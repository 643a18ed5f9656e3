#!/usr/bin/env python3
"""Generate SPARSE-span rehearsal corpora for the ExactSubstr family
(q131 detect / q132 excise / q133 emit) — the round-12 sf1 rehearsal
used by-construction 10x cluster duplication (every doc duplicated),
which exercises throughput but not the AFFECTED-DOCS GATE that makes
excision cheap in the common production case where duplicated spans
are rare. Three corpora, deterministic (seeded):

  small — 5,000 docs:  2% pair-span docs (50 unique 40-token spans,
          each shared by one doc pair) + 5% boilerplate docs (5
          families x 50 docs sharing a 35-token block) + 93% clean
          random-token docs. Affected fraction: 7%.
  big   — 50,000 docs: the same composition x10 (500 spans, 50
          families of the SAME size 50 — per-hash occurrences stay
          constant, the fraction stays 7%, rows grow 10x). The
          timing comparison small->big isolates corpus growth at
          fixed span density.
  cap   — 6,000 docs:  5,000 docs sharing ONE 35-token block
          (occurrences 5,000 > the engine's 4,096 occurrence cap)
          + 1,000 clean. The adversarial hot-key case: the cap must
          exclude the family (boilerplate by declared semantics,
          DedupOps.substrOccCap) so q131 emits ZERO spans and never
          goes quadratic on the hot hash.

Every other sf0.1 table is copied as-is so graft.Bench runs against
the dir. Writes under /tmp; /root/testdata is never touched.

Usage: python3 tools/gen_sparse_spans.py [/root/testdata/sf0.1] [/tmp]
"""
import os
import random
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = 50_000
DOC_LEN = 60          # tokens per doc (matches the fixture's ~54 avg)
SPAN_LEN = 40         # > the 30-token window, so pair spans are found
BOILER_LEN = 35
FAMILY = 50           # docs per boilerplate family (occ stays < cap)


def words(rnd, n):
    return [f"w{rnd.randrange(VOCAB)}" for _ in range(n)]


def corpus(seed, n_docs, n_spans, n_families, mega=0):
    rnd = random.Random(seed)
    docs = []
    did = 0

    def clean_doc():
        nonlocal did
        docs.append((did, " ".join(words(rnd, DOC_LEN)), "clean"))
        did += 1

    # pair-span docs: each span text unique, shared by exactly 2 docs
    for _ in range(n_spans):
        span = words(rnd, SPAN_LEN)
        for _ in range(2):
            head = words(rnd, rnd.randrange(5, 15))
            tail = words(rnd, DOC_LEN - SPAN_LEN - len(head))
            docs.append((did, " ".join(head + span + tail), "span"))
            did += 1
    # boilerplate families: one block per family, FAMILY docs each
    for _ in range(n_families):
        block = words(rnd, BOILER_LEN)
        for _ in range(FAMILY):
            head = words(rnd, rnd.randrange(5, 15))
            tail = words(rnd, DOC_LEN - BOILER_LEN - len(head))
            docs.append((did, " ".join(head + block + tail), "boiler"))
            did += 1
    # one mega family past the occurrence cap (the hot-key case)
    if mega:
        block = words(rnd, BOILER_LEN)
        for _ in range(mega):
            head = words(rnd, rnd.randrange(5, 15))
            tail = words(rnd, DOC_LEN - BOILER_LEN - len(head))
            docs.append((did, " ".join(head + block + tail), "mega"))
            did += 1
    while did < n_docs:
        clean_doc()
    rnd.shuffle(docs)
    return docs


def write(src, dst, docs):
    os.makedirs(dst, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "embeddings"):
        s = f"{src}/{t}.parquet"
        if os.path.exists(s):
            shutil.copyfile(s, f"{dst}/{t}.parquet")
    # mirror the fixture's documents schema (doc_id, text, source, lang?)
    ref = pq.read_table(f"{src}/documents.parquet")
    cols = {"doc_id": pa.array([d[0] for d in docs], pa.int64()),
            "text": pa.array([d[1] for d in docs], pa.string())}
    for name in ref.schema.names:
        if name in cols:
            continue
        # fill remaining columns with the role tag (deterministic)
        typ = ref.schema.field(name).type
        if pa.types.is_string(typ) or pa.types.is_large_string(typ):
            cols[name] = pa.array([d[2] for d in docs], typ)
        elif pa.types.is_integer(typ):
            cols[name] = pa.array([d[0] % 7 for d in docs], typ)
        elif pa.types.is_floating(typ):
            cols[name] = pa.array([float(d[0] % 7) for d in docs], typ)
        else:
            raise SystemExit(f"unhandled documents column {name}: {typ}")
    pq.write_table(
        pa.table({n: cols[n] for n in ref.schema.names}),
        f"{dst}/documents.parquet")
    print(f"{dst}: {len(docs)} docs "
          f"({sum(1 for d in docs if d[2] != 'clean')} affected-candidates)")


def main(src, base):
    write(src, f"{base}/graft-sparse-small",
          corpus(101, 5_000, n_spans=50, n_families=5))
    write(src, f"{base}/graft-sparse-big",
          corpus(202, 50_000, n_spans=500, n_families=50))
    write(src, f"{base}/graft-sparse-cap",
          corpus(303, 6_000, n_spans=0, n_families=0, mega=5_000))


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    base = sys.argv[2] if len(sys.argv) > 2 else "/tmp"
    main(src, base)
