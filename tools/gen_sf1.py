#!/usr/bin/env python3
"""Generate a local sf1 fixture (~6M-row lineitem) by key-consistent
10x replication of the driver's sf0.1 tables — the round-10 scale
rehearsal input. NOT checked-in data; writes to the given output dir
(default /tmp/graft-sf1). /root/testdata is never touched.

Shape notes:
  - every key domain (orderkey, partkey, suppkey, custkey, user_id,
    event_id, doc_id, vec_id) is offset by copy_index * (max_key + 1),
    so joins keep their sf0.1 selectivity (10x rows on both sides,
    fan-out unchanged) and per-copy entity counts scale together;
  - documents get a per-copy suffix token, so each source doc yields a
    10-member NEAR-dup cluster (Jaccard >= ~0.9) — heavy duplication
    is exactly what a web-scale corpus looks like, and it stress-tests
    the dedup candidate generators' bucketing;
  - embeddings get a tiny per-copy additive perturbation (copy_index *
    1e-3 on every dimension) — near-identical vectors across copies,
    the ANN analog of the near-dup clusters;
  - parquet logical types are preserved by writing through the SOURCE
    schema (the engine's readers are sensitive to timestamp encodings
    — see TESTDATA.md).

Usage: python3 tools/gen_sf1.py [src_sf_dir] [dst_dir] [copies]
(copies defaults to 10 = sf1; 30 = sf3, 50 = sf5 for the round-17
spot rehearsals)
"""
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

COPIES = 10  # default; override with the 3rd CLI arg (copies = 10*scale)

# column -> key-domain tag; domains shared across tables stay aligned
OFFSETS = {
    "lineitem": {"l_orderkey": "o", "l_partkey": "p", "l_suppkey": "s"},
    "orders": {"o_orderkey": "o", "o_custkey": "c"},
    "customer": {"c_custkey": "c"},
    "supplier": {"s_suppkey": "s"},
    "part": {"p_partkey": "p"},
    "events": {"event_id": "e", "user_id": "u"},
    "documents": {"doc_id": "d"},
    "embeddings": {"vec_id": "v"},
}
DOMAIN_SOURCE = {  # domain -> (table, column) holding its full range
    "o": ("orders", "o_orderkey"), "p": ("part", "p_partkey"),
    "s": ("supplier", "s_suppkey"), "c": ("customer", "c_custkey"),
    "e": ("events", "event_id"), "u": ("events", "user_id"),
    "d": ("documents", "doc_id"), "v": ("embeddings", "vec_id"),
}
COPY_AS_IS = ["region", "nation"]


def main(src, dst, copies=COPIES):
    os.makedirs(dst, exist_ok=True)
    strides = {}
    for dom, (t, c) in DOMAIN_SOURCE.items():
        col = pq.read_table(f"{src}/{t}.parquet", columns=[c])[c]
        strides[dom] = pc.max(col).as_py() + 1
    print("strides:", strides)
    for t in COPY_AS_IS:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
        print(f"{t}: copied")
    for t, offs in OFFSETS.items():
        tbl = pq.read_table(f"{src}/{t}.parquet").combine_chunks()
        schema = tbl.schema
        parts = []
        for k in range(copies):
            cols = []
            for name in schema.names:
                col = tbl[name].combine_chunks()
                if name in offs:
                    col = pc.add(col, k * strides[offs[name]]).cast(
                        schema.field(name).type)
                elif t == "documents" and name == "text" and k > 0:
                    col = pc.binary_join_element_wise(
                        col, pa.scalar(f"dupcopy{k}"), " ")
                elif t == "embeddings" and name == "embedding" and k > 0:
                    values = pc.add(col.values, k * 1e-3).cast(pa.float32())
                    col = pa.ListArray.from_arrays(
                        col.offsets, values).cast(schema.field(name).type)
                cols.append(col)
            parts.append(pa.table(cols, schema=schema))
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{t}.parquet")
        print(f"{t}: {tbl.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    # 3rd arg: replication count (round 17 - the sf3/sf5 spot
    # rehearsals pass 30/50 for /tmp/graft-sf3 and /tmp/graft-sf5)
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft-sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else COPIES
    main(src, dst, copies)
