#!/usr/bin/env python3
"""Sequential ONE-PROCESS oracle walk — the driver checker's execution
model, reproduced exactly.

tools/capwalk.py bounds each oracle's memory fork-isolated: it proves
per-oracle cost but NOT the pattern that killed 37 driver rows in
round 14 — buffer-pool/allocator accretion across a sequential walk of
all oracles inside one long-lived checker process ("failed to allocate
block of 16-256 KB" on a 6-row aggregate). This tool runs every oracle
back-to-back in THIS process (fresh duckdb connection per oracle, like
the driver and tools/selfcheck.py), with an explicit per-connection
memory_limit, and reports RSS high-water so the envelope is proven
under the accretion pattern itself, not only under fork isolation.

Usage: python3 tools/walk_one_process.py <sfDir> <oracle_sql.json> [cap...]
e.g.:  python3 tools/walk_one_process.py /root/testdata/sf0.01 \
           /root/.graft/verify_out/oracle_sql.json 64MB
Exit 0 iff every oracle at every cap returned at least one row without
error (every declared oracle returns rows at sf>=0.001 by fixture
construction, so an empty result is a failure, not a pass).
"""
import contextlib, duckdb, json, os, re, resource, sys, time

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Leading "SET x='y';" statements (the retired embedded prologue) —
# stripped when replaying old oracle dumps so the walk's cap governs.
_SET_PREFIX = re.compile(r"^\s*(SET\s+[^;]+;\s*)+", re.IGNORECASE)


def rss_mb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def walk(sf_dir, oracles, cap):
    fails = []
    t0 = time.time()
    for name in sorted(oracles):
        sql = _SET_PREFIX.sub("", oracles[name])
        try:
            # closing() so a failing oracle cannot leak its connection
            # (and buffer pool) into the rest of the walk — the leak
            # would inflate the RSS high-water this tool exists to
            # measure cleanly, and could cascade allocation failures
            # into later oracles (round-15 ADVICE).
            with contextlib.closing(duckdb.connect()) as con:
                con.execute(f"SET memory_limit='{cap}'")
                con.execute("SET threads=4")
                con.execute("SET temp_directory='/tmp/duck_spill'")
                for t in TABLES:
                    p = f"{sf_dir}/{t}.parquet"
                    if os.path.exists(p):
                        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
                rows = con.sql(sql).fetchall()
                if not rows:
                    fails.append((name, "returned 0 rows"))
        except Exception as e:
            fails.append((name, str(e).replace("\n", " ")[:150]))
    print(f"one-process cap={cap}: {len(fails)} fails in "
          f"{time.time() - t0:.0f}s, rss_high_water={rss_mb():.0f}MB")
    for n, e in fails:
        print("   ", n, e)
    return len(fails)


if __name__ == "__main__":
    os.makedirs("/tmp/duck_spill", exist_ok=True)
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    oracles = json.load(open(oracle_json))
    rc = 0
    for cap in sys.argv[3:] or ["128MB", "64MB"]:
        rc |= 1 if walk(sf_dir, oracles, cap) else 0
    sys.exit(rc)
