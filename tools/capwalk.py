#!/usr/bin/env python3
"""Reproduce / bound the oracle checker's memory envelope.

Round 11 lost 15 green rows to driver-side DuckDB OOMs ("Failed to
allocate block of 16384 bytes") on oracles as light as a 1,500-row
filter-agg — the checker process was at its commit limit, not the
queries. This tool walks EVERY oracle under an explicit DuckDB
memory_limit (fork-isolated per oracle, because this environment's
duckdb also segfaults under sustained in-process load) and reports
which genuinely exceed the cap.

Measured at sf0.01 (round 12): 512MB -> 0 fails; 256MB -> only
q34/q117 (recursive-CTE connected components) fail. Round 13 REMOVED
the embedded SET prologue (its multi-statement form coincided with
the driver checker recording zero rows in round 12 — every oracle is
now a single statement), so this walk is the only memory-cap evidence;
the prologue strip below is kept for replaying old oracle dumps.

Usage: python3 tools/capwalk.py <sfDir> <oracle_sql.json> <cap> [cap...]
e.g.:  python3 tools/capwalk.py /root/testdata/sf0.01 \
           /root/.graft/verify_out/oracle_sql.json 512MB 256MB
"""
import duckdb, json, os, re, sys, time
import multiprocessing as mp

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Leading "SET x='y';" statements (the embedded prologue) — stripped so
# the walk's own cap governs.
_SET_PREFIX = re.compile(r"^\s*(SET\s+[^;]+;\s*)+", re.IGNORECASE)


def run_one(q, sf_dir, sql, cap):
    try:
        con = duckdb.connect()
        con.execute(f"SET memory_limit='{cap}'")
        con.execute("SET threads=4")
        con.execute("SET temp_directory='/tmp/duck_spill'")
        for t in TABLES:
            p = f"{sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        con.sql(sql).fetchall()
        q.put(("ok", ""))
    except Exception as e:
        q.put(("fail", str(e)[:120]))


def walk(sf_dir, oracles, cap):
    ctx = mp.get_context("fork")
    fails = []
    t0 = time.time()
    for name in sorted(oracles):
        sql = _SET_PREFIX.sub("", oracles[name])
        q = ctx.Queue()
        p = ctx.Process(target=run_one, args=(q, sf_dir, sql, cap))
        p.start()
        p.join(300)
        if p.is_alive():
            p.kill(); p.join()
            fails.append((name, "TIMEOUT"))
            continue
        if p.exitcode != 0:
            fails.append((name, f"CRASH exit={p.exitcode}"))
            continue
        try:
            st, err = q.get(timeout=10)
            if st != "ok":
                fails.append((name, err))
        except Exception:
            fails.append((name, "no verdict"))
    print(f"cap={cap}: {len(fails)} fails in {time.time() - t0:.0f}s")
    for n, e in fails:
        print("   ", n, e)
    return len(fails)


if __name__ == "__main__":
    os.makedirs("/tmp/duck_spill", exist_ok=True)
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    oracles = json.load(open(oracle_json))
    rc = 0
    for cap in sys.argv[3:] or ["1GB", "512MB", "256MB"]:
        rc |= 1 if walk(sf_dir, oracles, cap) else 0
    sys.exit(rc)
