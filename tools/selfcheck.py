#!/usr/bin/env python3
"""Dev-only self-check: mimic the driver's DuckDB-oracle comparison.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>
Reads <verifyOutDir>/<query>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle against DuckDB views over
<sfDir>/*.parquet, and compares: column names, row count, exact values
(columns sorted by name), both in given row order and sorted-row order.
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    return v

def main(sf_dir, out_dir):
    con = duckdb.connect()
    # This box has no swap and a ~63 GB commit limit, while duckdb's
    # default memory_limit (80% of 128 GB RAM) exceeds it — so under
    # pressure malloc fails ("bad allocation" OOM on byte-sized blocks
    # with 120 GB nominally free) instead of duckdb's buffer manager
    # ever spilling. Pin a limit the kernel will actually honor and a
    # temp dir so eviction has somewhere to go.
    con.execute("SET memory_limit='16GB'")
    con.execute("SET threads=8")
    con.execute("SET temp_directory='/tmp/duckdb_selfcheck_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        got_cols = sorted(got.columns)
        got_rows = got.fetchall()
        if name not in oracle:
            print(f"  [rows-only] {name}: {len(got_rows)} rows, cols={got_cols}")
            continue
        exp = con.sql(oracle[name])
        exp_cols = sorted(exp.columns)
        exp_rows = exp.fetchall()
        # Compare logical types too: Python fetchall() collapses DuckDB
        # HUGEINT to int, masking Spark-BIGINT-vs-oracle-HUGEINT hash
        # mismatches the driver WILL flag (bit us in round 1: q20/q51/
        # q64/q72). Keyed by column name, same sort the driver uses.
        # ≤64-bit ints are equivalent (q21's Spark INT32 vs DuckDB
        # BIGINT hash-matched in round 1); HUGEINT is NOT — it arrives
        # as Decimal on the arrow path and breaks the value hash.
        def nt(t):
            s = str(t)
            return "int" if s in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                                  "UTINYINT", "USMALLINT", "UINTEGER") else s
        got_types = {c: nt(t) for c, t in zip(got.columns, got.types)}
        exp_types = {c: nt(t) for c, t in zip(exp.columns, exp.types)}
        status, detail = "PASS", ""
        if got_cols != exp_cols:
            status, detail = "FAIL", f"cols got={got_cols} exp={exp_cols}"
        elif got_types != exp_types:
            mism = {c: (got_types.get(c), exp_types.get(c))
                    for c in got_cols if got_types.get(c) != exp_types.get(c)}
            status, detail = "FAIL", f"types differ (got, exp): {mism}"
        elif len(got_rows) != len(exp_rows):
            status, detail = "FAIL", f"rowcount got={len(got_rows)} exp={len(exp_rows)}"
        else:
            gi = [got.columns.index(c) for c in got_cols]
            ei = [exp.columns.index(c) for c in exp_cols]
            g = [tuple(norm(r[i]) for i in gi) for r in got_rows]
            e = [tuple(norm(r[i]) for i in ei) for r in exp_rows]
            if g == e:
                pass
            elif sorted(map(repr, g)) == sorted(map(repr, e)):
                status, detail = "PASS*", "values match only after row sort"
            else:
                # find first diff for diagnostics
                gs, es = sorted(map(repr, g)), sorted(map(repr, e))
                diff = next((i for i, (a, b) in enumerate(zip(gs, es)) if a != b),
                            min(len(gs), len(es)) - 1)
                status = "FAIL"
                detail = f"first value diff @sorted-row {diff}:\n    got {gs[diff][:200]}\n    exp {es[diff][:200]}"
        if status.startswith("PASS"):
            n_pass += 1
        else:
            n_fail += 1
        print(f"  [{status}] {name} ({len(got_rows)} rows) {detail}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
