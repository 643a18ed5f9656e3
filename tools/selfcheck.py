#!/usr/bin/env python3
"""Dev-only self-check: mimic the driver's DuckDB-oracle comparison.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir> [--json OUT.json]
Reads <verifyOutDir>/<query>/ parquet (written by graft.Verify) and
<verifyOutDir>/oracle_sql.json, runs each oracle against DuckDB views over
<sfDir>/*.parquet, and compares: column names, row count, exact values
(columns sorted by name), both in given row order and sorted-row order.

--json writes a machine-readable record of the run ({queries: {name:
{status, detail}}, summary}) — the committed artifact that makes a
round's correctness evidence robust to driver-harness OOM flakiness
(the driver's own CORRECTNESS file can then be cross-referenced against
a green selfcheck of the same queries at the same scale).
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

def fresh_con(sf_dir):
    """One connection PER ORACLE: this box has no swap and a ~63 GB
    commit limit while duckdb 1.0's default memory_limit (80% of
    128 GB) exceeds it, and a single long-lived connection accretes
    allocator fragmentation across the heavy array oracles (q41/q45)
    until a late small malloc fails ("bad allocation" with 120 GB
    nominally free — seen at q51/q55/q95, i.e. wherever the walk
    happened to be). Fresh connections bound the process high-water;
    the explicit limit keeps the buffer manager evicting below what
    the kernel will actually commit."""
    con = duckdb.connect()
    con.execute("SET memory_limit='16GB'")
    con.execute("SET threads=8")
    con.execute("SET temp_directory='/tmp/duckdb_selfcheck_spill'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con

def with_oom_retry(fn, attempts=5):
    """This environment sporadically fails even 2 KB duckdb allocations
    ("bad allocation" with >100 GB nominally free) — observed right
    after Spark JVM exits and intermittently under load; a rerun of the
    identical query seconds later succeeds. Retry with backoff."""
    import time
    for i in range(attempts):
        try:
            return fn()
        except duckdb.OutOfMemoryException:
            if i == attempts - 1:
                raise
            time.sleep(5 * (i + 1))

def main(sf_dir, out_dir, json_out=None):
    """Each query's comparison runs in a FORKED SUBPROCESS: this
    environment's duckdb sporadically OOMs on byte-sized allocations
    AND segfaults outright under sustained load (observed at different
    queries on different runs, with >100 GB nominally free) — neither
    is a correctness verdict, and a segfault in-process would kill the
    whole walk. Isolation contains the blast radius; crashed/OOM'd
    queries retry up to 3 times and report [ENV] if still unlucky."""
    import multiprocessing as mp
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Round-13 delivery contract: every oracle is exactly ONE statement
    # (the round-12 multi-statement SET prologue coincided with the
    # driver checker recording zero rows). Enforce it here too, so a
    # regression fails the selfcheck loudly before any driver run.
    bad = [n for n, s in oracle.items() if not _single_statement(s)]
    if bad:
        print(f"CONTRACT VIOLATION: multi-statement oracles: {bad}")
        return 1
    n_pass = n_fail = n_env = 0
    record = {}
    ctx = mp.get_context("fork")
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        verdict = None
        for attempt in range(3):
            q = ctx.Queue()
            p = ctx.Process(target=_child, args=(q, sf_dir, d, name, oracle))
            p.start()
            p.join(600)
            if p.is_alive():
                p.kill()
                p.join()
            # q.get with a timeout, not q.empty(): after join() the
            # child's queued verdict may not yet be buffered in the
            # parent, and empty() transiently True would misclassify a
            # completed query as an env crash
            if p.exitcode == 0:
                import queue as _queue
                try:
                    verdict = q.get(timeout=10)
                    break
                except _queue.Empty:
                    pass
            import time
            time.sleep(5 * (attempt + 1))
        if verdict is None:
            n_env += 1
            record[name] = {"status": "env",
                            "detail": "duckdb crashed/OOM'd in 3 isolated attempts"}
            print(f"  [ENV] {name}: duckdb crashed/OOM'd in 3 isolated "
                  "attempts; not a correctness verdict")
        else:
            status, line = verdict
            record[name] = {"status": status, "detail": line.strip()}
            print(line)
            if status == "pass":
                n_pass += 1
            elif status == "fail":
                n_fail += 1
    suffix = f", {n_env} env-crash (rerun those)" if n_env else ""
    print(f"\n{n_pass} pass, {n_fail} fail{suffix}")
    if json_out:
        import datetime
        with open(json_out, "w") as fh:
            json.dump({
                "sf_dir": sf_dir,
                "out_dir": out_dir,
                "timestamp_utc": datetime.datetime.utcnow().isoformat() + "Z",
                "summary": {"pass": n_pass, "fail": n_fail, "env": n_env,
                            "rows_only": sum(1 for r in record.values()
                                             if r["status"] == "rows-only")},
                "queries": record,
            }, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else (2 if n_env else 0)

def _single_statement(sql):
    """True iff sql has no top-level ';' (outside single-quoted
    literals) and starts with SELECT/WITH."""
    in_s = False
    for ch in sql:
        if ch == "'":
            in_s = not in_s
        elif ch == ';' and not in_s:
            return False
    head = sql.strip().split(None, 1)[0].upper() if sql.strip() else ""
    return head in ("SELECT", "WITH")


def _child(q, sf_dir, d, name, oracle):
    try:
        q.put(check_one(sf_dir, d, name, oracle))
    except duckdb.OutOfMemoryException:
        os._exit(3)
    except Exception as e:
        # A binder/parse/conversion error is a DETERMINISTIC oracle
        # defect, not an environment crash — report it as a fail so it
        # can't hide behind the [ENV] retry loop (a nested-window
        # binder error spent three retries masquerading as OOM before
        # this branch existed).
        q.put(("fail", f"  [FAIL] {name}: {type(e).__name__}: "
               f"{str(e)[:300]}"))

def check_one(sf_dir, d, name, oracle):
        con = with_oom_retry(lambda: fresh_con(sf_dir))  # noqa: indent kept to minimize diff
        got = con.sql(f"SELECT * FROM '{d}/*.parquet'")
        got_cols = sorted(got.columns)
        got_rows = with_oom_retry(got.fetchall)
        if name not in oracle:
            con.close()
            return ("rows-only",
                    f"  [rows-only] {name}: {len(got_rows)} rows, cols={got_cols}")
        exp = con.sql(oracle[name])
        exp_cols = sorted(exp.columns)
        exp_rows = with_oom_retry(exp.fetchall)
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
        # Contract-test the OTHER plausible checker styles: the cursor
        # API (con.execute) must return the identical relation, and the
        # oracle must survive being WRAPPED as a subquery (a checker
        # that composes `SELECT ... FROM (<oracle>)` — legal for a
        # single WITH/SELECT statement, impossible for the round-12
        # prologue scripts).
        if status.startswith("PASS"):
            cur_rows = with_oom_retry(
                lambda: con.execute(oracle[name]).fetchall())
            # order-insensitive compare (the PASS* normalization): rows
            # tied on every ORDER BY key may legally permute between
            # two parallel executions of the same query
            if sorted(map(repr, cur_rows)) != sorted(map(repr, exp_rows)):
                status = "FAIL"
                detail = "execute()-style replay differs from sql()-style"
            else:
                try:
                    with_oom_retry(lambda: con.sql(
                        f"SELECT * FROM ({oracle[name]}) _wrap LIMIT 1"
                    ).fetchall())
                except duckdb.OutOfMemoryException:
                    raise
                except Exception as e:
                    status = "FAIL"
                    detail = (f"oracle is not wrappable as a subquery: "
                              f"{type(e).__name__}: {str(e)[:150]}")
        con.close()
        return ("pass" if status.startswith("PASS") else "fail",
                f"  [{status}] {name} ({len(got_rows)} rows) {detail}")

if __name__ == "__main__":
    args = sys.argv[1:]
    jout = None
    if "--json" in args:
        i = args.index("--json")
        jout = args[i + 1]
        args = args[:i] + args[i + 2:]
    sys.exit(main(args[0], args[1], jout))
