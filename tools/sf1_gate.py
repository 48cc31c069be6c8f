#!/usr/bin/env python3
"""Standing sf1 correctness gate (VERDICT r7 ask #7): the FULL-registry
DuckDB compare at 10x the per-round gate's scale, with the
float-tolerant cell compare of tools/compare.py (rel_tol 1e-9 — the
correct contract for order-dependent double aggregates; the r7 TPC-H
Q19 lesson: two engines' summation orders diverge ~1e-12 relative on
1e9+ sums, and exact compare breaks down while both are right).

Differences from compare.py (the sf0.01 driver mirror):
  - every ORACLE runs under a per-query wall budget (default 180 s,
    subprocess-enforced): a handful of oracles are intentionally
    quadratic in DuckDB at sf1 (all-pairs cosine/knn scans, the
    recursive-CTE jaccard closure) while the ENGINE side is the
    scale-safe formulation — those time out and are recorded as
    `oracle_budget`, not failures. The point of this gate is "does the
    engine match the oracle wherever the oracle can run at 10x", not
    "can DuckDB afford an O(n^2) closure".
  - emits a machine-readable CORRECTNESS-sf1.json next to the human
    report, committed per round.

Usage: python3 tools/sf1_gate.py <sf1Dir> <verifyOutDir> [budget_sec]
"""
import glob, json, multiprocessing as mp, os, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import TABLES, cells_eq, norm_cell


def run_oracle(sf, sql, q):
    import duckdb
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    # cap per-oracle threads: the gate runs WORKERS oracles at once and
    # an uncapped DuckDB would oversubscribe the box (and one slow
    # oracle would starve the rest into spurious budget SKIPs)
    con.sql("SET threads=6")
    for t in TABLES:
        path = f"{sf}/{t}.parquet"
        pat = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    try:
        o = con.sql(sql)
        cols = [c.lower() for c in o.columns]
        q.put((cols, o.fetchall(), None))
    except Exception as e:
        q.put((None, None, str(e)[:300]))


WORKERS = 5


def main():
    sf, out = sys.argv[1], sys.argv[2]
    budget = float(sys.argv[3]) if len(sys.argv) > 3 else 180.0
    import duckdb, time
    scon = duckdb.connect()
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    report = {}
    n_pass = n_fail = n_budget = n_exempt = n_missing = 0

    # run up to WORKERS oracle subprocesses concurrently, each under
    # its own wall budget; compare on the parent as results land
    pending = []
    for name in sorted(oracle):
        sql = oracle[name]
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            report[name] = {"status": "no_spark_result"}
            print(f"MISS {name}: no spark result")
            n_missing += 1
            continue
        pending.append((name, sql, files))

    running = {}  # name -> (proc, queue, deadline, files)

    def launch(name, sql, files):
        q = mp.Queue()
        p = mp.Process(target=run_oracle, args=(sf, sql, q))
        p.start()
        running[name] = (p, q, time.monotonic() + budget, files)

    def compare(name, res, files):
        # compare one finished oracle immediately — result rows are
        # freed as soon as the verdict lands, never buffered fleet-wide
        nonlocal n_pass, n_fail, n_budget
        if res == "budget":
            report[name] = {"status": "oracle_budget",
                            "note": f"oracle exceeded {budget}s at sf1"}
            print(f"SKIP {name}: oracle over {budget}s budget", flush=True)
            n_budget += 1
            return
        ocols, orows, err = res
        if err is not None:
            report[name] = {"status": "oracle_error", "err": err}
            print(f"FAIL {name}: oracle error: {err}", flush=True)
            n_fail += 1
            return
        s = scon.sql(f"SELECT * FROM read_parquet({files!r})")
        scols = [c.lower() for c in s.columns]
        srows = s.fetchall()
        if sorted(ocols) != sorted(scols):
            report[name] = {"status": "schema_mismatch",
                            "oracle": sorted(ocols), "spark": sorted(scols)}
            print(f"FAIL {name}: columns oracle={sorted(ocols)} spark={sorted(scols)}",
                  flush=True)
            n_fail += 1
            return
        operm = [ocols.index(c) for c in sorted(ocols)]
        sperm = [scols.index(c) for c in sorted(scols)]
        orows = [tuple(norm_cell(r[i]) for i in operm) for r in orows]
        srows = [tuple(norm_cell(r[i]) for i in sperm) for r in srows]
        if len(orows) != len(srows):
            report[name] = {"status": "rowcount_mismatch",
                            "oracle": len(orows), "spark": len(srows)}
            print(f"FAIL {name}: rowcount oracle={len(orows)} spark={len(srows)}",
                  flush=True)
            n_fail += 1
            return
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(orows, srows))
               if not cells_eq(a, b)]
        if bad:
            i, a, b = bad[0]
            report[name] = {"status": "value_mismatch", "n_bad": len(bad),
                            "first": {"row": i, "oracle": repr(a)[:300],
                                      "spark": repr(b)[:300]}}
            print(f"FAIL {name}: {len(bad)}/{len(orows)} rows differ (first at {i})",
                  flush=True)
            n_fail += 1
        else:
            report[name] = {"status": "pass", "rows": len(orows)}
            print(f"PASS {name}: {len(orows)} rows", flush=True)
            n_pass += 1

    idx = 0
    while idx < len(pending) or running:
        while idx < len(pending) and len(running) < WORKERS:
            n, s, f = pending[idx]
            launch(n, s, f)
            idx += 1
        time.sleep(0.2)
        for name in list(running):
            p, q, deadline, files = running[name]
            if not q.empty() or not p.is_alive():
                try:
                    res = q.get(timeout=5)
                except Exception:
                    res = (None, None, "oracle process died")
                p.join()
                del running[name]
                compare(name, res, files)
            elif time.monotonic() > deadline:
                p.terminate(); p.join()
                del running[name]
                compare(name, "budget", files)

    # queries with no oracle (golden-exempt) appear in neither map;
    # record them from the dump dir for a complete artifact
    for d in sorted(glob.glob(f"{out}/*")):
        name = os.path.basename(d)
        if os.path.isdir(d) and name not in report:
            report[name] = {"status": "golden_exempt"}
            n_exempt += 1
    summary = {"sf_dir": sf, "budget_sec": budget, "n_pass": n_pass,
               "n_fail": n_fail, "n_oracle_budget": n_budget,
               "n_golden_exempt": n_exempt, "n_no_result": n_missing,
               "float_tolerance": "rel_tol=1e-9, abs_tol=1e-9 (compare.cells_eq)"}
    print(f"== {json.dumps(summary)} ==")
    with open("CORRECTNESS-sf1.json", "w") as f:
        json.dump({"summary": summary, "queries": report}, f, indent=1, sort_keys=True)
    sys.exit(1 if (n_fail or n_missing) else 0)


if __name__ == "__main__":
    main()
