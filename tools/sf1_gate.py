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

r9 additions (VERDICT r8 ask #4 + ADVICE):
  - `<verifyOutDir>/oracle_sql_sf1.json` (written by graft.Verify)
    carries per-query OVERRIDE oracles for this gate: distinct-factored
    full rewrites (fuzzy family) and deterministic ~1% probe-slice
    forms (similarity family, `spark_where` applied to the engine dump
    before comparing) — per-row-complete value verification where the
    naive quadratic oracle cannot run at 10x.
  - per-query budget multipliers for linear-but-slow oracles (full
    lineitem fetch, 256M-lambda projections) that are not quadratic
    and deserve the time.
  - every report entry records elapsed_sec so budget flips between
    rounds are auditable (ADVICE r8).

Usage: python3 tools/sf1_gate.py <sf1Dir> <verifyOutDir> [budget_sec]
"""
import glob, json, multiprocessing as mp, os, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import TABLES, cells_eq, norm_cell

# linear-but-slow oracles (NOT quadratic): a bigger slice of the wall
# budget instead of a skip. Elapsed lands in the report either way.
BUDGET_MULT = {"q_math_funcs": 4.0, "q_embed_project": 4.0,
               "q_fuzzy_join": 2.0, "q_jaro_sim": 2.0,
               "q_sim_jaccard": 2.0, "q_sim_containment": 2.0,
               # r10 closure-family override scripts: ~50-140 s measured
               # solo at sf1; 2x headroom for gate-worker contention
               "q_dedup_cluster": 2.0, "q_dedup_keep_best": 2.0,
               "q_entity_resolution": 2.0,
               # 103 s solo at the gate's 6 threads (200M raw dots)
               "q_sim_cosine_topk": 2.0,
               # r13: the composed triad runs the full-corpus MinHash
               # chain PLUS a 20%-corpus probe-side chain (≈2x the
               # q_dedup_incr_near oracle) — linear, not quadratic
               "q_crawl_triad": 2.0,
               # r14: same oracle through the WARC round trip
               "q_warc_triad": 2.0}


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
    # engine dumps are compared in their written (total-order) row
    # order; sliced compares filter them, so pin order preservation
    scon.sql("SET preserve_insertion_order=true")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    sf1_path = f"{out}/oracle_sql_sf1.json"
    overrides = json.load(open(sf1_path)) if os.path.exists(sf1_path) else {}
    report = {}
    n_pass = n_fail = n_budget = n_exempt = n_missing = 0

    # run up to WORKERS oracle subprocesses concurrently, each under
    # its own wall budget; compare on the parent as results land
    pending = []
    for name in sorted(oracle):
        ov = overrides.get(name)
        sql = ov["sql"] if ov else oracle[name]
        where = (ov.get("spark_where") or "") if ov else ""
        files = sorted(glob.glob(f"{out}/{name}/*.parquet"))
        if not files:
            report[name] = {"status": "no_spark_result"}
            print(f"MISS {name}: no spark result")
            n_missing += 1
            continue
        pending.append((name, sql, files, where, bool(ov)))

    running = {}  # name -> (proc, queue, deadline, files, where, ov, t0)

    def launch(name, sql, files, where, ov):
        q = mp.Queue()
        p = mp.Process(target=run_oracle, args=(sf, sql, q))
        p.start()
        b = budget * BUDGET_MULT.get(name, 1.0)
        running[name] = (p, q, time.monotonic() + b, files, where, ov,
                         time.monotonic())

    def compare(name, res, files, where, ov, elapsed):
        # compare one finished oracle immediately — result rows are
        # freed as soon as the verdict lands, never buffered fleet-wide
        nonlocal n_pass, n_fail, n_budget
        extra = {"elapsed_sec": round(elapsed, 1)}
        if ov:
            extra["oracle"] = "sf1_override" + (" (sliced)" if where else "")
        if res == "budget":
            b = budget * BUDGET_MULT.get(name, 1.0)
            report[name] = {"status": "oracle_budget",
                            "note": f"oracle exceeded {b}s at sf1", **extra}
            print(f"SKIP {name}: oracle over {b}s budget", flush=True)
            n_budget += 1
            return
        ocols, orows, err = res
        if err is not None:
            report[name] = {"status": "oracle_error", "err": err, **extra}
            print(f"FAIL {name}: oracle error: {err}", flush=True)
            n_fail += 1
            return
        wsql = f" WHERE {where}" if where else ""
        s = scon.sql(f"SELECT * FROM read_parquet({files!r}){wsql}")
        scols = [c.lower() for c in s.columns]
        srows = s.fetchall()
        if sorted(ocols) != sorted(scols):
            report[name] = {"status": "schema_mismatch",
                            "oracle": sorted(ocols), "spark": sorted(scols),
                            **extra}
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
                            "oracle": len(orows), "spark": len(srows),
                            **extra}
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
                                      "spark": repr(b)[:300]}, **extra}
            print(f"FAIL {name}: {len(bad)}/{len(orows)} rows differ (first at {i})",
                  flush=True)
            n_fail += 1
        else:
            report[name] = {"status": "pass", "rows": len(orows), **extra}
            tag = " [sliced]" if where else (" [override]" if ov else "")
            print(f"PASS {name}: {len(orows)} rows{tag}", flush=True)
            n_pass += 1

    idx = 0
    while idx < len(pending) or running:
        while idx < len(pending) and len(running) < WORKERS:
            n, s, f, w, o = pending[idx]
            launch(n, s, f, w, o)
            idx += 1
        time.sleep(0.2)
        for name in list(running):
            p, q, deadline, files, where, ov, t0 = running[name]
            if not q.empty() or not p.is_alive():
                try:
                    res = q.get(timeout=5)
                except Exception:
                    res = (None, None, "oracle process died")
                p.join()
                del running[name]
                compare(name, res, files, where, ov, time.monotonic() - t0)
            elif time.monotonic() > deadline:
                p.terminate(); p.join()
                del running[name]
                compare(name, "budget", files, where, ov,
                        time.monotonic() - t0)

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
               "n_sf1_override": len(overrides),
               "budget_mult": BUDGET_MULT,
               "float_tolerance": "rel_tol=1e-9, abs_tol=1e-9 (compare.cells_eq)"}
    print(f"== {json.dumps(summary)} ==")
    with open("CORRECTNESS-sf1.json", "w") as f:
        json.dump({"summary": summary, "queries": report}, f, indent=1, sort_keys=True)
    sys.exit(1 if (n_fail or n_missing) else 0)


if __name__ == "__main__":
    main()
