#!/usr/bin/env python3
"""Rounding-boundary audit for the DuckDB oracle suite.

A rounded float aggregate is a latent cross-engine coin flip when a
group's UNROUNDED value sits within the summation-order error (tens to
hundreds of ulps) of a rounding boundary: Spark's partial-agg fold
order varies run to run, so the last rounded digit can flip between
verifies even though both engines are "correct". This audit caught
q_sql_q11 (flipped live between two r7 verifies), q_agg_scan (~116
ulps from a boundary at sf0.01) and q_transitions (~34 ulps) — all
three now sum in exact integer units.

Method: strip every rnd() emulation wrapper from oracle_sql.json
(written by `graft.Verify`), re-run the unrounded SQL in DuckDB, and
report values within `ULPS` ulps of a half-unit boundary at the
query's rounding scale. Values flagged at 0 ulps are only a risk when
the quantity is an ORDER-DEPENDENT aggregate (sum/avg over doubles);
per-row expressions and min/max compute bit-identical doubles in both
engines and round identically under the rnd() emulation.

Each value is checked against EVERY rounding scale the query uses
(the column→scale mapping is not recoverable from the result tuples),
so mixed-scale queries may over-flag — a human filters; they can
never under-flag the scale a column is actually rounded at.

r9: runs at sf1 too (VERDICT r8 ask #8 — the q_sql_q11 flip was
scale-dependent, so auditing only sf0.01 misses the next one). For
that: parquet views accept part-file DIRECTORIES, the sf1 override
oracles (oracle_sql_sf1.json — distinct-factored/sliced forms) replace
their quadratic primaries, and each unrounded oracle runs in a
subprocess under a wall budget (quadratic stragglers report TIMEOUT
instead of hanging the audit).

Usage: tools/boundary_audit.py <sfDir> <verifyOutDir> [ulps=200] [budget_sec=300]
"""
import duckdb, json, math, multiprocessing as mp, re, sys, glob, os

PREFIX = "round(CAST(CAST(("
MID = ") AS VARCHAR) AS DECIMAL(38,18)), "


def unround(sql):
    out, scales = [], []
    i = 0
    while True:
        j = sql.find(PREFIX, i)
        if j < 0:
            out.append(sql[i:])
            break
        k = sql.find(MID, j)
        expr = sql[j + len(PREFIX):k]
        # a nested rnd(rnd(e)) would make the first-MID slice grab the
        # INNER wrapper's boundary and emit silently wrong unrounded
        # SQL — fail loudly instead of mis-auditing (no current oracle
        # nests rnd(); this guard keeps that an error, not a trap)
        if PREFIX in expr or expr.count("(") != expr.count(")"):
            raise ValueError(
                f"nested/unbalanced rnd() wrapper (expr starts {expr[:80]!r}); "
                "unround()'s first-MID slice cannot handle nesting — "
                "flatten the oracle's rounding or extend this parser")
        m = re.match(r"(\d+)\)::DOUBLE", sql[k + len(MID):])
        if not m:
            return None, None
        scales.append(int(m.group(1)))
        out.append(sql[i:j])
        out.append("(" + expr + ")")
        i = k + len(MID) + m.end()
    return "".join(out), scales


def run_unrounded(sf_dir, usql, q):
    import duckdb
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    # the audit runs oracles SEQUENTIALLY — give each the whole box
    # (capping at 6 threads made the heavy unrounded oracles 5x slower
    # than the r8 shared-connection audit and tripped false timeouts)
    for f in glob.glob(os.path.join(sf_dir, "*.parquet")):
        t = os.path.basename(f).replace(".parquet", "")
        pat = f"{f}/*.parquet" if os.path.isdir(f) else f
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    try:
        q.put((con.execute(usql).fetchall(), None))
    except Exception as e:
        q.put((None, str(e)[:100]))


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    max_ulps = float(sys.argv[3]) if len(sys.argv) > 3 else 200.0
    budget = float(sys.argv[4]) if len(sys.argv) > 4 else 300.0
    sql_map = dict(json.load(open(os.path.join(out_dir, "oracle_sql.json"))))
    sf1_path = os.path.join(out_dir, "oracle_sql_sf1.json")
    if os.path.exists(sf1_path):
        for name, ov in json.load(open(sf1_path)).items():
            sql_map[name] = ov["sql"]
    flagged = timeouts = 0
    for name, sql in sorted(sql_map.items()):
        if PREFIX not in sql:
            continue
        usql, scales = unround(sql)
        if usql is None:
            print(f"{name}: UNPARSED rnd() shape"); continue
        q = mp.Queue()
        p = mp.Process(target=run_unrounded, args=(sf_dir, usql, q))
        p.start()
        # DRAIN the queue BEFORE joining (the sf1_gate discipline): a
        # child whose result exceeds the ~64KB pipe buffer blocks in
        # q.put until the parent reads, and a parent blocked in
        # p.join() never reads — every large-result oracle would
        # "time out" regardless of budget (found live in r9)
        import time as _time
        deadline = _time.monotonic() + budget
        rows, err, got = None, None, False
        while _time.monotonic() < deadline:
            if not q.empty():
                try:
                    rows, err = q.get(timeout=30)
                except Exception:
                    err = "audit result unreadable"
                got = True
                break
            if not p.is_alive():
                try:
                    rows, err = q.get(timeout=5)
                except Exception:
                    err = "audit process died"
                got = True
                break
            _time.sleep(0.2)
        if not got:
            p.terminate(); p.join()
            print(f"{name}: TIMEOUT over {budget}s (quadratic oracle at this SF)")
            timeouts += 1
            continue
        p.join(10)
        if p.is_alive():
            p.terminate(); p.join()
        if err is not None:
            print(f"{name}: ERR {err}"); continue
        # a mixed-scale query (e.g. q_agg_scan rounds at 2 AND 4) must be
        # checked at EVERY scale it rounds at — a scale-2 column sitting
        # on a half-cent boundary is invisible at scale 4
        hits = []
        for r in rows:
            for v in r:
                if isinstance(v, float) and math.isfinite(v) and v != 0:
                    for s in set(scales):
                        x = v * (10 ** s)
                        d = abs(x - math.floor(x) - 0.5)
                        u = math.ulp(x)
                        if u > 0 and d / u < max_ulps:
                            hits.append((round(d / u, 1), v))
        if hits:
            flagged += 1
            hits.sort()
            print(f"{name}: boundary within {hits[0][0]} ulps "
                  f"({len(hits)} value(s); closest v={hits[0][1]!r}) — "
                  f"order-dependent aggregate? then sum in integer units")
    print(f"== {flagged} queries flagged (<{max_ulps} ulps), "
          f"{timeouts} timed out ==")


if __name__ == "__main__":
    main()
