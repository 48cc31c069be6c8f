#!/usr/bin/env python3
"""Prove every sf1-gate oracle OVERRIDE identical to its primary
oracle at a scale where the primary can run (VERDICT r9 ask #3's
"each override proven == its primary at sf0.01").

For each entry in <verifyOutDir>/oracle_sql_sf1.json:
  - run the PRIMARY oracle (oracle_sql.json[name]) and the OVERRIDE
    (multi-statement scripts supported: duckdb's con.sql executes the
    script and returns the final SELECT) on <sfDir>'s parquet tables;
  - for sliced overrides (spark_where non-empty), filter the primary's
    result by the same predicate first — the override computes exactly
    the slice the gate compares;
  - compare row-by-row with compare.py's float-tolerant cells_eq.

Usage: python3 tools/override_equiv.py <sfDir> <verifyOutDir>
Exit 0 iff every override matches.
"""
import json, os, sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from compare import TABLES, cells_eq, norm_cell


def main():
    sf, out = sys.argv[1], sys.argv[2]
    import duckdb
    overrides = json.load(open(f"{out}/oracle_sql_sf1.json"))
    primaries = json.load(open(f"{out}/oracle_sql.json"))
    n_bad = 0
    for name in sorted(overrides):
        ov = overrides[name]
        if name not in primaries:
            print(f"SKIP {name}: no primary oracle (golden-exempt)")
            continue
        # fresh connection per query: override scripts create temp tables
        con = duckdb.connect()
        con.sql("SET TimeZone='UTC'")
        con.sql("SET preserve_insertion_order=true")
        for t in TABLES:
            path = f"{sf}/{t}.parquet"
            pat = f"{path}/*.parquet" if os.path.isdir(path) else path
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
        try:
            prim = con.sql(primaries[name])
            pcols, prows = [c.lower() for c in prim.columns], prim.fetchall()
            if ov.get("spark_where"):
                con.sql("CREATE TEMP TABLE prim_res AS "
                        + primaries[name])
                f = con.sql(f"SELECT * FROM prim_res WHERE {ov['spark_where']}")
                prows = f.fetchall()
            o = con.sql(ov["sql"])
            ocols, orows = [c.lower() for c in o.columns], o.fetchall()
        except Exception as e:
            print(f"ERR  {name}: {str(e)[:200]}")
            n_bad += 1
            continue
        if pcols != ocols:
            print(f"FAIL {name}: columns {pcols} vs {ocols}")
            n_bad += 1
            continue
        if len(prows) != len(orows):
            print(f"FAIL {name}: rows {len(prows)} vs {len(orows)}")
            n_bad += 1
            continue
        bad = None
        for i, (pr, orow) in enumerate(zip(prows, orows)):
            if not all(cells_eq(norm_cell(a), norm_cell(b))
                       for a, b in zip(pr, orow)):
                bad = (i, pr, orow)
                break
        if bad:
            print(f"FAIL {name}: row {bad[0]}: {bad[1]} vs {bad[2]}")
            n_bad += 1
        else:
            print(f"PASS {name}: {len(prows)} rows identical")
    print(f"{'ALL OVERRIDES EQUIVALENT' if n_bad == 0 else f'{n_bad} MISMATCHES'}")
    sys.exit(0 if n_bad == 0 else 1)


if __name__ == "__main__":
    main()
