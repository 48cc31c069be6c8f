#!/usr/bin/env python3
"""Simulate the driver harness's pandas-based load+sort step.

Round 1 lesson (CORRECTNESS_r01.json): the driver loads each query's
parquet dump into pandas and sorts by ALL columns; any raw array/map/
binary column raises TypeError (unhashable numpy.ndarray) and the query
gets `err` instead of a green row — even `no_oracle` queries are loaded.
This script applies that exact step to every dump under <verifyOutDir>
so the failure mode is caught locally before the round gate runs.

Usage: python3 tools/driver_sim.py <verifyOutDir>
"""
import glob, os, sys

import pandas as pd

def main():
    if len(sys.argv) != 2 or not os.path.isdir(sys.argv[1]):
        print("Usage: python3 tools/driver_sim.py <verifyOutDir>")
        sys.exit(2)
    out = sys.argv[1]
    bad = 0
    # query dumps are directories (<name>.parquet/part-*.parquet), but
    # accept bare top-level parquet files too so none are skipped
    dirs = sorted(d for d in glob.glob(f"{out}/*")
                  if os.path.isdir(d) or d.endswith(".parquet"))
    for d in dirs:
        name = os.path.basename(d)
        try:
            df = pd.read_parquet(d)
            df.sort_values(list(df.columns))
            print(f"OK   {name} rows={len(df)}")
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            bad += 1
    print(f"{len(dirs) - bad}/{len(dirs)} sortable")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main()
