#!/usr/bin/env python
"""Oracle-check a SUBSET of registered queries at one or more SFs —
the verify skill's recipe scoped to the queries named on the command
line (fast feedback while restructuring; the full 167-query simulation
still gates the round).

Usage: python tools/oracle_subset.py [--sf sf0.001,sf0.01] name [name..]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def main() -> None:
    args = sys.argv[1:]
    sfs = ["sf0.001", "sf0.01"]
    if args and args[0] == "--sf":
        sfs = args[1].split(",")
        args = args[2:]
    names = args
    import duckdb

    import __spark_entry__ as e
    from oracle_check import compare_frames
    from spark_sql_perf_spark.session import build_session

    spark = build_session(app_name="oracle-subset")
    spark.sparkContext.setLogLevel("ERROR")
    qs, os_ = e.queries(), e.oracle_sql()
    fails = []
    for sf in sfs:
        sf_dir = f"/root/testdata/{sf}"
        con = duckdb.connect()
        for t in [
            "region", "nation", "customer", "supplier", "part", "orders",
            "lineitem", "events", "documents", "embeddings",
        ]:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM"
                f" read_parquet('{sf_dir}/{t}.parquet')"
            )
        for name in names:
            try:
                spdf = qs[name](spark, sf_dir).toPandas()
                if name in os_:
                    compare_frames(spdf, con.execute(os_[name]).df(), name)
                    print(f"  {sf} {name}: MATCH ({len(spdf)} rows)", flush=True)
                else:
                    print(f"  {sf} {name}: no_oracle ({len(spdf)} rows)", flush=True)
            except Exception as ex:
                fails.append((sf, name))
                print(f"  {sf} {name}: FAIL {str(ex)[:300]}", flush=True)
        con.close()
    if fails:
        print("FAILS:", fails)
        sys.exit(1)
    print("ALL MATCH")


if __name__ == "__main__":
    main()
