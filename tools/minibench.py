#!/usr/bin/env python
"""Fresh-process mini-bench: bench.py's exact protocol (flagship warmup,
then min-of-5 noop-sink samples per query) over just the queries named on
the command line. For A/B-ing one query's change without a full bench run.

Usage: python tools/minibench.py q1_pricing_summary d10_incremental_lsh_probe
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import WARM_IN, consume  # noqa: E402
from spark_sql_perf_spark.operators import QUERIES  # noqa: E402
from spark_sql_perf_spark.session import build_session  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="minibench")
    spark.sparkContext.setLogLevel("ERROR")
    consume(QUERIES["flagship_star_agg"](spark, sf_dir))
    out = {}
    for name in names:
        fn = QUERIES[name]
        for _ in range(WARM_IN.get(name, 0)):
            consume(fn(spark, sf_dir))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            consume(fn(spark, sf_dir))
            ts.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(ts), "samples": ts}
        print(name, "min", min(ts), ts, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
