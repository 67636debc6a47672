#!/usr/bin/env python
"""minibench with session-conf overrides from $CONF_OVERRIDES
(k=v,k=v) — for A/B-ing cluster-static confs in fresh processes.
Usage: CONF_OVERRIDES="spark.x=y" python tools/confbench.py q1 ...
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
    overrides = dict(
        kv.split("=", 1)
        for kv in os.environ.get("CONF_OVERRIDES", "").split(",")
        if "=" in kv
    )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="confbench", extra_conf=overrides)
    spark.sparkContext.setLogLevel("ERROR")
    # tune_session (called by table()) force-sets shuffle.partitions; keep
    # any override in force for the experiment
    from spark_sql_perf_spark import catalog

    catalog.tune_session(spark)
    for k, v in overrides.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # cluster-static conf, already applied via builder
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
        out[name] = min(ts)
        print(name, "min", min(ts), ts, flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
