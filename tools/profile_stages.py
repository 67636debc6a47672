#!/usr/bin/env python
"""Per-stage profile of the headline queries (guide §1: measure first).

For each headline query: warm it (min-of-N discipline's steady state),
then run it once more and attribute that run's stages via the REST API
(UI enabled on an ephemeral port). Emits, per query, each stage's task
count, executor run time, input/shuffle bytes — the evidence needed to
decide whether time goes to a serial scan stage, shuffle, or compute.

Usage: python tools/profile_stages.py [query ...]   (default: HEADLINE)
Output: tools/profile_r13.json + a readable table on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, WARM_IN, consume  # noqa: E402
from spark_sql_perf_spark.operators import QUERIES  # noqa: E402
from spark_sql_perf_spark.session import build_session  # noqa: E402


def rest(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1:] or HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(
        app_name="stage-profile",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[1])
    app_id = spark.sparkContext.applicationId

    consume(QUERIES["flagship_star_agg"](spark, sf_dir))  # session warmup

    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        for _ in range(WARM_IN.get(name, 0)):
            consume(fn(spark, sf_dir))
        consume(fn(spark, sf_dir))  # warm run (bench min-of-5 analog)
        before = {s["stageId"] for s in rest(port, f"applications/{app_id}/stages")}
        spark.sparkContext.setJobGroup(name, name)
        t0 = time.perf_counter()
        consume(fn(spark, sf_dir))
        wall = round(time.perf_counter() - t0, 3)
        spark.sparkContext.setJobGroup(None, None)
        stages = [
            s
            for s in rest(port, f"applications/{app_id}/stages")
            if s["stageId"] not in before and s["status"] == "COMPLETE"
        ]
        rows = []
        for s in sorted(stages, key=lambda s: -s["executorRunTime"]):
            rows.append(
                {
                    "stage": s["stageId"],
                    "tasks": s["numCompleteTasks"],
                    "exec_ms": s["executorRunTime"],
                    "cpu_ms": s.get("executorCpuTime", 0) // 1_000_000,
                    "input_mb": round(s["inputBytes"] / 1e6, 1),
                    "sh_read_mb": round(s["shuffleReadBytes"] / 1e6, 1),
                    "sh_write_mb": round(s["shuffleWriteBytes"] / 1e6, 1),
                    "name": s["name"].split("\n")[0][:60],
                }
            )
        out[name] = {"wall_sec": wall, "n_stages": len(stages), "stages": rows}
        top = rows[:4]
        print(f"\n{name}: wall {wall}s, {len(stages)} stages")
        for r in top:
            print(
                f"  stage {r['stage']:>5} tasks={r['tasks']:>3} exec={r['exec_ms']:>6}ms"
                f" cpu={r['cpu_ms']:>6}ms in={r['input_mb']:>7} shr={r['sh_read_mb']:>7}"
                f" shw={r['sh_write_mb']:>7}  {r['name']}"
            )
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "profile_r13.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\nwrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
