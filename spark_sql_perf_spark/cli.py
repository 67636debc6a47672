"""CLI mirroring the reference's scopt flags (RunBenchmark.scala:29-85):

  -b/--benchmark   query-set name: any registered operator-corpus prefix
                   ('tpch', 'joins', 'all', ...) or comma list of query names
  -f/--filter      substring filter over query names
  -i/--iterations  iterations (default 3)
  -p/--shuffle-partitions
  -s/--sf-dir      testdata scale-factor directory
  -l/--location    results output location
  -t/--timeout     per-query timeout seconds
  --mode           collect | foreach | count | hash
  --variations     comma list of conf variations key=v1|v2,key2=...
  --ml-config      YAML ML-benchmark grid (yaml.scala semantics:
                   output / timeoutSeconds / common / benchmarks with
                   cartesian list expansion); runs the grid and exits

Example:
  python -m spark_sql_perf_spark.cli -b tpch -i 3 \
      --variations spark.sql.adaptive.enabled=true|false
"""

from __future__ import annotations

import argparse
import json
import sys

from .modes import COLLECT, COUNT, FOREACH, HASH
from .operators import QUERIES
from .query import Query, Variation
from .runner import ExperimentRunner
from .session import build_session

_MODES = {"collect": COLLECT, "foreach": FOREACH, "count": COUNT, "hash": HASH}


def select_queries(benchmark: str, name_filter: str | None, sf_dir: str, mode) -> list[Query]:
    if benchmark.startswith("suite:"):
        # generated-data benchmark suites (suite:joinperf / aggperf /
        # multijoin / tpcds) — resolved lazily against the live session
        return []  # resolved in main() where the session exists
    if benchmark == "all":
        names = sorted(QUERIES)
    elif "," in benchmark:
        names = [n.strip() for n in benchmark.split(",")]
    else:
        names = sorted(n for n in QUERIES if n.startswith(benchmark))
    if name_filter:
        names = [n for n in names if name_filter in n]
    missing = [n for n in names if n not in QUERIES]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")
    return [
        Query(name=n, build=(lambda s, _n=n: QUERIES[_n](s, sf_dir)), mode=mode)
        for n in names
    ]


def parse_variations(spec: str | None) -> list[Variation]:
    if not spec:
        return []
    out = []
    for part in spec.split(","):
        key, _, opts = part.partition("=")
        out.append(Variation.conf(key.strip(), opts.split("|")))
    return out


def run_ml_config_file(spark, path: str, location: str | None = None) -> list:
    """--ml-config: run a YAML ML-benchmark grid (the reference's
    ``bin/run --compile`` + yaml config path, yaml.scala:29-75) — each
    benchmark's common++params grid expanded cartesian and executed
    against the standard battery; results land as JSON lines under the
    config's ``output`` dir (or ``location`` if given)."""
    import dataclasses
    import os

    from .ml.benchmarks import load_ml_config, run_ml_config

    with open(path) as f:
        cfg = load_ml_config(f.read())
    results = run_ml_config(spark, cfg["runs"])
    out_dir = location or cfg["output"]
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "ml_results.json")
    with open(out_path, "w") as f:
        for r in results:
            f.write(json.dumps(dataclasses.asdict(r)) + "\n")
    print(f"{len(results)} ML runs -> {out_path}", file=sys.stderr)
    return results


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-b", "--benchmark", default="all")
    ap.add_argument("-f", "--filter", default=None)
    ap.add_argument("-i", "--iterations", type=int, default=3)
    ap.add_argument("-p", "--shuffle-partitions", default=None)
    ap.add_argument("-s", "--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("-l", "--location", default="results")
    ap.add_argument("-t", "--timeout", type=float, default=600.0)
    ap.add_argument("--mode", choices=sorted(_MODES), default="foreach")
    ap.add_argument("--variations", default=None)
    ap.add_argument(
        "--profile", action="store_true",
        help="sample executor-thread stacks during each query "
             "(collapsed-stack lines in the results JSON)",
    )
    ap.add_argument(
        "--ml-config", default=None,
        help="YAML ML-benchmark grid (common/benchmarks/output/"
             "timeoutSeconds, yaml.scala semantics); runs the grid and"
             " exits",
    )
    args = ap.parse_args(argv)

    extra = {}
    if args.shuffle_partitions:
        extra["spark.sql.shuffle.partitions"] = args.shuffle_partitions
    spark = build_session("spark-sql-perf-spark-cli", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")

    if args.ml_config:
        run_ml_config_file(spark, args.ml_config)
        spark.stop()
        return

    if args.benchmark.startswith("suite:"):
        from .suites import SUITES

        suite_name = args.benchmark.removeprefix("suite:")
        queries = SUITES[suite_name](spark)
        if args.filter:
            queries = [q for q in queries if args.filter in q.name]
        for q in queries:
            q.mode = _MODES[args.mode]
    else:
        queries = select_queries(args.benchmark, args.filter, args.sf_dir, _MODES[args.mode])
    runner = ExperimentRunner(spark, results_location=args.location, timeout_s=args.timeout)
    runs = runner.run_experiment(queries, iterations=args.iterations,
                                 variations=parse_variations(args.variations),
                                 include_profile=args.profile)

    from .analyze import load_results, summarize

    summary = summarize(load_results(spark, args.location))
    for row in summary.collect():
        print(json.dumps(row.asDict()), file=sys.stderr)
    print(f"{len(runs)} experiment runs -> {args.location}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
