"""IVF partitioned layout: write the corpus PARTITIONED BY cell id and
verify (a) the cell-pruned search reads ONLY the probed partitions —
the scan-level proof of the 100 TB design — and (b) its results equal
the flat-table IVF search exactly."""

from __future__ import annotations

import re

from conftest import SF_DIR_SMALL


def test_partitioned_search_prunes_and_matches(spark, tmp_path):
    from spark_sql_perf_spark.operators import QUERIES
    from spark_sql_perf_spark.pipeline.ivf import (
        ivf_partitioned_search,
        write_ivf_partitioned,
    )

    path = str(tmp_path / "ivf_corpus")
    write_ivf_partitioned(spark, SF_DIR_SMALL, path)

    flat = QUERIES["sim3_ivf_ann"](spark, SF_DIR_SMALL).toPandas()
    part_df = ivf_partitioned_search(spark, SF_DIR_SMALL, path)
    part = part_df.toPandas()

    key = ["query_id", "neighbor_id", "cosine", "rn"]
    assert (
        flat.sort_values(key).reset_index(drop=True).equals(
            part.sort_values(key).reset_index(drop=True)
        )
    ), "partitioned search diverged from the flat-table IVF search"

    # scan-level pruning: the files ACTUALLY read under the cid filter
    # (input_file_name is filter-aware; DataFrame.inputFiles is not)
    # all lie in probed cells' directories, a strict subset of the cells
    from pyspark.sql import functions as F

    from spark_sql_perf_spark.pipeline.ivf import (
        _N_QUERIES,
        _ranked_cells,
        _subset_cents,
        _vecs,
    )

    vecs = _vecs(spark, SF_DIR_SMALL)
    probed = {
        r["cid"]
        for r in _ranked_cells(
            vecs.where(F.col("vec_id") < _N_QUERIES), _subset_cents(vecs)
        )
        .where(F.col("rn") == 1)
        .select("cid")
        .distinct()
        .collect()
    }
    read_cells = {
        m.group(0)
        for r in (
            spark.read.parquet(path)
            .where(F.col("cid").isin(list(probed)))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .collect()
        )
        for m in [re.search(r"cid=\d+", r["f"])]
        if m
    }
    all_cells = {
        m.group(0)
        for f in spark.read.parquet(path).inputFiles()
        for m in [re.search(r"cid=\d+", f)]
        if m
    }
    assert read_cells, "no partition directories in the scanned files"
    assert read_cells == {f"cid={c}" for c in probed}
    assert read_cells < all_cells, (
        f"scan was not pruned: read {len(read_cells)} of {len(all_cells)} cells"
    )
    # nprobe=1 over 5 queries -> at most 5 distinct probed cells
    assert len(read_cells) <= _N_QUERIES, read_cells
    # and the physical plan carries the cells as partition filters
    plan = part_df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PartitionFilters: \[[^\]]*cid", plan), plan[:2000]
