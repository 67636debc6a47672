"""Streaming incremental near-dup probe (the streaming face of d10):
the at-rest index is built once, each arriving micro-batch is probed
through the same pipeline as the batch query, and the merged target
must (a) converge to EXACTLY the batch d10 answer and (b) be
replay-idempotent — the same file is delivered twice as two
micro-batches and the second pass must not change the table."""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_TINY


def test_streaming_probe_matches_batch_and_survives_replay(spark):
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.operators import QUERIES
    from spark_sql_perf_spark.streaming.dedup import (
        build_probe_index,
        streaming_incremental_probe,
    )

    work = tempfile.mkdtemp(prefix="probe-stream-")
    index_dir = os.path.join(work, "index")
    stream_dir = os.path.join(work, "arrivals")
    target_dir = os.path.join(work, "decisions")
    os.makedirs(stream_dir)

    # the arriving batch = d10's planted batch, as a documents-shaped
    # file (full table schema so the stream source reads it verbatim)
    docs = table(spark, SF_DIR_TINY, "documents")
    near = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(F.lower("text"), F.lit(" probe batch suffix")).alias("text"),
        "lang", "source", "n_chars",
    )
    novel = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.array_join(F.reverse(F.split(F.lower("text"), r"\s+")), " ").alias(
            "text"
        ),
        "lang", "source", "n_chars",
    )
    batch_file = os.path.join(work, "batch.parquet")
    near.unionAll(novel).coalesce(1).write.parquet(batch_file)
    part = [f for f in os.listdir(batch_file) if f.endswith(".parquet")][0]
    # two staged copies of the SAME batch -> with maxFilesPerTrigger=1
    # the second micro-batch is a full replay of the first
    for copy in ("arrival-0.parquet", "arrival-1.parquet"):
        os.symlink(
            os.path.join(batch_file, part), os.path.join(stream_dir, copy)
        )

    build_probe_index(spark, SF_DIR_TINY, index_dir)
    q = streaming_incremental_probe(
        spark, SF_DIR_TINY, stream_dir, index_dir, target_dir,
        max_files_per_trigger=1,
    )
    q.awaitTermination(180)

    cols = ["batch_id", "n_cand", "n_match", "match_id_min",
            "best_jaccard", "is_novel"]
    got = {
        r["batch_id"]: tuple(r[c] for c in cols[1:])
        for r in spark.read.parquet(target_dir).select(*cols).collect()
    }
    want = {
        r["batch_id"]: tuple(r[c] for c in cols[1:])
        for r in QUERIES["d10_incremental_lsh_probe"](
            spark, SF_DIR_TINY
        ).collect()
    }
    # replay collapsed: one decision per batch doc, equal to batch d10
    assert got == want
    assert any(v[-1] for v in got.values())  # novels present
    assert any(not v[-1] for v in got.values())  # matches present


def test_streaming_probe_grow_index_loop(spark):
    """The full continuous-ingestion loop (grow_index=True): batch A's
    accepted novels join the at-rest index, so batch B's near-dups OF
    THOSE NOVELS match them (not just the original corpus); a
    redelivery of batch A then changes neither the decisions table nor
    the index (self-exclusion + first-decision-wins + guarded append)."""
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.streaming.dedup import (
        build_probe_index,
        streaming_incremental_probe,
    )

    work = tempfile.mkdtemp(prefix="probe-grow-")
    index_dir = os.path.join(work, "index")
    stream_dir = os.path.join(work, "arrivals")
    target_dir = os.path.join(work, "decisions")
    os.makedirs(stream_dir)
    build_probe_index(spark, SF_DIR_TINY, index_dir)

    docs = table(spark, SF_DIR_TINY, "documents")
    meta = ["lang", "source", "n_chars"]
    # batch A: word-reversed docs — novel vs the corpus, will be indexed
    batch_a = docs.where(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.array_join(F.reverse(F.split(F.lower("text"), r"\s+")), " ").alias(
            "text"
        ),
        *meta,
    )
    # batch B: near-dups OF BATCH A's novels (suffix on the reversed text)
    batch_b = batch_a.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat("text", F.lit(" probe batch suffix")).alias("text"),
        *meta,
    )

    def deliver(df, name):
        path = os.path.join(work, f"{name}.parquet")
        df.coalesce(1).write.parquet(path)
        part = [f for f in os.listdir(path) if f.endswith(".parquet")][0]
        os.symlink(os.path.join(path, part),
                   os.path.join(stream_dir, f"{name}.parquet"))

    def drain(**kw):
        q = streaming_incremental_probe(
            spark, SF_DIR_TINY, stream_dir, index_dir, target_dir,
            max_files_per_trigger=1, grow_index=True, **kw,
        )
        q.awaitTermination(180)

    def decisions():
        return {
            r["batch_id"]: (r["n_match"], r["match_id_min"], r["is_novel"])
            for r in spark.read.parquet(target_dir).collect()
        }

    # r12 ADVICE: an EMPTY first arrival (zero-row file) must be a
    # no-op, not a wedge — the pre-fix merge wrote no bucket partitions
    # and every subsequent batch then died reading the empty target
    deliver(batch_a.limit(0), "arrival-00-empty")
    deliver(batch_a, "arrival-0")
    drain()
    after_a = decisions()
    assert after_a and all(v[2] for v in after_a.values()), after_a  # all novel
    n_a = len(after_a)

    deliver(batch_b, "arrival-1")
    drain()
    after_b = decisions()
    b_rows = {k: v for k, v in after_b.items() if k >= 3_000_000}
    assert len(b_rows) == n_a
    # every B doc matches, and its best match is its OWN batch-A source
    # (id - 1e6) — proof the index grew between batches
    for bid, (n_match, match_id, is_novel) in b_rows.items():
        assert n_match >= 1 and not is_novel, (bid, n_match, is_novel)
        assert match_id == bid - 1_000_000, (bid, match_id)
    # A's stored decisions unchanged
    assert {k: v for k, v in after_b.items() if k < 3_000_000} == after_a

    # redelivery of batch A (same content, new file): nothing changes —
    # and this drain runs the in-loop compaction path (compact_every,
    # folding the grown deltas into the base), which must also change
    # nothing
    from spark_sql_perf_spark.streaming.dedup import read_index_relation

    sigs_before = read_index_relation(spark, index_dir, "sigs").count()
    deliver(batch_a, "arrival-2")
    drain(compact_every=1, compact_max_files=0)
    assert decisions() == after_b
    assert read_index_relation(spark, index_dir, "sigs").count() == sigs_before
    per_id = (
        read_index_relation(spark, index_dir, "sigs")
        .groupBy("id").count().where(F.col("count") > 1).count()
    )
    assert per_id == 0  # no id indexed twice


def test_streaming_quality_cut_matches_batch_semantics(spark):
    """The streaming face of c16: over a twice-delivered file of
    documents with planted repetitive docs and verbatim copies, the
    drained stream must contain exactly one row per distinct SURVIVING
    text — repetitive docs cut (never entering dedup state), copies and
    re-deliveries collapsed — i.e. the same kept-set as the batch cut."""
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.pipeline.curation import (
        _WS_SPLIT,
        repetition_cut_flag,
    )
    from spark_sql_perf_spark.streaming.dedup import (
        run_stream_append,
        streaming_quality_cut,
    )

    work = tempfile.mkdtemp(prefix="qcut-stream-")
    stream_dir = os.path.join(work, "arrivals")
    os.makedirs(stream_dir)

    docs = table(spark, SF_DIR_TINY, "documents")
    meta = ["lang", "source", "n_chars"]
    base = docs.select("doc_id", F.lower("text").alias("text"), *meta)
    rep = base.where(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.trim(
            F.repeat(
                F.concat(
                    F.array_join(F.slice(F.split("text", _WS_SPLIT), 1, 3), " "),
                    F.lit(" "),
                ),
                8,
            )
        ).alias("text"),
        *meta,
    )
    copies = base.where(F.col("doc_id") % 20 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"), "text", *meta
    )
    corpus = base.unionAll(rep).unionAll(copies)
    staged = os.path.join(work, "corpus.parquet")
    corpus.coalesce(1).write.parquet(staged)
    part = [f for f in os.listdir(staged) if f.endswith(".parquet")][0]
    for copy in ("arrival-0.parquet", "arrival-1.parquet"):  # re-delivery
        os.symlink(os.path.join(staged, part), os.path.join(stream_dir, copy))

    out = streaming_quality_cut(spark, SF_DIR_TINY, stream_dir)
    assert out.isStreaming
    # plan gate: the cut Filter must sit BELOW the stateful dedup
    # operator (cut docs never enter state — the bounded-state claim).
    # analyzed(), not optimizedPlan(): a streaming frame cannot be
    # optimized before writeStream.start, and operator ORDER is a
    # construction property visible at analysis
    plan = out._jdf.queryExecution().analyzed().toString()
    dedup_at = plan.find("DeduplicateWithinWatermark")
    filter_at = plan.find("Filter")
    assert dedup_at != -1 and filter_at != -1, plan
    assert filter_at > dedup_at, plan  # children print below parents
    run_stream_append(out, "qcut_out")
    got = spark.table("qcut_out")

    expected_md5 = {
        r["m"]
        for r in corpus.withColumn("ws", F.split("text", _WS_SPLIT))
        .where(~repetition_cut_flag())
        .select(F.md5("text").alias("m"))
        .distinct()
        .collect()
    }
    got_md5 = [r["content_key"] for r in got.select("content_key").collect()]
    assert len(got_md5) == len(expected_md5)  # exactly-once per text
    assert set(got_md5) == expected_md5
    # the planted repetitive docs were cut BEFORE the stateful operator
    assert got.where(F.col("doc_id") >= 1_000_000).where(
        F.col("doc_id") < 2_000_000
    ).count() == 0


import pytest


@pytest.mark.parametrize(
    "pre_appended",
    [("hashed",), ("sigs",), ("bands",), ("hashed", "sigs"),
     ("hashed", "bands"), ("sigs", "bands")],
    ids=lambda p: "+".join(p),
)
def test_grow_index_append_converges_after_partial_crash(spark, pre_appended):
    """The r11 ADVICE failure mode, driven directly for EVERY partial
    crash state: a crash can leave any proper subset of the three
    relation appends durable. The per-relation guards must converge on
    replay from each one — NO duplicate (id, h) rows in hashed (the
    n_common/jaccard inflation bug), the missing relations caught up
    exactly once — and a subsequent probe must match a near-dup of the
    novel."""
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.pipeline.dedup import (
        _minhash_frames,
        probe_with_index,
    )
    from spark_sql_perf_spark.streaming.dedup import (
        build_probe_index,
        grow_index_append,
    )

    work = tempfile.mkdtemp(prefix="probe-crash-")
    index_dir = os.path.join(work, "index")
    build_probe_index(spark, SF_DIR_TINY, index_dir)

    docs = table(spark, SF_DIR_TINY, "documents")
    novels = docs.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 4_000_000).alias("id"),
        F.array_join(F.reverse(F.split(F.lower("text"), r"\s+")), " ").alias(
            "text"
        ),
    )
    n_novels = novels.count()
    assert n_novels > 0

    # simulated crash: the pre_appended relations landed, the rest did
    # not — written exactly as grow_index_append writes (one flat file
    # into the relation's __delta sidecar)
    from spark_sql_perf_spark.streaming.dedup import read_index_relation

    frames = dict(zip(("hashed", "sigs", "bands"), _minhash_frames(novels)))
    for rel in pre_appended:
        (
            frames[rel]
            .coalesce(1)
            .write.mode("append")
            .parquet(f"{index_dir}/{rel}__delta")
        )

    # replay: the full guarded append
    grow_index_append(spark, index_dir, novels)

    hashed = read_index_relation(spark, index_dir, "hashed")
    dup_pairs = (
        hashed.groupBy("id", "h").count().where(F.col("count") > 1).count()
    )
    assert dup_pairs == 0  # the pre-fix code would double-append here
    for rel in ("sigs", "bands"):
        per_id = (
            read_index_relation(spark, index_dir, rel)
            .where(F.col("id") >= 4_000_000)
            .groupBy("id", *(["band"] if rel == "bands" else []))
            .count()
            .where(F.col("count") > 1)
            .count()
        )
        assert per_id == 0, rel
    assert (
        read_index_relation(spark, index_dir, "sigs")
        .where(F.col("id") >= 4_000_000)
        .count()
        == n_novels
    )

    # a second replay of the SAME append is a complete no-op
    before = {
        rel: read_index_relation(spark, index_dir, rel).count()
        for rel in ("hashed", "sigs", "bands")
    }
    grow_index_append(spark, index_dir, novels)
    for rel, n in before.items():
        assert read_index_relation(spark, index_dir, rel).count() == n, rel

    # the grown index actually serves: a near-dup of a novel matches it
    probe = novels.select(
        (F.col("id") + 1_000_000).alias("id"),
        F.concat("text", F.lit(" probe batch suffix")).alias("text"),
    )
    got = probe_with_index(
        read_index_relation(spark, index_dir, "hashed"),
        read_index_relation(spark, index_dir, "sigs"),
        read_index_relation(spark, index_dir, "bands").select(
            "id", "band", "bh"
        ),
        probe,
    )
    rows = {r["batch_id"]: r["match_id_min"] for r in got.collect()}
    assert rows and all(m == b - 1_000_000 for b, m in rows.items())


def test_grow_index_append_repairs_partial_band_coverage(spark):
    """r12 ADVICE: an id left with PARTIAL band coverage (a crash on a
    non-rename-atomic object store, or a legacy layout) must be
    REPAIRED by replay, not skipped — the (id, band)-granular bands
    guard anti-joins the new band rows against the live ones, so only
    the missing bands append and none duplicate."""
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.pipeline.dedup import _minhash_frames
    from spark_sql_perf_spark.streaming.dedup import (
        build_probe_index,
        grow_index_append,
        read_index_relation,
    )

    work = tempfile.mkdtemp(prefix="probe-bands-")
    index_dir = os.path.join(work, "index")
    build_probe_index(spark, SF_DIR_TINY, index_dir)

    docs = table(spark, SF_DIR_TINY, "documents")
    novels = docs.where(F.col("doc_id") % 19 == 0).select(
        (F.col("doc_id") + 6_000_000).alias("id"),
        F.array_join(F.reverse(F.split(F.lower("text"), r"\s+")), " ").alias(
            "text"
        ),
    )
    n_novels = novels.count()
    assert n_novels > 0
    _, _, bands = _minhash_frames(novels)
    n_bands_full = bands.count()
    half_bands = bands.where(F.col("band") < 2)  # 2 of the 3 bands
    assert 0 < half_bands.count() < n_bands_full

    # simulated partial state: only bands 0-1 landed for every novel id
    (
        half_bands
        .coalesce(1)
        .write.mode("append")
        .parquet(f"{index_dir}/bands__delta")
    )
    grow_index_append(spark, index_dir, novels)

    live = read_index_relation(spark, index_dir, "bands").where(
        F.col("id") >= 6_000_000
    )
    assert live.count() == n_bands_full  # coverage repaired...
    dup_pairs = (
        live.groupBy("id", "band").count().where(F.col("count") > 1).count()
    )
    assert dup_pairs == 0  # ...without duplicating the bands that landed


def test_probe_at_rest_prunes_index_partitions(spark):
    """r12 VERDICT task 2: the at-rest probe must partition-prune the
    hashed/sigs verification scans to the candidate ids' id_part
    directories — identical decisions to the unpruned probe, with a
    file-level receipt that only the candidate partitions were read."""
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.pipeline.dedup import probe_with_index
    from spark_sql_perf_spark.streaming.dedup import (
        _ID_PART,
        _id_part,
        build_probe_index,
        index_file_counts,
        probe_index_at_rest,
    )

    work = tempfile.mkdtemp(prefix="probe-prune-")
    index_dir = os.path.join(work, "index")
    build_probe_index(spark, SF_DIR_TINY, index_dir)

    # a trickle batch: few docs -> few candidate ids -> few id_parts
    docs = table(spark, SF_DIR_TINY, "documents")
    batch = docs.where(F.col("doc_id") % 83 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("id"),
        F.concat(F.lower("text"), F.lit(" probe batch suffix")).alias("text"),
    )
    out, cand = probe_index_at_rest(spark, index_dir, batch)

    cols = ["batch_id", "n_cand", "n_match", "match_id_min", "best_jaccard",
            "is_novel"]
    got = {r["batch_id"]: tuple(r[c] for c in cols[1:])
           for r in out.select(*cols).collect()}
    want = {
        r["batch_id"]: tuple(r[c] for c in cols[1:])
        for r in probe_with_index(
            spark.read.parquet(f"{index_dir}/hashed"),
            spark.read.parquet(f"{index_dir}/sigs"),
            spark.read.parquet(f"{index_dir}/bands").select("id", "band", "bh"),
            batch,
        ).select(*cols).collect()
    }
    assert got == want  # pruning never changes decisions
    assert any(not v[-1] for v in got.values())  # the near-dups matched

    # receipt: the pruned scans read only the candidate partitions
    parts = [
        r[0]
        for r in cand.select(_id_part("idx_id").alias("p")).distinct().collect()
    ]
    assert 0 < len(parts) < 64
    totals = index_file_counts(spark, index_dir)
    for rel in ("hashed", "sigs"):
        read_files = (
            spark.read.parquet(f"{index_dir}/{rel}")
            .where(F.col(_ID_PART).isin(parts))
            .select(F.input_file_name().alias("f"))
            .distinct()
            .count()
        )
        assert read_files <= len(parts) < totals[rel], (
            rel, read_files, totals[rel]
        )
    # and the probe PLAN carries the partition filter (not a post-scan
    # predicate): the scan nodes prune at the source
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("PartitionFilters: [id_part") >= 2, plan


def test_compact_index_preserves_probe_and_cuts_files(spark):
    """compact_index is the grow-index small-files story: after many
    appended batches (one flat delta file per relation per batch), a
    forced compaction must (a) fold every delta into its base and
    reduce the file count to the size-derived target, (b) leave probe
    results byte-identical, and (c) self-heal a crashed swap on the
    next call — both the base swap (live missing, __old present) and
    the delta stage-aside (delta renamed aside, publish not reached)."""
    from spark_sql_perf_spark.catalog import table
    from spark_sql_perf_spark.pipeline.dedup import probe_with_index
    from spark_sql_perf_spark.streaming.dedup import (
        build_probe_index,
        compact_index,
        grow_index_append,
        index_file_counts,
        read_index_relation,
        recover_index,
    )

    work = tempfile.mkdtemp(prefix="probe-compact-")
    index_dir = os.path.join(work, "index")
    build_probe_index(spark, SF_DIR_TINY, index_dir)

    docs = table(spark, SF_DIR_TINY, "documents")
    # several grow batches -> one appended delta file per batch per relation
    for k in range(4):
        novels = docs.where(F.col("doc_id") % 17 == k).select(
            (F.col("doc_id") + (5 + k) * 1_000_000).alias("id"),
            F.concat(F.lower("text"), F.lit(f" grown batch {k}")).alias("text"),
        )
        grow_index_append(spark, index_dir, novels)
    assert os.path.isdir(f"{index_dir}/sigs__delta")

    def read_index():
        return (
            read_index_relation(spark, index_dir, "hashed"),
            read_index_relation(spark, index_dir, "sigs"),
            read_index_relation(spark, index_dir, "bands").select(
                "id", "band", "bh"
            ),
        )

    probe = docs.where(F.col("doc_id") % 17 == 1).select(
        (F.col("doc_id") + 9_000_000).alias("id"),
        F.concat(
            F.lower("text"), F.lit(" grown batch 1 probe suffix")
        ).alias("text"),
    )
    cols = ["batch_id", "n_cand", "n_match", "match_id_min", "best_jaccard",
            "is_novel"]
    before_files = index_file_counts(spark, index_dir)
    want = {
        r["batch_id"]: tuple(r[c] for c in cols[1:])
        for r in probe_with_index(*read_index(), probe).collect()
    }
    assert any(v[1] >= 1 for v in want.values())  # matches grown docs

    compacted = compact_index(spark, index_dir, max_files=0)  # force all
    after_files = index_file_counts(spark, index_dir)
    assert set(compacted) == {"hashed", "sigs", "bands"}
    for rel in ("hashed", "sigs"):
        assert after_files[rel] < before_files[rel], (rel, after_files)
        assert not os.path.exists(f"{index_dir}/{rel}__delta")  # folded
    assert after_files["bands"] <= before_files["bands"]

    got = {
        r["batch_id"]: tuple(r[c] for c in cols[1:])
        for r in probe_with_index(*read_index(), probe).collect()
    }
    assert got == want  # probe results unchanged by compaction

    # crashed-swap recovery: live relation gone, __old holds the copy
    import shutil

    shutil.move(f"{index_dir}/sigs", f"{index_dir}/sigs__old")
    compact_index(spark, index_dir, max_files=10**9)  # recovery-only pass
    assert os.path.isdir(f"{index_dir}/sigs")
    assert not os.path.exists(f"{index_dir}/sigs__old")
    got2 = {
        r["batch_id"]: tuple(r[c] for c in cols[1:])
        for r in probe_with_index(*read_index(), probe).collect()
    }
    assert got2 == want

    # delta stage-aside recovery (crash between the delta rename and the
    # base publish: delta__old present, tmp complete, base unchanged) —
    # recover_index must roll the delta BACK, not lose or double it
    novels5 = docs.where(F.col("doc_id") % 17 == 5).select(
        (F.col("doc_id") + 11_000_000).alias("id"),
        F.concat(F.lower("text"), F.lit(" grown batch 5")).alias("text"),
    )
    grow_index_append(spark, index_dir, novels5)
    want_sigs = read_index_relation(spark, index_dir, "sigs").count()
    shutil.move(f"{index_dir}/sigs__delta", f"{index_dir}/sigs__delta__old")
    shutil.copytree(f"{index_dir}/sigs", f"{index_dir}/sigs__compact_tmp")
    recover_index(spark, index_dir)
    assert os.path.isdir(f"{index_dir}/sigs__delta")
    assert not os.path.exists(f"{index_dir}/sigs__delta__old")
    assert not os.path.exists(f"{index_dir}/sigs__compact_tmp")
    assert read_index_relation(spark, index_dir, "sigs").count() == want_sigs
