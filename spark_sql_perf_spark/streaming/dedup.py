"""Streaming exact deduplication — the streaming face of the d1 dedup
family, for a training-data pipeline that ingests documents/events
continuously instead of in batch.

``dropDuplicatesWithinWatermark`` is the idiomatic Structured Streaming
operator here: state for a key is retained only for the watermark delay
(bounded state — the property that lets this run forever at 100 TB/day),
and any duplicate arriving within that window is suppressed. The key is
a content hash of the full row identity, which turns an at-least-once
upstream (re-delivered files, replayed batches — the normal failure
mode of large ingest) into exactly-once rows downstream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.registry import query
from .sink import _BUCKET, _with_bucket, merge_into_buckets
from .windows import stream_events

# bucket count shared by the decision merge and the bucket-pruned
# stored-novel read in the grow loop — they must agree or the pruned
# read silently misses buckets
_N_DECISION_BUCKETS = 16


def content_key(df: DataFrame) -> DataFrame:
    """Attach the row-identity hash over every payload column including
    the timestamp, so a re-delivered row collapses no matter which
    file/batch carried it. ``xxhash64`` hashes each column with its type
    and null-ness intact — unlike a ``concat_ws`` string (which silently
    drops NULL fields and lets a delimiter inside a value alias two
    different rows), distinct rows cannot collide by construction here
    short of an actual 64-bit hash collision."""
    return df.withColumn(
        "content_key",
        F.xxhash64(
            F.col("event_id"), F.col("ts"), F.col("user_id"),
            F.col("event_type"), F.col("value"), F.col("props"),
        ),
    )


def streaming_dedup(
    spark: SparkSession, sf_dir: str, stream_dir: str, delay: str = "2 hours"
) -> DataFrame:
    """events as a stream, deduplicated on content identity within a
    watermark: state per key lives for ``delay`` of event time, then is
    dropped — bounded state, append output."""
    ev = stream_events(spark, sf_dir, stream_dir).withWatermark("ts", delay)
    return content_key(ev).dropDuplicatesWithinWatermark(["content_key"])


def run_stream_append(df: DataFrame, table_name: str, timeout: int = 120) -> None:
    """Drain an append-mode streaming DataFrame into a memory sink
    (dedup/map-like operators are append; aggregations use
    ``run_stream_once``'s complete mode). Raises on timeout instead of
    returning over a PARTIALLY-filled memory table — a silent partial
    drain reads as a baffling result mismatch downstream (e6's oracle
    comparison) rather than the timeout it actually was."""
    q = (
        df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError(
            f"run_stream_append: availableNow drain exceeded {timeout}s — "
            f"stopped the query instead of returning a partial {table_name}"
        )


# ---------------------------------------------------------------------------
# streaming incremental NEAR-dup probe (the streaming face of d10)
# ---------------------------------------------------------------------------


def stream_documents(
    spark: SparkSession,
    sf_dir: str,
    stream_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """``documents``-shaped rows as a true stream (file source watching
    ``stream_dir``) — schema taken from a batch read of the real table,
    like stream_events."""
    raw = spark.read.parquet(f"{sf_dir}/documents.parquet")
    reader = spark.readStream.schema(raw.schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(stream_dir)


# Bounded id-derived partition key for the at-rest index relations
# (r12 VERDICT task 2 — the one 100 TB residual: hashed/sigs took a
# full column-pruned scan every micro-batch; only bands had a pruning
# layout, and band partitioning bought nothing because a batch's
# signatures hit every band). All three relations now lay out
# partitioned by ``id_part = xxhash64(id) % _N_ID_PARTS`` — the same
# bounded-key pattern as ann_serve_at_rest's sig-derived layout: a
# probe/guard collects the DISTINCT parts its candidate/novel ids hash
# into (a driver-side list capped at _N_ID_PARTS values, never O(ids))
# and reads only those directories via an isin partition filter. In the
# trickle regime — where the fixed O(index) per-batch I/O is the tax —
# candidate ids are few and the scan shrinks to |candidate parts| /
# _N_ID_PARTS of the index; at large batches the parts saturate and the
# scan amortizes over the candidates, which is the regime where a full
# scan was already fine.
#
# Appends do NOT write into the partitioned base (a saturating batch
# would publish one file per touched directory — measured at 192
# files/append vs the flat layout's 3, a 38x listing-tax multiplier):
# each relation's accepted novels land as ONE flat file per micro-batch
# in a ``<rel>__delta`` sidecar — the LSM/base+delta shape every table
# format uses — so the append commits as a single rename, with each
# id's rows (all bands included) in that one file: fully appended or
# absent, the guard premise, structural. Probes and guards read pruned
# base UNION delta; the delta stays small because compact_index folds
# it into the partitioned base on the threshold cadence via a
# crash-safe two-directory swap (recover_index).
_N_ID_PARTS = 64
_ID_PART = "id_part"


def _delta_dir(index_dir: str, rel: str) -> str:
    return f"{index_dir}/{rel}__delta"


def _id_part(col: str):
    return F.pmod(F.xxhash64(F.col(col)), F.lit(_N_ID_PARTS))


def _with_id_part(df: DataFrame) -> DataFrame:
    return df.withColumn(_ID_PART, _id_part("id"))


def build_probe_index(spark: SparkSession, sf_dir: str, index_dir: str) -> None:
    """Materialize d10's corpus-side relations AT REST: (id, shingle
    hash) sets, minhash signatures, and band buckets as parquet under
    ``index_dir`` — computed ONCE from the static corpus, reused by
    every arriving micro-batch. This is the 100 TB division of labor
    the batch query can only document: index cost amortizes over the
    stream's lifetime, per-batch cost is the broadcast probe alone.

    Layout: every relation partitioned by the bounded id-derived
    ``id_part`` (see the module note) — one file per directory here;
    a production-sized index would let compact_index's byte-targeted
    rewrite pick the within-directory file count."""
    from ..catalog import table
    from ..pipeline.dedup import _minhash_frames

    idx = table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"), F.lower("text").alias("text")
    )
    write_index_frames(index_dir, *_minhash_frames(idx))


def write_index_frames(
    index_dir: str, hashed: DataFrame, sigs: DataFrame, bands: DataFrame
) -> None:
    """Lay (hashed, sigs, bands) frames out in the at-rest index layout
    (id_part-partitioned, one file per directory) — shared by
    build_probe_index and every tool/test that stages an index from its
    own corpus, so a layout change happens in exactly one place."""
    for rel, frame in (("hashed", hashed), ("sigs", sigs), ("bands", bands)):
        (
            _with_id_part(frame)
            .repartition(_N_ID_PARTS, F.col(_ID_PART))
            .write.mode("overwrite")
            .partitionBy(_ID_PART)
            .parquet(f"{index_dir}/{rel}")
        )


def read_index_relation(
    spark: SparkSession, index_dir: str, rel: str, prune=None
) -> DataFrame:
    """The live view of one index relation: the id_part-partitioned
    base — partition-PRUNED when ``prune`` (a Column predicate over
    id_part) is given and the layout carries the column — unioned with
    the flat ``__delta`` sidecar of not-yet-compacted appends. The
    delta is bounded by the compaction cadence, so it is always read
    in full (and a legacy base without id_part simply skips pruning —
    decisions are identical either way)."""
    base = spark.read.parquet(f"{index_dir}/{rel}")
    cols = [c for c in base.columns if c != _ID_PART]
    if prune is not None and _ID_PART in base.columns:
        base = base.where(prune)
    out = base.select(cols)
    fs, Path = _index_fs(spark, index_dir)
    delta = _delta_dir(index_dir, rel)
    if fs.exists(Path(delta)) and _count_data_files(fs, Path, delta) > 0:
        out = out.unionByName(spark.read.parquet(delta).select(cols))
    return out


# The three at-rest index relations, each partitioned by the bounded
# id-derived key (module note above).
_INDEX_RELS: tuple[tuple[str, str | None], ...] = (
    ("hashed", _ID_PART),
    ("sigs", _ID_PART),
    ("bands", _ID_PART),
)


def _index_fs(spark: SparkSession, index_dir: str):
    """(FileSystem, Path class) for the index root — the Hadoop FS API,
    not driver-local os functions, for the same object-store honesty as
    sink._target_has_buckets."""
    jvm = spark._jvm
    path = jvm.org.apache.hadoop.fs.Path(index_dir)
    return path.getFileSystem(spark._jsc.hadoopConfiguration()), jvm.org.apache.hadoop.fs.Path


def _count_data_files(fs, Path, dir_path: str) -> int:
    """Recursive data-file count (metadata files excluded) — the number
    the probe's file-listing cost is proportional to."""
    if not fs.exists(Path(dir_path)):
        return 0
    it = fs.listFiles(Path(dir_path), True)
    n = 0
    while it.hasNext():
        name = it.next().getPath().getName()
        if not (name.startswith("_") or name.startswith(".")):
            n += 1
    return n


def _count_partition_dirs(fs, Path, dir_path: str) -> int:
    """Top-level ``col=value`` partition directories of a relation —
    the compacted-state file FLOOR (compaction leaves one file per
    directory), which the rewrite threshold must sit above or a
    partitioned relation would re-trigger a full rewrite on every
    check."""
    if not fs.exists(Path(dir_path)):
        return 0
    return sum(
        1
        for status in fs.listStatus(Path(dir_path))
        if status.isDirectory() and "=" in status.getPath().getName()
    )


def index_file_counts(spark: SparkSession, index_dir: str) -> dict[str, int]:
    """Data-file count per index relation (base + delta sidecar) — the
    accretion observable the compaction threshold watches."""
    fs, Path = _index_fs(spark, index_dir)
    return {
        rel: _count_data_files(fs, Path, f"{index_dir}/{rel}")
        + _count_data_files(fs, Path, _delta_dir(index_dir, rel))
        for rel, _ in _INDEX_RELS
    }


def grow_index_append(spark: SparkSession, index_dir: str, novels: DataFrame) -> None:
    """Append accepted novels (an (id, text) frame) to the at-rest
    index's ``__delta`` sidecars, each relation INDEPENDENTLY guarded:
    hashed/sigs at id granularity, bands at (id, band) granularity
    (r12 ADVICE — an anti-join of the new band rows against the LIVE
    band rows, so a replay REPAIRS an id left with partial band
    coverage by a non-rename-atomic object store instead of skipping
    it; on a rename-atomic filesystem the single-file delta append
    makes that state unreachable, so the finer guard is a repair path).

    Per-relation guards (not one shared anti-join) are what make the
    three non-atomic appends converge under crash-and-replay: a crash
    between the hashed and sigs appends leaves hashed grown and sigs
    not — on replay the hashed guard skips (no duplicate (id, h) rows
    to inflate n_common/jaccard) while the sigs and bands guards see
    the ids missing and catch up. Any crash point leaves each relation
    either fully appended or untouched for a given id (each append is
    ONE flat file, one rename — all of an id's rows inside), and
    replay completes exactly the missing ones.

    Guard cost (r12 VERDICT task 5 — was three separate index scans
    per batch): ONE Spark job over a rel-tagged union of the three
    relations' guard columns — base partition-PRUNED to the novel ids'
    id_part directories (a bounded driver-side list, <= _N_ID_PARTS
    values) plus the small delta sidecars — broadcast-semi-filtered by
    the batch-bounded novel ids; the result is materialized once and
    the three append jobs anti-join against that tiny frozen frame
    instead of re-scanning the index each."""
    from ..pipeline.dedup import _minhash_frames

    if novels.isEmpty():
        # a fully-replayed batch accepts nothing: skip the guard scan
        # + write jobs outright (isEmpty only touches the
        # batch-bounded side)
        return
    novel_ids = novels.select("id").distinct().localCheckpoint(eager=True)
    live = None
    try:
        parts = [
            r[0]
            for r in novel_ids.select(_id_part("id").alias("p"))
            .distinct()
            .collect()
        ]
        prune = F.col(_ID_PART).isin(parts) if parts else F.lit(False)
        frames = dict(zip(("hashed", "sigs", "bands"), _minhash_frames(novels)))

        def guard_read(rel: str) -> DataFrame:
            df = read_index_relation(spark, index_dir, rel, prune=prune)
            band = (
                F.col("band")
                if rel == "bands"
                else F.lit(None).cast("int").alias("band")
            )
            return df.select(F.lit(rel).alias("rel"), F.col("id"), band)

        live = (
            guard_read("hashed")
            .unionByName(guard_read("sigs"))
            .unionByName(guard_read("bands"))
            .join(F.broadcast(novel_ids), "id", "left_semi")
            .distinct()
            .localCheckpoint(eager=True)
        )
        for rel, _ in _INDEX_RELS:
            if rel == "bands":
                live_pairs = live.where(F.col("rel") == rel).select("id", "band")
                to_append = frames[rel].join(
                    F.broadcast(live_pairs), ["id", "band"], "left_anti"
                )
            else:
                live_ids = live.where(F.col("rel") == rel).select("id")
                missing = novel_ids.join(F.broadcast(live_ids), "id", "left_anti")
                to_append = frames[rel].join(F.broadcast(missing), "id")
            # coalesce(1) into the flat delta sidecar: the batch-bounded
            # append commits as ONE file rename, so each relation's
            # novel set is fully appended or absent — never split
            # across directories (the partitioned-base alternative
            # published one file per touched directory: 192/append at
            # saturating batches, a 38x listing-tax multiplier the r13
            # loop cells measured before this sidecar existed). Object
            # stores without atomic rename keep the same mid-commit
            # caveat as the upsert sink (sink.py docstring) — and the
            # (id, band) bands guard above repairs exactly that state.
            (
                to_append.coalesce(1)
                .write.mode("append")
                .parquet(_delta_dir(index_dir, rel))
            )
    finally:
        for frame in (novel_ids, live):
            if frame is None:
                continue
            try:
                frame._jdf.queryExecution().analyzed().rdd().unpersist(False)
            except Exception:
                pass


def probe_index_at_rest(
    spark: SparkSession,
    index_dir: str,
    batch: DataFrame,
    exclude_self: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Partition-pruned probe of an (id, text) batch against the
    at-rest index (r12 VERDICT task 2): candidates are materialized
    FIRST (one localCheckpoint job — the bands join against the
    broadcast batch side), the distinct id_part values of the candidate
    ids are collected (a bounded list, <= _N_ID_PARTS, never O(ids)),
    and the hashed/sigs verification scans read ONLY those directories
    via an isin partition filter. Per-batch index I/O becomes
    O(candidate partitions) instead of O(index) — the trickle-regime
    fix; at saturating batch sizes the filter keeps every directory and
    the plan equals the unpruned one. Every relation read is base
    UNION its small delta sidecar (read_index_relation), so decisions
    always include not-yet-compacted appends.

    Returns (decisions, cand); ``cand`` is localCheckpointed — the
    caller must release it when the batch ends (the grow loop's
    finally block), or a long-running stream accumulates pinned blocks.

    Layouts without the id_part column (a legacy index) skip pruning
    and keep the full column-pruned scan — decisions are identical
    either way, asserted in test_streaming_probe.py."""
    from ..pipeline.dedup import (
        _minhash_frames,
        probe_candidates,
        probe_with_index,
    )

    ibands = read_index_relation(spark, index_dir, "bands").select(
        "id", "band", "bh"
    )
    bframes = _minhash_frames(batch)
    cand = probe_candidates(ibands, bframes[2], exclude_self).localCheckpoint(
        eager=True
    )
    parts = [
        r[0]
        for r in cand.select(_id_part("idx_id").alias("p")).distinct().collect()
    ]
    prune = (
        F.col(_ID_PART).isin(parts) if parts else F.lit(False)
    )
    ihashed = read_index_relation(spark, index_dir, "hashed", prune=prune)
    isigs = read_index_relation(spark, index_dir, "sigs", prune=prune)
    out = probe_with_index(
        ihashed, isigs, ibands, batch,
        exclude_self=exclude_self, cand=cand, bframes=bframes,
    )
    return out, cand


def recover_index(spark: SparkSession, index_dir: str) -> None:
    """Restore a crashed compact_index swap. The swap's rename order
    (tmp complete -> delta aside -> base aside -> tmp published ->
    olds deleted) makes every crash point recoverable from directory
    EXISTENCE alone:

    - live base missing: the crash hit between the base renames — roll
      BACK to the definitely-complete originals (base__old -> base,
      and delta__old -> delta so the folded rows are not lost).
    - live base present and a tmp still exists: the swap never reached
      the base renames — roll back the delta rename (delta__old ->
      delta) and drop the tmp.
    - live base present, no tmp: the publish completed — the delta's
      rows are IN the base, so a surviving delta__old must be deleted,
      never restored (restoring it would duplicate (id, h) rows and
      inflate n_common/jaccard).

    Runs at the TOP of every grow-loop micro-batch (skipped between
    cleanly-committed batches via the loop's healthy flag), not just
    inside compact_index: the loop's first action is reading the live
    relations, so a crash mid-swap would otherwise fail every replay
    before compaction's own recovery could ever execute."""
    fs, Path = _index_fs(spark, index_dir)
    for rel, _ in _INDEX_RELS:
        live, old, tmp = (
            f"{index_dir}/{rel}",
            f"{index_dir}/{rel}__old",
            f"{index_dir}/{rel}__compact_tmp",
        )
        delta = _delta_dir(index_dir, rel)
        delta_old = f"{delta}__old"
        if not fs.exists(Path(live)) and fs.exists(Path(old)):
            if not fs.rename(Path(old), Path(live)):
                raise IOError(f"recover_index: could not restore {live}")
            if fs.exists(Path(delta_old)) and not fs.exists(Path(delta)):
                if not fs.rename(Path(delta_old), Path(delta)):
                    raise IOError(f"recover_index: could not restore {delta}")
        if fs.exists(Path(delta_old)):
            if fs.exists(Path(tmp)) and not fs.exists(Path(delta)):
                # swap never published: the delta was only staged aside
                if not fs.rename(Path(delta_old), Path(delta)):
                    raise IOError(f"recover_index: could not restore {delta}")
            else:
                # publish completed (tmp consumed): folded rows live in
                # the base — the staged-aside delta must go
                fs.delete(Path(delta_old), True)
        if fs.exists(Path(old)):
            fs.delete(Path(old), True)
        if fs.exists(Path(tmp)):
            fs.delete(Path(tmp), True)


def compact_index(
    spark: SparkSession, index_dir: str, max_files: int = 64
) -> dict[str, int]:
    """Fold each relation's flat ``__delta`` sidecar into its
    id_part-partitioned base when the accreted file count warrants it —
    the small-files answer for the grow-index loop: appends publish one
    delta file per relation per micro-batch, and after enough batches
    the probe's delta scan is file-listing-bound (the same tax
    SCALE_PROBE measured for sim8). Trigger: delta files plus the
    base's EXCESS over its one-file-per-directory floor exceeds
    ``max_files`` (a freshly-compacted relation sits exactly at the
    floor, so the threshold never re-triggers an idle rewrite).
    Returns {relation: file_count_before} for the relations rewritten.

    Target file count is sized from the relation's byte size (~128 MB
    per file, Spark's default maxPartitionBytes, so a compacted file is
    one scan split), floored at one file per id_part directory.

    Crash discipline — rename order is the recovery contract
    (recover_index's docstring walks every crash point): (1) write
    base UNION delta to ``<rel>__compact_tmp``; (2) delta ->
    ``<delta>__old``; (3) base -> ``<rel>__old``; (4) tmp -> base;
    (5) delete both olds. The staged-aside delta is deleted only after
    the publish — never restored once the fold is visible, or the
    folded rows would double. Every call first RECOVERS from a prior
    crash, so the single-writer loop self-heals on its next batch.
    Compaction must run from that single writer loop — between
    micro-batches, never concurrently with a probe or an append."""
    recover_index(spark, index_dir)
    fs, Path = _index_fs(spark, index_dir)
    compacted: dict[str, int] = {}
    for rel, part in _INDEX_RELS:
        live, old, tmp = (
            f"{index_dir}/{rel}",
            f"{index_dir}/{rel}__old",
            f"{index_dir}/{rel}__compact_tmp",
        )
        delta = _delta_dir(index_dir, rel)
        delta_old = f"{delta}__old"
        n_base = _count_data_files(fs, Path, live)
        n_delta = _count_data_files(fs, Path, delta)
        base_excess = max(0, n_base - _count_partition_dirs(fs, Path, live))
        if n_delta + base_excess <= max_files:
            continue
        nbytes = fs.getContentSummary(Path(live)).getLength()
        if fs.exists(Path(delta)):
            nbytes += fs.getContentSummary(Path(delta)).getLength()
        n_target = max(1, int(nbytes // (128 * 1024 * 1024)) + 1)
        df = read_index_relation(spark, index_dir, rel)
        # hash-distribute by the partition key so each id_part's rows
        # coalesce into one task -> one file per directory (a
        # production-sized index raises _N_ID_PARTS rather than files
        # per directory — the directory is the pruning unit)
        (
            _with_id_part(df)
            .repartition(max(n_target, 16), F.col(part))
            .write.mode("overwrite")
            .partitionBy(part)
            .parquet(tmp)
        )
        if fs.exists(Path(delta)):
            if not fs.rename(Path(delta), Path(delta_old)):
                raise IOError(f"compact_index: could not stage {delta} aside")
        if not fs.rename(Path(live), Path(old)):
            raise IOError(f"compact_index: could not stage {live} aside")
        if not fs.rename(Path(tmp), Path(live)):
            raise IOError(f"compact_index: could not publish {tmp}")
        fs.delete(Path(old), True)
        if fs.exists(Path(delta_old)):
            fs.delete(Path(delta_old), True)
        compacted[rel] = n_base + n_delta
    return compacted


def streaming_incremental_probe(
    spark: SparkSession,
    sf_dir: str,
    stream_dir: str,
    index_dir: str,
    target_dir: str,
    max_files_per_trigger: int | None = None,
    grow_index: bool = False,
    compact_every: int | None = None,
    compact_max_files: int = 64,
):
    """Probe an arriving document stream against the at-rest index and
    MERGE each micro-batch's decisions into a bucket-partitioned
    parquet target (exactly the upsert-sink discipline): rows dedupe on
    batch_id, so an at-least-once upstream that re-delivers a whole
    file converges to the same table — replay-idempotent, asserted in
    test_streaming_probe.py by draining the same file twice and
    comparing against the BATCH d10 answer.

    foreachBatch is the right engine surface here: the probe is a
    multi-join + aggregation pipeline (not expressible as a single
    streaming stateful operator), and per-micro-batch batch-mode
    execution against static index relations is precisely its
    production shape.

    ``grow_index=True`` closes the continuous-ingestion loop: a batch's
    ACCEPTED novels are appended back to the at-rest index (signatures,
    shingle sets, band buckets), so later batches dedup against earlier
    arrivals, not just the original corpus. Replay safety is ordered
    around ONE durable commit point (r11 ADVICE — the index must never
    mutate before the decisions that justified it are stored):

    1. the probe excludes self-id matches (a redelivered doc must not
       match its own earlier acceptance and flip novel -> dup);
    2. the decision MERGE runs FIRST and keeps the earliest stored
       decision (_is_new ASC) — replay cannot rewrite history;
    3. the index append derives its novel set from the STORED decisions
       table (not the in-flight recomputation, which on replay can see
       a half-grown index), and each of the three relation appends is
       independently guarded against that relation's live ids
       (grow_index_append), so a crash at ANY point replays to the same
       index — no duplicate (id, h) rows, no lost sigs/bands.

    The index frames are re-read from parquet inside every micro-batch
    — each batch must see the appends of the previous one.

    ``compact_every=N`` runs compact_index (threshold
    ``compact_max_files``) after every Nth micro-batch, from this
    single writer loop — the append-per-batch layout is otherwise
    file-listing-bound after ~10^4 batches (see compact_index)."""
    from pyspark.sql import Window

    # Crash-recovery probes only when needed (r12 VERDICT task 5): the
    # three per-relation fs.exists sweeps of recover_index are part of
    # the loop's fixed per-batch overhead, but a swap can only be left
    # half-done by a batch that DIDN'T complete. healthy=True only
    # between a fully-committed apply() and the start of the next; any
    # exception (or a fresh session) leaves it False and the next batch
    # recovers.
    state = {"healthy": False}

    def one_per_key(df: DataFrame) -> DataFrame:
        # _is_new ASC: the stored decision wins, a replay cannot rewrite
        # history (with a static index both rows are identical; with a
        # grown index only the FIRST decision is the true one)
        w = Window.partitionBy("batch_id").orderBy(F.col("_is_new").asc())
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            # A zero-row micro-batch (empty arrival file) must be a
            # no-op BEFORE the merge: if it were the very first batch,
            # the merge would write no bucket partitions and the
            # stored-decision read below would throw on a target
            # holding only _checkpoint — wedging the stream in a
            # permanent replay-fail loop (r12 ADVICE).
            return
        if grow_index and not state["healthy"]:
            # heal a crashed compaction swap BEFORE touching the live
            # relations — the reads below would fail on every replay
            # otherwise and compaction's own recovery could never run
            recover_index(spark, index_dir)
        state["healthy"] = False
        batch = batch_df.select(
            F.col("doc_id").alias("id"), F.lower("text").alias("text")
        )
        # fresh per micro-batch (the live index includes prior
        # appends), hashed/sigs partition-pruned to the candidate ids'
        # directories; cand rides pre-materialized into the probe plan
        out, cand = probe_index_at_rest(
            spark, index_dir, batch, exclude_self=grow_index
        )
        stored_novel_ids = None
        try:
            if not grow_index:
                # same explicit bucket count as the grow path (r12
                # ADVICE: relying on the sink's default here let the two
                # paths' decision tables silently diverge if either
                # constant moved)
                merge_into_buckets(
                    out, target_dir, "batch_id", one_per_key,
                    n_buckets=_N_DECISION_BUCKETS,
                )
                state["healthy"] = True
                return
            # Compute-once: the merge executes `out` twice
            # (touched-bucket collect + winners write); localCheckpoint
            # materializes the probe once. Replay SAFETY no longer rides
            # on it — the commit ordering below does — it is purely the
            # recompute guard. The blocks are released when the batch
            # ends; a long-running stream must not accumulate one pinned
            # RDD per micro-batch.
            out = out.localCheckpoint(eager=True)
            # 1. COMMIT the decisions (replay-idempotent first-wins
            # merge) BEFORE any index mutation.
            merge_into_buckets(
                out, target_dir, "batch_id", one_per_key,
                n_buckets=_N_DECISION_BUCKETS,
            )
            # 2. Append novels derived from the STORED decisions — the
            # history a replay must honor, not the recomputation it
            # must not — restricted to this batch's ids. The read is
            # pruned to the batch's buckets (the sink's own O(touched
            # buckets) contract — an unpruned scan would pay the whole
            # stored history every batch) and MATERIALIZED once, so the
            # three guard/append jobs downstream re-read a tiny frozen
            # frame instead of re-scanning the decisions table each.
            touched = [
                r[0]
                for r in _with_bucket(
                    batch.select(F.col("id").alias("batch_id")),
                    "batch_id",
                    _N_DECISION_BUCKETS,
                )
                .select(_BUCKET)
                .distinct()
                .collect()
            ]
            stored_novel_ids = (
                spark.read.parquet(target_dir)
                .where(F.col(_BUCKET).isin(touched))
                .where(F.col("is_novel"))
                .select(F.col("batch_id").alias("id"))
                .join(F.broadcast(batch.select("id")), "id", "left_semi")
                .localCheckpoint(eager=True)
            )
            grow_index_append(
                spark, index_dir, batch.join(F.broadcast(stored_novel_ids), "id")
            )
            if compact_every and (batch_id + 1) % compact_every == 0:
                compact_index(spark, index_dir, max_files=compact_max_files)
            state["healthy"] = True
        finally:
            for frame in (out, cand, stored_novel_ids):
                if frame is None:
                    continue
                try:
                    frame._jdf.queryExecution().analyzed().rdd().unpersist(False)
                except Exception:
                    pass

    stream = stream_documents(spark, sf_dir, stream_dir, max_files_per_trigger)
    return (
        stream.writeStream.foreachBatch(apply)
        .trigger(availableNow=True)
        .option(
            "checkpointLocation", os.path.join(target_dir, "_checkpoint")
        )
        .start()
    )


# ---------------------------------------------------------------------------
# streaming quality cut (the streaming face of c16's Gopher cut)
# ---------------------------------------------------------------------------


def streaming_quality_cut(
    spark: SparkSession, sf_dir: str, stream_dir: str, delay: str = "2 hours"
) -> DataFrame:
    """c16's Gopher repetition cut + exact dedup applied ON THE STREAM:
    the in-row top-gram fold is a stateless projection (it rides each
    micro-batch with zero state), and duplicate suppression is
    dropDuplicatesWithinWatermark on the content hash — bounded state,
    the same exactly-once discipline as streaming_dedup.

    Documents carry no event time, so the dedup window is ARRIVAL time
    (an injected processing-time column) — the standard choice for
    ingest dedup where re-deliveries cluster within minutes of the
    original. Cut documents never enter the dedup state at all: the
    filter sits below the stateful operator, so boilerplate floods
    (the very thing the Gopher rules drop) cannot balloon state."""
    from ..pipeline.curation import _WS_SPLIT, repetition_cut_flag

    docs = stream_documents(spark, sf_dir, stream_dir)
    kept = (
        docs.withColumn("text", F.lower("text"))
        .withColumn("ws", F.split("text", _WS_SPLIT))
        .where(~repetition_cut_flag())
        .drop("ws")
    )
    return (
        kept.withColumn("arrival_ts", F.current_timestamp())
        .withWatermark("arrival_ts", delay)
        .withColumn("content_key", F.md5("text"))
        .dropDuplicatesWithinWatermark(["content_key"])
    )


# e6 runs c16's planted corpus over a deterministic 1-in-4 slice of the
# natural docs (r12 VERDICT task 4: e6 was the registry's most
# expensive verification query at 12.2 s — the drain's cost is
# row-bound, and the slice keeps both plant families at proportional
# mass: every-20th repetitive doc, every-20th verbatim copy). The
# oracle applies the SAME slice, so the certificate is unweakened —
# doubled delivery, cut-below-state plan gate, and survivor-digest
# equality all still hold.
_E6_EVERY = 4


def _e6_oracle() -> str:
    from ..pipeline.curation import _C16_TOP2, _C16_TOP3, _c16_corpus_sql
    from ..pipeline.textstats import _gram_metrics_sql

    return f"""
    WITH {_c16_corpus_sql(f"WHERE doc_id % {_E6_EVERY} = 0")},
    w AS (
      SELECT doc_id, text, string_split_regex(text, '\\s+') AS ws
      FROM corpus),
    {_gram_metrics_sql(2)},
    {_gram_metrics_sql(3)},
    m AS (
      SELECT w.text,
             COALESCE(CAST(a2.top2 AS DOUBLE) / a2.total2
                      > {_C16_TOP2}, FALSE)
             OR COALESCE(CAST(a3.top3 AS DOUBLE) / a3.total3
                         > {_C16_TOP3}, FALSE) AS cut
      FROM w
      LEFT JOIN a2 ON a2.doc_id = w.doc_id
      LEFT JOIN a3 ON a3.doc_id = w.doc_id),
    kept AS (SELECT DISTINCT text FROM m WHERE NOT cut),
    keyed AS (
      SELECT md5(text) AS content_key,
             CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS tok
      FROM kept)
    SELECT substr(content_key, 1, 1) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_texts,
           MIN(content_key) AS min_key,
           MAX(content_key) AS max_key,
           CAST(SUM(tok) AS BIGINT) AS sum_tok
    FROM keyed
    GROUP BY substr(content_key, 1, 1)
    """


# staged stream corpus per sf_dir, written once per process: the corpus
# is deterministic (c16's planted verification corpus), so re-staging it
# on every call would only rewrite identical bytes. The DRAIN runs per
# call — the query certifies the stream path, not a cached table.
_E6_STAGE_MEMO: dict[str, str] = {}
_E6_SINK_SEQ = iter(range(10**9))
_E6_LAST_SINK: list[str] = []


def e6_streaming_quality_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-verifiable face of streaming_quality_cut (the r11 verdict
    item: the streaming cut was pytest-only): stage c16's planted
    corpus as a document stream DELIVERED TWICE (a whole-file
    re-delivery, the at-least-once ingest failure mode), drain it
    through the streaming Gopher cut + arrival-time dedup, and roll the
    survivor set up into an arrival-order-invariant shape — per
    content-key prefix bucket: surviving-text count, min/max content
    key, token mass. Exactly-once semantics make the drained table hold
    ONE row per distinct surviving text, so the rollup equals the
    BATCH answer (the oracle: distinct kept texts of the same sliced
    c16 corpus, _c16_corpus_sql) —
    the same residency-invariance certificate sim8 rides: results must
    not depend on whether the corpus was a table or a replayed stream.

    Only text-derived columns are aggregated: WHICH doc_id survives a
    duplicate group depends on arrival order (nondeterministic), but
    the surviving text set — and therefore every column here — does
    not."""
    import tempfile

    from ..pipeline.curation import _WS_SPLIT, _c16_corpus

    staged = _E6_STAGE_MEMO.get(sf_dir)
    if staged is None or not os.path.isdir(staged):
        work = tempfile.mkdtemp(prefix="e6-qcut-")
        corpus_dir = os.path.join(work, "corpus.parquet")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        # full documents schema so stream_documents reads it verbatim;
        # metadata columns ride as typed NULLs — the streaming cut and
        # the survivor digest touch only text-derived columns, and the
        # join-back that used to fill real metadata was the most
        # expensive job of the staging write (a shuffle the
        # verification query re-paid every fresh process)
        meta = {
            f.name: f.dataType
            for f in docs.schema
            if f.name not in ("doc_id", "text")
        }
        corpus = _c16_corpus(spark, sf_dir, every=_E6_EVERY).select(
            "doc_id",
            "text",
            *[F.lit(None).cast(t).alias(c) for c, t in meta.items()],
        )
        corpus.select(docs.columns).coalesce(1).write.parquet(corpus_dir)
        staged = os.path.join(work, "arrivals")
        os.makedirs(staged)
        part = [
            f for f in os.listdir(corpus_dir) if f.endswith(".parquet")
        ][0]
        for copy in ("arrival-0.parquet", "arrival-1.parquet"):
            os.symlink(
                os.path.join(corpus_dir, part), os.path.join(staged, copy)
            )
        _E6_STAGE_MEMO[sf_dir] = staged

    if _E6_LAST_SINK:
        # only the current call's table is ever read; a long session
        # must not pin every past run's survivor set in memory
        spark.catalog.dropTempView(_E6_LAST_SINK[-1])
        _E6_LAST_SINK.clear()
    sink = f"e6_qcut_out_{next(_E6_SINK_SEQ)}"
    run_stream_append(
        streaming_quality_cut(spark, sf_dir, staged), sink, timeout=300
    )
    _E6_LAST_SINK.append(sink)
    got = spark.table(sink)
    return (
        got.select(
            "content_key",
            F.size(F.split("text", _WS_SPLIT)).cast("long").alias("tok"),
        )
        .groupBy(F.substring("content_key", 1, 1).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_texts"),
            F.min("content_key").alias("min_key"),
            F.max("content_key").alias("max_key"),
            F.sum("tok").alias("sum_tok"),
        )
    )


query("e6_streaming_quality_cut", oracle=_e6_oracle())(
    e6_streaming_quality_cut
)
