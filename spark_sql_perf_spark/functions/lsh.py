"""Sign-LSH (random-hyperplane) signature expressions over an
array<double> column named ``v``, bit-identical in Spark and DuckDB.

Plane component i of hyperplane ``bit`` is md5-derived
(md5('lsh|p{bit}-{i}') first 8 hex digits -> [0, 2^32) -> [-1, 1)), so
both engines construct the same planes from nothing but the shared md5
— no side-channel plane table to keep in sync. Shared by sim2's ANN
bucketing and d5's dedup blocking; lives in this leaf module (no
registry import) so either consumer can be imported first without a
cycle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .text import md5_hash32_sql

LSH_BITS = 8

# Adaptive (LSH-forest) bucket splitting, shared by sim6's kNN graph,
# d5's embedding dedup, and the streaming ANN server: buckets over
# BUCKET_CAP members re-hash with SPLIT_BITS extension planes; split
# keys live past SPLIT_MARKER so they never collide with unsplit sig0
# values. Constants live in this leaf module so every consumer
# (pipeline.similarity, pipeline.dedup's module-load oracle,
# streaming.ann) can import them without a package cycle.
#
# These defaults are ORACLE-SCALE constants, NOT production sizing:
# BUCKET_CAP=5 / SPLIT_BITS=4 are chosen so the sf0.01 test corpus
# (500 vectors, buckets reaching 8) exercises the split path in every
# driver-verified query. A production corpus must size all three knobs
# to its row count — use ``sized_lsh_params`` below, which encodes the
# rule the scale probe validates at 500k-64M rows.
SPLIT_BITS = 4
BUCKET_CAP = 5  # sf0.01 buckets reach 8, so the split path IS oracle-exercised
SPLIT_MARKER = 1 << (LSH_BITS + SPLIT_BITS)


def sized_lsh_params(n: int, cap: int = 64) -> tuple[int, int, int]:
    """(nbits, split_bits, cap) sized to a corpus of ``n`` vectors — the
    production counterpart of the oracle-scale module constants.

    Sizing rule (validated in SCALE_PROBE.md's knn cells, 500k-64M rows,
    candidate pairs/row flat ~15 across the whole range):

    - ``nbits ~ log2(n/2)``: base signature width tracks the corpus so
      the MEAN bucket holds ~2 vectors. Width alone is not enough —
      sign-LSH bucket masses are multiplicatively uneven, so the dense
      tail's sum-of-squares candidate volume grows superlinearly even at
      this width (measured 61x -> 98x pairs/row from 500k -> 2M before
      the split existed).
    - ``split_bits = 10`` extension planes re-hash any bucket over
      ``cap`` members into 1024 sub-buckets, flattening the tail.

    BOUND (the honest contract): the split is SINGLE-LEVEL, so one
    application bounds the expected sub-bucket size only for base
    buckets up to ~``cap << split_bits`` members (65k at the defaults —
    at mean-2 sizing that is a region holding tens of thousands of
    near-identical vectors, i.e. heavy duplication). Beyond that the
    candidate volume degrades gracefully (quadratic only WITHIN the
    still-oversized sub-buckets) but is no longer capped; corpora known
    to be duplicate-heavy should exact-dedup first (d1/d5's job) or
    raise ``split_bits``. Callers that skip this helper and inherit the
    module constants get test-scale behavior, not a scale guarantee.
    """
    nbits = max(LSH_BITS, (max(n, 2) // 2).bit_length() - 1)  # ~log2(n/2)
    return nbits, 10, cap


def _plane_sign_sql(bit: int) -> str:
    """DuckDB: sign bit `bit` = sign of dot(v, plane_bit) where
    plane_bit[i] = md5_hash32(bit|i) / 2^31 - 1  (deterministic in [-1, 1))."""
    hash_arg = f"'p{bit}-' || CAST(i AS VARCHAR)"
    plane_i = f"({md5_hash32_sql(hash_arg, 'lsh')} / 2147483648.0 - 1.0)"
    return (
        f"CASE WHEN list_sum(list_transform(range(1, len(v) + 1),"
        f" i -> v[i] * {plane_i})) > 0 THEN {1 << bit} ELSE 0 END"
    )


def _plane_sign_spark(bit: int) -> F.Column:
    # Divisor pinned to DOUBLE: a bare 2147483648.0 literal parses as
    # DECIMAL(11,1) and BIGINT / DECIMAL is decimal division, ~1e-12 off
    # the exact IEEE quotient — enough to flip a sign on a projection
    # that close to zero (see tests/test_lsh.py).
    plane_i = (
        f"(cast(conv(substring(md5(concat('lsh|p{bit}-', cast(i as string))), 1, 8), 16, 10) AS BIGINT)"
        f" / cast(2147483648.0 as double) - 1.0)"
    )
    proj = F.expr(
        f"aggregate(transform(sequence(1, size(v)), i -> element_at(v, i) * {plane_i}),"
        f" cast(0.0 as double), (acc, x) -> acc + x)"
    )
    return F.when(proj > 0, F.lit(1 << bit)).otherwise(F.lit(0))


def sign_lsh_sig_sql(nbits: int = LSH_BITS, lo: int = 0) -> str:
    """DuckDB expression for the nbits-bit hyperplane-sign signature of
    a DOUBLE[] column named ``v`` (bit-identical to the Spark twin).
    ``lo`` starts the plane family at a higher bit — used for the
    EXTENSION planes that adaptively split oversized buckets (the bit
    weights stay 1 << b, so an extension signature is already shifted
    past the base signature's value range)."""
    return " + ".join(_plane_sign_sql(b) for b in range(lo, lo + nbits))


def _plane_value(bit: int, i: int) -> float:
    """Python twin of the md5-derived plane component (i is 1-based, as
    in the SQL ``range``/``sequence`` forms): bit-identical to what the
    in-expression derivation computes — exact 32-bit int divided by 2^31
    (exact in IEEE double) minus 1.0."""
    import hashlib

    h = hashlib.md5(f"lsh|p{bit}-{i}".encode()).hexdigest()[:8]
    return int(h, 16) / 2147483648.0 - 1.0


def _plane_sign_spark_lit(bit: int, dim: int) -> F.Column:
    plane = F.array(*[F.lit(_plane_value(bit, i)) for i in range(1, dim + 1)])
    proj = F.aggregate(
        F.zip_with(F.col("v"), plane, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(proj > 0, F.lit(1 << bit)).otherwise(F.lit(0))


def sign_lsh_sig_spark(
    nbits: int = LSH_BITS, dim: int | None = None, lo: int = 0
) -> F.Column:
    """Spark twin of ``sign_lsh_sig_sql`` over an array<double> column
    ``v``.

    Pass ``dim`` (the fixed vector length) to embed the hyperplanes as
    ARRAY LITERALS resolved once at plan time. Without it the plane
    components are md5-derived INSIDE the row expression — correct, but
    the engine then recomputes per-(bit, i) constants once per row
    element: at 10^9 rows x 64 dims x 8 bits that is ~5e11 md5 calls
    for values that never change. Both forms divide the md5-derived
    32-bit int by a DOUBLE-pinned 2^31 (see ``_plane_sign_spark``), so
    their plane components and left-to-right summations are bit-identical
    to each other and to the DuckDB oracle's; oracle hashes are
    unaffected by the choice. The literal form additionally requires
    vectors of uniform length (zip_with would null-pad a short row and
    null its signature).
    """
    sig = None
    for b in range(lo, lo + nbits):
        term = _plane_sign_spark_lit(b, dim) if dim else _plane_sign_spark(b)
        sig = term if sig is None else sig + term
    return sig
