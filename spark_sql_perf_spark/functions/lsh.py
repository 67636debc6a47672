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
    plane_i = (
        f"(cast(conv(substring(md5(concat('lsh|p{bit}-', cast(i as string))), 1, 8), 16, 10) AS BIGINT)"
        f" / 2147483648.0 - 1.0)"
    )
    proj = F.expr(
        f"aggregate(transform(sequence(1, size(v)), i -> element_at(v, i) * {plane_i}),"
        f" cast(0.0 as double), (acc, x) -> acc + x)"
    )
    return F.when(proj > 0, F.lit(1 << bit)).otherwise(F.lit(0))


def sign_lsh_sig_sql(nbits: int = LSH_BITS) -> str:
    """DuckDB expression for the nbits-bit hyperplane-sign signature of
    a DOUBLE[] column named ``v`` (bit-identical to the Spark twin)."""
    return " + ".join(_plane_sign_sql(b) for b in range(nbits))


def sign_lsh_sig_spark(nbits: int = LSH_BITS) -> F.Column:
    """Spark twin of ``sign_lsh_sig_sql`` over an array<double> column
    ``v``."""
    sig = None
    for b in range(nbits):
        term = _plane_sign_spark(b)
        sig = term if sig is None else sig + term
    return sig
