"""Order-independent floating aggregation (oracle-exact and cluster-safe).

Summing doubles is order-dependent at the ulp level, and Spark's
partial aggregation merges partitions in nondeterministic order — so a
plain ``SUM(double)`` is not even stable across two runs of the *same*
engine, let alone between Spark and DuckDB.  At 100 TB (thousands of
partials) the wobble grows with the merge-tree depth.

Fix: cast each value to a fixed-scale DECIMAL *before* aggregation.
Decimal addition is exact and associative-commutative, so the result is
bit-identical regardless of partition order and engine, and the final
``CAST(... AS DOUBLE)`` is a single deterministic conversion.  The same
pattern is expressed on the DuckDB side by :func:`sql_dsum` /
:func:`sql_davg`.

Cost: decimal aggregation is marginally slower than double aggregation
but stays fully inside Tungsten/WholeStageCodegen — no Python involved.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 total digits is the Spark/DuckDB decimal max; sums get widened
# automatically.  Scale 4 covers the 2-decimal money domains; product
# expressions carry their own (wider) scale from the operand casts.
SUM_DEC = "decimal(24,4)"
AVG_DEC = "decimal(24,4)"


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dsum(c: Column | str, dec: str = SUM_DEC) -> Column:
    """Exact order-independent sum of a double column, returned as double."""
    return F.sum(_col(c).cast(dec)).cast("double")


def dsum_exact(c: Column) -> Column:
    """Exact sum of an (already-decimal) product expression → double.

    Two portability traps this dodges (both hit at sf0.1 in round 1/2):

    1. ``decimal → double`` is only bit-portable if the unscaled integer
       fits in a 53-bit mantissa — DuckDB converts via
       ``(double)int128 / (double)10^scale`` and the first step rounds.
       So we requantize to scale 4 first (sums ≲ 10^11 then fit).
    2. ``decimal → decimal`` downscale: Spark rounds HALF_UP, DuckDB
       *truncates*.  The SQL twin must therefore use an explicit
       ``ROUND(sum, 4)`` (half-away-from-zero == HALF_UP for positives),
       mirrored by :func:`sql_dsum_exact`.
    """
    return F.sum(c).cast("decimal(24,4)").cast("double")


def sql_dsum_exact(expr: str) -> str:
    """DuckDB twin of :func:`dsum_exact` — see its docstring."""
    return f"CAST(ROUND(SUM({expr}), 4) AS DOUBLE)"


def davg(c: Column | str, dec: str = AVG_DEC) -> Column:
    """avg = exact-decimal sum (as double) / count — deterministic IEEE division."""
    return (F.sum(_col(c).cast(dec)).cast("double") / F.count(F.lit(1))).alias("avg")


def sql_dsum(expr: str, dec: str = "DECIMAL(24,4)") -> str:
    return f"CAST(SUM(CAST({expr} AS {dec})) AS DOUBLE)"


def sql_davg(expr: str, dec: str = "DECIMAL(24,4)") -> str:
    return f"(CAST(SUM(CAST({expr} AS {dec})) AS DOUBLE) / COUNT(*))"
