"""Cross-engine deterministic rounding.

Spark's ``round`` (HALF_UP on the binary double) and DuckDB's ``round``
disagree on values that print like a decimal half (e.g. 0.8687499999999999 →
Spark 0.8687, DuckDB 0.8688). Every rounded double that feeds the
differential value-hash therefore uses ``floor(x·10^d + 0.5)/10^d`` — plain
fp multiply/add/floor/divide, bit-identical in both engines. The oracle SQL
is rewritten to the same form (``oracles.fix_rounds``).

Valid while |x|·10^d < 2^53; fixture scales stay far below that.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column | str, digits: int = 4) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    scale = 10 ** digits
    return F.floor(c * F.lit(float(scale)) + F.lit(0.5)) / F.lit(float(scale))


def exact_decimal_sum(col: Column | str, digits: int = 4) -> Column:
    """Order-independent aggregate sum of a fixed-decimal double column:
    each row is converted to exact integer 10^-digits units with the
    shared floor form (bit-identical per row in both engines), summed
    exactly as long, then divided ONCE by the scale. Use this instead of
    ``round_half_up(F.sum(c), d)`` whenever the summed magnitude × 10^d
    approaches 2^53 / #rows — a data-sized fp64 sum is
    summation-order-dependent, and the round-14 10× sweep caught three
    rows (q1, broadcast-dim join, case-conditional agg) flipping their
    4th decimal cross-engine at ~10¹⁰–10¹¹ magnitudes. Valid while
    |sum| · 10^digits < 2^63 (~9·10^14 in value units at digits=4).
    SQL twin: ``CAST(sum(CAST(floor(c * 1e4 + 0.5) AS BIGINT)) AS
    BIGINT) / 1e4``."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10 ** digits)
    return F.sum(
        F.floor(c * F.lit(scale) + F.lit(0.5)).cast("long")
    ) / F.lit(scale)


def exact_decimal_avg(
    col: Column | str, digits: int = 4, out_digits: int = 4
) -> Column:
    """Order-independent aggregate mean of a fixed-decimal double column:
    the ``exact_decimal_sum`` integer-unit sum divided by the scaled
    NON-NULL count (mirroring ``avg``'s NULL semantics), then one
    ``round_half_up``. SQL twin: ``round(CAST(sum(CAST(floor(c * 1e4 +
    0.5) AS BIGINT)) AS BIGINT) / (1e4 * count(c)), d)`` (fix_rounds
    rewrites the outer round to the shared floor form)."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10 ** digits)
    micro = F.sum(F.floor(c * F.lit(scale) + F.lit(0.5)).cast("long"))
    return round_half_up(micro / (F.lit(scale) * F.count(c)), out_digits)


def round_half_up_f(x: float, digits: int = 4) -> float:
    """Python-float twin of ``round_half_up`` — the same IEEE
    multiply/add/floor/divide sequence, for driver-side values that feed
    the differential hash (builtin ``round`` is banker's and disagrees at
    decimal-half doubles)."""
    import math

    scale = float(10 ** digits)
    return math.floor(x * scale + 0.5) / scale
