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


def round_half_up_f(x: float, digits: int = 4) -> float:
    """Python-float twin of ``round_half_up`` — the same IEEE
    multiply/add/floor/divide sequence, for driver-side values that feed
    the differential hash (builtin ``round`` is banker's and disagrees at
    decimal-half doubles)."""
    import math

    scale = float(10 ** digits)
    return math.floor(x * scale + 0.5) / scale
