"""Differential compare mimicking the driver: row count + column names +
order-insensitive value comparison between a Spark DataFrame and a DuckDB
result on the same fixtures."""

from __future__ import annotations

import math


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # kill -0.0 and residual binary noise beyond round(…, 4..6) done in-query
        return round(v, 9) + 0.0
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=repr)
    return out


def assert_match(sdf, duck, sql: str, name: str = "") -> None:
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    ns, nd = _norm_rows(spark_cols, spark_rows), _norm_rows(duck_cols, duck_rows)
    mism = [i for i, (a, b) in enumerate(zip(ns, nd)) if a != b]
    assert not mism, (
        f"{name}: value mismatch at sorted-row {mism[:3]}: "
        f"spark={ns[mism[0]]} duck={nd[mism[0]]}"
    )
