"""Property-based tests (hypothesis) for the cross-engine determinism
machinery — the layer every value-hash comparison rests on. The reference
has no property tests (SURVEY §5); these guard this engine's additions."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

finite_doubles = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    yield c
    c.close()


@settings(max_examples=200, deadline=None)
@given(x=finite_doubles, d=st.integers(min_value=0, max_value=6))
def test_fix_rounds_rewrite_equals_floor_formula(con, x, d):
    """`oracles.fix_rounds` must rewrite round(expr, d) into exactly the
    floor form the Spark side computes (functions/rounding.round_half_up):
    floor(x·10^d + 0.5)/10^d — for any finite double where the product
    stays in the exact-integer range of float64."""
    from spark_ml_algo_lib_master_tongji_spark.oracles import fix_rounds

    if abs(x) * 10**d >= 2**52:  # documented validity bound
        return
    # Evaluate through a MATERIALIZED one-row table, not an inline literal:
    # oracle SQL always rounds COLUMN expressions (runtime IEEE-double
    # kernels, which match Spark bit-for-bit). Literal arguments — even via
    # an inlined subquery — hit DuckDB's constant folder, which folds at
    # higher precision and can differ by 1 ulp above ~2^51, a path
    # production oracles never take.
    con.execute("CREATE OR REPLACE TABLE _px AS SELECT ?::DOUBLE AS x", [x])
    sql = f"SELECT round(x, {d}) AS v FROM _px"
    rewritten = fix_rounds(sql)
    assert "round(" not in rewritten
    got = con.execute(rewritten).fetchone()[0]
    want = math.floor(x * float(10**d) + 0.5) / float(10**d)
    assert got == want or (math.isnan(got) and math.isnan(want)), (x, d)


@settings(max_examples=100, deadline=None)
@given(
    inner=st.integers(min_value=0, max_value=4),
    outer=st.integers(min_value=0, max_value=4),
    x=finite_doubles,
)
def test_fix_rounds_handles_nested_rounds(con, inner, outer, x):
    """Nested round() calls rewrite independently (balanced-paren parse)."""
    from spark_ml_algo_lib_master_tongji_spark.oracles import fix_rounds

    if abs(x) * 10**4 >= 2**52:
        return
    # materialized column path, not inline literal (see the rewrite test)
    con.execute("CREATE OR REPLACE TABLE _px AS SELECT ?::DOUBLE AS x", [x])
    sql = f"SELECT round(round(x, {inner}) + 1.5, {outer}) AS v FROM _px"
    rewritten = fix_rounds(sql)
    assert "round(" not in rewritten
    ri = math.floor(x * float(10**inner) + 0.5) / float(10**inner)
    want = math.floor((ri + 1.5) * float(10**outer) + 0.5) / float(10**outer)
    got = con.execute(rewritten).fetchone()[0]
    assert got == want, (x, inner, outer)


@settings(max_examples=100, deadline=None)
@given(vals=st.lists(finite_doubles, min_size=1, max_size=20))
def test_norm_rows_is_order_invariant(vals):
    """tests/compare._norm_rows must hash-compare equal under any row
    permutation — the driver's order-insensitive contract."""
    from tests.compare import _norm_rows

    rows = [(v,) for v in vals]
    a = _norm_rows(["x"], rows)
    b = _norm_rows(["x"], list(reversed(rows)))
    assert a == b


# ---- PII pattern dialect parity (Python re ↔ DuckDB RE2) -------------------
#
# The pipeline_pii_scrub patterns are restricted to the Java-regex ∩ RE2
# dialect; the fixed synthetic-corpus test in test_text_pipeline pins
# Spark (Java) against both. This property widens the input space: random
# token streams with planted PII and PII-near-misses must count and
# redact identically under Python re and DuckDB RE2.

_pii_words = st.sampled_from(
    ["alpha", "beta", "x", "scan12", "a@b", "1.2.3", "12-34-5678",
     "user@@y.io", "3.14", "v1.2.3.4beta", "..", "@", "-"]
)
_pii_emails = st.builds(
    lambda a, b, c: f"{a}@{b}.{c}",
    st.sampled_from(["bob", "a.b", "x_1", "p+tag", "u%v"]),
    st.sampled_from(["mail", "ex.co", "h-q"]),
    st.sampled_from(["io", "com", "de"]),
)
_pii_ips = st.builds(
    lambda a, b, c, d: f"{a}.{b}.{c}.{d}",
    *([st.integers(min_value=0, max_value=999)] * 4),
)
_pii_phones = st.builds(
    lambda a, b, c, s1, s2: f"{a:03d}{s1}{b:03d}{s2}{c:04d}",
    st.integers(min_value=0, max_value=999),
    st.integers(min_value=0, max_value=999),
    st.integers(min_value=0, max_value=9999),
    st.sampled_from(["-", " "]),
    st.sampled_from(["-", " "]),
)
_pii_tokens = st.one_of(_pii_words, _pii_emails, _pii_ips, _pii_phones)


@settings(max_examples=150, deadline=None)
@given(toks=st.lists(_pii_tokens, min_size=0, max_size=12))
def test_pii_patterns_re_and_re2_agree(con, toks):
    import re

    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        PII_EMAIL,
        PII_IPV4,
        PII_PHONE,
    )

    text = " ".join(toks)
    want_counts = tuple(
        len(re.findall(p, text)) for p in (PII_EMAIL, PII_IPV4, PII_PHONE)
    )
    want_clean = re.sub(
        PII_PHONE,
        "<PHONE>",
        re.sub(PII_IPV4, "<IP>", re.sub(PII_EMAIL, "<EMAIL>", text)),
    )
    got = con.execute(
        """
        SELECT len(regexp_extract_all(?, ?)),
               len(regexp_extract_all(?, ?)),
               len(regexp_extract_all(?, ?)),
               regexp_replace(regexp_replace(regexp_replace(?,
                   ?, '<EMAIL>', 'g'), ?, '<IP>', 'g'), ?, '<PHONE>', 'g')
        """,
        [text, PII_EMAIL, text, PII_IPV4, text, PII_PHONE,
         text, PII_EMAIL, PII_IPV4, PII_PHONE],
    ).fetchone()
    assert (got[0], got[1], got[2]) == want_counts, text
    assert got[3] == want_clean, text


# ---- winnowing sketch: DuckDB list-op oracle vs pure Python ----------------
#
# The winnow oracle is a chain of list_transform/slice/list_min ops whose
# off-by-ones (1-based inclusive slices, prefix windows) are easy to get
# silently wrong in BOTH engines at once; this property pins the DuckDB
# formulation against an independent Python implementation on random
# token streams, including the sub-K-token empty case.

_winnow_tokens = st.lists(
    st.sampled_from(["a", "b", "c", "dd", "eee", "x1"]), min_size=0, max_size=30
)


@settings(max_examples=120, deadline=None)
@given(toks=_winnow_tokens)
def test_winnow_oracle_listops_match_python(con, toks):
    import hashlib

    from spark_ml_algo_lib_master_tongji_spark.operators.text_analysis import (
        WINNOW_K,
        WINNOW_W,
    )

    text = " ".join(toks)
    t = text.split(" ")  # mirrors both engines' single-space split
    grams = [
        " ".join(t[i : i + WINNOW_K]) for i in range(len(t) - WINNOW_K + 1)
    ]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    want = sorted(
        {min(hs[max(0, i - WINNOW_W + 1) : i + 1]) for i in range(len(hs))}
    )
    got = con.execute(
        """
        WITH g AS (
            SELECT CASE WHEN len(t) >= 3 THEN
                       list_transform(range(1, len(t) - 1),
                                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                   ELSE []::VARCHAR[] END AS grams
            FROM (SELECT string_split(?, ' ') AS t)
        ),
        h AS (
            SELECT list_transform(grams,
                       x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
            FROM g
        )
        SELECT list_sort(list_distinct(
                   list_transform(range(1, len(hs) + 1),
                       i -> list_min(hs[greatest(1, i - 3):i]))))
        FROM h
        """,
        [text],
    ).fetchone()[0]
    assert list(got) == want, text


# The substring-span twin's trickiest stage is the gaps-and-islands merge:
# matched gram positions (pa, pb) collapse into maximal consecutive runs
# per alignment diagonal via pa - row_number(). A bug here would be
# silently shared by the Spark side (same window shape), so this property
# pins the SQL formulation against an independent Python reference on
# random match sets — including duplicate diagonals, singleton islands,
# and adjacent-but-different-diagonal matches.
_match_pairs = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=12),
        st.integers(min_value=1, max_value=12),
    ),
    min_size=0,
    max_size=25,
    unique=True,
)


@settings(max_examples=120, deadline=None)
@given(pairs=_match_pairs)
def test_span_islands_sql_matches_python(con, pairs):
    def python_islands(ps):
        by_diag = {}
        for pa, pb in ps:
            by_diag.setdefault(pa - pb, set()).add(pa)
        runs = []
        for diag, pas in by_diag.items():
            for pa in sorted(pas):
                if pa - 1 in pas:
                    continue  # not a run start
                end = pa
                while end + 1 in pas:
                    end += 1
                runs.append((diag, pa, end, end - pa + 1))
        return sorted(runs)

    want = python_islands(set(pairs))
    if not pairs:
        assert want == []
        return
    values = ", ".join(f"({pa}, {pb})" for pa, pb in pairs)
    got = con.execute(
        f"""
        WITH m(pa, pb) AS (VALUES {values}),
        isl AS (
            SELECT pa, pa - pb AS diag,
                   pa - row_number() OVER (
                       PARTITION BY pa - pb ORDER BY pa) AS isl
            FROM m
        )
        SELECT diag, min(pa) AS a_start, max(pa) AS a_end,
               count(*) AS n
        FROM isl GROUP BY diag, isl
        ORDER BY diag, a_start
        """
    ).fetchall()
    assert [tuple(r) for r in got] == want, pairs


# ---- round-12 oracle models: the DuckDB twins vs independent pure-Python
# models over RANDOMIZED inputs. The Spark sides are value-hash-matched to
# these twins on four fixtures (+ the partitioning sweep); these tests
# close the other half of the differential: the twin itself must agree
# with a from-scratch model on inputs no fixture contains.

import datetime as _dt


def _events_duck(con, rows):
    """Register generated (event_id, user_id, event_type, ts_us, value)
    rows as the `events` table the oracles read."""
    con.execute("DROP TABLE IF EXISTS events")
    con.execute(
        "CREATE TABLE events (event_id BIGINT, user_id BIGINT, "
        "event_type VARCHAR, ts TIMESTAMP, value DOUBLE)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, ?, make_timestamp(?), ?)",
        [(i, u, t, us, v) for i, (u, t, us, v) in enumerate(rows)],
    )


_TYPES = ("click", "view", "purchase", "signup", "error")

# microseconds over a ~5-week window starting 2024-01-01
_us_range = st.integers(min_value=0, max_value=35 * 86_400_000_000)
# values as multiples of 1/64 — exact in binary, so the model's Python sum
# and DuckDB's own summation order can never disagree at the rounding grain
_val64 = st.integers(min_value=0, max_value=640_000).map(lambda i: i / 64.0)
_EPOCH_US = int(
    _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc).timestamp() * 1_000_000
)

_event_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # user
        st.sampled_from(_TYPES),
        _us_range.map(lambda d: _EPOCH_US + d),
        _val64,
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=60, deadline=None)
@given(rows=_event_rows)
def test_funnel_oracle_matches_python_model(con, rows):
    """q_funnel_conversion's twin vs a from-scratch funnel state machine:
    t_click = min click; t_view = min view ≥ t_click; t_purchase =
    min purchase ≥ t_view; counts roll up per user."""
    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles

    _events_duck(con, rows)
    got = con.execute(all_oracles()["q_funnel_conversion"]).fetchone()

    users = {u for u, _, _, _ in rows}
    t1, t2, t3 = {}, {}, {}
    for u, t, us, _ in rows:
        if t == "click":
            t1[u] = min(t1.get(u, us), us)
    for u, t, us, _ in rows:
        if t == "view" and u in t1 and us >= t1[u]:
            t2[u] = min(t2.get(u, us), us)
    for u, t, us, _ in rows:
        if t == "purchase" and u in t2 and us >= t2[u]:
            t3[u] = min(t3.get(u, us), us)
    assert tuple(got) == (len(users), len(t1), len(t2), len(t3))


@settings(max_examples=60, deadline=None)
@given(rows=_event_rows)
def test_retention_oracle_matches_python_model(con, rows):
    """q_events_retention_cohorts' twin vs a from-scratch cohort matrix
    (Monday-truncated weeks, whole-week offsets, distinct users/cell)."""
    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles

    _events_duck(con, rows)
    got = {
        (r[0], r[1]): r[2]
        for r in con.execute(
            all_oracles()["q_events_retention_cohorts"]
        ).fetchall()
    }

    def monday(us):
        d = _dt.datetime.fromtimestamp(
            us / 1_000_000, tz=_dt.timezone.utc
        ).date()
        return d - _dt.timedelta(days=d.weekday())

    weekly = {(u, monday(us)) for u, _, us, _ in rows}
    cohort = {}
    for u, wk in weekly:
        cohort[u] = min(cohort.get(u, wk), wk)
    want: dict[tuple, int] = {}
    for u, wk in weekly:
        key = (cohort[u], (wk - cohort[u]).days // 7)
        want[key] = want.get(key, 0) + 1
    assert got == want


@settings(max_examples=60, deadline=None)
@given(rows=_event_rows)
def test_histogram_oracle_matches_python_model(con, rows):
    """stat_value_histogram's twin vs a from-scratch equal-width binning
    with the same IEEE expression order (vmax==vmin pins bucket 0)."""
    from spark_ml_algo_lib_master_tongji_spark.functions.rounding import (
        round_half_up_f,
    )
    from spark_ml_algo_lib_master_tongji_spark.operators.stats import (
        HIST_NBUCKETS,
    )
    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles

    _events_duck(con, rows)
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(all_oracles()["stat_value_histogram"]).fetchall()
    }

    vals = [v for _, _, _, v in rows]
    vmin, vmax = min(vals), max(vals)
    w = (vmax - vmin) / float(HIST_NBUCKETS)
    buckets: dict[int, list] = {}
    for v in vals:
        b = (
            0
            if vmax == vmin
            else min(int(math.floor((v - vmin) / w)), HIST_NBUCKETS - 1)
        )
        buckets.setdefault(b, []).append(v)
    want = {
        b: (
            round_half_up_f(vmin + b * w, 6),
            len(vs),
            round_half_up_f(math.fsum(vs), 4),
        )
        for b, vs in buckets.items()
    }
    assert {b: (lo, n, s) for b, (lo, n, s) in got.items()} == want


@settings(max_examples=60, deadline=None)
@given(rows=_event_rows)
def test_chi_square_oracle_matches_python_model(con, rows):
    """stat_chi_square's twin vs a from-scratch chi-square on the
    (event_type × day-of-week) contingency: observed counts, expected
    = row·col/n, χ² sum, df, Cramér's V. Level alignment is part of
    the property (DuckDB dayofweek+1 = Spark dayofweek = python
    (weekday+1)%7+1). Degenerate single-level factors must yield df 0,
    χ² 0, and NULL effect size (DuckDB float x/0 is NULL, the same
    contract Spark's try_divide gives the query side)."""
    import datetime as dt

    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles

    _events_duck(con, rows)
    got = con.execute(all_oracles()["stat_chi_square"]).fetchone()
    n, r_levels, c_levels, chi2, df_chi, cramers_v = got

    epoch = dt.datetime(1970, 1, 1)
    obs: dict[tuple, int] = {}
    for _, (u, t, us, v) in enumerate(rows):
        wd = (epoch + dt.timedelta(microseconds=us)).weekday()
        key = (t, (wd + 1) % 7 + 1)  # Spark dayofweek: Sunday=1 … Sat=7
        obs[key] = obs.get(key, 0) + 1
    ra: dict[str, int] = {}
    cb: dict[int, int] = {}
    for (a, b), o in obs.items():
        ra[a] = ra.get(a, 0) + o
        cb[b] = cb.get(b, 0) + o
    total = len(rows)
    chi2_model = math.fsum(
        (o - ra[a] * cb[b] / total) ** 2 / (ra[a] * cb[b] / total)
        for (a, b), o in obs.items()
    )
    assert (n, r_levels, c_levels) == (total, len(ra), len(cb))
    assert df_chi == (len(ra) - 1) * (len(cb) - 1)
    assert abs(chi2 - chi2_model) <= 5e-4
    denom = total * min(len(ra) - 1, len(cb) - 1)
    if denom == 0:
        assert cramers_v is None and chi2 == 0.0
    else:
        assert abs(cramers_v - math.sqrt(chi2_model / denom)) <= 1e-5


@settings(max_examples=60, deadline=None)
@given(rows=_event_rows)
def test_group_distinct_oracle_matches_python_model(con, rows):
    """stat_group_distinct's twin vs a from-scratch per-(event_type,
    Monday-week) rollup: group row counts partition the events and the
    exact distinct-user counts match; the audit boolean is constant
    TRUE on the twin by construction."""
    import datetime as dt

    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles

    _events_duck(con, rows)
    got = {
        (t, wk): (ne, eu, ok)
        for t, wk, ne, eu, ok in con.execute(
            all_oracles()["stat_group_distinct"]
        ).fetchall()
    }

    epoch = dt.datetime(1970, 1, 1)
    model: dict[tuple, tuple[int, set]] = {}
    for u, t, us, v in rows:
        d = (epoch + dt.timedelta(microseconds=us)).date()
        monday = d - dt.timedelta(days=d.weekday())
        ne, users = model.get((t, monday), (0, set()))
        users.add(u)
        model[(t, monday)] = (ne + 1, users)
    assert got == {
        k: (ne, len(users), True) for k, (ne, users) in model.items()
    }
    assert sum(ne for ne, _, _ in got.values()) == len(rows)


def test_value_histogram_oracle_excludes_nulls(con):
    """The twin-side half of the round-12 ADVICE NULL fix: on a
    NULL-bearing events table the oracle's bucket counts must cover
    exactly the non-NULL rows (pre-fix, both engines agreed on binning
    NULLs into bucket NB−1, which the hash could not catch)."""
    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles

    con.execute("DROP TABLE IF EXISTS events")
    con.execute(
        "CREATE TABLE events (event_id BIGINT, user_id BIGINT, "
        "event_type VARCHAR, ts TIMESTAMP, value DOUBLE)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, 0, 'click', "
        "TIMESTAMP '2024-01-01 00:00:00', ?)",
        [(i, v) for i, v in enumerate([0.0, None, 10.0, None, 5.0, 10.0])],
    )
    rows = con.execute(all_oracles()["stat_value_histogram"]).fetchall()
    assert sum(n for _, _, n, _ in rows) == 4  # NULLs excluded
    assert abs(sum(s for _, _, _, s in rows) - 25.0) < 1e-9
    by_bucket = {b: n for b, _, n, _ in rows}
    assert by_bucket[max(by_bucket)] == 2  # only the vmax rows
