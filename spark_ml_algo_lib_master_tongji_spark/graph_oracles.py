"""DuckDB oracles for the graph engine (``operators/graph.py``).

Every graph operator runs a *fixed* number of supersteps, so its result is a
pure function of the input tables — expressible in plain SQL by unrolling
the iteration into a chain of CTEs (pr0 → pr1 → … → prK), generated here
with the same constants the Spark side imports. Integer algorithms (CC, BFS,
SSSP, LPA, k-core, triangles, SCC, closeness distances) match bit-exactly;
double-valued ones (PageRank family, modularity, clustering coefficient)
mirror the exact expression shapes (same literals, same operand order, same
coalesce defaults) and round through the shared floor formula, so the
order-of-summation noise (~1e-13) cannot flip the hash.

DuckDB typing notes applied throughout: bare ``1.0`` literals are DECIMAL
(→ cast to DOUBLE), ``sum(BIGINT)`` is HUGEINT (→ cast to BIGINT),
``/`` is float division in both engines.
"""

from __future__ import annotations

import re

from spark_ml_algo_lib_master_tongji_spark.operators.graph import (
    BFS_ROUNDS,
    CC_ITERS,
    CLOSURE_DOUBLINGS,
    DAMP,
    INF,
    KCORE_K,
    KCORE_ROUNDS,
    LPA_ITERS,
    PPR_SOURCES,
    PR_ITERS,
    RESET,
    SSSP_ROUNDS,
    TRUST_SEEDS,
)

# Co-purchase graph derivation — mirror of graph.copurchase_pairs /
# symmetrize / vertices / degrees.
PAIRS_CTES = """
pairs AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS cnt
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
),
edges AS (
    SELECT src, dst, cnt FROM pairs
    UNION ALL
    SELECT dst AS src, src AS dst, cnt FROM pairs
),
verts AS (SELECT DISTINCT src AS v FROM edges),
deg AS (
    SELECT src AS v, count(*) AS deg, sum(cnt)::BIGINT AS wdeg
    FROM edges GROUP BY 1
)
"""

#: betweenness-oracle walk-count unroll depth — must cover the nation
#: graph's diameter (guarded by an error() CTE, never silent truncation);
#: 8 keeps the intermediate walk counts < 25^8 ≈ 1.5e11, safely BIGINT.
BETW_MAX_DIAM = 8

NATION_CTES = """
tn AS (
    SELECT DISTINCT c.c_nationkey::BIGINT AS src, s.s_nationkey::BIGINT AS dst
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE c.c_nationkey <> s.s_nationkey
)
"""


def _pagerank_sql(reset_cte: str, share_expr: str, iters: int = PR_ITERS) -> str:
    ctes = [
        PAIRS_CTES.strip().rstrip(","),
        f"es AS (SELECT e.src, e.dst, {share_expr} AS share\n"
        "        FROM edges e JOIN deg d ON e.src = d.v)",
        f"reset_d AS ({reset_cte})",
        "pr0 AS (SELECT v, reset AS pr FROM reset_d)",
    ]
    for i in range(iters):
        ctes.append(
            f"""pr{i + 1} AS (
    SELECT r.v,
           r.reset + {DAMP!r} * coalesce(c.contrib, CAST(0.0 AS DOUBLE)) AS pr
    FROM reset_d r LEFT JOIN (
        SELECT es.dst AS v, sum(p.pr * es.share) AS contrib
        FROM es JOIN pr{i} p ON es.src = p.v
        GROUP BY es.dst
    ) c ON r.v = c.v
)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT v, round(pr, 6) AS pr FROM pr{iters}"
    )


_UNIFORM_RESET = (
    f"SELECT v, {RESET!r} / (SELECT count(*)::DOUBLE FROM verts) AS reset FROM verts"
)
_PPR_RESET = (
    f"SELECT v, CASE WHEN v = (SELECT min(v) FROM verts) THEN {RESET!r} "
    "ELSE CAST(0.0 AS DOUBLE) END AS reset FROM verts"
)
_TRUST_RESET = (
    f"SELECT v, CASE WHEN v IN (SELECT v FROM verts ORDER BY v LIMIT {TRUST_SEEDS}) "
    f"THEN {RESET / TRUST_SEEDS!r} ELSE CAST(0.0 AS DOUBLE) END AS reset FROM verts"
)
_UNWEIGHTED_SHARE = "CAST(1.0 AS DOUBLE) / d.deg"
_WEIGHTED_SHARE = "e.cnt / d.wdeg"


def _min_propagation_sql(
    init_expr: str, relax_expr: str, rounds: int, final_select: str
) -> str:
    """Shared unroll for CC / BFS / SSSP: state (v, x); each round
    x' = least(x, min over in-neighbors of relax_expr)."""
    ctes = [
        PAIRS_CTES.strip().rstrip(","),
        f"s0 AS (SELECT v, {init_expr} AS x FROM verts)",
    ]
    for i in range(rounds):
        ctes.append(
            f"""s{i + 1} AS (
    SELECT t.v, least(t.x, coalesce(n.m, t.x)) AS x
    FROM s{i} t LEFT JOIN (
        SELECT e.dst AS v, min({relax_expr}) AS m
        FROM edges e JOIN s{i} p ON e.src = p.v
        GROUP BY e.dst
    ) n ON t.v = n.v
)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\n{final_select.format(last=f's{rounds}')}"


def _ppr_multi_sql(n_sources: int = PPR_SOURCES, iters: int = PR_ITERS) -> str:
    """Tall unroll of the parallel-personalized power iteration (mirror of
    ``graph.ppr_multi``: source set = n_sources smallest vertex ids, reset
    mass RESET concentrated per source, same recurrence as the
    single-source oracle keyed (v, source))."""
    ctes = [
        PAIRS_CTES.strip().rstrip(","),
        f"srcs AS (SELECT v AS source FROM verts ORDER BY v LIMIT {n_sources})",
        f"es AS (SELECT e.src, e.dst, {_UNWEIGHTED_SHARE} AS share\n"
        "        FROM edges e JOIN deg d ON e.src = d.v)",
        f"""reset_d AS (
    SELECT verts.v, srcs.source,
           CASE WHEN verts.v = srcs.source THEN {RESET!r}
                ELSE CAST(0.0 AS DOUBLE) END AS reset
    FROM verts CROSS JOIN srcs
)""",
        "pr0 AS (SELECT v, source, reset AS pr FROM reset_d)",
    ]
    for i in range(iters):
        ctes.append(
            f"""pr{i + 1} AS (
    SELECT r.v, r.source,
           r.reset + {DAMP!r} * coalesce(c.contrib, CAST(0.0 AS DOUBLE)) AS pr
    FROM reset_d r LEFT JOIN (
        SELECT es.dst AS v, p.source, sum(p.pr * es.share) AS contrib
        FROM es JOIN pr{i} p ON es.src = p.v
        GROUP BY es.dst, p.source
    ) c ON r.v = c.v AND r.source = c.source
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v, source, round(pr, 6) AS pr FROM pr{iters}"
    )


def _mssp_sql(n_sources: int = TRUST_SEEDS, rounds: int = SSSP_ROUNDS) -> str:
    """Tall unroll of the multi-landmark hop relaxation (mirror of
    ``graph.mssp``: seed set = n_sources smallest vertex ids, +1 per hop,
    unreachable rows filtered). The SQL state is (v, landmark) tall — the
    Spark side's per-landmark columns are just the pivoted layout of the
    same recurrence, so the final flattened rows agree bit-for-bit."""
    ctes = [
        PAIRS_CTES.strip().rstrip(","),
        f"lms AS (SELECT v AS landmark FROM verts ORDER BY v LIMIT {n_sources})",
        f"""s0 AS (
    SELECT verts.v, lms.landmark,
           CASE WHEN verts.v = lms.landmark THEN 0 ELSE {INF} END::BIGINT AS x
    FROM verts CROSS JOIN lms
)""",
    ]
    for i in range(rounds):
        ctes.append(
            f"""s{i + 1} AS (
    SELECT t.v, t.landmark, least(t.x, coalesce(n.m, t.x)) AS x
    FROM s{i} t LEFT JOIN (
        SELECT e.dst AS v, p.landmark, min(p.x + 1) AS m
        FROM edges e JOIN s{i} p ON e.src = p.v
        GROUP BY e.dst, p.landmark
    ) n ON t.v = n.v AND t.landmark = n.landmark
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT v, landmark, x AS dist FROM s{rounds} WHERE x < {INF}"
    )


def _lpa_sql(iters: int = LPA_ITERS) -> str:
    ctes = [
        PAIRS_CTES.strip().rstrip(","),
        "l0 AS (SELECT v, v AS label FROM verts)",
    ]
    for i in range(iters):
        ctes.append(
            f"""l{i + 1} AS (
    SELECT v, label FROM (
        SELECT e.dst AS v, p.label, count(*) AS c,
               row_number() OVER (PARTITION BY e.dst
                                  ORDER BY count(*) DESC, p.label ASC) AS rn
        FROM edges e JOIN l{i} p ON e.src = p.v
        GROUP BY e.dst, p.label
    ) WHERE rn = 1
)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT v, label FROM l{iters}"


def _kcore_sql(k: int = KCORE_K, rounds: int = KCORE_ROUNDS) -> str:
    ctes = [
        PAIRS_CTES.strip().rstrip(","),
        "a0 AS (SELECT v FROM verts)",
    ]
    for i in range(rounds):
        ctes.append(
            f"""a{i + 1} AS (
    SELECT e.src AS v
    FROM edges e
    JOIN a{i} s ON e.src = s.v
    JOIN a{i} t ON e.dst = t.v
    GROUP BY e.src
    HAVING count(*) >= {k}
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT e.src AS v, count(*) AS deg
FROM edges e
JOIN a{rounds} s ON e.src = s.v
JOIN a{rounds} t ON e.dst = t.v
GROUP BY e.src"""
    )


_TRIANGLE_CTES = """
tri AS (
    SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
    FROM pairs e1
    JOIN pairs e2 ON e1.dst = e2.src
    JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
pertri AS (
    SELECT a AS v FROM tri
    UNION ALL SELECT b AS v FROM tri
    UNION ALL SELECT c AS v FROM tri
),
tcount AS (
    SELECT t.v, coalesce(p.t, 0) AS triangles
    FROM verts t LEFT JOIN (SELECT v, count(*) AS t FROM pertri GROUP BY v) p
      ON t.v = p.v
)
"""


def _closure_ctes(doublings: int = CLOSURE_DOUBLINGS) -> str:
    """Transitive closure of tn by repeated squaring: r{i} covers paths of
    ≤ 2^i edges."""
    out = ["r0 AS (SELECT src, dst FROM tn)"]
    for i in range(doublings):
        out.append(
            f"""r{i + 1} AS (
    SELECT DISTINCT src, dst FROM (
        SELECT src, dst FROM r{i}
        UNION ALL
        SELECT a.src, b.dst FROM r{i} a JOIN r{i} b ON a.dst = b.src
    )
)"""
        )
    return ",\n".join(out)


def _dist_closure_ctes(doublings: int = CLOSURE_DOUBLINGS) -> str:
    """Min-plus closure: d{i}(u,v) = shortest path using ≤ 2^i edges."""
    out = ["d0 AS (SELECT src, dst, CAST(1 AS BIGINT) AS dist FROM tn)"]
    for i in range(doublings):
        out.append(
            f"""d{i + 1} AS (
    SELECT src, dst, min(dist) AS dist FROM (
        SELECT src, dst, dist FROM d{i}
        UNION ALL
        SELECT a.src, b.dst, a.dist + b.dist AS dist
        FROM d{i} a JOIN d{i} b ON a.dst = b.src
    ) GROUP BY src, dst
)"""
        )
    return ",\n".join(out)


def _materialize(sql: str) -> str:
    """Force ``AS MATERIALIZED`` on every CTE. DuckDB inlines CTEs by
    default; an iterative CTE referenced twice per round (the state appears
    in both the outer row set and the neighbor-aggregate subquery) would be
    expanded 2^rounds times — materialization keeps the unrolled plan
    linear in the round count."""
    return re.sub(r"(\b\w+ AS) \(", r"\1 MATERIALIZED (", sql)


def build_graph_oracles() -> dict[str, str]:
    o: dict[str, str] = {}

    o["graph_edges"] = f"WITH {PAIRS_CTES.strip().rstrip(',')} SELECT src, dst, cnt FROM pairs"

    o["graph_degrees"] = (
        f"WITH {PAIRS_CTES.strip().rstrip(',')} SELECT v, deg, wdeg FROM deg"
    )

    o["graph_pagerank"] = _pagerank_sql(_UNIFORM_RESET, _UNWEIGHTED_SHARE)
    o["graph_pagerank_personalized"] = _pagerank_sql(_PPR_RESET, _UNWEIGHTED_SHARE)
    o["graph_pagerank_weighted"] = _pagerank_sql(_UNIFORM_RESET, _WEIGHTED_SHARE)
    o["graph_trustrank"] = _pagerank_sql(_TRUST_RESET, _UNWEIGHTED_SHARE)

    o["graph_connected_components"] = _min_propagation_sql(
        "v",
        "p.x",
        CC_ITERS,
        "SELECT v, x AS label FROM {last}",
    )
    o["graph_bfs"] = _min_propagation_sql(
        f"CASE WHEN v = (SELECT min(v) FROM verts) THEN 0 ELSE {INF} END::BIGINT",
        "p.x + 1",
        BFS_ROUNDS,
        f"SELECT v, x AS dist FROM {{last}} WHERE x < {INF}",
    )
    o["graph_sssp"] = _min_propagation_sql(
        f"CASE WHEN v = (SELECT min(v) FROM verts) THEN 0 ELSE {INF} END::BIGINT",
        "p.x + e.cnt",
        SSSP_ROUNDS,
        f"SELECT v, x AS dist FROM {{last}} WHERE x < {INF}",
    )

    o["graph_mssp"] = _mssp_sql()
    o["graph_ppr_multi"] = _ppr_multi_sql()

    o["graph_label_propagation"] = _lpa_sql()
    o["graph_kcore"] = _kcore_sql()

    o["graph_triangle_count"] = (
        f"WITH {PAIRS_CTES.strip().rstrip(',')}, {_TRIANGLE_CTES.strip()} "
        "SELECT v, triangles FROM tcount"
    )

    o["graph_clustering_coefficient"] = (
        f"WITH {PAIRS_CTES.strip().rstrip(',')}, {_TRIANGLE_CTES.strip()} "
        """
SELECT t.v,
       round(CASE WHEN d.deg < 2 THEN CAST(0.0 AS DOUBLE)
                  ELSE CAST(2.0 AS DOUBLE) * t.triangles
                       / (d.deg * (d.deg - CAST(1.0 AS DOUBLE)))
             END, 6) AS lcc
FROM tcount t JOIN deg d ON t.v = d.v"""
    )

    # Modularity of the LPA communities: Q = Σ_c [L_c/m − (D_c/2m)²].
    lpa = _lpa_sql()
    lpa_ctes = lpa[len("WITH ") : lpa.rindex("\nSELECT")]
    o["graph_modularity"] = (
        "WITH "
        + lpa_ctes
        + f""",
lab AS (SELECT v, label FROM l{LPA_ITERS}),
m AS (SELECT count(*)::DOUBLE AS m FROM pairs),
intra AS (
    SELECT ls.label, count(*) AS lc
    FROM pairs p
    JOIN lab ls ON p.src = ls.v
    JOIN lab ld ON p.dst = ld.v
    WHERE ls.label = ld.label
    GROUP BY ls.label
),
degc AS (
    SELECT l.label, sum(d.deg)::BIGINT AS dc
    FROM deg d JOIN lab l ON d.v = l.v
    GROUP BY l.label
),
perc AS (
    SELECT coalesce(i.lc, 0) / (SELECT m FROM m)
           - (dc / (CAST(2.0 AS DOUBLE) * (SELECT m FROM m)))
             * (dc / (CAST(2.0 AS DOUBLE) * (SELECT m FROM m))) AS q
    FROM degc g LEFT JOIN intra i ON g.label = i.label
)
SELECT round(sum(q), 6) AS modularity FROM perc"""
    )

    o["graph_degrees_nation"] = (
        f"WITH {NATION_CTES.strip()} "
        """
SELECT coalesce(o.v, i.v) AS v,
       coalesce(o.out_deg, 0) AS out_deg,
       coalesce(i.in_deg, 0) AS in_deg
FROM (SELECT src AS v, count(*) AS out_deg FROM tn GROUP BY 1) o
FULL JOIN (SELECT dst AS v, count(*) AS in_deg FROM tn GROUP BY 1) i
  ON o.v = i.v"""
    )

    o["graph_scc_nation"] = (
        f"WITH {NATION_CTES.strip()},\n{_closure_ctes()},"
        + f"""
nverts AS (SELECT src AS v FROM tn UNION SELECT dst AS v FROM tn),
mutual AS (
    SELECT f.src AS u, f.dst AS v
    FROM r{CLOSURE_DOUBLINGS} f JOIN r{CLOSURE_DOUBLINGS} b
      ON f.src = b.dst AND f.dst = b.src
),
ml AS (SELECT v, min(u) AS mu FROM mutual GROUP BY v)
SELECT t.v, least(t.v, coalesce(m.mu, t.v)) AS label
FROM nverts t LEFT JOIN ml m ON t.v = m.v"""
    )

    o["graph_closeness_nation"] = (
        f"WITH {NATION_CTES.strip()},\n{_dist_closure_ctes()}"
        + f"""
SELECT src AS v,
       round(count(*) / CAST(sum(dist)::BIGINT AS DOUBLE), 6) AS closeness
FROM d{CLOSURE_DOUBLINGS}
WHERE src <> dst
GROUP BY src"""
    )

    # Exact directed betweenness by PAIR COUNTING — an algebraically
    # different formulation from the operator's Brandes accumulation:
    # BC(v) = Σ_{s≠v≠t, d(s,v)+d(v,t)=d(s,t)} σ_sv·σ_vt/σ_st, with σ read
    # from length-L walk counts at L = d(s,t) (a minimal-length walk cannot
    # revisit a vertex, so walk counts at the shortest distance ARE
    # shortest-path counts). Unrolled to BETW_MAX_DIAM; the chk CTE errors
    # loudly if the graph's diameter ever exceeds the unroll instead of
    # silently dropping pairs.
    sig_unroll = BETW_MAX_DIAM  # walk counts at this length stay < 25^8
    walk_ctes = ["w1 AS (SELECT src, dst, CAST(1 AS BIGINT) AS n FROM tn)"]
    for i in range(1, sig_unroll):
        walk_ctes.append(
            f"""w{i + 1} AS (
    SELECT a.src, b.dst, CAST(sum(a.n) AS BIGINT) AS n
    FROM w{i} a JOIN tn b ON a.dst = b.src
    GROUP BY a.src, b.dst
)"""
        )
    allw = "\nUNION ALL\n".join(
        f"SELECT src, dst, {L} AS len, n FROM w{L}" for L in range(1, sig_unroll + 1)
    )
    o["graph_betweenness"] = (
        f"WITH {NATION_CTES.strip()},\n{_dist_closure_ctes()},\n"
        + ",\n".join(walk_ctes)
        + f""",
allw AS ({allw}),
chk AS (
    SELECT CASE WHEN max(dist) > {sig_unroll}
                THEN CAST(error('betweenness unroll shorter than diameter') AS BIGINT)
                ELSE 0 END AS ok
    FROM d{CLOSURE_DOUBLINGS}
),
sig AS (
    SELECT d.src, d.dst, d.dist, w.n AS sigma
    FROM d{CLOSURE_DOUBLINGS} d
    JOIN allw w ON w.src = d.src AND w.dst = d.dst AND w.len = d.dist
),
bc AS (
    SELECT sv.dst AS v,
           sum(CAST(sv.sigma AS DOUBLE) * vt.sigma / st.sigma) AS b
    FROM sig sv
    JOIN sig vt ON sv.dst = vt.src
    JOIN sig st ON st.src = sv.src AND st.dst = vt.dst
    WHERE sv.src <> sv.dst AND vt.src <> vt.dst AND sv.src <> vt.dst
      AND sv.dist + vt.dist = st.dist
    GROUP BY sv.dst
),
nodes AS (
    SELECT DISTINCT v FROM (
        SELECT src AS v FROM tn UNION ALL SELECT dst FROM tn
    )
)
SELECT n.v, round(coalesce(b.b, CAST(0.0 AS DOUBLE)), 6) AS betweenness
FROM nodes n LEFT JOIN bc b ON n.v = b.v CROSS JOIN chk
WHERE chk.ok = 0"""
    )

    o["graph_subgraph_matching"] = (
        f"WITH {PAIRS_CTES.strip().rstrip(',')},\n"
        + """
tri AS (
    SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
    FROM pairs e1
    JOIN pairs e2 ON e1.dst = e2.src
    JOIN pairs e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
common AS (
    SELECT s1.dst AS u, s2.dst AS w, count(*) AS k
    FROM edges s1 JOIN edges s2 ON s1.src = s2.src
    WHERE s1.dst < s2.dst
    GROUP BY s1.dst, s2.dst
)
SELECT 'triangle' AS template, (SELECT count(*) FROM tri)::BIGINT AS matches
UNION ALL
SELECT 'four_cycle' AS template,
       (SELECT CAST(sum(k * (k - 1) / 2) / 2 AS BIGINT) FROM common) AS matches"""
    )

    o.update(_build_graph_extra_oracles())
    return {k: _materialize(v) for k, v in o.items()}


# ---- graph_extra oracles ---------------------------------------------------


def _pr_round_ctes(
    prefix: str, es: str, reset_d: str, start: str, n: int
) -> tuple[list[str], str]:
    """Unrolled PageRank rounds reading edge-shares from ``es`` and the
    per-vertex reset column from ``reset_d``, starting at CTE ``start``."""
    ctes = []
    cur = start
    for i in range(n):
        nxt = f"{prefix}{i + 1}"
        ctes.append(
            f"""{nxt} AS (
    SELECT r.v,
           r.reset + {DAMP!r} * coalesce(c.contrib, CAST(0.0 AS DOUBLE)) AS pr
    FROM {reset_d} r LEFT JOIN (
        SELECT {es}.dst AS v, sum(p.pr * {es}.share) AS contrib
        FROM {es} JOIN {cur} p ON {es}.src = p.v
        GROUP BY {es}.dst
    ) c ON r.v = c.v
)"""
        )
        cur = nxt
    return ctes, cur


def _build_graph_extra_oracles() -> dict[str, str]:
    from spark_ml_algo_lib_master_tongji_spark.operators.graph_extra import (
        BETW_OVERLAP_K,
        BETW_OVERLAP_TARGET_V,
        CLIQUE_MIN_W,
        H_A,
        H_B,
        H_C,
        INC_CUTOFF,
        INC_ITERS,
        LOUVAIN_L2_ROUNDS,
        LOUVAIN_ROUNDS,
        N2V_W_FAR,
        N2V_W_NEAR,
        N2V_W_RETURN,
        RATE_MAX,
        RATE_MIN,
        WALK_LEN,
        WALKS_PER_NODE,
        WCE_ROUNDS,
    )

    o: dict[str, str] = {}

    # Sampled-betweenness accuracy anchor (graph_extra.
    # graph_betweenness_overlap): the corpus-scaled audit modulus
    # (max(1, |V| // TARGET), graph_extra._betw_overlap_mod — integer
    # floor division on both engines) and the subgraph vertex/edge counts
    # and k are recomputed from the co-purchase derivation; the measured
    # top-k overlap vs the exact (all-sources) arm rides in the boolean
    # the twin asserts TRUE.
    o["graph_betweenness_overlap"] = f"""
WITH pairs_full AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
),
md AS (
    SELECT greatest(1, (SELECT CAST(count(DISTINCT v) AS BIGINT)
        FROM (SELECT src AS v FROM pairs_full
              UNION ALL SELECT dst FROM pairs_full))
        // {BETW_OVERLAP_TARGET_V}) AS m
),
sub AS (
    SELECT src, dst FROM pairs_full, md
    WHERE src % md.m = 0 AND dst % md.m = 0
),
nv AS (
    SELECT CAST(count(DISTINCT v) AS BIGINT) AS n_verts
    FROM (SELECT src AS v FROM sub UNION ALL SELECT dst FROM sub)
)
SELECT nv.n_verts,
       (SELECT CAST(count(*) AS BIGINT) FROM sub) AS n_edges,
       CAST(least({BETW_OVERLAP_K}, nv.n_verts) AS INT) AS k,
       TRUE AS overlap_ok
FROM nv
"""

    # -- incremental pagerank: prior snapshot PR → warm-started full PR
    prior_ctes = f"""
pairsp AS (
    SELECT a.l_partkey AS src, b.l_partkey AS dst, count(*) AS cnt
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    WHERE a.l_shipdate < TIMESTAMP '{INC_CUTOFF}'
      AND b.l_shipdate < TIMESTAMP '{INC_CUTOFF}'
    GROUP BY 1, 2
),
edgesp AS (SELECT src, dst, cnt FROM pairsp
           UNION ALL SELECT dst AS src, src AS dst, cnt FROM pairsp),
vertsp AS (SELECT DISTINCT src AS v FROM edgesp),
degp AS (SELECT src AS v, count(*) AS deg FROM edgesp GROUP BY 1),
esp AS (SELECT e.src, e.dst, CAST(1.0 AS DOUBLE) / d.deg AS share
        FROM edgesp e JOIN degp d ON e.src = d.v),
resetp AS (SELECT v, {RESET!r} / (SELECT count(*)::DOUBLE FROM vertsp) AS reset
           FROM vertsp),
pp0 AS (SELECT v, reset AS pr FROM resetp)"""
    prior_rounds, prior_last = _pr_round_ctes("pp", "esp", "resetp", "pp0", PR_ITERS)

    full_ctes = f"""esf AS (SELECT e.src, e.dst, CAST(1.0 AS DOUBLE) / d.deg AS share
       FROM edges e JOIN deg d ON e.src = d.v),
resetf AS (SELECT v, {RESET!r} / (SELECT count(*)::DOUBLE FROM verts) AS reset
           FROM verts),
fi0 AS (
    SELECT fv.v,
           coalesce(pp.pr, {RESET!r} / (SELECT count(*)::DOUBLE FROM verts)) AS pr
    FROM verts fv LEFT JOIN {prior_last} pp ON fv.v = pp.v
)"""
    inc_rounds, inc_last = _pr_round_ctes("fi", "esf", "resetf", "fi0", INC_ITERS)

    o["graph_incremental_pagerank"] = (
        "WITH "
        + ",\n".join(
            [PAIRS_CTES.strip(), prior_ctes.strip()]
            + prior_rounds
            + [full_ctes.strip()]
            + inc_rounds
        )
        + f"\nSELECT v, round(pr, 6) AS pr FROM {inc_last}"
    )

    # -- cycle detection with rate constraints on the weighted nation graph
    rmin = f"CAST({RATE_MIN!r} AS DOUBLE)"
    rmax = f"CAST({RATE_MAX!r} AS DOUBLE)"

    def rate(wa: str, wb: str) -> str:
        return f"({wb} / {wa} >= {rmin} AND {wb} / {wa} <= {rmax})"

    o["graph_cycle_detection"] = f"""
WITH ew AS (
    SELECT c.c_nationkey::BIGINT AS src, s.s_nationkey::BIGINT AS dst,
           count(*) AS w
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE c.c_nationkey <> s.s_nationkey
    GROUP BY 1, 2
),
c3 AS (
    SELECT CAST(e1.src AS VARCHAR) || '->' || CAST(e1.dst AS VARCHAR)
           || '->' || CAST(e2.dst AS VARCHAR) AS cycle, 3 AS len
    FROM ew e1
    JOIN ew e2 ON e1.dst = e2.src
    JOIN ew e3 ON e2.dst = e3.src AND e3.dst = e1.src
    WHERE e1.src < e1.dst AND e1.src < e2.dst
      AND {rate('e1.w', 'e2.w')} AND {rate('e2.w', 'e3.w')}
      AND {rate('e3.w', 'e1.w')}
),
c4 AS (
    SELECT CAST(e1.src AS VARCHAR) || '->' || CAST(e1.dst AS VARCHAR)
           || '->' || CAST(e2.dst AS VARCHAR)
           || '->' || CAST(e3.dst AS VARCHAR) AS cycle, 4 AS len
    FROM ew e1
    JOIN ew e2 ON e1.dst = e2.src
    JOIN ew e3 ON e2.dst = e3.src
    JOIN ew e4 ON e3.dst = e4.src AND e4.dst = e1.src
    WHERE e1.src < e1.dst AND e1.src < e2.dst AND e1.src < e3.dst
      AND e1.dst <> e3.dst
      AND {rate('e1.w', 'e2.w')} AND {rate('e2.w', 'e3.w')}
      AND {rate('e3.w', 'e4.w')} AND {rate('e4.w', 'e1.w')}
)
SELECT cycle, len FROM c3 UNION ALL SELECT cycle, len FROM c4"""

    # -- maximal cliques (size 2-4) on the strong subgraph
    o["graph_maximal_cliques"] = f"""
WITH {PAIRS_CTES.strip()},
p2 AS (SELECT src, dst FROM pairs WHERE cnt >= {CLIQUE_MIN_W}),
sym2 AS (SELECT src, dst FROM p2 UNION ALL SELECT dst AS src, src AS dst FROM p2),
tri AS (
    SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
    FROM p2 e1 JOIN p2 e2 ON e1.dst = e2.src
    JOIN p2 e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
tri_edges AS (
    SELECT DISTINCT src, dst FROM (
        SELECT a AS src, b AS dst FROM tri
        UNION ALL SELECT b AS src, c AS dst FROM tri
        UNION ALL SELECT a AS src, c AS dst FROM tri
    )
),
max2 AS (
    SELECT CAST(src AS VARCHAR) || '-' || CAST(dst AS VARCHAR) AS clique,
           2 AS size
    FROM p2 ANTI JOIN tri_edges USING (src, dst)
),
tri_ext AS (
    SELECT DISTINCT t.a, t.b, t.c
    FROM tri t
    JOIN sym2 sa ON t.a = sa.src
    JOIN sym2 sb ON t.b = sb.src AND sb.dst = sa.dst
    JOIN sym2 sc ON t.c = sc.src AND sc.dst = sa.dst
),
max3 AS (
    SELECT CAST(a AS VARCHAR) || '-' || CAST(b AS VARCHAR)
           || '-' || CAST(c AS VARCHAR) AS clique, 3 AS size
    FROM tri ANTI JOIN tri_ext USING (a, b, c)
),
k4 AS (
    SELECT t.a, t.b, t.c, p1.dst AS d
    FROM tri t
    JOIN p2 p1 ON t.c = p1.src
    JOIN p2 pa ON pa.src = t.a AND pa.dst = p1.dst
    JOIN p2 pb ON pb.src = t.b AND pb.dst = p1.dst
),
k4_ext AS (
    SELECT DISTINCT t.a, t.b, t.c, t.d
    FROM k4 t
    JOIN sym2 sa ON t.a = sa.src
    JOIN sym2 sb ON t.b = sb.src AND sb.dst = sa.dst
    JOIN sym2 sc ON t.c = sc.src AND sc.dst = sa.dst
    JOIN sym2 sd ON t.d = sd.src AND sd.dst = sa.dst
),
max4 AS (
    SELECT CAST(a AS VARCHAR) || '-' || CAST(b AS VARCHAR)
           || '-' || CAST(c AS VARCHAR) || '-' || CAST(d AS VARCHAR) AS clique,
           4 AS size
    FROM k4 ANTI JOIN k4_ext USING (a, b, c, d)
)
SELECT clique, size FROM max2
UNION ALL SELECT clique, size FROM max3
UNION ALL SELECT clique, size FROM max4"""

    # -- weak cliques: min-label components of the strong subgraph
    wce_ctes = [
        PAIRS_CTES.strip(),
        f"p2 AS (SELECT src, dst FROM pairs WHERE cnt >= {CLIQUE_MIN_W})",
        "sym2 AS (SELECT src, dst FROM p2 UNION ALL "
        "SELECT dst AS src, src AS dst FROM p2)",
        "w0 AS (SELECT DISTINCT src AS v, src AS wce_id FROM sym2)",
    ]
    for i in range(WCE_ROUNDS):
        wce_ctes.append(
            f"""w{i + 1} AS (
    SELECT t.v, least(t.wce_id, coalesce(m.m, t.wce_id)) AS wce_id
    FROM w{i} t LEFT JOIN (
        SELECT s.dst AS v, min(p.wce_id) AS m
        FROM sym2 s JOIN w{i} p ON s.src = p.v
        GROUP BY s.dst
    ) m ON t.v = m.v
)"""
        )
    o["graph_weak_cliques"] = (
        "WITH "
        + ",\n".join(wce_ctes)
        + f"\nSELECT v, wce_id FROM w{WCE_ROUNDS}"
    )

    # -- Louvain: local-move rounds (mirror of _louvain_local_move; k_v,c
    # excludes self-loops, wdeg/Σtot include them), one level per edge CTE
    def _louvain_level(
        edges_cte: str, pfx: str, rounds: int = LOUVAIN_ROUNDS
    ) -> list[str]:
        ctes = [
            f"{pfx}wdeg AS (SELECT src AS v, sum(cnt)::BIGINT AS wv "
            f"FROM {edges_cte} GROUP BY src)",
            f"{pfx}lv0 AS (SELECT v, v AS label FROM {pfx}wdeg)",
        ]
        for i in range(rounds):
            ctes.append(
                f"""{pfx}kvc{i} AS (
    SELECT e.src AS v, lb.label AS c, sum(e.cnt)::BIGINT AS k
    FROM {edges_cte} e JOIN {pfx}lv{i} lb ON e.dst = lb.v
    WHERE e.src <> e.dst
    GROUP BY e.src, lb.label
)"""
            )
            ctes.append(
                f"""{pfx}cand{i} AS (
    SELECT v, c, max(k) AS k FROM (
        SELECT v, c, k FROM {pfx}kvc{i}
        UNION ALL
        SELECT v, label AS c, CAST(0 AS BIGINT) AS k FROM {pfx}lv{i}
    ) GROUP BY v, c
)"""
            )
            ctes.append(
                f"""{pfx}sig{i} AS (
    SELECT lb.label AS c, sum(w.wv)::BIGINT AS stot
    FROM {pfx}lv{i} lb JOIN {pfx}wdeg w ON lb.v = w.v
    GROUP BY lb.label
)"""
            )
            ctes.append(
                f"""{pfx}sc{i} AS (
    SELECT cand.v, cand.c,
           round(cand.k - w.wv
                 * (s.stot - CASE WHEN lb.label = cand.c THEN w.wv ELSE 0 END)
                 / (SELECT tm FROM tm), 9) AS score
    FROM {pfx}cand{i} cand
    JOIN {pfx}sig{i} s ON cand.c = s.c
    JOIN {pfx}wdeg w ON cand.v = w.v
    JOIN {pfx}lv{i} lb ON cand.v = lb.v
)"""
            )
            ctes.append(
                f"""{pfx}lv{i + 1} AS (
    SELECT v, c AS label FROM (
        SELECT v, c,
               row_number() OVER (PARTITION BY v
                                  ORDER BY score DESC, c ASC) AS rn
        FROM {pfx}sc{i}
    ) WHERE rn = 1
)"""
            )
        return ctes

    # Unweighted modularity of a (v, label) CTE — mirror of
    # graph.modularity (m = |pairs|, deg from the sym edge list).
    def _q_cte(lab_cte: str, name: str) -> str:
        return f"""{name} AS (
    SELECT round(sum(
        coalesce(i.lc, 0) / (SELECT count(*)::DOUBLE FROM pairs)
        - (d.dc / (2.0 * (SELECT count(*)::DOUBLE FROM pairs)))
          * (d.dc / (2.0 * (SELECT count(*)::DOUBLE FROM pairs)))
    ), 6) AS q
    FROM (
        SELECT l.label, sum(g.deg)::BIGINT AS dc
        FROM deg g JOIN {lab_cte} l ON g.v = l.v
        GROUP BY l.label
    ) d LEFT JOIN (
        SELECT ls.label, count(*) AS lc
        FROM pairs p
        JOIN {lab_cte} ls ON p.src = ls.v
        JOIN {lab_cte} ld ON p.dst = ld.v
        WHERE ls.label = ld.label
        GROUP BY ls.label
    ) i ON d.label = i.label
)"""

    lv_ctes = [
        PAIRS_CTES.strip(),
        "tm AS (SELECT sum(cnt)::DOUBLE AS tm FROM edges)",
        *_louvain_level("edges", ""),
        f"""coarse AS (
    SELECT la.label AS src, lb.label AS dst, sum(e.cnt)::BIGINT AS cnt
    FROM edges e
    JOIN lv{LOUVAIN_ROUNDS} la ON e.src = la.v
    JOIN lv{LOUVAIN_ROUNDS} lb ON e.dst = lb.v
    GROUP BY la.label, lb.label
)""",
        *_louvain_level("coarse", "g2", LOUVAIN_L2_ROUNDS),
        f"""comp AS (
    SELECT l1.v, l1.label AS c1, l2.label AS c2
    FROM lv{LOUVAIN_ROUNDS} l1 JOIN g2lv{LOUVAIN_L2_ROUNDS} l2 ON l1.label = l2.v
)""",
        _q_cte(f"lv{LOUVAIN_ROUNDS}", "q1"),
        "compl AS (SELECT v, c2 AS label FROM comp)",
        _q_cte("compl", "q2"),
    ]
    # The coarse level is accepted only when it improves rounded Q —
    # mirror of the accept-if-improves rule in graph_extra.louvain.
    o["graph_louvain"] = (
        "WITH "
        + ",\n".join(lv_ctes)
        + """
SELECT v, CASE WHEN (SELECT q FROM q2) > (SELECT q FROM q1)
               THEN c2 ELSE c1 END AS community
FROM comp"""
    )

    # -- node2vec deterministic walks
    nv_ctes = [
        PAIRS_CTES.strip(),
        "adj AS (SELECT src AS v, list(dst ORDER BY dst) AS nbrs "
        "FROM edges GROUP BY src)",
        f"""nv0 AS (
    SELECT a.v * 10 + t.w AS walk_id, t.w, 0 AS step, a.v AS node
    FROM adj a CROSS JOIN
         (SELECT UNNEST(generate_series(0, {WALKS_PER_NODE - 1})) AS w) t
)""",
    ]
    for t in range(1, WALK_LEN + 1):
        nv_ctes.append(
            f"""nv{t} AS (
    SELECT s.walk_id, s.w, {t} AS step,
           a.nbrs[((s.node * {H_A} + {t} * {H_B} + s.w * {H_C})
                   % len(a.nbrs)) + 1] AS node
    FROM nv{t - 1} s JOIN adj a ON s.node = a.v
)"""
        )
    o["graph_node2vec_walks"] = (
        "WITH "
        + ",\n".join(nv_ctes)
        + "\nSELECT walk_id, step, node FROM ("
        + " UNION ALL ".join(
            f"SELECT walk_id, step, node FROM nv{t}" for t in range(WALK_LEN + 1)
        )
        + ")"
    )
    # Word2Vec surface row (graph_node2vec_embeddings): with minCount=1 the
    # fitted vocab is exactly the distinct walk nodes, so the (n_nodes, dim)
    # summary is SQL-derivable from the deterministic walk corpus; the
    # embedding VALUES keep their pytest (stochastic gradient fit).
    o["graph_node2vec_embeddings"] = (
        "SELECT count(DISTINCT node) AS n_nodes, 16 AS dim FROM ("
        + o["graph_node2vec_walks"]
        + ")"
    )

    # -- node2vec biased walks: inverse-CDF pick over integer 2nd-order
    # weights (mirror of graph_extra.node2vec_biased_walks; step 1 uniform)
    bw_ctes = [
        PAIRS_CTES.strip(),
        "adj AS (SELECT src AS v, list(dst ORDER BY dst) AS nbrs "
        "FROM edges GROUP BY src)",
        f"""bw0 AS (
    SELECT a.v * 10 + t.w AS walk_id, t.w, 0 AS step,
           CAST(NULL AS BIGINT) AS prev, a.v AS node
    FROM adj a CROSS JOIN
         (SELECT UNNEST(generate_series(0, {WALKS_PER_NODE - 1})) AS w) t
)""",
        f"""bw1 AS (
    SELECT s.walk_id, s.w, 1 AS step, s.node AS prev,
           a.nbrs[((s.node * {H_A} + 1 * {H_B} + s.w * {H_C})
                   % len(a.nbrs)) + 1] AS node
    FROM bw0 s JOIN adj a ON s.node = a.v
)""",
    ]
    for t in range(2, WALK_LEN + 1):
        bw_ctes.append(
            f"""bwex{t} AS (
    SELECT s.walk_id, s.w, s.node, s.prev,
           generate_subscripts(a.nbrs, 1) AS ord,
           unnest(a.nbrs) AS cand,
           p.nbrs AS pnbrs
    FROM bw{t - 1} s
    JOIN adj a ON s.node = a.v
    JOIN adj p ON s.prev = p.v
)"""
        )
        bw_ctes.append(
            f"""bww{t} AS (
    SELECT walk_id, w, node, ord, cand,
           CASE WHEN cand = prev THEN {N2V_W_RETURN}
                WHEN list_contains(pnbrs, cand) THEN {N2V_W_NEAR}
                ELSE {N2V_W_FAR} END::BIGINT AS wt
    FROM bwex{t}
)"""
        )
        bw_ctes.append(
            f"""bw{t} AS (
    SELECT walk_id, w, {t} AS step, node AS prev, cand AS node FROM (
        SELECT walk_id, w, node, cand,
               row_number() OVER (PARTITION BY walk_id ORDER BY ord) AS rn
        FROM (
            SELECT *,
                   sum(wt) OVER (PARTITION BY walk_id ORDER BY ord) AS cum,
                   sum(wt) OVER (PARTITION BY walk_id) AS tot
            FROM bww{t}
        ) WHERE cum > (node * {H_A} + {t} * {H_B} + w * {H_C}) % tot
    ) WHERE rn = 1
)"""
        )
    o["graph_node2vec_biased_walks"] = (
        "WITH "
        + ",\n".join(bw_ctes)
        + "\nSELECT walk_id, step, node FROM ("
        + " UNION ALL ".join(
            f"SELECT walk_id, step, node FROM bw{t}" for t in range(WALK_LEN + 1)
        )
        + ")"
    )

    return o
