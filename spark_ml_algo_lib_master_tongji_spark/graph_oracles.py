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

    return {k: _materialize(v) for k, v in o.items()}
