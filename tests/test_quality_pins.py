"""Model-quality regression pins (round-6 verdict item 7).

bench.py records evaluation scalars (accuracy/rmse/wssse/modularity/recall)
in ``report/bench_*.yml``; every value is a pure function of (code, data,
seed), so at the standard bench input (sf0.1) each one is pinned here at
the reference's scalar tolerance — rel-err ≤ 0.005 (``Utils.scala:176``).
A quality regression now fails CI instead of waiting for a human to diff
BENCH artifacts round-over-round.

The test reads the NEWEST sf0.1 bench report; keys the report predates
(scalars added after that bench ran) are skipped with a note — the next
bench run arms them.
"""

from __future__ import annotations

from pathlib import Path

import pytest

REPORT_DIR = Path(__file__).resolve().parent.parent / "report"

#: scalar → expected value at sf0.1 (from the round-6/7 bench runs).
#: Tolerance is the reference's scalar rule: |got − want| ≤ 0.005·|want|
#: (``Utils.scala:176-183``), with an absolute floor for near-zero values.
EXPECTED_SF01 = {
    "ml_linreg_ols.rmse": 30047.7841,
    "graph_modularity.modularity": 0.002501,
    "ml_est_kmeans.wssse": 1898.08,
    "ml_est_lda.log_likelihood": -412970.44,
    "ml_est_lda.log_perplexity": 3.553,
    "ml_est_logreg.accuracy": 0.1885,
    "ml_est_gbt_classifier.accuracy": 0.9175,
    "ml_est_linreg.rmse": 30047.7456,
    "ml_est_rf_regressor.rmse": 2.1442,
    "ml_est_als.mse": 92.2203,
    "ivf_recall_at_k": 0.618,
    "knn_containment_rate": 1.0,
    "louvain_modularity_q": 0.0248,
    # round-7 scalars: the two-level Lloyd assign agreement rates
    "lloyd_ivf_assign_agreement": 1.0,
    "lloyd_ivf_assign_agreement_halfprobe": 0.91,
    # round-7 corpus-pipeline scalars (DuckDB-recomputed exact values)
    "vocab_coverage": 0.6704,
    "quality_filter_keep_rate": 0.5018,
}

#: scalars that are stochastic-ish across library versions (LDA's online VB
#: objective) get a wider but still regression-visible band.
WIDE_REL = {"ml_est_lda.log_likelihood": 0.02, "ml_est_lda.log_perplexity": 0.02}


def _latest_sf01_report() -> dict[str, float] | None:
    if not REPORT_DIR.is_dir():
        return None
    for path in sorted(REPORT_DIR.glob("bench_*.yml"), reverse=True):
        kv: dict[str, float] = {}
        sf_ok = False
        for line in path.read_text().splitlines():
            if ":" not in line:
                continue
            k, _, v = line.partition(":")
            k, v = k.strip(), v.strip().strip('"')
            if k == "sf_dir":
                sf_ok = v.rstrip("/").endswith("sf0.1")
            else:
                try:
                    kv[k] = float(v)
                except ValueError:
                    pass
        if sf_ok:
            return kv
    return None


_REPORT = _latest_sf01_report()


@pytest.mark.parametrize("key", sorted(EXPECTED_SF01))
def test_quality_scalar_pinned(key):
    if _REPORT is None:
        pytest.skip("no sf0.1 bench report present")
    if key not in _REPORT:
        pytest.skip(f"report predates scalar {key}; next bench run arms it")
    want = EXPECTED_SF01[key]
    got = _REPORT[key]
    rel = WIDE_REL.get(key, 0.005)
    assert abs(got - want) <= max(rel * abs(want), 1e-4), (key, got, want)
