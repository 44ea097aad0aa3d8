"""Delta-dedup scale evidence: FIXED increment vs growing base corpus.

The claim behind ``dedup_delta`` is cost ∝ increment, not corpus: deciding
a fixed re-crawl batch against a 10× larger persisted index must not cost
10× — the base is never re-sketched, only its (compact) stored sketches
are banded and joined, and exact-Jaccard shingles are rebuilt solely for
candidate base docs.

Protocol (fair per PLANS round-7 notes): fresh session per arm, unrelated
warmup count before timing, 3 runs with ``benchlib.materialize`` (never a
bare count), warm = min of runs 2-3. The increment is sf0.1's
``_delta_docs`` (~1.5k docs) in BOTH arms; the base/index is sf0.1 (5k
docs) in arm A and the synthetic sf1 (50k docs) in arm B.

Usage: python tools/delta_scale_ab.py {small|big}   (one arm per process)
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMALL = "/root/testdata/sf0.1"
SF_BIG = "/root/repo/testdata_sf1"
SF_HUGE = "/root/repo/testdata_sf3"  # 30× base — second-decade arm
#: 10× base with --mutate-docs 25 (round-10): replicas are NEAR- not
#: exact duplicates, so the capped winnow store is populated like an
#: organic corpus instead of everything-over-cap (PLANS r9 addendum 1).
SF_BIG_MUT = "/root/repo/testdata_sf1m"
SF_HUGE_MUT = "/root/repo/testdata_sf3m"  # 30× mutated — realistic store


def main() -> None:
    arm = sys.argv[1]
    base_sf = {
        "small": SF_SMALL,
        "big": SF_BIG,
        "bigm": SF_BIG_MUT,
        "huge": SF_HUGE,
        "hugem": SF_HUGE_MUT,
    }[arm]

    from spark_ml_algo_lib_master_tongji_spark import benchlib
    from spark_ml_algo_lib_master_tongji_spark.operators import dedup
    from spark_ml_algo_lib_master_tongji_spark.session import get_session
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

    spark = get_session(app_name=f"delta_ab_{arm}")
    spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").count()  # JIT warmup

    inc_cat = Catalog(spark, SF_SMALL)  # increment: ALWAYS sf0.1-sized
    base_cat = Catalog(spark, base_sf)
    idx = dedup._dedup_index(base_cat)  # index build = one-time, untimed
    delta = dedup._delta_docs(inc_cat)
    base_docs = base_cat.documents.select("doc_id", "text")

    for r in range(3):
        t0 = time.perf_counter()
        n = benchlib.materialize(
            dedup.delta_decisions(
                delta, idx.fps_union, idx.sigs, idx.winnow, base_docs
            )
        )
        print(
            f"{arm} base={base_sf} run{r}: "
            f"{time.perf_counter() - t0:.3f}s rows={n}"
        )


if __name__ == "__main__":
    main()
