"""Refresh write-volume evidence: merge_dedup_index writes ∝ increment.

Reproduces PLANS round-9 addendum 2 / round-10 fps-delta follow-up:
build a base store (v0), merge a small increment (v1), and print
per-table parquet byte volumes plus wall times. The claim under test:
v1's fps/sigs/winnow/winnow_df are ALL increment-sized (fps became an
election delta in round 10 — formerly the one corpus-wide rewrite);
only winnow_overcap (the hot-fingerprint list) is corpus-cumulative,
and it is tiny by construction.

Usage: python tools/refresh_volume_ab.py [base_sf_dir] [inc_sf_dir]
       (defaults: /root/repo/testdata_sf1 base, /root/testdata/sf0.1
        increment — a ~1% 'new'-slice increment of 500 docs)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _vol(path: str) -> float:
    return sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )


def main() -> None:
    base_sf = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf1"
    inc_sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from spark_ml_algo_lib_master_tongji_spark.operators import dedup
    from spark_ml_algo_lib_master_tongji_spark.session import get_session
    from spark_ml_algo_lib_master_tongji_spark.sources.readers import Catalog

    spark = get_session(app_name="refresh_volume_ab")
    spark.sparkContext.setLogLevel("ERROR")
    base_cat, inc_cat = Catalog(spark, base_sf), Catalog(spark, inc_sf)
    root = os.path.join(tempfile.gettempdir(), "spark_graft_refresh_vol_ab")
    shutil.rmtree(root, ignore_errors=True)

    t0 = time.perf_counter()
    idx = dedup.build_dedup_index(
        base_cat.documents.select("doc_id", "text"), f"{root}/v0"
    )
    t1 = time.perf_counter()
    inc = dedup._delta_docs(inc_cat).where(
        f"doc_id >= {dedup.DELTA_NEW_OFFSET} "
        f"AND doc_id < {dedup.DELTA_PARTIAL_OFFSET}"
    )
    dedup.merge_dedup_index(idx, inc, f"{root}/v1")
    t2 = time.perf_counter()

    nb = base_cat.documents.count()
    ni = inc.count()
    print(
        f"base_docs={nb} inc_docs={ni} "
        f"build={t1 - t0:.1f}s merge={t2 - t1:.1f}s"
    )
    for t in ("fps", "sigs", "winnow", "winnow_df", "winnow_overcap"):
        print(
            f"{t}: v0={_vol(f'{root}/v0/{t}') / 1e6:.2f}MB "
            f"v1={_vol(f'{root}/v1/{t}') / 1e6:.2f}MB"
        )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
