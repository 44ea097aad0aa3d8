"""Ad-hoc differential check for a subset of queries at a chosen SF.

Usage: python tools/check_subset.py <prefix> [sf_dir]
Runs every registry query whose name starts with <prefix> against its DuckDB
oracle (same compare as tests/compare.py) and prints MATCH/MISMATCH.
"""

from __future__ import annotations

import sys
import traceback
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from tests.compare import assert_match


def main() -> None:
    prefix = sys.argv[1] if len(sys.argv) > 1 else ""
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles
    from spark_ml_algo_lib_master_tongji_spark.registry import build_registry
    from spark_ml_algo_lib_master_tongji_spark.session import get_session

    spark = get_session(app_name="check_subset", shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    reg, oracles = build_registry(), all_oracles()
    fails = 0
    for name in sorted(reg):
        if not name.startswith(prefix):
            continue
        try:
            sdf = reg[name](spark, sf_dir)
            if name in oracles:
                assert_match(sdf, con, oracles[name], name)
                print(f"{name}: MATCH")
            else:
                print(f"{name}: rows={sdf.count()} (no oracle)")
        except Exception as ex:  # noqa: BLE001
            fails += 1
            print(f"{name}: FAIL {type(ex).__name__}: {ex}")
            traceback.print_exc(limit=3)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
