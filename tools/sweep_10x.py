"""Full 10×-fixture oracle sweep — one command, one committed artifact.

Usage: python tools/sweep_10x.py [sf_dir] [--out report/SWEEP_10X_rN.json]

Runs EVERY oracle-bearing registry query against its DuckDB twin at the
10× fixture (default ``testdata_sf1m``) — the scale regime where three
latent defects invisible at sf0.01 have been caught so far (round 13:
the minhash twin's hash family, the lm-perplexity summation order;
round 14 pre-ship: freq_histogram's sampled-partitioning race). The
round-13 verdict (item 3) asked for exactly this wrapper so the sweep
is one command and a diff instead of a hand-driven family-by-family
session.

Output: per-query MATCH/MISMATCH lines grouped by family (the name's
first ``_``-separated token), per-family wall timing, and a JSON
artifact {fixture, n_queries, n_oracles, n_match, n_mismatch,
mismatches: [...], families: {fam: {n, match, seconds}},
host_loadavg} — commit it as ``report/SWEEP_10X_r{N}.json``. Exits 1
on any mismatch. Queries without a SQL oracle are skipped (they carry
pytest differential oracles instead; the sweep-marked pytest half
covers them at 10×).
"""

from __future__ import annotations

import json
import sys
import time
import traceback
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import duckdb

from tests.compare import assert_match

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else str(REPO / "testdata_sf1m")
    out_path = None
    for i, a in enumerate(sys.argv[1:], 1):
        if a == "--out" and i < len(sys.argv) - 1:
            out_path = sys.argv[i + 1]

    from spark_ml_algo_lib_master_tongji_spark.oracles import all_oracles
    from spark_ml_algo_lib_master_tongji_spark.registry import build_registry
    from spark_ml_algo_lib_master_tongji_spark.session import get_session

    spark = get_session(app_name="sweep_10x", shuffle_partitions=32)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    reg, oracles = build_registry(), all_oracles()
    names = [n for n in reg if n in oracles]

    # per-query checkpoint: each result is appended to <out>.progress the
    # moment it lands, and a re-run skips names already recorded there —
    # a killed/timed-out sweep resumes instead of restarting (learned the
    # hard way: the first r14 run died at a wrapper timeout with ~90% done
    # and nothing persisted).
    progress_path = Path(out_path or "SWEEP_10X.json").with_suffix(".progress")
    done: dict[str, str] = {}
    if progress_path.exists():
        for line in progress_path.read_text().splitlines():
            rec = json.loads(line)
            done[rec["name"]] = rec["line"]
        print(f"# resuming: {len(done)} results from {progress_path}")

    fams: dict[str, dict] = {}
    mismatches: list[str] = []
    t_all = time.monotonic()
    with progress_path.open("a") as prog:
        for name in names:
            fam = name.split("_", 1)[0]
            st = fams.setdefault(fam, {"n": 0, "match": 0, "seconds": 0.0})
            st["n"] += 1
            if name in done:
                line = done[name]
                if "MATCH" in line and "MISMATCH" not in line:
                    st["match"] += 1
                    # recover the measured seconds from the checkpoint line
                    # ("name: MATCH (12.3s)") so family totals survive resume
                    if line.endswith("s)"):
                        st["seconds"] += float(
                            line.rsplit("(", 1)[1].rstrip("s)")
                        )
                else:
                    mismatches.append(line)
                print(f"{line} [cached]", flush=True)
                continue
            t0 = time.monotonic()
            try:
                sdf = reg[name](spark, sf_dir)
                assert_match(sdf, con, oracles[name], name)
                st["match"] += 1
                line = f"{name}: MATCH ({time.monotonic() - t0:.1f}s)"
                print(line, flush=True)
            except Exception as ex:  # noqa: BLE001
                line = f"{name}: MISMATCH {type(ex).__name__}: {ex}"
                mismatches.append(line)
                print(line, flush=True)
                traceback.print_exc(limit=2)
            st["seconds"] += time.monotonic() - t0
            prog.write(json.dumps({"name": name, "line": line}) + "\n")
            prog.flush()

    for fam, st in sorted(fams.items()):
        st["seconds"] = round(st["seconds"], 1)
        print(f"  {fam:10s} {st['match']}/{st['n']} in {st['seconds']}s")
    artifact = {
        "fixture": sf_dir,
        "n_queries": len(reg),
        "n_oracles": len(names),
        "n_match": len(names) - len(mismatches),
        "n_mismatch": len(mismatches),
        "mismatches": mismatches,
        "families": fams,
        # sum of per-query measured seconds (survives a resume, where the
        # cached rows contribute their checkpointed timings but this
        # process's wall clock does not cover them)
        "total_seconds": round(sum(st["seconds"] for st in fams.values()), 1),
        "wall_seconds": round(time.monotonic() - t_all, 1),
        "host_loadavg": list(__import__("os").getloadavg()),
    }
    line = json.dumps(artifact)
    print(line)
    if out_path:
        Path(out_path).write_text(line + "\n")
    sys.exit(1 if mismatches else 0)


if __name__ == "__main__":
    main()
