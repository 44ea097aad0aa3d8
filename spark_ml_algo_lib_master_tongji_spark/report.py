"""Run-report writer — the reference's per-run YAML artifact
(``utils/Utils.scala:150-161``: params + loadDataTime + costTime +
evaluation dumped to ``report/<Algo>_<timestamp>.yml``; the driver prints
``Exec Successful: costTime: …`` like ``KMeansRunner.scala:104``).

Values are emitted as flat YAML scalars (hand-rendered — no YAML dep
needed for a flat mapping), one file per run.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path


def _yaml_scalar(v) -> str:
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    s = str(v)
    if any(c in s for c in ":#{}[],&*?|-<>=!%@`'\"\n"):
        return '"' + s.replace("\\", "\\\\").replace('"', '\\"') + '"'
    return s


def write_run_report(
    algo: str,
    params: dict,
    cost_time_s: float,
    evaluation: dict | None = None,
    load_time_s: float | None = None,
    out_dir: str | Path = "report",
) -> Path:
    """Dump one run's record; returns the file path. Mirrors the reference
    report keys: params + loadDataTime + costTime + evaluation."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    ts = time.strftime("%Y%m%d_%H%M%S")
    path = out / f"{algo}_{ts}.yml"
    lines = [f"algorithmName: {_yaml_scalar(algo)}"]
    for k, v in params.items():
        lines.append(f"{k}: {_yaml_scalar(v)}")
    if load_time_s is not None:
        lines.append(f"loadDataTime: {_yaml_scalar(round(load_time_s, 4))}")
    lines.append(f"costTime: {_yaml_scalar(round(cost_time_s, 4))}")
    for k, v in (evaluation or {}).items():
        lines.append(f"{k}: {_yaml_scalar(v)}")
    path.write_text("\n".join(lines) + "\n", encoding="utf-8")
    # stderr: callers like bench.py reserve stdout for their JSON contract
    print(
        f"Exec Successful: costTime: {round(cost_time_s, 4)}s ({algo})",
        file=sys.stderr,
    )
    return path
