"""Structured per-step metrics logging.

The reference logs iteration residuals and solver stats with ~80 bare
println!s plus Mutex-shared ``LinearSolverStats`` for the UI (SURVEY.md §5
"Metrics / logging").  Here metrics come back as a structured pytree from the
scanned time loop; :class:`MetricsLog` accumulates them across host-side
runs, renders summaries, and exports JSONL for external tooling.
"""

from __future__ import annotations

import json
from collections import defaultdict

import numpy as np


class MetricsLog:
    """Accumulates per-step metric dicts (scalars or arrays of steps)."""

    def __init__(self):
        self._series = defaultdict(list)

    def append(self, metrics: dict) -> None:
        """Add one scan's metrics (each value: scalar or (steps,) array)."""
        for key, val in metrics.items():
            arr = np.atleast_1d(np.asarray(val))
            self._series[key].extend(arr.tolist())

    def __getitem__(self, key: str) -> np.ndarray:
        return np.asarray(self._series[key])

    def __len__(self) -> int:
        if not self._series:
            return 0
        return max(len(v) for v in self._series.values())

    @property
    def keys(self):
        return list(self._series.keys())

    def summary(self) -> str:
        lines = [f"=== Run metrics ({len(self)} steps) ==="]
        for key, vals in self._series.items():
            a = np.asarray(vals, dtype=np.float64)
            lines.append(f"  {key:<20} last={a[-1]:.4g}  mean={a.mean():.4g} "
                         f" min={a.min():.4g}  max={a.max():.4g}")
        return "\n".join(lines)

    def to_jsonl(self, path: str) -> None:
        n = len(self)
        with open(path, "w") as f:
            for i in range(n):
                row = {k: (v[i] if i < len(v) else None)
                       for k, v in self._series.items()}
                f.write(json.dumps(row) + "\n")
