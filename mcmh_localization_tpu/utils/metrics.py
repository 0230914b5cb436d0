"""Per-step observability: JSONL metrics logging.

The reference's only observability is the results-file protocol plus ad-hoc
loginfo lines (SURVEY.md §5).  Here every step's StepInfo (ESS, MH
acceptance rate, active particle count, augmented-MCL internals, pose
estimate) streams to JSONL for offline analysis; `summarize` aggregates a
run.
"""

from __future__ import annotations

import json
import os
from typing import IO

import numpy as np


class MetricsLogger:
    """Append-only JSONL writer for StepInfo records."""

    def __init__(self, path: str):
        d = os.path.dirname(os.path.abspath(path))
        os.makedirs(d, exist_ok=True)
        self.path = path
        self._f: IO = open(path, "a")
        self._step = 0

    def log_step(self, info, wall_ms: float | None = None, extra: dict | None = None):
        rec = {
            "step": self._step,
            "est": [round(float(v), 6) for v in np.asarray(info.estimate.mean)],
            "ess": round(float(info.ess), 3),
            "accept_rate": round(float(info.accept_rate), 4),
            "count": int(info.count),
            "p_random": round(float(info.p_random), 6),
            "w_slow": float(info.w_slow),
            "w_fast": float(info.w_fast),
            "anchor_mass": round(float(info.anchor_mass), 4),
        }
        if wall_ms is not None:
            rec["ms"] = round(wall_ms, 3)
        if extra:
            rec.update(extra)
        self._f.write(json.dumps(rec) + "\n")
        self._step += 1

    def log_run(self, infos, times=None):
        """Log a stacked StepInfo (from lax.scan run) in one call."""
        n = len(np.asarray(infos.ess))
        for i in range(n):
            rec = {
                "step": self._step,
                "est": [round(float(v), 6) for v in np.asarray(infos.estimate.mean)[i]],
                "ess": round(float(np.asarray(infos.ess)[i]), 3),
                "accept_rate": round(float(np.asarray(infos.accept_rate)[i]), 4),
                "count": int(np.asarray(infos.count)[i]),
                "p_random": round(float(np.asarray(infos.p_random)[i]), 6),
                "anchor_mass": round(
                    float(np.asarray(infos.anchor_mass)[i]), 4
                ),
            }
            if times is not None:
                rec["t"] = float(np.asarray(times)[i])
            self._f.write(json.dumps(rec) + "\n")
            self._step += 1
        self._f.flush()

    def close(self):
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def read_metrics(path: str) -> list[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def summarize(path: str) -> dict:
    recs = read_metrics(path)
    if not recs:
        return {}
    out = {"steps": len(recs)}
    for k in ("ess", "accept_rate", "count", "p_random"):
        vals = [r[k] for r in recs if k in r]
        if vals:
            out[f"{k}_mean"] = float(np.mean(vals))
            out[f"{k}_min"] = float(np.min(vals))
            out[f"{k}_max"] = float(np.max(vals))
    if "ms" in recs[0]:
        out["ms_mean"] = float(np.mean([r["ms"] for r in recs]))
    return out
