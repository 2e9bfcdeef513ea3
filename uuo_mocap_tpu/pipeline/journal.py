"""Iteration/stage journal — observability for the solver.

The reference's ``iter_fn`` callback protocol dumps a full parameter
snapshot per optimizer iteration (``multimodal.py:102-142``,
``--save_iterations``) for replay by ``vis/visualize_iterations.py``.
Per-iteration host callbacks would stall the TPU pipeline, so the journal
records per-*stage* snapshots (parameters, scores, timings) plus optional
L-BFGS convergence stats, and serializes to pkl for the visualizers.

For intra-stage traces, ``record_curve`` can store loss curves captured via
``jax.debug.callback`` when a stage is built with ``trace=True``.
"""
from __future__ import annotations

import pickle
import time
from typing import Any, Dict

import numpy as np


class IterationJournal:
    def __init__(self):
        self.entries: Dict[str, Any] = {}
        self._t0 = time.time()

    def record(self, stage: str, **data) -> None:
        entry: Dict[str, Any] = {"t": time.time() - self._t0}
        for key, value in data.items():
            if hasattr(value, "_fields"):  # NamedTuple (SmplParams)
                entry[key] = {f: np.asarray(getattr(value, f)) for f in value._fields}
            elif hasattr(value, "shape"):
                entry[key] = np.asarray(value)
            else:
                entry[key] = value
        self.entries.setdefault(stage, []).append(entry)

    def record_curve(self, stage: str, iteration: int, loss: float) -> None:
        self.entries.setdefault(f"{stage}__curve", []).append(
            {"iteration": int(iteration), "loss": float(loss)}
        )

    def save(self, filename: str) -> str:
        with open(filename, "wb") as f:
            pickle.dump(self.entries, f)
        return filename

    @staticmethod
    def load(filename: str) -> Dict[str, Any]:
        with open(filename, "rb") as f:
            return pickle.load(f)
