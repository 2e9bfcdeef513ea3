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

    def segment_hook(self, stage: str, convert=None):
        """Per-L-BFGS-segment parameter snapshots — the bounded-rate analog
        of the reference's per-iteration ``iter_fn`` dumps
        (``multimodal.py:102-142``).  Attach to ``BatchedLbfgs.snapshot``;
        the segmented driver already syncs per segment, so snapshots cost no
        extra device round-trips.

        ``convert(params_np, lanes)`` may map the raw optimizer parameters
        (6d rotations etc.) to render-ready arrays per lane.  Entries land
        under ``<stage>__segments`` as {lanes, iters, params}.
        """

        def hook(lanes: np.ndarray, iters: np.ndarray, params_np) -> None:
            params = params_np if convert is None else convert(params_np, lanes)
            self.entries.setdefault(f"{stage}__segments", []).append(
                {"t": time.time() - self._t0, "lanes": lanes, "iters": iters, "params": params}
            )

        return hook

    def save(self, filename: str) -> str:
        with open(filename, "wb") as f:
            pickle.dump(self.entries, f)
        return filename

    @staticmethod
    def load(filename: str) -> Dict[str, Any]:
        with open(filename, "rb") as f:
            return pickle.load(f)
