"""Paper-figure helpers.

Ports of the reference's ``vis/paper/`` scripts: per-part error bar charts
(``plot_part_errors.py`` / ``visualize_part_metrics.py``), segmentation
confusion matrices (via ``vis/plots.py``), and result-image cropping
(``crop_results.py``).
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np


def plot_part_errors(
    filename: str,
    stats_per_method: Dict[str, Dict],
    metric: str = "mpjpe",
    parts: Optional[List[str]] = None,
) -> str:
    """Grouped bars of per-part metric means across methods; input is the
    comparisons harness output (``eval/comparisons.py`` stats dicts)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    if parts is None:
        from uuo_mocap_tpu.eval.metrics import PARTS_MAP

        parts = [p for p in PARTS_MAP if p != "full"]

    methods = list(stats_per_method)
    width = 0.8 / max(len(methods), 1)
    fig, ax = plt.subplots(figsize=(1.2 * len(parts) + 2, 3.5))
    for mi, method in enumerate(methods):
        stats = stats_per_method[method]
        vals = [stats.get(f"{p}__{metric}", {}).get("mean", np.nan) for p in parts]
        ax.bar(np.arange(len(parts)) + mi * width, vals, width, label=method)
    ax.set_xticks(np.arange(len(parts)) + 0.4 - width / 2)
    ax.set_xticklabels(parts, rotation=30, ha="right")
    ax.set_ylabel(f"{metric} (mm)")
    ax.legend()
    fig.tight_layout()
    fig.savefig(filename, dpi=200)
    plt.close(fig)
    return filename


def crop_results(input_paths: List[str], out_dir: str, box: tuple) -> List[str]:
    """Crop rendered result images to a (left, top, right, bottom) box
    (reference ``vis/paper/crop_results.py``)."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    written = []
    for path in input_paths:
        img = Image.open(path).crop(box)
        out = os.path.join(out_dir, os.path.basename(path))
        img.save(out)
        written.append(out)
    return written
