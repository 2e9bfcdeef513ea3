"""Marker segmentation / re-identification — host-side preprocessing.

Ports of the reference's ``markers/markers_utils.py`` host algorithms
(rigid clustering, marker cleanup, re-ID, label filtering).  These run once
per sequence on O(M^2) data (M ~ 40-100), so they stay on host
(SURVEY.md §2.9); the downstream fits are the TPU programs.
"""
from __future__ import annotations

from typing import List

import numpy as np


def segment_rigid(points: np.ndarray, distance_threshold: float = 0.005) -> List[List[int]]:
    """Cluster markers into rigid bodies by the stddev of pairwise
    inter-marker distances over time (reference ``markers_utils.py:244-271``:
    average-linkage agglomerative clustering, threshold 5 mm).

    points: [F, M, 3] -> list of marker-index clusters.
    """
    from sklearn.cluster import AgglomerativeClustering

    F, M, _ = points.shape
    # pairwise distance time-series stddev, vectorized (the reference loops)
    diff = points[:, :, None, :] - points[:, None, :, :]  # [F, M, M, 3]
    dist = np.linalg.norm(diff, axis=-1)  # [F, M, M]
    mat = dist.std(axis=0)  # [M, M]

    if M == 1:
        return [[0]]

    clustering = AgglomerativeClustering(
        n_clusters=None, distance_threshold=distance_threshold, metric="precomputed", linkage="average"
    ).fit(mat)

    return [np.where(clustering.labels_ == v)[0].tolist() for v in np.unique(clustering.labels_)]


def filter_rigid(points: np.ndarray, labels: np.ndarray) -> np.ndarray:
    """Vote each rigid cluster to its median label
    (reference ``markers_utils.py:220-241``)."""
    output = np.array(labels)
    for group in segment_rigid(points):
        output[:, group] = np.median(labels[:, group])
    return output


def cleanup_markers(points: np.ndarray) -> np.ndarray:
    """Drop markers whose median speed is zero (static junk / dead channels)
    (reference ``markers_utils.py:196-217``). [F, M, 3] -> [F, M_kept, 3]."""
    speed = np.linalg.norm(points[1:] - points[:-1], axis=-1)  # [F-1, M]
    keep = np.median(speed, axis=0) > 0
    if not keep.any():  # degenerate: keep everything rather than nothing
        return points
    return points[:, keep]


def trim_trailing_zero_frames(points: np.ndarray) -> np.ndarray:
    """Trim trailing frames where every channel is zero — the c3d-trim
    variant the reference's test CLI imports from
    ``datasets/preprocess_cmu_kitchen.py:32-39``. [F, M, 3] -> [F_t, M, 3]."""
    nonzero = np.abs(points).sum(axis=(1, 2)) != 0
    if not nonzero.any():
        return points
    last = np.max(np.where(nonzero)[0])
    return points[: last + 1]


def id_markers(points: np.ndarray) -> np.ndarray:
    """Frame-to-frame marker re-identification by bipartite matching
    (reference ``markers_utils.py:94-119``). [F, M, 3] -> [F, M, 3]."""
    from scipy.optimize import linear_sum_assignment

    output = np.zeros_like(points)
    output[0] = points[0]
    for f in range(1, points.shape[0]):
        cost = np.linalg.norm(output[f - 1][:, None] - points[f][None, :], axis=-1)
        _, order = linear_sum_assignment(cost)
        output[f] = points[f][order]
    return output


def shuffle_markers(points: np.ndarray, rng: np.random.RandomState | None = None) -> np.ndarray:
    """Per-frame random permutation — destroys labels for unstructured-mocap
    experiments (reference ``markers_utils.py:26-31``)."""
    rng = rng or np.random
    output = np.zeros_like(points)
    for f in range(points.shape[0]):
        output[f] = points[f, rng.permutation(points.shape[1])]
    return output


def labels_mode(marker_labels: np.ndarray) -> np.ndarray:
    """Per-marker temporal mode of [F, M] labels (torch.mode equivalent)."""
    from scipy import stats

    return stats.mode(marker_labels, axis=0, keepdims=False).mode


def segment_markers_network(
    points: np.ndarray,  # [F, M, 3]
    freq: float,
    checkpoint_root: str = "./checkpoints",
    joints: np.ndarray | None = None,  # [F, 22, 3] HMR stream for the multimodal net
) -> np.ndarray:
    """Neural per-marker part labels via the (multimodal) segmenter
    (reference ``segment_markers``, ``markers_utils.py:34-76``: window 32,
    stride 4, softmax over parts).  Returns [F, M] argmax labels.

    Loads flax checkpoints written by ``models/train.py``; raises a clear
    error when none exist (the reference assumes pretrained ``.pth`` files
    the same way).
    """
    import os

    import jax
    import jax.numpy as jnp

    from uuo_mocap_tpu.models.checkpoints import checkpoint_path, load_params
    from uuo_mocap_tpu.models.marker_segmenter import MarkerSegmenter
    from uuo_mocap_tpu.models.marker_segmenter_multimodal import MarkerSegmenterMultimodal

    multimodal = joints is not None and os.path.exists(
        checkpoint_path(checkpoint_root, "marker_segmenter_multimodal")
    )
    name = "marker_segmenter_multimodal" if multimodal else "marker_segmenter"
    path = checkpoint_path(checkpoint_root, name)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no segmenter checkpoint at {path}; train one with "
            f"uuo_mocap_tpu.models.train.train_marker_segmenter and save via "
            f"models.checkpoints.save_params"
        )

    F, M, _ = points.shape
    # CPU backend: this is host-side preprocessing (one pass over a handful
    # of 32-frame windows with a ~1MB net), and the segmenter's window
    # shapes trigger a libtpu fusion-pass CHECK crash on the v5e remote
    # compiler ("TransformWindow: Loop will not make progress",
    # 2026-08-20) that the CPU backend does not have
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        pts = jnp.asarray(np.nan_to_num(points, nan=0.0), jnp.float32)
        if multimodal:
            model = MarkerSegmenterMultimodal()
            template = model.init(jax.random.PRNGKey(0), pts[None, :32],
                                  jnp.asarray(joints[None, :32], jnp.float32))
            params = load_params(template, checkpoint_root, name)
            probs = model.forward_sequence(params, pts, jnp.asarray(joints, jnp.float32), freq=freq)
        else:
            model = MarkerSegmenter()
            template = model.init(jax.random.PRNGKey(0), pts[None, :32])
            params = load_params(template, checkpoint_root, name)
            probs = model.forward_sequence(params, pts, freq=freq)
        return np.asarray(jnp.argmax(probs, axis=-1))


def merge_symmetric_labels(labels_mode_arr: np.ndarray) -> np.ndarray:
    """Merge right-side labels into left (multi-hypothesis testing resolves
    the side later) — reference ``find_best_part_fits`` network mode
    (``markers_utils.py:303-324``)."""
    from uuo_mocap_tpu.body.joints import SMPL_JOINT_SYMMETRY

    out = np.array(labels_mode_arr)
    for left, right in SMPL_JOINT_SYMMETRY:
        out[out == right] = left
    return out


def chains_from_labels(labels_merged: np.ndarray, parents: np.ndarray) -> List[List[int]]:
    """Group present part labels into connected kinematic chains, then keep
    the chain covering the most markers (reference ``markers_utils.py:326-367``).
    Returns the list of chains sorted so the 'largest' chain is first.
    """
    present = sorted(set(int(l) for l in labels_merged))
    chains: List[List[int]] = []
    for j in sorted(present):
        placed = False
        for chain in chains:
            if int(parents[j]) in chain:
                chain.append(j)
                placed = True
                break
        if not placed:
            chains.append([j])

    def chain_score(chain):
        n_markers = sum(int((labels_merged == j).sum()) for j in chain)
        return (len(chain), n_markers)

    return sorted(chains, key=chain_score, reverse=True)
