"""Transfer observed marker positions onto a template body and export .ply.

CLI port of the reference's ``tools/export_marker_layout.py:14-100``
(teaser-figure asset generator): solve/choose a frame, attach each marker to
its nearest template surface point, and write a .ply of the template body
with marker spheres.
"""
from __future__ import annotations

import argparse

import numpy as np


def write_ply(filename: str, vertices: np.ndarray, faces: np.ndarray,
              colors: np.ndarray | None = None) -> str:
    """Minimal ASCII PLY writer (replaces trimesh export)."""
    V, T = len(vertices), len(faces)
    with open(filename, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {V}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write(f"element face {T}\nproperty list uchar int vertex_indices\nend_header\n")
        for i, v in enumerate(vertices):
            line = f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}"
            if colors is not None:
                c = (np.clip(colors[i], 0, 1) * 255).astype(int)
                line += f" {c[0]} {c[1]} {c[2]}"
            f.write(line + "\n")
        for tri in faces:
            f.write(f"3 {tri[0]} {tri[1]} {tri[2]}\n")
    return filename


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--markers", required=True, help=".c3d file")
    parser.add_argument("--smpl", required=True, help="solved *_stageii.npz for the same sequence")
    parser.add_argument("--frame", type=int, default=0)
    parser.add_argument("--output", type=str, default="marker_layout.ply")
    parser.add_argument("--body_models", type=str, default="./body_models")
    args = parser.parse_args(argv)

    import os

    import jax.numpy as jnp

    from uuo_mocap_tpu.data.markers import Markers
    from uuo_mocap_tpu.eval.comparisons import load_smpl_npz, smpl_forward_zeroed_hands
    from uuo_mocap_tpu.ops.point_mesh import point_mesh_distance
    from uuo_mocap_tpu.utils.colors import colors_for_labels

    if os.path.exists(args.body_models):
        from uuo_mocap_tpu.body.model import load_body_model

        model = load_body_model(args.body_models, "neutral")
    else:
        from uuo_mocap_tpu.body.synthetic import synthetic_body_model

        model = synthetic_body_model()

    markers = np.nan_to_num(Markers(args.markers).get_points(), nan=0.0)
    smpl = load_smpl_npz(args.smpl)
    out = smpl_forward_zeroed_hands(model, smpl)
    frame = min(args.frame, markers.shape[0] - 1, int(out["vertices"].shape[0]) - 1)

    # attach markers to the posed surface, then transfer to the template
    pm = point_mesh_distance(
        jnp.asarray(markers[frame])[None], out["vertices"][frame][None], jnp.asarray(model.faces)
    )
    face_idx = np.asarray(pm["face_index"][0])
    bary = np.asarray(pm["barycentric"][0])
    template = np.asarray(model.v_template)
    tmpl_pos = np.einsum("mk,mkd->md", bary, template[model.faces[face_idx]])

    labels = np.asarray(jnp.argmax(model.lbs_weights, axis=-1))
    body_colors = np.full((template.shape[0], 3), 0.75)

    # marker spheres: tiny octahedra at the transferred positions
    sphere_v = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]]) * 0.012
    sphere_f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4], [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    verts = [template]
    faces = [model.faces]
    colors = [body_colors]
    offset = template.shape[0]
    marker_colors = colors_for_labels(labels[model.faces[face_idx][:, 0]])
    for i, pos in enumerate(tmpl_pos):
        verts.append(sphere_v + pos)
        faces.append(sphere_f + offset)
        colors.append(np.tile(marker_colors[i], (6, 1)))
        offset += 6

    path = write_ply(args.output, np.concatenate(verts), np.concatenate(faces), np.concatenate(colors))
    print("wrote", path)


if __name__ == "__main__":
    main()
