"""Reference-architecture proxy baseline (torch CPU, eager).

The reference stack (PyTorch3D CUDA + smplx) cannot run in this image, so
the baseline is a faithful proxy of its hot loop measured here: an *eager
torch* implementation of one L-BFGS closure evaluation — full-sequence SMPL
LBS forward (450 frames x 6890 vertices, same tensor shapes/math as
``smplx`` with pose blendshapes) plus single-directional chamfer against 41
markers and backward — driven by ``torch.optim.LBFGS(strong_wolfe)`` exactly
as the reference drives every stage (``optimization.py:46-53``).

The measured seconds/closure-eval, multiplied by the total closure evals the
staged solve performs (instrumented in our pipeline, same optimizer + same
tolerances => comparable eval counts), estimates the reference's end-to-end
sequence solve time on this host.  Writes BASELINE_PROXY.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import torch

F_FRAMES = 450
N_MARKERS = 41


def torch_smpl_forward(v_template, shapedirs, posedirs, j_regressor, weights, parents,
                       pose_body, betas, root_orient, trans):
    F = trans.shape[0]
    V = v_template.shape[0]
    v_shaped = v_template[None] + torch.einsum("vdk,fk->fvd", shapedirs, betas)
    joints = torch.einsum("jv,fvd->fjd", j_regressor, v_shaped)
    rots = torch.cat([root_orient, pose_body], dim=1)  # [F, 24, 3, 3]
    pose_feature = (pose_body - torch.eye(3)).reshape(F, -1)
    v_posed = v_shaped + (pose_feature @ posedirs).reshape(F, V, 3)

    G = [None] * 24
    for j in range(24):
        R = rots[:, j]
        t = joints[:, j] - (joints[:, parents[j]] if parents[j] >= 0 else 0)
        T = torch.zeros(F, 4, 4)
        T[:, :3, :3] = R
        T[:, :3, 3] = t
        T[:, 3, 3] = 1
        G[j] = T if parents[j] < 0 else G[parents[j]] @ T
    Gs = torch.stack(G, dim=1)  # [F, 24, 4, 4]
    A = Gs.clone()
    A[:, :, :3, 3] -= torch.einsum("fjab,fjb->fja", Gs[:, :, :3, :3], joints)
    T_v = torch.einsum("vj,fjab->fvab", weights, A)
    verts = torch.einsum("fvab,fvb->fva", T_v[:, :, :3, :3], v_posed) + T_v[:, :, :3, 3]
    return verts + trans[:, None]


def main():
    from uuo_mocap_tpu.body.synthetic import _build_arrays

    arrs = _build_arrays("neutral")
    parents = np.array([-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21])

    v_template = torch.tensor(arrs["v_template"])
    shapedirs = torch.tensor(arrs["shapedirs"])
    posedirs = torch.tensor(arrs["posedirs"])  # [207, V*3]
    j_regressor = torch.tensor(arrs["j_regressor"])
    weights = torch.tensor(arrs["lbs_weights"])

    rng = np.random.RandomState(0)
    markers = torch.tensor(rng.randn(F_FRAMES, N_MARKERS, 3).astype(np.float32))

    pose6_init = np.tile(np.eye(3, dtype=np.float32)[None, None], (F_FRAMES, 23, 1, 1))
    pose_body = torch.tensor(pose6_init, requires_grad=True)
    root = torch.tensor(np.tile(np.eye(3, dtype=np.float32)[None, None], (F_FRAMES, 1, 1, 1)), requires_grad=False)
    trans = torch.tensor(rng.randn(F_FRAMES, 3).astype(np.float32) * 0.1, requires_grad=True)
    betas = torch.zeros(1, 10, requires_grad=True)

    n_evals = [0]

    def closure():
        opt.zero_grad()
        n_evals[0] += 1
        betas_f = betas.expand(F_FRAMES, 10)
        verts = torch_smpl_forward(
            v_template, shapedirs, posedirs, j_regressor, weights, parents,
            pose_body, betas_f, root, trans,
        )
        d = torch.cdist(markers, verts)  # [F, M, V]
        cham = d.min(dim=-1).values.pow(2).mean()
        loss = cham * 10.0 + betas.pow(2).mean()
        loss.backward()
        return loss

    opt = torch.optim.LBFGS(
        [pose_body, trans, betas], max_iter=20, lr=1.0,
        tolerance_grad=1e-7, tolerance_change=1e-9, line_search_fn="strong_wolfe",
    )
    t0 = time.time()
    opt.step(closure)
    dt = time.time() - t0
    sec_per_eval = dt / max(n_evals[0], 1)

    out = {
        "sec_per_closure_eval": sec_per_eval,
        "n_evals_measured": n_evals[0],
        "frames": F_FRAMES,
        "markers": N_MARKERS,
        "host": "torch-cpu-eager-proxy",
        "note": "multiply by pipeline total closure evals for e2e estimate",
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_PROXY.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
