"""Device-mesh parallelism for the solver.

The reference has no distributed execution of any kind (SURVEY.md §2.8) —
its scaling axes are embarrassingly parallel Python loops.  Here those axes
become sharded dimensions of single XLA programs over a
``jax.sharding.Mesh``:

  * **data axis**: independent work units — sequences x yaw hypotheses x
    subtree candidates.  No collectives until the final argmin (an
    all-gather of A scalars).
  * **model axis**: the SMPL vertex dimension (V=6890).  LBS is
    row-parallel in V (template/shapedirs/posedirs/weights shard by vertex;
    every chip computes the full 24-joint kinematic chain, which is tiny),
    and the chamfer min-reduction over V commutes with sharding via a
    ``pmin`` collective.  This is genuine tensor parallelism for the
    marker-distance bottleneck.

Collectives ride ICI; the host only sees the final selected parameters.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from uuo_mocap_tpu.body.model import BodyModel, lbs_forward
from uuo_mocap_tpu.ops import rotations as rot
from uuo_mocap_tpu.ops.chamfer import squared_distance_matrix


def make_mesh(n_devices: Optional[int] = None, data: Optional[int] = None, model: Optional[int] = None) -> Mesh:
    """Mesh over available devices, axes (data, model).

    Defaults: model axis 2 (if divisible), rest data — marker solves are
    compute-light per frame, so the data axis dominates.
    """
    devices = np.asarray(jax.devices()[: n_devices or len(jax.devices())])
    n = devices.size
    if model is None:
        model = 2 if n % 2 == 0 and n > 1 else 1
    if data is None:
        data = n // model
    return Mesh(devices.reshape(data, model), axis_names=("data", "model"))


def _shard_model_by_vertex(model: BodyModel, mesh: Mesh) -> BodyModel:
    """Place body-model tensors sharded on the vertex axis of the mesh."""
    vsh = NamedSharding(mesh, P("model"))  # v_template [V, 3] -> V sharded
    rep = NamedSharding(mesh, P())

    def put(x, spec):
        return jax.device_put(x, spec)

    return BodyModel(
        v_template=put(model.v_template, NamedSharding(mesh, P("model", None))),
        shapedirs=put(model.shapedirs, NamedSharding(mesh, P("model", None, None))),
        posedirs=put(model.posedirs, rep),  # [207, V*3]: flattened, keep replicated
        j_regressor=put(model.j_regressor, NamedSharding(mesh, P(None, "model"))),
        lbs_weights=put(model.lbs_weights, NamedSharding(mesh, P("model", None))),
        faces=model.faces,
        parents=model.parents,
        gender=model.gender,
        content_fp=model.content_fp,  # placement-only change, same contents
        const_shas=model.const_shas,
    )


def sharded_hypothesis_solve(model: BodyModel, mesh: Mesh, loss_and_solve_fn):
    """Wrap a per-hypothesis solve so a [A_total, ...] batch runs data-parallel
    over the mesh: hypotheses shard over 'data', everything inside each lane
    runs locally; the final scores all-gather for the argmin.

    ``loss_and_solve_fn(hypothesis_inputs) -> (params_pytree, score)``.
    """
    data_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    vmapped = jax.vmap(loss_and_solve_fn)

    @jax.jit
    def run(hypothesis_inputs):
        hypothesis_inputs = jax.lax.with_sharding_constraint(hypothesis_inputs, data_sharding)
        params, scores = vmapped(hypothesis_inputs)
        scores = jax.lax.with_sharding_constraint(scores, replicated)
        best = jnp.argmin(scores)
        best_params = jax.tree_util.tree_map(lambda x: x[best], params)
        return best_params, scores

    return run


def sharded_train_step(model: BodyModel, mesh: Mesh):
    """A full sharded gradient step of the flagship compute: chamfer loss of
    an SMPL batch against markers, grads, SGD update.

    Shardings: batch (sequences) over 'data'; the [V] vertex axis of the
    chamfer distance matrix over 'model' (row-parallel LBS output); the
    min-over-V reduction completes with a ``pmin``-style collective that XLA
    inserts from the sharding constraints.  Returns a jitted
    ``step(params, batch) -> (params, loss)``.
    """
    data_sh = NamedSharding(mesh, P("data"))
    vert_sh = NamedSharding(mesh, P(None, None, "model", None))  # [B, F, V, 3]

    def loss_fn(params, batch):
        pose = rot.rotation_6d_to_matrix(params["pose6d"])  # [B, F, 23, 3, 3]
        root = rot.rotation_6d_to_matrix(params["root6d"])  # [B, F, 1, 3, 3]
        B, F = params["trans"].shape[:2]
        betas = jnp.broadcast_to(params["betas"][:, None], (B, F, 10))
        out = lbs_forward(model, pose, betas, root, params["trans"])
        verts = jax.lax.with_sharding_constraint(out["vertices"], vert_sh)
        d2 = squared_distance_matrix(batch["markers"], verts)  # [B, F, M, V]
        d2_min = jnp.min(d2, axis=-1)  # min over sharded V -> XLA collective
        w = batch["weights"]
        cham = jnp.sum(d2_min * w) / jnp.maximum(jnp.sum(w), 1e-12)
        reg = jnp.mean(params["betas"] ** 2)
        return cham * 10.0 + reg * 0.1

    @jax.jit
    def step(params, batch, lr=1e-2):
        params = jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P("data"))), params
        )
        batch = {
            "markers": jax.lax.with_sharding_constraint(batch["markers"], NamedSharding(mesh, P("data"))),
            "weights": jax.lax.with_sharding_constraint(batch["weights"], NamedSharding(mesh, P("data"))),
        }
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
        return params, loss

    return step


def make_train_batch(model: BodyModel, batch: int, frames: int, markers: int, seed: int = 0):
    """Tiny example batch for dry runs."""
    rng = np.random.RandomState(seed)
    eye6 = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (batch, frames, 23, 1))
    root6 = np.tile(np.array([1, 0, 0, 0, 1, 0], np.float32), (batch, frames, 1, 1))
    params = {
        "pose6d": jnp.asarray(eye6 + rng.randn(*eye6.shape).astype(np.float32) * 0.01),
        "root6d": jnp.asarray(root6),
        "trans": jnp.asarray(rng.randn(batch, frames, 3).astype(np.float32) * 0.1),
        "betas": jnp.asarray(rng.randn(batch, 10).astype(np.float32) * 0.1),
    }
    data = {
        "markers": jnp.asarray(rng.randn(batch, frames, markers, 3).astype(np.float32)),
        "weights": jnp.asarray(np.ones((batch, frames, markers), np.float32)),
    }
    return params, data
