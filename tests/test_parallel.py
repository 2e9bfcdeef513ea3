"""Device-mesh parallelism tests on the 8-device virtual CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.body.synthetic import synthetic_body_model
from uuo_mocap_tpu.parallel.mesh import make_mesh, make_train_batch, sharded_train_step

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


@pytest.fixture(scope="module")
def body():
    return synthetic_body_model()


def test_make_mesh_shapes():
    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["model"] == 8
    assert mesh.shape["model"] == 2
    mesh2 = make_mesh(8, data=8, model=1)
    assert mesh2.shape["data"] == 8


def test_sharded_train_step_runs_and_descends(body):
    mesh = make_mesh(8)
    step = sharded_train_step(body, mesh)
    params, batch = make_train_batch(body, batch=int(mesh.shape["data"]) * 2, frames=4, markers=8)
    losses = []
    for _ in range(3):
        params, loss = step(params, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # SGD descends on the chamfer objective


def test_sharded_matches_single_device(body):
    """The sharded step computes the same loss as an unsharded replica."""
    mesh = make_mesh(8)
    step = sharded_train_step(body, mesh)
    params, batch = make_train_batch(body, batch=int(mesh.shape["data"]), frames=3, markers=6)
    _, loss_sharded = step(params, batch)

    mesh1 = make_mesh(1, data=1, model=1)
    step1 = sharded_train_step(body, mesh1)
    _, loss_single = step1(params, batch)
    np.testing.assert_allclose(float(loss_sharded), float(loss_single), rtol=1e-4)


@pytest.mark.slow  # the realistic-shape dryrun solves the staged pipeline
# TWICE (model=2 vs model=1 parity) at V=6890 on 8 virtual devices — >10 min
# alone on the 1-vCPU host.  The driver runs dryrun_multichip independently
# every round (MULTICHIP artifact), so fast-tier coverage is not lost.
def test_graft_entry_contract():
    """entry() is jittable; dryrun_multichip exercises the full sharded step."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    loss, joints = jax.jit(fn)(*args)
    assert np.isfinite(float(loss))
    assert joints.shape[-2:] == (45, 3)

    mod.dryrun_multichip(8)  # raises on failure
