"""L-BFGS solver parity tests against torch.optim.LBFGS (the reference's
optimizer) on shared objectives."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.solver import LbfgsOptions, lbfgs_minimize, lbfgs_minimize_flat

RNG = np.random.RandomState(11)


def torch_lbfgs(fun_torch, x0_np, max_iter=200, lr=1.0, history_size=10):
    import torch

    x = torch.tensor(x0_np, dtype=torch.float32, requires_grad=True)
    opt = torch.optim.LBFGS(
        [x],
        max_iter=max_iter,
        lr=lr,
        history_size=history_size,
        tolerance_grad=1e-7,
        tolerance_change=1e-9,
        line_search_fn="strong_wolfe",
    )

    def closure():
        opt.zero_grad()
        loss = fun_torch(x)
        loss.backward()
        return loss

    opt.step(closure)
    return x.detach().numpy(), float(fun_torch(x.detach()))


def rosenbrock_jax(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


def rosenbrock_torch(x):
    import torch

    return torch.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1 - x[:-1]) ** 2)


def test_quadratic_exact():
    A = RNG.randn(12, 8).astype(np.float32)
    b = RNG.randn(12).astype(np.float32)

    def f(x):
        r = A @ x - b
        return jnp.dot(r, r)

    res = lbfgs_minimize_flat(f, jnp.zeros(8), LbfgsOptions(max_iter=100))
    x_star = np.linalg.lstsq(A, b, rcond=None)[0]
    np.testing.assert_allclose(np.asarray(res.x), x_star, atol=1e-3)
    assert int(res.num_iters) < 60


def test_rosenbrock_matches_torch():
    x0 = np.full(6, -1.2, np.float32)
    res = lbfgs_minimize_flat(jax.jit(rosenbrock_jax), jnp.asarray(x0), LbfgsOptions(max_iter=400, history_size=10))
    x_t, f_t = torch_lbfgs(rosenbrock_torch, x0, max_iter=400)
    f_j = float(res.f)
    # both should reach the global minimum basin (f ~ 0)
    assert f_j < 1e-6, f_j
    assert abs(f_j - f_t) < 1e-4, (f_j, f_t)
    np.testing.assert_allclose(np.asarray(res.x), np.ones(6), atol=1e-2)


def test_matches_torch_on_random_nonconvex():
    """Same start, same objective: final losses should agree closely."""
    import torch

    W1 = RNG.randn(5, 5).astype(np.float32)
    W2 = RNG.randn(5, 5).astype(np.float32)
    b = RNG.randn(5).astype(np.float32)

    def f_jax(x):
        h = jnp.tanh(W1 @ x + b)
        return jnp.sum((W2 @ h - 1.0) ** 2) + 0.1 * jnp.sum(jnp.sin(3 * x) ** 2)

    def f_torch(x):
        h = torch.tanh(torch.tensor(W1) @ x + torch.tensor(b))
        return torch.sum((torch.tensor(W2) @ h - 1.0) ** 2) + 0.1 * torch.sum(torch.sin(3 * x) ** 2)

    x0 = RNG.randn(5).astype(np.float32) * 0.1
    res = lbfgs_minimize_flat(f_jax, jnp.asarray(x0), LbfgsOptions(max_iter=200))
    _, f_t = torch_lbfgs(f_torch, x0, max_iter=200)
    assert float(res.f) <= f_t + 1e-3, (float(res.f), f_t)


def test_max_iter_respected():
    res = lbfgs_minimize_flat(rosenbrock_jax, jnp.full(4, -1.2), LbfgsOptions(max_iter=3))
    assert int(res.num_iters) <= 3


def test_already_converged_at_start():
    def f(x):
        return jnp.sum(x**2)

    res = lbfgs_minimize_flat(f, jnp.zeros(4), LbfgsOptions(max_iter=50))
    assert int(res.num_iters) == 0
    assert float(res.f) == 0.0


def test_pytree_interface():
    def f(p):
        return jnp.sum((p["a"] - 2.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 2)

    p0 = {"a": jnp.zeros((3,)), "b": jnp.zeros((2, 2))}
    p_opt, res = lbfgs_minimize(f, p0, LbfgsOptions(max_iter=50))
    np.testing.assert_allclose(np.asarray(p_opt["a"]), 2.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(p_opt["b"]), -1.0, atol=1e-4)


def test_vmapped_hypotheses():
    """Batched solves — A independent problems in lockstep (the TPU-native
    replacement for the reference's sequential per-angle loop)."""
    targets = jnp.asarray(np.array([1.0, -2.0, 3.0, 0.5], np.float32))

    def solve_one(tgt):
        def f(x):
            return jnp.sum((x - tgt) ** 2) + 0.01 * jnp.sum(x**4)

        return lbfgs_minimize_flat(f, jnp.zeros(3), LbfgsOptions(max_iter=60)).f

    fs = jax.vmap(solve_one)(targets)
    fs_seq = np.array([float(solve_one(t)) for t in targets])
    np.testing.assert_allclose(np.asarray(fs), fs_seq, rtol=1e-3, atol=1e-5)


def test_jit_no_recompile_across_iteration_counts():
    """One compiled program serves different data (different actual iteration
    counts) — the no-per-iteration-recompile requirement."""
    opts = LbfgsOptions(max_iter=100)

    @jax.jit
    def solve(b):
        def f(x):
            return jnp.sum((x - b) ** 2 * jnp.arange(1, 5))

        return lbfgs_minimize_flat(f, jnp.zeros(4), opts).x

    with jax.log_compiles(False):
        x1 = solve(jnp.asarray([1.0, 2, 3, 4]))
        x2 = solve(jnp.asarray([-5.0, 0.1, 2, 7]))
    np.testing.assert_allclose(np.asarray(x1), [1, 2, 3, 4], atol=1e-4)
    np.testing.assert_allclose(np.asarray(x2), [-5, 0.1, 2, 7], atol=1e-4)
