"""Segmented batched L-BFGS driver: segment-size invariance, lane chunking,
and parity with the single-program path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uuo_mocap_tpu.solver.lbfgs import BatchedLbfgs, LbfgsOptions, lbfgs_minimize_flat

RNG = np.random.RandomState(4)


def quad_fun(p, lane, shared):
    t = lane["target"]
    return jnp.sum((p["x"] - t) ** 2) + 0.01 * jnp.sum(p["x"] ** 4) + shared["bias"]


def test_segment_size_invariance():
    """10000 iters in one program vs many small segments: same optimum."""
    targets = jnp.asarray(RNG.randn(4, 6).astype(np.float32))
    p0 = {"x": jnp.zeros((4, 6))}
    lanes = {"target": targets}
    shared = {"bias": jnp.asarray(0.0)}

    outs = []
    for seg in (5, 1000):
        solver = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=100), segment_size=seg)
        p_opt, res = solver.run(p0, lanes, shared)
        outs.append((np.asarray(p_opt["x"]), np.asarray(res.f)))
    np.testing.assert_allclose(outs[0][0], outs[1][0], atol=1e-5)
    np.testing.assert_allclose(outs[0][1], outs[1][1], atol=1e-6)


def test_matches_single_program_path():
    target = jnp.asarray(RNG.randn(5).astype(np.float32))

    def flat_fun(x):
        return jnp.sum((x - target) ** 2) + 0.01 * jnp.sum(x**4)

    res_single = lbfgs_minimize_flat(flat_fun, jnp.zeros(5), LbfgsOptions(max_iter=80))

    solver = BatchedLbfgs(
        lambda p, lane, shared: flat_fun(p["x"]), LbfgsOptions(max_iter=80), segment_size=7
    )
    p_opt, res_b = solver.run({"x": jnp.zeros((1, 5))}, {"target": target[None]}, {})
    np.testing.assert_allclose(np.asarray(p_opt["x"][0]), np.asarray(res_single.x), atol=1e-5)


def test_lane_chunking_matches_unchunked():
    L = 16
    targets = jnp.asarray(RNG.randn(L, 4).astype(np.float32))
    p0 = {"x": jnp.zeros((L, 4))}
    shared = {"bias": jnp.asarray(0.0)}

    a = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=60), segment_size=20)
    pa, _ = a.run(p0, {"target": targets}, shared)
    b = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=60), segment_size=20, lane_chunk=4)
    pb, _ = b.run(p0, {"target": targets}, shared)
    np.testing.assert_allclose(np.asarray(pa["x"]), np.asarray(pb["x"]), atol=1e-5)


def test_lane_chunk_mismatch_falls_back_ungrouped():
    """Lane counts that don't divide lane_chunk run ungrouped (one vmap)
    instead of erroring — the chunk is a memory bound, not a contract."""
    solver = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=50), segment_size=10, lane_chunk=4)
    p_opt, res = solver.run(
        {"x": jnp.zeros((6, 3))},
        {"target": jnp.ones((6, 3)) * 0.3},
        {"bias": jnp.asarray(0.0)},
    )
    assert np.isfinite(np.asarray(res.f)).all()
    np.testing.assert_allclose(np.asarray(p_opt["x"]), 0.3, atol=0.05)


def test_early_convergence_stops_host_loop():
    """All lanes converged -> loop exits long before max_iter segments."""
    solver = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=10000), segment_size=50)
    p_opt, res = solver.run(
        {"x": jnp.zeros((2, 3))},
        {"target": jnp.asarray([[0.5, -0.5, 1.0], [0.1, 0.2, 0.3]], jnp.float32)},
        {"bias": jnp.asarray(0.0)},
    )
    assert (np.asarray(res.num_iters) < 200).all()
    # quartic regularizer makes f* nonzero; check x converged to ~target
    np.testing.assert_allclose(
        np.asarray(p_opt["x"]), [[0.5, -0.5, 1.0], [0.1, 0.2, 0.3]], atol=0.05
    )


def test_mixed_convergence_and_max_iter_terminates():
    """Regression: some lanes converge early while others run to max_iter —
    the host loop must exit on the per-lane OR, not done.all() OR
    iters.all() (which hangs forever)."""

    def fun(p, lane, shared):
        # lane 0: smooth quadratic (converges fast); lane 1: rough sine-sum
        # landscape that won't satisfy the tolerances within max_iter
        easy = jnp.sum((p["x"] - 1.0) ** 2)
        hard = jnp.sum(jnp.sin(37.0 * p["x"]) * 0.5 + (p["x"] - 2.0) ** 2 * 0.001)
        return jnp.where(lane["kind"] > 0, hard, easy)

    solver = BatchedLbfgs(fun, LbfgsOptions(max_iter=40), segment_size=7)
    p_opt, res = solver.run(
        {"x": jnp.zeros((2, 4))}, {"kind": jnp.asarray([0, 1])}, {}
    )
    iters = np.asarray(res.num_iters)
    done = iters  # loop returned -> no hang; lane 0 converged early
    assert iters[0] < 40
    np.testing.assert_allclose(np.asarray(p_opt["x"][0]), 1.0, atol=1e-3)


def test_shape_change_rebuilds():
    solver = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=30), segment_size=10)
    for n in (3, 5):
        p_opt, _ = solver.run(
            {"x": jnp.zeros((2, n))}, {"target": jnp.ones((2, n))}, {"bias": jnp.asarray(0.0)}
        )
        assert p_opt["x"].shape == (2, n)
        np.testing.assert_allclose(np.asarray(p_opt["x"]), 1.0, atol=1e-1)


def test_streaming_matches_unstreamed():
    """L lanes streamed through a W-wide working set (refill-on-retire) must
    match the all-lanes-resident solve bit-for-bit: lanes are independent."""
    L, W = 12, 4
    # heterogeneous difficulty so lanes converge at very different times
    targets = jnp.asarray(RNG.randn(L, 6).astype(np.float32) * np.linspace(0.1, 5.0, L)[:, None])
    p0 = {"x": jnp.zeros((L, 6))}
    shared = {"bias": jnp.asarray(0.0)}

    a = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=120), segment_size=6)
    pa, ra = a.run(p0, {"target": targets}, shared)
    b = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=120), segment_size=6, max_width=W)
    pb, rb = b.run(p0, {"target": targets}, shared)
    np.testing.assert_array_equal(np.asarray(pa["x"]), np.asarray(pb["x"]))
    np.testing.assert_array_equal(np.asarray(ra.num_evals), np.asarray(rb.num_evals))
    assert b.last_run_stats["width"] == W
    assert b.last_run_stats["lanes"] == L
    assert b.last_run_stats["refills"] >= 1
    assert b.last_run_stats["lane_evals"] == int(np.asarray(rb.num_evals).sum())
    assert b.last_run_stats["device_evals"] >= b.last_run_stats["lane_evals"] * W // L


def test_drain_shrink_matches():
    """drain_shrink halves the working set once the queue empties; results
    stay bit-equal (lanes are independent; duplicates only get replaced by
    narrower programs)."""
    L, W = 10, 4
    targets = jnp.asarray(RNG.randn(L, 6).astype(np.float32) * np.linspace(0.1, 4.0, L)[:, None])
    p0 = {"x": jnp.zeros((L, 6))}
    shared = {"bias": jnp.asarray(0.0)}

    a = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=120), segment_size=6)
    pa, ra = a.run(p0, {"target": targets}, shared)
    b = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=120), segment_size=6,
                     max_width=W, drain_shrink=True)
    pb, rb = b.run(p0, {"target": targets}, shared)
    np.testing.assert_array_equal(np.asarray(pa["x"]), np.asarray(pb["x"]))
    np.testing.assert_array_equal(np.asarray(ra.num_evals), np.asarray(rb.num_evals))
    assert b.last_run_stats["width"] <= W  # drained below the cap


def test_pad_width_matches():
    """L < W with pad_width: the working set pads up to the next power-of-2
    bucket (capped at max_width) with duplicate lanes so a small bounded set
    of canonical-width programs gets reused; results unchanged."""
    L, W = 3, 8
    targets = jnp.asarray(RNG.randn(L, 5).astype(np.float32))
    p0 = {"x": jnp.zeros((L, 5))}
    shared = {"bias": jnp.asarray(0.0)}

    a = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=60), segment_size=10)
    pa, _ = a.run(p0, {"target": targets}, shared)
    b = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=60), segment_size=10,
                     max_width=W, pad_width=True)
    pb, _ = b.run(p0, {"target": targets}, shared)
    # 3 lanes bucket to width 4, not all the way to max_width=8
    assert b.last_run_stats["width"] == 4
    np.testing.assert_array_equal(np.asarray(pa["x"]), np.asarray(pb["x"]))

    # a lane count above max_width still streams at exactly max_width
    L2 = 11
    t2 = jnp.asarray(RNG.randn(L2, 5).astype(np.float32))
    c = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=60), segment_size=10,
                     max_width=W, pad_width=True)
    pc, _ = c.run({"x": jnp.zeros((L2, 5))}, {"target": t2}, shared)
    assert c.last_run_stats["width"] == W
    d = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=60), segment_size=10)
    pd, _ = d.run({"x": jnp.zeros((L2, 5))}, {"target": t2}, shared)
    np.testing.assert_array_equal(np.asarray(pd["x"]), np.asarray(pc["x"]))


def test_prepare_constant_aux_is_identical():
    """With a constant aux that doesn't affect the objective, the prepare
    (rank-freeze) path must walk the exact same trajectory; only the
    per-iteration re-evaluation changes the eval counter."""
    L = 5
    targets = jnp.asarray(RNG.randn(L, 6).astype(np.float32))
    p0 = {"x": jnp.zeros((L, 6))}
    lanes = {"target": targets}
    shared = {"bias": jnp.asarray(0.0)}

    a = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=60), segment_size=10)
    pa, ra = a.run(p0, lanes, shared)

    def fun_aux(p, lane, shared, aux):
        return quad_fun(p, lane, shared) + 0.0 * aux

    b = BatchedLbfgs(fun_aux, LbfgsOptions(max_iter=60), segment_size=10,
                     prepare=lambda p, lane, shared: jnp.zeros(()))
    pb, rb = b.run(p0, lanes, shared)
    np.testing.assert_allclose(np.asarray(pa["x"]), np.asarray(pb["x"]), atol=1e-7)
    assert (np.asarray(rb.num_evals) >= np.asarray(ra.num_evals)).all()


def test_prepare_piecewise_objective_converges():
    """aux = nearest anchor id, recomputed per iteration (the rank-freeze
    pattern): the descent must land on the true nearest anchor even though
    line-search trials hold the assignment fixed."""
    anchors = jnp.asarray(np.array([[-3.0, 0.0], [2.0, 1.0], [5.0, -2.0]], np.float32))

    def prepare(p, lane, shared):
        d = jnp.sum((anchors - p["x"][None, :]) ** 2, axis=-1)
        return jnp.argmin(d)

    def fun(p, lane, shared, aux):
        return jnp.sum((p["x"] - anchors[aux]) ** 2) + shared["bias"]

    p0 = {"x": jnp.asarray(np.array([[1.4, 0.9], [4.0, -1.0]], np.float32))}
    lanes = {"target": jnp.zeros((2, 1))}
    shared = {"bias": jnp.asarray(0.0)}
    solver = BatchedLbfgs(fun, LbfgsOptions(max_iter=50), segment_size=10, prepare=prepare)
    p_opt, res = solver.run(p0, lanes, shared)
    out = np.asarray(p_opt["x"])
    np.testing.assert_allclose(out[0], np.array([2.0, 1.0]), atol=1e-4)   # nearest to (1.4, .9)
    np.testing.assert_allclose(out[1], np.array([5.0, -2.0]), atol=1e-4)  # nearest to (4, -1)


def test_warmup_iter_cap_composes_with_iter_cap():
    """warmup_iter_cap=1 (bench.py's compile-only warmup) stops every lane
    after ~1 iteration even when the caller set its own higher iter_cap, and
    clearing it restores the full descent — same compiled programs."""
    L = 4
    targets = jnp.asarray(RNG.randn(L, 6).astype(np.float32))
    p0 = {"x": jnp.zeros((L, 6))}
    lanes = {"target": targets}
    shared = {"bias": jnp.asarray(0.0)}

    solver = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=60), segment_size=10)
    solver.iter_cap = 30
    solver.warmup_iter_cap = 1
    p_w, res_w = solver.run(p0, lanes, shared)
    assert int(np.max(np.asarray(res_w.num_iters))) <= 1
    assert not np.allclose(np.asarray(p_w["x"]), np.asarray(targets), atol=1e-3)

    solver.warmup_iter_cap = None
    p_f, res_f = solver.run(p0, lanes, shared)
    assert int(np.max(np.asarray(res_f.num_iters))) > 1

    ref = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=60), segment_size=10)
    ref.iter_cap = 30
    p_r, _ = ref.run(p0, lanes, shared)
    np.testing.assert_allclose(np.asarray(p_f["x"]), np.asarray(p_r["x"]), atol=1e-6)
