"""L-BFGS with strong-Wolfe line search as a single XLA program.

The reference drives every optimization stage with ``torch.optim.LBFGS(...,
line_search_fn="strong_wolfe")`` (``optimization.py:46-53,176-183,319-326``,
``markers_utils.py:428-435``, ``hmr_utils.py:281-288``) — an eager host loop
re-launching the closure per evaluation.  Here the whole minimization is one
jitted program: ``lax.while_loop`` over iterations with data-dependent
termination (max_iter up to 10000, tolerance_grad/tolerance_change), so the
solve never recompiles per iteration count and never syncs to host
(SURVEY.md §7 hard part 1).

Algorithmic semantics follow torch.optim.LBFGS:
  * two-loop recursion over a circular (s, y) history with gamma scaling;
  * curvature pairs stored only when y.s > 1e-10;
  * first-iteration step  t0 = lr * min(1, 1/||g||_1);
  * strong Wolfe (c1=1e-4, c2=0.9, max 25 evals) with cubic interpolation
    bracketing + zoom;
  * stop on max|g| <= tolerance_grad, max|t*d| <= tolerance_change, or
    |f - f_prev| < tolerance_change.

vmap-compatible: batching over hypotheses runs A line searches in lockstep
(each lane keeps its own bracket), which is how the per-yaw-angle stage loop
becomes one batched program (SURVEY.md §2.8).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree


@dataclasses.dataclass(frozen=True)
class LbfgsOptions:
    max_iter: int = 100
    tolerance_grad: float = 1e-7
    tolerance_change: float = 1e-9
    history_size: int = 10
    lr: float = 1.0
    max_ls: int = 25
    c1: float = 1e-4
    c2: float = 0.9
    # iterations per device call when driven by the segmented host loop
    # (bounds single-execution wall time; some TPU transports kill
    # minutes-long executions). None = single while_loop to completion.
    segment_size: int | None = None


class LbfgsResult(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    grad_norm: jnp.ndarray
    num_iters: jnp.ndarray
    num_evals: jnp.ndarray


class LbfgsState(NamedTuple):
    """Full optimizer state — lives on device across segment calls."""

    x: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    f_prev: jnp.ndarray
    S: jnp.ndarray  # [H, n]
    Y: jnp.ndarray  # [H, n]
    rho: jnp.ndarray  # [H]
    hist: jnp.ndarray
    n_iter: jnp.ndarray
    n_evals: jnp.ndarray
    done: jnp.ndarray


def _cubic_interpolate(x1, f1, g1, x2, f2, g2, xmin, xmax):
    """torch.optim.lbfgs._cubic_interpolate, branch-free."""
    d1 = g1 + g2 - 3 * (f1 - f2) / (x1 - x2)
    d2_sq = d1 * d1 - g1 * g2
    d2 = jnp.sqrt(jnp.maximum(d2_sq, 0.0))
    min_pos_12 = x2 - (x2 - x1) * ((g2 + d2 - d1) / (g2 - g1 + 2 * d2))
    min_pos_21 = x1 - (x1 - x2) * ((g1 + d2 - d1) / (g1 - g2 + 2 * d2))
    min_pos = jnp.where(x1 <= x2, min_pos_12, min_pos_21)
    mid = (xmin + xmax) / 2.0
    out = jnp.where(d2_sq >= 0, jnp.clip(min_pos, xmin, xmax), mid)
    # guard divide-by-zero pathologies
    return jnp.where(jnp.isfinite(out), out, mid)


def _strong_wolfe(eval_fd, x, t, d, f, g, gtd, opts: LbfgsOptions):
    """torch.optim.lbfgs._strong_wolfe, restructured as a single-eval-site
    state machine: ONE ``eval_fd`` call per loop iteration serves both the
    bracketing and zoom phases.  This matters for compile time — the naive
    two-loop form inlines the full forward+backward graph three times and
    XLA compile cost scales superlinearly with program size.

    ``eval_fd(t) -> (f_new, g_new)`` evaluates at x + t*d.
    Returns (f_new, g_new, t, n_evals).
    """
    c1, c2 = opts.c1, opts.c2
    tol = 1e-9  # torch hard-codes tolerance_change=1e-9 inside the line search
    d_norm = jnp.max(jnp.abs(d))
    n = d.shape[0]
    dtype = f.dtype

    BRACKET, ZOOM = 0, 1

    # carry:
    #   phase, done, ls_iter (torch's counter = evals after the first),
    #   t_c (candidate evaluated at the top of each iteration),
    #   t_p, f_p, g_p, gtd_p (bracket-phase previous point),
    #   br_t[2], br_f[2], br_g[2, n], br_gtd[2], insuf
    def low_high(bf):
        low = jnp.where(bf[0] <= bf[1], 0, 1)
        return low, 1 - low

    def cond(c):
        return (~c["done"]) & (c["ls_iter"] < opts.max_ls)

    def body(c):
        t_c = c["t_c"]
        f_c, g_c = eval_fd(t_c)  # the single evaluation site
        gtd_c = jnp.dot(g_c, d)
        in_bracket = c["phase"] == BRACKET

        # ---------------- bracket-phase checks (torch loop top) ----------
        armijo_fail = (f_c > f + c1 * t_c * gtd) | ((c["ls_iter"] > 1) & (f_c >= c["f_p"]))
        wolfe_ok = jnp.abs(gtd_c) <= -c2 * gtd
        grad_pos = gtd_c >= 0
        hit = armijo_fail | wolfe_ok | grad_pos
        wolfe_exit_b = in_bracket & wolfe_ok & ~armijo_fail
        to_zoom = in_bracket & hit & ~wolfe_exit_b

        sel_prev = armijo_fail | grad_pos
        bt_new = jnp.where(sel_prev, jnp.stack([c["t_p"], t_c]), jnp.stack([t_c, t_c]))
        bf_new = jnp.where(sel_prev, jnp.stack([c["f_p"], f_c]), jnp.stack([f_c, f_c]))
        bg_new = jnp.where(sel_prev, jnp.stack([c["g_p"], g_c]), jnp.stack([g_c, g_c]))
        bgtd_new = jnp.where(sel_prev, jnp.stack([c["gtd_p"], gtd_c]), jnp.stack([gtd_c, gtd_c]))
        # wolfe exit: both bracket slots = the accepted point
        bt_new = jnp.where(wolfe_exit_b, jnp.stack([t_c, t_c]), bt_new)
        bf_new = jnp.where(wolfe_exit_b, jnp.stack([f_c, f_c]), bf_new)
        bg_new = jnp.where(wolfe_exit_b, jnp.stack([g_c, g_c]), bg_new)
        bgtd_new = jnp.where(wolfe_exit_b, jnp.stack([gtd_c, gtd_c]), bgtd_new)

        # bracket-phase continuation: extrapolate the next candidate
        min_step = t_c + 0.01 * (t_c - c["t_p"])
        max_step = t_c * 10.0
        t_next_b = _cubic_interpolate(c["t_p"], c["f_p"], c["gtd_p"], t_c, f_c, gtd_c, min_step, max_step)

        # ---------------- zoom-phase update (torch zoom, post-eval) ------
        low0, high0 = low_high(c["br_f"])
        z_fail = (f_c > f + c1 * t_c * gtd) | (f_c >= c["br_f"][low0])
        z_wolfe = jnp.abs(gtd_c) <= -c2 * gtd
        flip = gtd_c * (c["br_t"][high0] - c["br_t"][low0]) >= 0

        # fail: high <- t_c ; success: maybe high <- old low, then low <- t_c
        def z_update(arr, val):
            fail_arr = arr.at[high0].set(val)
            succ_arr = jnp.where(flip, arr.at[high0].set(arr[low0]), arr)
            succ_arr = succ_arr.at[low0].set(val)
            return jnp.where(z_fail, fail_arr, succ_arr)

        z_bt = z_update(c["br_t"], t_c)
        z_bf = z_update(c["br_f"], f_c)
        z_bg = z_update(c["br_g"], g_c)
        z_bgtd = z_update(c["br_gtd"], gtd_c)
        zoom_done = (~z_fail) & z_wolfe

        # ---------------- merge phases ----------------------------------
        # bracket continuation keeps [0, last evaluated t] so a max_ls
        # exhaustion returns torch's [0, t] bracket
        cont_bt = jnp.stack([jnp.zeros_like(t_c), t_c])
        cont_bf = jnp.stack([f, f_c])
        cont_bg = jnp.stack([g, g_c])
        cont_bgtd = jnp.stack([gtd, gtd_c])
        br_t = jnp.where(in_bracket, jnp.where(hit, bt_new, cont_bt), z_bt)
        br_f = jnp.where(in_bracket, jnp.where(hit, bf_new, cont_bf), z_bf)
        br_g = jnp.where(in_bracket, jnp.where(hit, bg_new, cont_bg), z_bg)
        br_gtd = jnp.where(in_bracket, jnp.where(hit, bgtd_new, cont_bgtd), z_bgtd)

        entering_zoom = to_zoom | (~in_bracket)
        phase = jnp.where(in_bracket & ~hit, BRACKET, ZOOM)
        done = c["done"] | wolfe_exit_b | ((~in_bracket) & zoom_done)

        # next zoom candidate from the (updated) bracket + safeguards
        t_z = _cubic_interpolate(
            br_t[0], br_f[0], br_gtd[0], br_t[1], br_f[1], br_gtd[1],
            jnp.minimum(br_t[0], br_t[1]), jnp.maximum(br_t[0], br_t[1]),
        )
        bmax = jnp.maximum(br_t[0], br_t[1])
        bmin = jnp.minimum(br_t[0], br_t[1])
        eps = 0.1 * (bmax - bmin)
        close_to_edge = jnp.minimum(bmax - t_z, t_z - bmin) < eps
        force = c["insuf"] | (t_z >= bmax) | (t_z <= bmin)
        t_forced = jnp.where(jnp.abs(t_z - bmax) < jnp.abs(t_z - bmin), bmax - eps, bmin + eps)
        t_z_final = jnp.where(close_to_edge & force, t_forced, t_z)
        insuf = jnp.where(entering_zoom, close_to_edge & ~force, c["insuf"])

        # zoom width termination (torch zoom-loop top check)
        width_done = entering_zoom & (jnp.abs(br_t[1] - br_t[0]) * d_norm < tol)
        done = done | width_done

        t_next = jnp.where(entering_zoom, t_z_final, t_next_b)

        return {
            "phase": phase,
            "done": done,
            "ls_iter": c["ls_iter"] + 1,
            "t_c": t_next,
            "t_p": jnp.where(in_bracket & ~hit, t_c, c["t_p"]),
            "f_p": jnp.where(in_bracket & ~hit, f_c, c["f_p"]),
            "g_p": jnp.where(in_bracket & ~hit, g_c, c["g_p"]),
            "gtd_p": jnp.where(in_bracket & ~hit, gtd_c, c["gtd_p"]),
            "br_t": br_t,
            "br_f": br_f,
            "br_g": br_g,
            "br_gtd": br_gtd,
            "insuf": insuf,
        }

    init = {
        "phase": jnp.asarray(BRACKET),
        "done": jnp.asarray(False),
        "ls_iter": jnp.asarray(0),
        "t_c": t,
        "t_p": jnp.zeros_like(t),
        "f_p": f,
        "g_p": g,
        "gtd_p": gtd,
        # pre-seed the bracket with [0, t0-ish]; only read once in zoom after
        # a max_ls bracket exhaustion (torch uses [0, last_t] there too)
        "br_t": jnp.stack([jnp.zeros_like(t), t]),
        "br_f": jnp.stack([f, f]),
        "br_g": jnp.stack([g, g]),
        "br_gtd": jnp.stack([gtd, gtd]),
        "insuf": jnp.asarray(False),
    }
    out = jax.lax.while_loop(cond, body, init)

    low, _ = low_high(out["br_f"])
    n_evals = 1 + out["ls_iter"]  # approximate torch's ls_func_evals accounting
    return out["br_f"][low], out["br_g"][low], out["br_t"][low], n_evals


def lbfgs_init(fun: Callable[..., jnp.ndarray], x0: jnp.ndarray, opts: LbfgsOptions,
               prepare: Callable[[jnp.ndarray], object] | None = None) -> LbfgsState:
    """Evaluate f/g at x0 and build the initial optimizer state.

    ``prepare`` (optional): ``prepare(x) -> aux`` computes non-differentiated
    auxiliary data (e.g. nearest-vertex ids) once per iterate; ``fun`` then
    takes ``(x, aux)``.  See ``make_lbfgs_step``.
    """
    if prepare is not None:
        aux0 = prepare(x0)
        f0, g0 = jax.value_and_grad(lambda x: fun(x, aux0))(x0)
    else:
        f0, g0 = jax.value_and_grad(fun)(x0)
    n = x0.shape[0]
    H = opts.history_size
    dtype = x0.dtype
    return LbfgsState(
        x=x0, f=f0, g=g0, f_prev=f0 + 1.0,
        S=jnp.zeros((H, n), dtype), Y=jnp.zeros((H, n), dtype), rho=jnp.zeros((H,), dtype),
        hist=jnp.asarray(0), n_iter=jnp.asarray(0), n_evals=jnp.asarray(1),
        done=jnp.max(jnp.abs(g0)) <= opts.tolerance_grad,
    )


def make_lbfgs_step(fun: Callable[..., jnp.ndarray], opts: LbfgsOptions,
                    prepare: Callable[[jnp.ndarray], object] | None = None):
    """One full L-BFGS iteration (direction + strong-Wolfe line search +
    history/convergence update): ``step(state) -> state``.

    With ``prepare``, each iteration recomputes ``aux = prepare(x)`` at the
    accepted iterate, re-evaluates (f, g) under that aux (one extra closure
    eval, counted), and holds aux FIXED for every line-search trial — the
    rank-freeze optimization: the expensive non-differentiated part of the
    objective (dense-forward nearest-vertex ranking) runs once per
    iteration instead of once per evaluation.  All quantities within an
    iteration (direction, Wolfe conditions, curvature pair y = g_new - g)
    are consistent under the same aux; at convergence aux is stationary, so
    the fixed point satisfies the original objective's conditions.
    """
    H = opts.history_size

    def body(state: LbfgsState) -> LbfgsState:
        (x, f, g, f_prev, S, Y, rho, hist, n_iter, n_evals, _done) = state
        if prepare is not None:
            aux = prepare(x)
            f, g = jax.value_and_grad(lambda x_: fun(x_, aux))(x)
            n_evals = n_evals + 1

            def eval_at(x_):
                return jax.value_and_grad(lambda xx: fun(xx, aux))(x_)
        else:
            def eval_at(x_):
                return jax.value_and_grad(fun)(x_)
        dtype = x.dtype

        # ---- direction: two-loop recursion ----
        num = jnp.minimum(hist, H)

        def first_dir():
            return -g

        def hist_dir():
            q = -g
            al = jnp.zeros((H,), dtype)

            def bwd(i, qa):
                q, al = qa
                # iterate most-recent first: slot = (hist - 1 - i) mod H
                slot = jnp.mod(hist - 1 - i, H)
                valid = i < num
                a_i = rho[slot] * jnp.dot(S[slot], q)
                a_i = jnp.where(valid, a_i, 0.0)
                q = q - a_i * Y[slot]
                return q, al.at[slot].set(a_i)

            q, al = jax.lax.fori_loop(0, H, bwd, (q, al))
            last = jnp.mod(hist - 1, H)
            ys = jnp.dot(Y[last], S[last])
            yy = jnp.dot(Y[last], Y[last])
            gamma = ys / jnp.maximum(yy, 1e-20)
            r = q * gamma

            def fwd(i, r):
                # oldest first: slot = (hist - num + i) mod H
                slot = jnp.mod(hist - num + i, H)
                valid = i < num
                be = rho[slot] * jnp.dot(Y[slot], r)
                upd = (al[slot] - be) * S[slot]
                return r + jnp.where(valid, upd, 0.0)

            return jax.lax.fori_loop(0, H, fwd, r)

        d = jax.lax.cond(hist == 0, first_dir, hist_dir)

        gtd = jnp.dot(g, d)
        # directional derivative below machine tolerance -> stop
        dd_break = gtd > -opts.tolerance_change

        t0 = jnp.where(
            n_iter == 0,
            opts.lr * jnp.minimum(1.0, 1.0 / jnp.maximum(jnp.sum(jnp.abs(g)), 1e-20)),
            jnp.asarray(opts.lr, dtype),
        )

        def eval_fd(t):
            return eval_at(x + t * d)

        def do_search():
            return _strong_wolfe(eval_fd, x, t0, d, f, g, gtd, opts)

        def skip_search():
            return f, g, jnp.zeros_like(t0), jnp.asarray(0)

        f_new, g_new, t, evals = jax.lax.cond(dd_break, skip_search, do_search)

        x_new = x + t * d

        # ---- history update (torch: store if ys > 1e-10) ----
        s = t * d
        y = g_new - g
        ys = jnp.dot(y, s)
        store = ys > 1e-10
        slot = jnp.mod(hist, H)
        S_new = jnp.where(store, S.at[slot].set(s), S)
        Y_new = jnp.where(store, Y.at[slot].set(y), Y)
        rho_new = jnp.where(store, rho.at[slot].set(1.0 / ys), rho)
        hist_new = jnp.where(store, hist + 1, hist)

        # ---- convergence ----
        grad_small = jnp.max(jnp.abs(g_new)) <= opts.tolerance_grad
        step_small = jnp.max(jnp.abs(s)) <= opts.tolerance_change
        f_small = jnp.abs(f_new - f) < opts.tolerance_change
        done = dd_break | grad_small | step_small | f_small

        # if dd_break, do not take the step
        x_out = jnp.where(dd_break, x, x_new)
        f_out = jnp.where(dd_break, f, f_new)
        g_out = jnp.where(dd_break, g, g_new)

        return LbfgsState(
            x=x_out, f=f_out, g=g_out, f_prev=f, S=S_new, Y=Y_new, rho=rho_new,
            hist=hist_new, n_iter=n_iter + 1, n_evals=n_evals + evals, done=done,
        )

    return body


def run_lbfgs_segment(fun, state: LbfgsState, opts: LbfgsOptions, num_iters: int,
                      prepare=None, iter_cap=None) -> LbfgsState:
    """Advance the optimizer by up to ``num_iters`` iterations (or until
    done / max_iter) as one bounded device program.  vmap-compatible.

    ``iter_cap`` (optional, may be a traced scalar): additional per-lane
    TOTAL-iteration ceiling checked inside the loop, so caps below
    ``num_iters`` are exact — a lane stops at ``n_iter == iter_cap`` instead
    of running out the whole segment.  Passing it as a device scalar keeps
    ONE compiled program for every cap value."""
    step = make_lbfgs_step(fun, opts, prepare=prepare)

    def cond(c):
        s, k = c
        alive = (~s.done) & (s.n_iter < opts.max_iter) & (k < num_iters)
        if iter_cap is not None:
            alive = alive & (s.n_iter < iter_cap)
        return alive

    def body(c):
        s, k = c
        return step(s), k + 1

    out, _ = jax.lax.while_loop(cond, body, (state, jnp.asarray(0)))
    return out


def _result(state: LbfgsState) -> LbfgsResult:
    return LbfgsResult(
        x=state.x, f=state.f, grad_norm=jnp.max(jnp.abs(state.g)),
        num_iters=state.n_iter, num_evals=state.n_evals,
    )


def lbfgs_minimize_flat(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    opts: LbfgsOptions,
) -> LbfgsResult:
    """Minimize ``fun`` (flat-vector -> scalar) from ``x0``.

    ``opts.segment_size`` None: one ``lax.while_loop`` to completion (use
    inside larger jitted programs).  Set: a host loop re-invokes a bounded
    segment program, keeping state on device between calls — robust against
    transports that kill long single executions, identical semantics.
    """
    state = lbfgs_init(fun, x0, opts)
    if opts.segment_size is None:
        return _result(run_lbfgs_segment(fun, state, opts, opts.max_iter))

    segment = jax.jit(lambda s: run_lbfgs_segment(fun, s, opts, opts.segment_size))
    import numpy as _np

    while True:
        state = segment(state)
        if bool(_np.asarray(state.done)) or int(state.n_iter) >= opts.max_iter:
            break
    return _result(state)


def lbfgs_minimize(fun, params0, opts: LbfgsOptions) -> Tuple[object, LbfgsResult]:
    """Pytree front-end: minimize ``fun(params) -> scalar``; returns
    (optimized params, result stats)."""
    x0, unravel = ravel_pytree(params0)

    def flat_fun(x):
        return fun(unravel(x))

    res = lbfgs_minimize_flat(flat_fun, x0, opts)
    return unravel(res.x), res


@functools.partial(jax.jit, donate_argnums=())
def _tree_take(tree, idx):
    return jax.tree_util.tree_map(lambda a: a[idx], tree)


@functools.partial(jax.jit, donate_argnums=(0,))
def _tree_scatter(pool, idx, rows):
    """pool[idx] = rows (duplicate idx carry identical row values)."""
    return jax.tree_util.tree_map(lambda p, r: p.at[idx].set(r), pool, rows)


class BatchedLbfgs:
    """Segmented, batched L-BFGS driver with persistent compiled programs.

    ``fun(params, lane_arg, shared) -> scalar`` is minimized independently
    for every lane of a leading batch axis (lane_args batched, shared
    broadcast).  Lanes advance in lockstep segments of ``segment_size``
    iterations per device call; the host loop stops when every lane
    converges or hits max_iter — so no single device execution runs longer
    than one segment (some TPU transports kill minutes-long executions).
    ``lane_chunk`` groups lanes through ``lax.map`` to bound memory (the
    part-fit pattern).

    This is the TPU-native replacement for the reference's sequential
    per-hypothesis / per-subtree optimizer loops; build ONCE per stage so
    the init/segment programs stay in the jit cache across sequences.

    Streaming (``max_width``): the device programs run a fixed WORKING SET
    of W lanes; all L lanes live in a device-resident pool.  When a working
    lane converges it retires to the pool and a queued lane refills its
    slot, so (a) L can exceed the largest stable program width on the chip,
    (b) exactly ONE program shape per stage compiles regardless of L, and
    (c) converged lanes stop consuming closure evaluations (the lockstep
    ride-along cost is bounded by the final drain, where duplicates of
    still-live lanes pad the working set — duplicates evolve identically,
    so results are bit-equal to the unstreamed solve).
    """

    def __init__(self, fun, opts: LbfgsOptions, segment_size: int = 100,
                 lane_chunk: int | None = None, max_width: int | None = None,
                 pad_width: bool = False, drain_shrink: bool = False,
                 prepare=None, aot=None, name: str = "lbfgs"):
        self.fun = fun
        # optional solver/aot.AotCache: serialize the traced+lowered
        # init/segment programs to disk so later PROCESSES skip tracing and
        # lowering (the round-3 bench burned 824 s of per-process tracing
        # for a 53.5 s solve).  ``name`` keys the entries per stage.
        self.aot = aot
        self.name = name
        # optional rank-freeze hook: prepare(params, lane, shared) -> aux
        # computed once per L-BFGS iteration; fun then takes
        # (params, lane, shared, aux).  See make_lbfgs_step.
        self.prepare = prepare
        self.opts = opts
        self.segment_size = segment_size
        self.lane_chunk = lane_chunk
        # device-program lane width cap; None = all lanes in one program
        self.max_width = max_width
        # pad the working set UP to max_width even when L < max_width, so a
        # smaller batch reuses the canonical-width compiled programs
        self.pad_width = pad_width
        # shrink the working set by halvings once the refill queue drains
        # (opt-in: every new width re-traces the segment program — see
        # drained_width below and Benchmarks.md's counter-result)
        self.drain_shrink = drain_shrink
        # warmup mode: stop after this many device segments regardless of
        # convergence (results are partial descents).  The segment/init
        # programs are IDENTICAL to a full run (opts are unchanged), so this
        # compiles every program of a stage at a bounded cost — bench.py's
        # compile-only warmup (VERDICT r2 item 1).
        self.abort_after_segments = None
        # PER-LANE iteration cap: lanes stop once n_iter >= iter_cap even
        # though opts.max_iter (baked into the compiled segment program) is
        # higher.  The cap is enforced INSIDE the segment loop (passed to the
        # device program as a dynamic scalar — one compiled program for every
        # cap value), so budgets are exact even below segment_size: a 15-iter
        # cap costs ~15 iterations, not a full 50-iter segment.  Per-LANE, so
        # it is correct under streaming (every lane gets its cap, regardless
        # of when it enters the working set) — used by hypothesis/part
        # pruning's partial-descent phases (parallel/batch_solver.py,
        # pipeline/part_fit.py).  Zero extra traces/compiles vs uncapped.
        self.iter_cap = None
        # warmup override: min-composed with iter_cap/max_iter at every
        # run(), INCLUDING runs whose caller sets its own iter_cap (the
        # prune cascades).  bench.py's compile-only warmup sets this to 1 so
        # every stage program is loaded/compiled and dispatched once but
        # executes ~1 iteration per lane instead of a full descent — the
        # warmup pays program-load cost, not solve cost.
        self.warmup_iter_cap = None
        # optional pytree placer (e.g. NamedSharding over a mesh 'data' axis)
        # applied to the optimizer state + lane args at init and after every
        # refill, so lanes stay sharded across devices
        self.reshard = None
        # optional per-segment observer: snapshot(global_lane_idx, n_iter,
        # params_pytree) called after every segment with the CURRENT
        # parameters of the working-set lanes.  The segmented host loop
        # already syncs per segment, so this is the natural bounded-rate
        # analog of the reference's per-iteration ``iter_fn`` protocol
        # (``multimodal.py:102-142``) with no extra device round-trips.
        self.snapshot = None
        # honest eval accounting for the last run() (VERDICT r2 item 4):
        #   lane_evals   — sum of per-lane closure evals (useful work; the
        #                  vmapped while_loop freezes finished lanes, so
        #                  their counters stop);
        #   device_evals — lower bound of evals the chip actually burned:
        #                  per segment, width x max per-lane evals (lockstep
        #                  lanes ride until the segment's slowest lane);
        #   segments / refills — host-loop round trips & lane swap-ins.
        self.last_run_stats: dict = {}
        self._built = {}  # shape-signature -> (init_fn, seg_fn, unravel)

    def _build(self, params_single, eff_chunk: int | None):
        """Build (init, segment) programs; ``eff_chunk`` groups lanes through
        ``lax.map`` in blocks of that size (bounds concurrent closure memory
        — decided per lane count at run time)."""
        _, unravel = ravel_pytree(params_single)
        opts = self.opts
        fun = self.fun
        prepare = self.prepare

        if prepare is None:
            def init_one(params, lane_arg, shared):
                x0, _ = ravel_pytree(params)
                return lbfgs_init(lambda x: fun(unravel(x), lane_arg, shared), x0, opts)

            def seg_one(state, lane_arg, shared, cap):
                return run_lbfgs_segment(
                    lambda x: fun(unravel(x), lane_arg, shared),
                    state, opts, self.segment_size, iter_cap=cap,
                )
        else:
            def init_one(params, lane_arg, shared):
                x0, _ = ravel_pytree(params)
                return lbfgs_init(
                    lambda x, aux: fun(unravel(x), lane_arg, shared, aux), x0, opts,
                    prepare=lambda x: prepare(unravel(x), lane_arg, shared),
                )

            def seg_one(state, lane_arg, shared, cap):
                return run_lbfgs_segment(
                    lambda x, aux: fun(unravel(x), lane_arg, shared, aux),
                    state, opts, self.segment_size,
                    prepare=lambda x: prepare(unravel(x), lane_arg, shared),
                    iter_cap=cap,
                )

        vmap_init = jax.vmap(init_one, in_axes=(0, 0, None))
        vmap_seg = jax.vmap(seg_one, in_axes=(0, 0, None, None))

        def maybe_aot(tag, jit_fn):
            # exported programs carry no sharding annotations — keep plain
            # jit under a mesh (reshard set) so GSPMD sees the input layouts
            if self.aot is None or self.reshard is not None:
                return jit_fn
            return self.aot.wrap(f"{self.name}:{tag}", jit_fn)

        if eff_chunk is None:
            return maybe_aot("init", jax.jit(vmap_init)), maybe_aot("seg", jax.jit(vmap_seg)), unravel
        else:
            C = eff_chunk

            def grouped_init(fn):
                def run(tree, lane_args, shared):
                    L = jax.tree_util.tree_leaves(tree)[0].shape[0]
                    G = L // C

                    def g(t):
                        return jax.tree_util.tree_map(lambda a: a.reshape((G, C) + a.shape[1:]), t)

                    out = jax.lax.map(lambda args: fn(*args, shared), (g(tree), g(lane_args)))
                    return jax.tree_util.tree_map(lambda a: a.reshape((L,) + a.shape[2:]), out)

                return run

            def grouped_seg(fn):
                def run(tree, lane_args, shared, cap):
                    L = jax.tree_util.tree_leaves(tree)[0].shape[0]
                    G = L // C

                    def g(t):
                        return jax.tree_util.tree_map(lambda a: a.reshape((G, C) + a.shape[1:]), t)

                    out = jax.lax.map(lambda args: fn(*args, shared, cap), (g(tree), g(lane_args)))
                    return jax.tree_util.tree_map(lambda a: a.reshape((L,) + a.shape[2:]), out)

                return run

            return (maybe_aot("init_g", jax.jit(grouped_init(vmap_init))),
                    maybe_aot("seg_g", jax.jit(grouped_seg(vmap_seg))), unravel)

    @staticmethod
    def _take(tree, idx):
        """Jitted row gather along axis 0 of every leaf."""
        return _tree_take(tree, idx)

    def run(self, params0_batch, lane_args, shared) -> Tuple[object, LbfgsResult]:
        import numpy as _np

        L = jax.tree_util.tree_leaves(params0_batch)[0].shape[0]
        # working-set width: cap at max_width (streaming); pad_width rounds
        # small batches UP to the next power-of-2 bucket (capped at
        # max_width) so the number of distinct compiled program widths stays
        # bounded at log2(max_width) without the ride-along waste of padding
        # every small lane set all the way to max_width (e.g. the 4 pruned-
        # survivor lanes no longer burn 4x device evals in a 16-wide program)
        if self.max_width is not None and L > self.max_width:
            W = int(self.max_width)
        elif self.pad_width and self.max_width is not None and L < self.max_width:
            W = min(1 << max(L - 1, 1).bit_length(), int(self.max_width)) if L > 1 else 1
        else:
            W = L
        W0 = W  # initial width (drain_shrink floor logic)
        # group lanes through lax.map only when the working set is big
        # enough to threaten HBM; small sets (e.g. 4 hypothesis lanes) stay
        # one vmap
        C = self.lane_chunk

        def programs_for(width):
            eff = C if (C is not None and width > C and width % C == 0) else None
            sig = lambda tree: tuple(
                (str(p), (width,) + a.shape[1:], str(a.dtype))
                for p, a in jax.tree_util.tree_flatten_with_path(tree)[0]
            )
            k = (eff,) + sig(params0_batch) + sig(lane_args)
            if k not in self._built:
                self._built[k] = self._build(
                    jax.tree_util.tree_map(lambda a: a[0], params0_batch), eff
                )
            return self._built[k]

        init_fn, seg_fn, unravel = programs_for(W)

        import os as _os
        import time as _time

        debug = _os.environ.get("UUO_DEBUG_LBFGS")
        if self.reshard is not None:
            params0_batch = self.reshard(params0_batch)
            lane_args = self.reshard(lane_args)

        # ---- init the pool in W-wide chunks (row j of chunk s = lane
        #      min(s+j, L-1); tail duplicates beyond L are sliced off)
        pool_chunks = []
        for s in range(0, L, W):
            idx0 = jnp.asarray(_np.clip(_np.arange(s, s + W), 0, L - 1))
            st = init_fn(self._take(params0_batch, idx0), self._take(lane_args, idx0), shared)
            pool_chunks.append(st)
        if len(pool_chunks) == 1 and W == L:
            pool = pool_chunks[0]
        else:
            pool = jax.tree_util.tree_map(
                lambda *cs: jnp.concatenate(cs, axis=0)[:L], *pool_chunks
            )
        if self.reshard is not None:
            pool = self.reshard(pool)

        finished = _np.zeros(L, bool)
        evals_prev = _np.asarray(pool.n_evals).astype(_np.int64)
        device_evals = int(W * (len(pool_chunks)))  # init evals burned
        segments = 0
        refills = 0

        cap = self.opts.max_iter if self.iter_cap is None else min(
            self.opts.max_iter, int(self.iter_cap))
        if self.warmup_iter_cap is not None:
            cap = min(cap, int(self.warmup_iter_cap))
        cap_dev = jnp.asarray(cap, jnp.int32)

        def pick_active():
            """W working rows: live lanes first, padded with repeats of live
            lanes (duplicates evolve identically — writes are bit-equal)."""
            live = _np.where(~finished)[0]
            if len(live) >= W:
                return live[:W]
            return _np.concatenate([live, live[_np.arange(W - len(live)) % len(live)]])

        def drained_width():
            """Once the refill queue is empty, duplicates pad the working
            set — pure ride-along.  With ``drain_shrink`` on, W halves to
            the smallest width fitting the live lanes.  MEASURED SLOWER for
            single-batch runs (Benchmarks.md): every new width re-TRACES the
            vmapped segment program (tracing is per-process, only compiles
            persist), costing far more host time than the retired duplicate
            evals save — opt in only for long-lived processes that solve
            many batches per stage shape."""
            live = int((~finished).sum())
            w = W
            while w // 2 >= max(live, 1):
                w //= 2
            return w

        active = pick_active()
        prev_active = None
        ws_state = None
        ws_args = None
        while True:
            if ws_state is None or not _np.array_equal(active, prev_active):
                act_j = jnp.asarray(active)
                ws_state = self._take(pool, act_j)
                ws_args = self._take(lane_args, act_j)
                if self.reshard is not None:
                    ws_state = self.reshard(ws_state)
                    ws_args = self.reshard(ws_args)
                if prev_active is not None:
                    refills += 1
                prev_active = active
            t0 = _time.time()
            ws_state = seg_fn(ws_state, ws_args, shared, cap_dev)
            segments += 1
            # ONE batched transfer for the per-segment control state (three
            # separate np.asarray fetches each paid a device->host sync —
            # over the TPU tunnel that is three network round-trips per
            # segment; a third of wall-clock went to host orchestration on
            # the 1-CPU host, VERDICT r3 item 6)
            done, iters, evals = jax.device_get(
                (ws_state.done, ws_state.n_iter, ws_state.n_evals))
            evals = evals.astype(_np.int64)
            fin_now = done | (iters >= cap)  # per-lane OR!
            # device burns W x (slowest lane's evals) per lockstep segment
            delta = evals - evals_prev[active]
            device_evals += int(W * max(int(delta.max()), 0))
            if self.snapshot is not None:
                params_np = jax.tree_util.tree_map(
                    _np.asarray, jax.vmap(unravel)(ws_state.x)
                )
                self.snapshot(active.copy(), iters.copy(), params_np)
            if debug:
                print(
                    f"[lbfgs] segment {_time.time() - t0:.1f}s  width {W}"
                    f"  live {int((~finished).sum())}/{L}"
                    f"  iters {iters.min()}-{iters.max()}"
                    f"  evalsΔ {int(delta.min())}-{int(delta.max())}"
                    f"  seg-finished {int(fin_now.sum())}/{fin_now.size}", flush=True,
                )
            evals_prev[active] = evals
            finished[active[fin_now]] = True

            def flush_pool():
                # write the working rows back to the pool (duplicate indices
                # carry identical values).  DEFERRED to the points that read
                # the pool — a refill re-gather or loop exit: lanes that
                # finished mid-stream stop evolving inside the segment
                # program (their cond is false), so skipping the scatter on
                # same-working-set segments is lossless and saves a device
                # dispatch + result churn per segment
                return _tree_scatter(pool, jnp.asarray(active), ws_state)

            if finished.all() or (
                self.abort_after_segments and segments >= self.abort_after_segments
            ):
                pool = flush_pool()
                break
            # pad_width exists to REUSE the canonical-width program for
            # small batches — shrinking below it would re-trace the very
            # program padding avoided, so drain_shrink only engages when
            # the batch genuinely overflowed the cap (L > initial width)
            if self.drain_shrink and L > W0:
                w_new = drained_width()
                if w_new < W:
                    W = w_new
                    init_fn, seg_fn, unravel = programs_for(W)
            new_active = pick_active()
            if not _np.array_equal(new_active, active):
                pool = flush_pool()
                active = new_active
                ws_state = None  # force re-gather from pool

        state_np = {f: _np.asarray(getattr(pool, f)) for f in ("x", "f", "g", "n_iter", "n_evals")}
        lane_evals = int(state_np["n_evals"].sum())
        self.last_run_stats = {
            "width": W,
            "lanes": L,
            "segments": segments,
            "refills": refills,
            "lane_evals": lane_evals,
            "device_evals": device_evals,
            "ride_along_evals": max(device_evals - lane_evals, 0),
        }
        x_all = jnp.asarray(state_np["x"])
        params_out = jax.vmap(unravel)(x_all)
        result = LbfgsResult(
            x=x_all,
            f=jnp.asarray(state_np["f"]),
            grad_norm=jnp.max(jnp.abs(jnp.asarray(state_np["g"])), axis=-1),
            num_iters=jnp.asarray(state_np["n_iter"]),
            num_evals=jnp.asarray(state_np["n_evals"]),
        )
        return params_out, result
