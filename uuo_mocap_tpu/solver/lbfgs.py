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
from functools import partial
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


class LbfgsResult(NamedTuple):
    x: jnp.ndarray
    f: jnp.ndarray
    grad_norm: jnp.ndarray
    num_iters: jnp.ndarray
    num_evals: jnp.ndarray


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
    """torch.optim.lbfgs._strong_wolfe.

    ``eval_fd(t) -> (f_new, g_new)`` evaluates at x + t*d.
    Returns (f_new, g_new, t, n_evals).
    """
    c1, c2 = opts.c1, opts.c2
    tol = 1e-9  # torch hard-codes tolerance_change=1e-9 inside the line search
    d_norm = jnp.max(jnp.abs(d))

    f_new, g_new = eval_fd(t)
    gtd_new = jnp.dot(g_new, d)

    # ---- bracketing phase ----
    # carry: (t_prev, f_prev, g_prev, gtd_prev, t, f_new, g_new, gtd_new,
    #         ls_iter, n_evals, done, found,
    #         br_t[2], br_f[2], br_g[2, n], br_gtd[2])
    def bracket_cond(c):
        (*_, ls_iter, _n, done, found, _bt, _bf, _bg, _bgtd) = c
        return (~done) & (~found) & (ls_iter < opts.max_ls)

    def bracket_body(c):
        (t_prev, f_prev, g_prev, gtd_prev, t, f_new, g_new, gtd_new,
         ls_iter, n_evals, done, found, br_t, br_f, br_g, br_gtd) = c

        armijo_fail = (f_new > f + c1 * t * gtd) | ((ls_iter > 1) & (f_new >= f_prev))
        wolfe_ok = jnp.abs(gtd_new) <= -c2 * gtd
        grad_pos = gtd_new >= 0

        hit = armijo_fail | wolfe_ok | grad_pos
        new_found = found | hit
        new_done = done | (wolfe_ok & ~armijo_fail)

        # bracket on armijo_fail / grad_pos: [t_prev, t]; on wolfe: [t, t]
        sel_prev = armijo_fail | grad_pos
        b_t = jnp.where(hit, jnp.where(sel_prev, jnp.stack([t_prev, t]), jnp.stack([t, t])), br_t)
        b_f = jnp.where(hit, jnp.where(sel_prev, jnp.stack([f_prev, f_new]), jnp.stack([f_new, f_new])), br_f)
        b_g = jnp.where(hit, jnp.where(sel_prev, jnp.stack([g_prev, g_new]), jnp.stack([g_new, g_new])), br_g)
        b_gtd = jnp.where(
            hit, jnp.where(sel_prev, jnp.stack([gtd_prev, gtd_new]), jnp.stack([gtd_new, gtd_new])), br_gtd
        )

        # interpolation step (only matters when not hit)
        min_step = t + 0.01 * (t - t_prev)
        max_step = t * 10.0
        t_next = _cubic_interpolate(t_prev, f_prev, gtd_prev, t, f_new, gtd_new, min_step, max_step)

        f_next, g_next = jax.lax.cond(hit, lambda: (f_new, g_new), lambda: eval_fd(t_next))
        gtd_next = jnp.dot(g_next, d)

        return (
            jnp.where(hit, t_prev, t),
            jnp.where(hit, f_prev, f_new),
            jnp.where(hit, g_prev, g_new),
            jnp.where(hit, gtd_prev, gtd_new),
            jnp.where(hit, t, t_next),
            jnp.where(hit, f_new, f_next),
            jnp.where(hit, g_new, g_next),
            jnp.where(hit, gtd_new, gtd_next),
            ls_iter + jnp.where(hit, 0, 1),
            n_evals + jnp.where(hit, 0, 1),
            new_done,
            new_found,
            b_t, b_f, b_g, b_gtd,
        )

    n = d.shape[0]
    zero2 = jnp.zeros((2,), f.dtype)
    zg2 = jnp.zeros((2, n), g.dtype)
    init = (
        jnp.zeros_like(t), f, g, gtd, t, f_new, g_new, gtd_new,
        jnp.asarray(0), jnp.asarray(1), jnp.asarray(False), jnp.asarray(False),
        zero2, zero2, zg2, zero2,
    )
    (t_prev, f_prev, g_prev, gtd_prev, t, f_new, g_new, gtd_new,
     ls_iter, n_evals, done, found, br_t, br_f, br_g, br_gtd) = jax.lax.while_loop(
        bracket_cond, bracket_body, init
    )

    # max_ls exhausted without bracket: [0, t]
    no_bracket = ~found & ~done
    br_t = jnp.where(no_bracket, jnp.stack([jnp.zeros_like(t), t]), br_t)
    br_f = jnp.where(no_bracket, jnp.stack([f, f_new]), br_f)
    br_g = jnp.where(no_bracket, jnp.stack([g, g_new]), br_g)
    br_gtd = jnp.where(no_bracket, jnp.stack([gtd, gtd_new]), br_gtd)

    # ---- zoom phase ----
    def low_high(bf):
        low = jnp.where(bf[0] <= bf[1], 0, 1)
        return low, 1 - low

    def zoom_cond(c):
        (br_t, br_f, _bg, _bgtd, ls_iter, _n, done, _ip) = c
        width_ok = jnp.abs(br_t[1] - br_t[0]) * d_norm >= tol
        return (~done) & (ls_iter < opts.max_ls) & width_ok

    def zoom_body(c):
        (br_t, br_f, br_g, br_gtd, ls_iter, n_evals, done, insuf) = c
        t_z = _cubic_interpolate(br_t[0], br_f[0], br_gtd[0], br_t[1], br_f[1], br_gtd[1],
                                 jnp.minimum(br_t[0], br_t[1]), jnp.maximum(br_t[0], br_t[1]))

        bmax = jnp.maximum(br_t[0], br_t[1])
        bmin = jnp.minimum(br_t[0], br_t[1])
        eps = 0.1 * (bmax - bmin)
        close_to_edge = jnp.minimum(bmax - t_z, t_z - bmin) < eps
        force = insuf | (t_z >= bmax) | (t_z <= bmin)
        t_forced = jnp.where(jnp.abs(t_z - bmax) < jnp.abs(t_z - bmin), bmax - eps, bmin + eps)
        t_z = jnp.where(close_to_edge & force, t_forced, t_z)
        new_insuf = close_to_edge & ~force

        f_z, g_z = eval_fd(t_z)
        gtd_z = jnp.dot(g_z, d)

        low, high = low_high(br_f)
        fail = (f_z > f + c1 * t_z * gtd) | (f_z >= br_f[low])

        # case fail: replace high with t_z
        br_t_f = br_t.at[high].set(t_z)
        br_f_f = br_f.at[high].set(f_z)
        br_g_f = br_g.at[high].set(g_z)
        br_gtd_f = br_gtd.at[high].set(gtd_z)

        # case success:
        wolfe_ok = jnp.abs(gtd_z) <= -c2 * gtd
        flip = gtd_z * (br_t[high] - br_t[low]) >= 0  # move high to old low
        br_t_s = jnp.where(flip, br_t.at[high].set(br_t[low]), br_t)
        br_f_s = jnp.where(flip, br_f.at[high].set(br_f[low]), br_f)
        br_g_s = jnp.where(flip, br_g.at[high].set(br_g[low]), br_g)
        br_gtd_s = jnp.where(flip, br_gtd.at[high].set(br_gtd[low]), br_gtd)
        br_t_s = br_t_s.at[low].set(t_z)
        br_f_s = br_f_s.at[low].set(f_z)
        br_g_s = br_g_s.at[low].set(g_z)
        br_gtd_s = br_gtd_s.at[low].set(gtd_z)

        return (
            jnp.where(fail, br_t_f, br_t_s),
            jnp.where(fail, br_f_f, br_f_s),
            jnp.where(fail, br_g_f, br_g_s),
            jnp.where(fail, br_gtd_f, br_gtd_s),
            ls_iter + 1,
            n_evals + 1,
            done | (~fail & wolfe_ok),
            new_insuf,
        )

    (br_t, br_f, br_g, br_gtd, ls_iter, n_evals, done, _ip) = jax.lax.while_loop(
        zoom_cond, zoom_body, (br_t, br_f, br_g, br_gtd, ls_iter, n_evals, done, jnp.asarray(False))
    )

    low, _ = low_high(br_f)
    return br_f[low], br_g[low], br_t[low], n_evals


def lbfgs_minimize_flat(
    fun: Callable[[jnp.ndarray], jnp.ndarray],
    x0: jnp.ndarray,
    opts: LbfgsOptions,
) -> LbfgsResult:
    """Minimize ``fun`` (flat-vector -> scalar) from ``x0``."""
    value_and_grad = jax.value_and_grad(fun)
    n = x0.shape[0]
    H = opts.history_size
    dtype = x0.dtype

    f0, g0 = value_and_grad(x0)

    def eval_at(x):
        return value_and_grad(x)

    # carry: x, f, g, f_prev, S[H,n], Y[H,n], rho[H], hist_count,
    #        n_iter, n_evals, done
    def cond(c):
        return (~c[-1]) & (c[-3] < opts.max_iter)

    def body(c):
        (x, f, g, f_prev, S, Y, rho, hist, n_iter, n_evals, _done) = c

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

        return (x_out, f_out, g_out, f, S_new, Y_new, rho_new, hist_new,
                n_iter + 1, n_evals + evals, done)

    S0 = jnp.zeros((H, n), dtype)
    Y0 = jnp.zeros((H, n), dtype)
    rho0 = jnp.zeros((H,), dtype)
    grad_already_small = jnp.max(jnp.abs(g0)) <= opts.tolerance_grad
    init = (x0, f0, g0, f0 + 1.0, S0, Y0, rho0, jnp.asarray(0),
            jnp.asarray(0), jnp.asarray(1), grad_already_small)

    (x, f, g, _fp, _S, _Y, _rho, _h, n_iter, n_evals, _done) = jax.lax.while_loop(cond, body, init)
    return LbfgsResult(x=x, f=f, grad_norm=jnp.max(jnp.abs(g)), num_iters=n_iter, num_evals=n_evals)


def lbfgs_minimize(fun, params0, opts: LbfgsOptions) -> Tuple[object, LbfgsResult]:
    """Pytree front-end: minimize ``fun(params) -> scalar``; returns
    (optimized params, result stats)."""
    x0, unravel = ravel_pytree(params0)

    def flat_fun(x):
        return fun(unravel(x))

    res = lbfgs_minimize_flat(flat_fun, x0, opts)
    return unravel(res.x), res
