"""Persistent AOT program cache (solver/aot.py): export/reload round-trip.

Round-3 measurement: the bench capture burned 824 s of per-process Python
tracing + HLO lowering for a 53.5 s solve even with the XLA compile cache
hitting.  ``AotCache`` serializes each traced+lowered stage program via
``jax.export`` so later processes deserialize StableHLO instead of
re-tracing.  These tests pin: (1) exported programs compute the same thing
as plain jit, (2) a fresh cache instance (stand-in for a fresh process)
loads from disk instead of re-exporting, (3) the dynamic iteration cap
rides through an exported program as a runtime scalar — one serialized
entry serves every cap value.

AOT is disabled suite-wide under pytest (conftest.py: the double compile of
round-tripped StableHLO blows the fast-tier budget); these tests opt in per
cache instance.
"""
import numpy as np
import jax.numpy as jnp

from uuo_mocap_tpu.solver import aot as aot_mod
from uuo_mocap_tpu.solver.aot import AotCache
from uuo_mocap_tpu.solver.lbfgs import BatchedLbfgs, LbfgsOptions

RNG = np.random.RandomState(11)


def quad_fun(p, lane, shared):
    t = lane["target"]
    return jnp.sum((p["x"] - t) ** 2) + 0.01 * jnp.sum(p["x"] ** 4) + shared["bias"]


def _make_solver(cache):
    s = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=60), segment_size=10,
                     aot=cache, name="t")
    return s


def _inputs(L=4, n=6):
    targets = jnp.asarray(RNG.randn(L, n).astype(np.float32))
    return {"x": jnp.zeros((L, n))}, {"target": targets}, {"bias": jnp.asarray(0.0)}


def _enabled_cache(tmp_path):
    c = AotCache(extra="test", cache_dir=str(tmp_path / "aot"))
    c.enabled = True  # conftest sets UUO_AOT=0 suite-wide
    return c


def test_export_reload_matches_plain_jit(tmp_path):
    p0, lanes, shared = _inputs()

    plain = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=60), segment_size=10)
    pa, ra = plain.run(p0, lanes, shared)

    n_fallbacks0 = len(aot_mod.FALLBACKS)
    cache1 = _enabled_cache(tmp_path)
    pb, rb = _make_solver(cache1).run(p0, lanes, shared)
    assert cache1.stats["misses"] > 0 and cache1.stats["hits"] == 0
    assert cache1.stats["fallbacks"] == 0, aot_mod.FALLBACKS[n_fallbacks0:]
    np.testing.assert_array_equal(np.asarray(pa["x"]), np.asarray(pb["x"]))
    np.testing.assert_array_equal(np.asarray(ra.num_evals), np.asarray(rb.num_evals))

    # fresh cache over the same dir = stand-in for a fresh process: programs
    # deserialize from disk, no re-export
    cache2 = _enabled_cache(tmp_path)
    pc, rc = _make_solver(cache2).run(p0, lanes, shared)
    assert cache2.stats["hits"] > 0 and cache2.stats["misses"] == 0
    assert cache2.stats["fallbacks"] == 0
    np.testing.assert_array_equal(np.asarray(pa["x"]), np.asarray(pc["x"]))


def test_dynamic_iter_cap_shares_one_program(tmp_path):
    """The per-lane iteration cap enters the exported segment program as a
    runtime scalar: different cap values must NOT export new entries, and a
    cap below segment_size must bind exactly (advisor r3 finding 1: the old
    between-segment check silently ran sub-segment caps out to a full
    segment)."""
    p0, lanes, shared = _inputs()

    cache = _enabled_cache(tmp_path)
    solver = _make_solver(cache)
    solver.iter_cap = 3
    _, res3 = solver.run(p0, lanes, shared)
    files_after_first = cache.stats["misses"]
    assert (np.asarray(res3.num_iters) <= 3).all()
    assert (np.asarray(res3.num_iters) == 3).any(), "quartic shouldn't converge in <3 iters"

    solver2 = _make_solver(AotCache(extra="test", cache_dir=str(tmp_path / "aot")))
    solver2.aot.enabled = True
    solver2.iter_cap = 7
    _, res7 = solver2.run(p0, lanes, shared)
    assert solver2.aot.stats["misses"] == 0, "cap value must not key a new export"
    assert solver2.aot.stats["hits"] > 0
    assert (np.asarray(res7.num_iters) <= 7).all()
    assert files_after_first > 0


def test_exact_cap_without_aot():
    """In-loop cap exactness on the plain jit path too (the production
    part_prune phase 1 runs with AOT on or off)."""
    p0, lanes, shared = _inputs()
    a = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=60), segment_size=50)
    a.iter_cap = 5
    _, res = a.run(p0, lanes, shared)
    assert (np.asarray(res.num_iters) <= 5).all()
    assert (np.asarray(res.num_iters) == 5).any()

    # capped partial descent must equal the same cap run as max_iter
    b = BatchedLbfgs(quad_fun, LbfgsOptions(max_iter=5), segment_size=50)
    _, res_b = b.run(p0, lanes, shared)
    np.testing.assert_array_equal(np.asarray(res.num_iters), np.asarray(res_b.num_iters))


def test_package_fingerprint_keys_entries(tmp_path, monkeypatch):
    """Any package source change must invalidate every entry — a stale
    program would silently compute old semantics."""
    p0, lanes, shared = _inputs()
    cache1 = _enabled_cache(tmp_path)
    _make_solver(cache1).run(p0, lanes, shared)
    assert cache1.stats["misses"] > 0

    monkeypatch.setattr(aot_mod, "_PKG_FP", "deadbeef00000000")
    cache2 = _enabled_cache(tmp_path)
    _make_solver(cache2).run(p0, lanes, shared)
    assert cache2.stats["hits"] == 0, "fingerprint change must miss every entry"
    assert cache2.stats["misses"] > 0


def test_constants_hoisted_out_of_exported_blobs(tmp_path):
    """Round-4: closure constants must NOT be baked into the serialized
    module.  With baking, every stage program embedded the ~17 MB body
    model, costing 309 s of warm-cache deserialize/load per bench process;
    hoisted programs store constants once in a content-addressed side store
    shared across programs (solver/aot.py:_load_or_export)."""
    import os
    import jax

    big = jnp.asarray(RNG.randn(512, 1024).astype(np.float32))  # 2 MB const

    def fun_with_const(p, lane, shared):
        y = p["x"] @ big[: p["x"].shape[-1]]
        return jnp.sum((y - lane["t"]) ** 2) + shared["bias"]

    p0 = {"x": jnp.zeros((3, 512))}
    lanes = {"t": jnp.asarray(RNG.randn(3, 1024).astype(np.float32))}
    shared = {"bias": jnp.asarray(0.0)}

    plain = BatchedLbfgs(fun_with_const, LbfgsOptions(max_iter=20), segment_size=10)
    pa, _ = plain.run(p0, lanes, shared)

    cache1 = _enabled_cache(tmp_path)
    s1 = BatchedLbfgs(fun_with_const, LbfgsOptions(max_iter=20), segment_size=10,
                      aot=cache1, name="t")
    pb, _ = s1.run(p0, lanes, shared)
    assert cache1.stats["fallbacks"] == 0, aot_mod.FALLBACKS
    np.testing.assert_array_equal(np.asarray(pa["x"]), np.asarray(pb["x"]))

    aot_dir = tmp_path / "aot"
    blobs = sorted(aot_dir.glob("*.jexp"))
    metas = sorted(aot_dir.glob("*.jexp.consts"))
    assert blobs and metas, "hoisted export must write module + const meta"
    # the 2 MB constant must live in the side store, not the module
    assert max(b.stat().st_size for b in blobs) < 512 * 1024, (
        [(b.name, b.stat().st_size) for b in blobs])
    store = list((aot_dir / "consts").glob("*.bin"))
    assert any(f.stat().st_size >= 512 * 1024 * 4 for f in store)

    # fresh process stand-in: loads consts from the store, same result
    aot_mod._CONST_CACHE.clear()
    cache2 = _enabled_cache(tmp_path)
    s2 = BatchedLbfgs(fun_with_const, LbfgsOptions(max_iter=20), segment_size=10,
                      aot=cache2, name="t")
    pc, _ = s2.run(p0, lanes, shared)
    assert cache2.stats["hits"] > 0 and cache2.stats["misses"] == 0
    assert cache2.stats["fallbacks"] == 0, aot_mod.FALLBACKS
    np.testing.assert_array_equal(np.asarray(pa["x"]), np.asarray(pc["x"]))
    # the big tensor device_put exactly once per process (content-addressed)
    assert len(aot_mod._CONST_CACHE) == len(store)


def test_seeded_model_consts_reused_without_reupload(tmp_path):
    """Round-4: seed_model_consts maps the body model's committed tensors
    into the constant store by their build-time shas, so (a) loading an AOT
    program whose hoisted consts are model tensors reuses the ON-DEVICE
    arrays instead of device_put-ing ~19 MB from disk (measured 339 s over
    a slow tunnel phase in the bench warmup), and (b) the export path skips
    the host readback of consts whose bytes are already in the store."""
    import jax

    from uuo_mocap_tpu.body.synthetic import synthetic_body_model

    model = synthetic_body_model()
    assert model.const_shas and len(model.const_shas) == 5

    aot_mod._CONST_CACHE.clear()
    aot_mod._SEEDED_SHA_BY_ID.clear()
    assert aot_mod.seed_model_consts(model) == len(set(model.const_shas))
    # identity: the store holds the model's own device tensors
    assert aot_mod._CONST_CACHE[model.const_shas[0]] is model.v_template
    assert aot_mod._seeded_sha(model.shapedirs) == model.const_shas[1]

    posedirs = model.posedirs  # closure-captured model tensor -> hoisted const

    def fwd(x):
        return x @ posedirs  # [207] @ [207, 20670]

    x = jnp.asarray(RNG.randn(posedirs.shape[0]).astype(np.float32))
    cache1 = _enabled_cache(tmp_path)
    wrapped1 = cache1.wrap("fwd", jax.jit(fwd))
    out1 = np.asarray(wrapped1(x))
    assert cache1.stats == {"hits": 0, "misses": 1, "fallbacks": 0}
    # export wrote the const bytes (first-ever export still persists them)
    sha = model.const_shas[2]
    assert (tmp_path / "aot" / "consts" / f"{sha}.bin").exists()

    # fresh-process stand-in: clear + re-seed, then LOAD the program.  The
    # loaded const must be the seeded device tensor itself, not a re-upload.
    aot_mod._CONST_CACHE.clear()
    aot_mod._SEEDED_SHA_BY_ID.clear()
    aot_mod.seed_model_consts(model)
    cache2 = _enabled_cache(tmp_path)
    wrapped2 = cache2.wrap("fwd", jax.jit(fwd))
    out2 = np.asarray(wrapped2(x))
    assert cache2.stats == {"hits": 1, "misses": 0, "fallbacks": 0}, aot_mod.FALLBACKS
    assert aot_mod._CONST_CACHE[sha] is posedirs
    np.testing.assert_array_equal(out1, out2)
    np.testing.assert_allclose(out1, np.asarray(fwd(x)), rtol=1e-6)
