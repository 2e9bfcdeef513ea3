"""Persistent ahead-of-time program cache for the solver stages.

Round-3 measurement (`BENCH_r03.json`): the bench capture spent 824 s in
warmup for a 53.5 s solve — and the XLA *compile* cache was verified
hitting.  The cost is per-process Python tracing + HLO lowering of the
~dozen large stage programs (vmapped L-BFGS ``while_loop`` state machines
over a 450-frame LBS forward), which `jax.jit` redoes in every process no
matter what the compilation cache holds.

This module serializes each traced+lowered program ONCE via ``jax.export``
and reloads the StableHLO on later runs, skipping tracing and lowering
entirely; the XLA compile of the deserialized module still goes through the
persistent compilation cache, so a warm process pays only
deserialize + cache-load per program.

Constants are HOISTED out of the exported program (round-4 measurement:
with constants baked, the warm-cache warmup still cost 309 s — every stage
program embedded the body model's ~17 MB pose-corrective tensor, making
each ``.jexp`` ~19 MB of MLIR to parse and each cached executable
~70 MB to load).  ``_load_or_export`` traces the *unjitted* function
(``jit_fn.__wrapped__``) with ``jax.make_jaxpr``, which lifts every closure
constant to ``ClosedJaxpr.consts``; the exported program takes those
constants as a leading argument, and their values live in a
content-addressed side store (``<cache_dir>/consts/<sha>.bin``) that is
read and ``device_put`` ONCE per unique tensor per process — the body
model is shared by every stage program instead of being re-parsed per
program.

Keying: a program is only served when ALL of these match —
  * every argument's (shape, dtype, pytree structure);
  * the package source fingerprint (hash of every ``uuo_mocap_tpu`` .py
    file — any code change invalidates every entry);
  * the caller-supplied ``extra`` fingerprint (solver config + body-model
    tensor hash: closures bake both into the program as constants);
  * jax version and lowering platform.

Everything is fail-open: any export/deserialize error falls back to the
plain jitted callable (recorded in ``FALLBACKS`` for tests/diagnostics).

The reference has no analog — its per-process warmup cost is zero because
eager torch never compiles, and its per-eval cost is ~2000x ours for it
(BASELINE.md).  This closes the one place the compiled design was paying
for its own compilation.
"""
from __future__ import annotations

import hashlib
import json
import os
import threading
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import numpy as np

_ENV_TOGGLE = "UUO_AOT"  # "0" disables; default on
_ENV_DIR = "UUO_AOT_DIR"
_ENV_PROFILE = "UUO_AOT_PROFILE"  # "1": print per-program load/compile walls

# diagnostics: list of (name, reason) for every fallback taken this process
FALLBACKS: list = []

_PKG_FP: Optional[str] = None
_MODEL_FP: Dict[int, Tuple[Any, str]] = {}
_LOCK = threading.Lock()

# content-addressed constant store: sha -> committed (device) array.  One
# entry per unique tensor PER PROCESS no matter how many programs share it
# (the ~17 MB body-model tensors appear in every stage program).
_CONST_CACHE: Dict[str, Any] = {}
# reverse map for SEEDED device tensors: id(array) -> (array, sha).  Lets
# the export path recognize a hoisted const as an already-known model tensor
# WITHOUT materializing it on the host (np.asarray of a device const is a
# ~19 MB tunnel readback, 77-280 s depending on tunnel state).  The strong
# array reference pins the id against reuse-after-GC; lookups still verify
# identity before trusting the sha.
_SEEDED_SHA_BY_ID: Dict[int, Tuple[Any, str]] = {}


def _seeded_sha(arr) -> Optional[str]:
    ent = _SEEDED_SHA_BY_ID.get(id(arr))
    if ent is not None and ent[0] is arr:
        return ent[1]
    return None


def _const_sha(arr: np.ndarray) -> str:
    h = hashlib.sha256()
    h.update(str(arr.dtype).encode())
    h.update(str(arr.shape).encode())
    h.update(np.ascontiguousarray(arr).tobytes())
    return h.hexdigest()[:32]


const_sha = _const_sha  # public alias: body/model.py stamps per-tensor shas


def seed_model_consts(model) -> int:
    """Pre-seed the constant store with a body model's already-committed
    device tensors, keyed by their build-time content shas.

    Without this, the FIRST AOT program loaded in a process pays
    ``_load_const``'s disk-read + ``device_put`` for every hoisted model
    tensor (~19 MB) — measured at 339 s inside the bench warmup when the
    tunneled TPU link was in a slow phase (10 s in a fast phase; the
    variance alone disqualifies it from the capture path).  The very same
    tensors are already resident on the device as ``model``'s leaves, so
    programs can take them as arguments directly.  Returns the number of
    entries seeded."""
    shas = getattr(model, "const_shas", None)
    if not shas:
        return 0
    children, _ = model.tree_flatten()
    seeded = 0
    with _LOCK:
        for sha, arr in zip(shas, children):
            if not sha:
                continue
            _SEEDED_SHA_BY_ID[id(arr)] = (arr, sha)
            if sha not in _CONST_CACHE:
                _CONST_CACHE[sha] = arr
                seeded += 1
    return seeded


def _np_dtype(name: str) -> np.dtype:
    try:
        return np.dtype(name)
    except TypeError:
        import ml_dtypes  # bfloat16 & friends register through ml_dtypes

        return np.dtype(getattr(ml_dtypes, name))


def _save_const(cache_dir: str, arr: np.ndarray) -> Dict[str, Any]:
    sha = _const_sha(arr)
    path = os.path.join(cache_dir, "consts", sha + ".bin")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(np.ascontiguousarray(arr).tobytes())
        os.replace(tmp, path)
    return {"sha": sha, "shape": list(arr.shape), "dtype": str(arr.dtype)}


def _load_const(cache_dir: str, spec: Dict[str, Any]):
    return _load_consts(cache_dir, [spec])[0]


def _load_consts(cache_dir: str, specs) -> list:
    """Load a program's const list, committing ALL store misses in ONE
    ``jax.device_put`` call.  Per-const ``device_put`` is one RPC each over
    the tunneled TPU backend, and a slow tunnel phase turns the ~40 small
    derived consts of a stage program into minutes of serialized round-trips
    (observed: 297 s and 678 s loading ``model_forward``'s 42 consts vs
    0.26 s in a fast phase — same code, same bytes).  One batched call
    bounds the critical path at a single round-trip regardless of const
    count; the big model tensors are normally pre-seeded device-resident
    (``seed_model_consts``) and skip the transfer entirely."""
    out: list = [None] * len(specs)
    miss_idx: list = []
    miss_arrs: list = []
    pending: Dict[str, int] = {}  # sha -> first miss position in miss_arrs
    for i, spec in enumerate(specs):
        sha = spec["sha"]
        hit = _CONST_CACHE.get(sha)
        if hit is not None:
            out[i] = hit
            continue
        if sha in pending:  # duplicate sha within one program: upload once
            miss_idx.append((i, pending[sha]))
            continue
        path = os.path.join(cache_dir, "consts", sha + ".bin")
        with open(path, "rb") as f:
            raw = f.read()
        arr = np.frombuffer(raw, dtype=_np_dtype(spec["dtype"])).reshape(spec["shape"])
        pending[sha] = len(miss_arrs)
        miss_idx.append((i, len(miss_arrs)))
        miss_arrs.append(arr)
    if miss_arrs:
        committed = jax.device_put(miss_arrs)  # one transfer for all misses
        with _LOCK:
            for i, j in miss_idx:
                out[i] = _CONST_CACHE.setdefault(specs[i]["sha"], committed[j])
    return out


def aot_enabled() -> bool:
    return os.environ.get(_ENV_TOGGLE, "1") != "0"


def default_cache_dir() -> str:
    env = os.environ.get(_ENV_DIR)
    if env:
        return env
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, ".cache", "aot")


def package_fingerprint() -> str:
    """Hash of every .py source in the package — any code change must
    invalidate every serialized program (a stale program would silently
    compute old semantics)."""
    global _PKG_FP
    if _PKG_FP is not None:
        return _PKG_FP
    h = hashlib.sha256()
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for dirpath, dirnames, filenames in sorted(os.walk(pkg_root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                h.update(os.path.relpath(p, pkg_root).encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    _PKG_FP = h.hexdigest()[:16]
    return _PKG_FP


# env toggles that change the TRACED program (module-level variant switches
# read at import time).  They must key the cache: a hit on a program exported
# under a different toggle value would silently run the other variant.
_TRACE_ENV_TOGGLES = (
    "UUO_CHAMFER_PALLAS", "UUO_CHAMFER_2STAGE", "UUO_RANK_PALLAS",
    "UUO_RANK_HIER", "UUO_RANK_PRECISION",
)


def env_fingerprint() -> str:
    """Compact fingerprint of the trace-affecting env toggles."""
    return ",".join(f"{k}={os.environ.get(k, '')}" for k in _TRACE_ENV_TOGGLES)


def config_fingerprint(config: Dict[str, Any]) -> str:
    """Stable hash of a (nested, JSON-able) solver config dict."""
    return hashlib.sha256(
        json.dumps(config, sort_keys=True, default=str).encode()
    ).hexdigest()[:16]


def model_fingerprint(model) -> str:
    """Hash of the body model's tensor contents (they are baked into the
    exported programs as constants).  Memoized per model identity.

    Prefers the model's build-time ``content_fp`` (hashed from the host-side
    numpy arrays, ``body/model.py``): hashing the VALUES of a
    device-committed model reads ~19 MB back from the TPU, which costs
    minutes over the tunneled backend — measured 280 s inside
    MultiSequenceSolver construction before this fast path existed."""
    fp = getattr(model, "content_fp", None)
    if fp:
        return f"bfp:{fp}"
    hit = _MODEL_FP.get(id(model))
    if hit is not None and hit[0] is model:
        return hit[1]
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(model):
        arr = np.asarray(leaf)
        h.update(str(arr.shape).encode())
        h.update(str(arr.dtype).encode())
        h.update(arr.tobytes())
    fp = h.hexdigest()[:16]
    _MODEL_FP[id(model)] = (model, fp)
    return fp


def _avals_signature(args: Tuple) -> str:
    leaves, treedef = jax.tree_util.tree_flatten(args)
    parts = [str(treedef)]
    for leaf in leaves:
        parts.append(f"{getattr(leaf, 'shape', ())}:{getattr(leaf, 'dtype', type(leaf).__name__)}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:16]


_SERIALIZATIONS_DONE = False


def _register_serializations():
    """``jax.export`` refuses to serialize unregistered custom pytree types;
    register every NamedTuple that crosses a stage-program boundary (names
    must be stable across processes — they key the serialized treedefs)."""
    global _SERIALIZATIONS_DONE
    if _SERIALIZATIONS_DONE:
        return
    from jax import export as jexport

    def reg():
        from uuo_mocap_tpu.pipeline.stages import MarkerAttachment, SmplParams
        from uuo_mocap_tpu.solver.lbfgs import LbfgsResult, LbfgsState

        for cls in (LbfgsState, LbfgsResult, SmplParams, MarkerAttachment):
            try:
                jexport.register_namedtuple_serialization(
                    cls, serialized_name=f"uuo_mocap_tpu.{cls.__name__}")
            except ValueError:
                pass  # already registered (e.g. by a parallel test session)

    reg()
    _SERIALIZATIONS_DONE = True


class AotCache:
    """Disk-backed cache of exported (traced+lowered) programs.

    ``wrap(name, jit_fn)`` returns a drop-in callable.  Per distinct
    argument signature it either deserializes a previously exported program
    (skipping trace+lower) or exports the jitted function once and persists
    it for the next process.
    """

    def __init__(self, extra: str = "", cache_dir: Optional[str] = None):
        self.extra = extra
        self.cache_dir = cache_dir or default_cache_dir()
        self.enabled = aot_enabled()
        self.stats = {"hits": 0, "misses": 0, "fallbacks": 0}

    def _key(self, name: str, args: Tuple) -> str:
        platform = jax.default_backend()
        raw = "|".join([
            name, package_fingerprint(), env_fingerprint(), self.extra,
            _avals_signature(args), jax.__version__, platform,
        ])
        return hashlib.sha256(raw.encode()).hexdigest()[:24]

    def wrap(self, name: str, jit_fn: Callable) -> Callable:
        if not self.enabled:
            return jit_fn
        cache = self

        # per-signature state: key -> ("exp", jitted exp.call) | ("fallback", jit_fn)
        loaded: Dict[str, Tuple[str, Callable]] = {}

        def call(*args):
            key = cache._key(name, args)
            hit = loaded.get(key)
            if hit is None:
                import time as _time

                t0 = _time.time()
                hit = cache._load_or_export(name, key, jit_fn, args)
                t1 = _time.time()
                if os.environ.get(_ENV_PROFILE) == "1":
                    out = hit[1](*args)
                    jax.block_until_ready(out)
                    t2 = _time.time()
                    print(
                        f"[aot] {name} {key[:8]} {hit[0]}: load {t1 - t0:.2f}s"
                        f" first-call {t2 - t1:.2f}s",
                        flush=True,
                    )
                    loaded[key] = hit
                    return out
                loaded[key] = hit
            return hit[1](*args)

        return call

    def _load_or_export(self, name, key, jit_fn, args):
        from jax import export as jexport

        _register_serializations()

        path = os.path.join(self.cache_dir, key + ".jexp")
        meta_path = path + ".consts"
        try:
            if os.path.exists(path):
                consts = None
                if os.path.exists(meta_path):
                    with open(meta_path) as f:
                        consts = _load_consts(self.cache_dir, json.load(f))
                with open(path, "rb") as f:
                    exp = jexport.deserialize(bytearray(f.read()))
                self.stats["hits"] += 1
                call = jax.jit(exp.call)
                if consts is None:
                    return ("exp", call)
                return ("exp", lambda *a: call(consts, *a))
        except Exception as e:  # corrupt / version-skewed entry: re-export
            FALLBACKS.append((name, f"deserialize: {e}"))
            for p in (path, meta_path):
                try:
                    os.remove(p)
                except OSError:
                    pass
        specs = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(np.shape(a), np.asarray(a).dtype), args
        )
        # hoisted export: trace the UNJITTED function so closure constants
        # land in ClosedJaxpr.consts instead of being baked into the module
        # (jit wrapping keeps them inside the pjit eqn; see module docstring)
        raw_fn = getattr(jit_fn, "__wrapped__", None)
        if raw_fn is not None:
            try:
                closed, out_shape = jax.make_jaxpr(raw_fn, return_shape=True)(*specs)
                out_tree = jax.tree_util.tree_structure(out_shape)
                jaxpr = closed.jaxpr

                def fn_c(consts, *a):
                    flat, _ = jax.tree_util.tree_flatten(a)
                    out_flat = jax.core.eval_jaxpr(jaxpr, list(consts), *flat)
                    return jax.tree_util.tree_unflatten(out_tree, out_flat)

                # materialize a const on the host ONLY when its bytes are
                # not already in the content store: np.asarray of a device
                # const is a ~19 MB tunnel readback for the body-model
                # tensors (77-280 s depending on tunnel state); seeded
                # model tensors carry their sha (seed_model_consts)
                metas = []
                const_specs = []
                for c in closed.consts:
                    const_specs.append(
                        jax.ShapeDtypeStruct(np.shape(c), np.result_type(c)))
                    sha = _seeded_sha(c)
                    if sha is not None and os.path.exists(
                            os.path.join(self.cache_dir, "consts", sha + ".bin")):
                        metas.append({"sha": sha, "shape": list(np.shape(c)),
                                      "dtype": str(np.result_type(c))})
                    else:
                        metas.append(_save_const(self.cache_dir, np.asarray(c)))
                exp = jexport.export(jax.jit(fn_c))(const_specs, *specs)
                blob = exp.serialize()
                with _LOCK:
                    os.makedirs(self.cache_dir, exist_ok=True)
                    tmp = path + f".tmp.{os.getpid()}"
                    with open(tmp, "wb") as f:
                        f.write(blob)
                    os.replace(tmp, path)
                    tmp = meta_path + f".tmp.{os.getpid()}"
                    with open(tmp, "w") as f:
                        json.dump(metas, f)
                    os.replace(tmp, meta_path)
                self.stats["misses"] += 1
                consts = _load_consts(self.cache_dir, metas)
                call = jax.jit(exp.call)
                return ("exp", lambda *a: call(consts, *a))
            except Exception as e:
                FALLBACKS.append((name, f"hoisted export: {e}"))
        try:
            exp = jexport.export(jit_fn)(*specs)
            blob = exp.serialize()
            with _LOCK:
                os.makedirs(self.cache_dir, exist_ok=True)
                tmp = path + f".tmp.{os.getpid()}"
                with open(tmp, "wb") as f:
                    f.write(blob)
                os.replace(tmp, path)
            self.stats["misses"] += 1
            return ("exp", jax.jit(exp.call))
        except Exception as e:
            FALLBACKS.append((name, f"export: {e}"))
            self.stats["fallbacks"] += 1
            return ("fallback", jit_fn)
