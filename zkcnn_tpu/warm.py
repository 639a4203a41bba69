"""Concurrent program warming for the TPU-tunnel dispatch path.

A fresh process pays ~0.45 s per DISTINCT jitted program the first time
it is called (executable ship over the tunnel; persistent-cache hits
still pay the load RPC).  A LeNet proof touches several hundred
distinct programs, so a cold process spent ~5 min in program loads
while the device sat idle (results/lenet_timing_probe.log) -- that, not
compute, was the first-proof latency floor.  Loads overlap well across
threads (~9x with 32 threads, measured on the v5e tunnel).

This module makes the program set of a proof *recordable* and
*replayable*:

  * ``zjit`` wraps ``jax.jit`` (same semantics) and records, per call,
    the (program key, abstract input signature) pair the first time it
    is seen.
  * ``register_factory`` names the lru-cached program factories
    (e.g. gkr.fused._quad_ladder) so their inner jitted closures get
    stable keys of the form (factory name, factory args).
  * ``save_manifest`` persists the union of recorded signatures;
    ``warm_from_manifest`` re-creates every program in a fresh process
    and first-calls them with dummy zero inputs from a thread pool,
    so the serial proof afterwards hits only loaded programs.

Replay is best-effort: entries that no longer resolve (code changed,
kernel renamed) are skipped -- the proof still runs, just pays the
load for those programs inline.  Correctness never depends on the
manifest; it is purely a latency device.
"""

import json
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from functools import wraps
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

_FACTORIES: Dict[str, Any] = {}
_RECORDED: Dict[str, dict] = {}      # sig-json -> entry (ordered, deduped)
_LOCK = threading.Lock()
_WARMED: set = set()                 # sig-jsons already replayed this process

# modules whose import registers every factory/kernel used by a proof;
# warm_from_manifest imports them before resolving entries
_KERNEL_MODULES = (
    "zkcnn_tpu.field.limbs",
    "zkcnn_tpu.field.ops",
    "zkcnn_tpu.field.matmul",
    "zkcnn_tpu.field.pallas_round",
    "zkcnn_tpu.field.pallas_round2",
    "zkcnn_tpu.mle.beta",
    "zkcnn_tpu.mle.fold",
    "zkcnn_tpu.ntt.ntt",
    "zkcnn_tpu.circuit.eval",
    "zkcnn_tpu.gkr.engine",
    "zkcnn_tpu.gkr.fused",
    "zkcnn_tpu.gkr.kernels",
    "zkcnn_tpu.pcs.curve",
    "zkcnn_tpu.pcs.msm",
)


def _sig_of_value(v) -> list:
    """JSON-able abstract signature of one runtime argument."""
    if v is None:
        return ["none"]
    if isinstance(v, bool):
        return ["bool", v]
    if isinstance(v, int):
        return ["int"]
    if isinstance(v, float):
        return ["float"]
    if isinstance(v, (tuple, list)):
        return ["seq", [_sig_of_value(x) for x in v]]
    shape = getattr(v, "shape", None)
    dtype = getattr(v, "dtype", None)
    if shape is not None and dtype is not None:
        return ["arr", list(shape), str(dtype)]
    return ["static", repr(v)]


_STATIC_TOKENS: Dict[str, Any] = {}


def register_static(token: str, obj):
    """Name a singleton object (e.g. a Field instance) so it can appear
    as a static jit argument in manifests."""
    _STATIC_TOKENS[token] = obj
    try:
        obj._warm_token = token
    except Exception:
        pass
    return obj


def _enc_static(v):
    """Exact JSON encoding of a static argument (int/bool/str/None,
    nested tuples of those, or register_static singletons).  Raises for
    anything else, which aborts recording of that call -- never the
    call itself."""
    tok = getattr(v, "_warm_token", None)
    if tok is not None:
        return {"tok": tok}
    if v is None or isinstance(v, (bool, int, str)):
        return v
    if isinstance(v, tuple):
        return {"t": [_enc_static(x) for x in v]}
    raise TypeError(f"unrecordable static {type(v)}")


def _dec_static(v):
    if isinstance(v, dict):
        if "tok" in v:
            return _STATIC_TOKENS[v["tok"]]
        return tuple(_dec_static(x) for x in v["t"])
    return v


def _dummy_of_sig(s):
    import jax.numpy as jnp
    kind = s[0]
    if kind == "none":
        return None
    if kind == "bool":
        return s[1]
    if kind == "int":
        return 0
    if kind == "float":
        return 0.0
    if kind == "seq":
        return tuple(_dummy_of_sig(x) for x in s[1])
    if kind == "arr":
        return jnp.zeros(tuple(s[1]), dtype=s[2])
    raise ValueError(f"unreplayable signature {s}")


class _Wrapped:
    """jax.jit with call-signature recording.  ``key`` identifies the
    program source: ("module.fn", ()) for module-level functions, or
    (factory name, factory args) for factory-built closures."""

    __slots__ = ("_jit", "key", "statics")

    def __init__(self, fn, key: Tuple[str, tuple], jit_kwargs: dict):
        import jax
        self._jit = jax.jit(fn, **jit_kwargs)
        self.key = key
        sa = jit_kwargs.get("static_argnums", ())
        if isinstance(sa, int):
            sa = (sa,)
        self.statics = set(sa or ())

    def __call__(self, *args, **kwargs):
        try:
            sig = [(["s", _enc_static(a)] if i in self.statics
                    else _sig_of_value(a))
                   for i, a in enumerate(args)]
            ksig = {k: _sig_of_value(v) for k, v in sorted(kwargs.items())}
            entry = {"f": self.key[0], "fa": list(self.key[1]),
                     "sig": sig, "kw": ksig}
            j = json.dumps(entry, separators=(",", ":"))
            if j not in _RECORDED:
                with _LOCK:
                    _RECORDED.setdefault(j, entry)
        except Exception:
            pass    # recording must never break the call
        return self._jit(*args, **kwargs)

    def lower(self, *a, **k):
        return self._jit.lower(*a, **k)

    def __get__(self, obj, objtype=None):
        # descriptor support: zjit-wrapped instance methods bind `self`
        # like a plain function would (static_argnums=0 idiom)
        if obj is None:
            return self
        import functools
        return functools.partial(self, obj)


def zjit(fn=None, *, key: Optional[str] = None, factory_args: tuple = (),
         **jit_kwargs):
    """Drop-in ``jax.jit`` replacement with signature recording.

    Module-level use: ``@zjit`` / ``@partial(zjit, static_argnums=...)``
    -- the key defaults to ``module.qualname``.  Factory use: pass
    ``key=`` (a ``register_factory`` name) and ``factory_args=``.
    """
    def build(f):
        k = key or f"{f.__module__}.{f.__qualname__}"
        return _Wrapped(f, (k, tuple(factory_args)), jit_kwargs)
    if fn is None:
        return build
    return build(fn)


def register_factory(name: str):
    """Decorator: register a program factory for manifest replay.  The
    factory must return a ``zjit``-wrapped callable (pass the factory's
    ``name`` and args through so recorded keys resolve back to it)."""
    def deco(factory):
        _FACTORIES[name] = factory
        factory._warm_name = name
        return factory
    return deco


def recorded_count() -> int:
    return len(_RECORDED)


def save_manifest(path: str) -> int:
    """Write the union of this process's recorded signatures (merging
    any entries already in the file).  Returns the entry count."""
    entries = dict(_RECORDED)
    if os.path.exists(path):
        with open(path) as fh:
            for line in fh:
                line = line.strip()
                if line:
                    entries.setdefault(line, None)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(tmp, "w") as fh:
        for j in entries:
            fh.write(j + "\n")
    os.replace(tmp, path)
    return len(entries)


def _resolve(entry: dict):
    """Manifest entry -> (callable, dummy args, dummy kwargs)."""
    name, fa = entry["f"], tuple(
        tuple(a) if isinstance(a, list) else a for a in entry["fa"])
    if name in _FACTORIES:
        fn = _FACTORIES[name](*fa)
    else:
        mod, _, attr = name.rpartition(".")
        import importlib
        obj = importlib.import_module(mod)
        fn = getattr(obj, attr)
    if not isinstance(fn, _Wrapped):
        raise TypeError(f"{name} is not zjit-wrapped")
    args = [(_dec_static(s[1]) if s[0] == "s" else _dummy_of_sig(s))
            for s in entry["sig"]]
    kwargs = {k: _dummy_of_sig(v) for k, v in entry.get("kw", {}).items()}
    return fn, args, kwargs


def warm_from_manifest(path: str, threads: int = 32,
                       verbose: bool = False) -> Tuple[int, int]:
    """Pre-load every program in the manifest with a thread pool.
    Returns (loaded, skipped).  Safe to call multiple times; entries
    already warmed this process are skipped for free."""
    if not os.path.exists(path):
        return 0, 0
    for m in _KERNEL_MODULES:
        try:
            __import__(m)
        except Exception:
            pass
    with open(path) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    todo = [ln for ln in lines if ln not in _WARMED]

    def one(line: str) -> bool:
        try:
            fn, args, kwargs = _resolve(json.loads(line))
            fn(*args, **kwargs)
            return True
        except Exception as e:
            if verbose:
                print(f"warm skip: {e}: {line[:120]}")
            return False

    if not todo:
        return 0, 0
    with ThreadPoolExecutor(threads) as ex:
        results = list(ex.map(one, todo))
    _WARMED.update(todo)
    return sum(results), len(results) - sum(results)


def manifest_path(tag: str) -> str:
    """Canonical manifest location for a model/config tag."""
    root = os.environ.get("ZKCNN_TPU_WARM_DIR",
                          os.path.join(os.path.dirname(__file__), "..",
                                       "warm"))
    return os.path.join(os.path.abspath(root), f"{tag}.jsonl")
