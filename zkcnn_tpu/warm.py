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
STATS = {"hit": 0, "miss": 0, "fail": 0}   # AOT dispatch counters

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
        # record the tuple-vs-list distinction: the pytree structure of
        # a list differs from a tuple's, and warming the wrong one
        # compiles a program the real call never hits (ADVICE r3)
        return ["seq" if isinstance(v, tuple) else "lseq",
                [_sig_of_value(x) for x in v]]
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
    if kind == "lseq":
        return [_dummy_of_sig(x) for x in s[1]]
    if kind == "arr":
        return jnp.zeros(tuple(s[1]), dtype=s[2])
    raise ValueError(f"unreplayable signature {s}")


class _Wrapped:
    """jax.jit with call-signature recording.  ``key`` identifies the
    program source: ("module.fn", ()) for module-level functions, or
    (factory name, factory args) for factory-built closures.

    ``_compiled`` maps signature-json -> an AOT-compiled executable
    rebuilt from an export blob (see warm_from_manifest); calls whose
    signature matches dispatch straight to it, skipping the pjit
    trace/lower path entirely (the dominant cold-process cost on
    GIL-bound hosts)."""

    __slots__ = ("_jit", "key", "statics", "static_names", "_compiled",
                 "donated")

    def __init__(self, fn, key: Tuple[str, tuple], jit_kwargs: dict):
        import jax
        self._jit = jax.jit(fn, **jit_kwargs)
        self.key = key
        sa = jit_kwargs.get("static_argnums", ())
        if isinstance(sa, int):
            sa = (sa,)
        self.statics = set(sa or ())
        sn = jit_kwargs.get("static_argnames", ())
        if isinstance(sn, str):
            sn = (sn,)
        self.static_names = set(sn or ())
        da = jit_kwargs.get("donate_argnums", ())
        if isinstance(da, int):
            da = (da,)
        self.donated = tuple(da or ())
        self._compiled = {}

    def _sig_json(self, args, kwargs) -> Tuple[str, dict]:
        sig = [(["s", _enc_static(a)] if i in self.statics
                else _sig_of_value(a))
               for i, a in enumerate(args)]
        ksig = {k: _sig_of_value(v) for k, v in sorted(kwargs.items())}
        entry = {"f": self.key[0], "fa": list(self.key[1]),
                 "sig": sig, "kw": ksig}
        return json.dumps(entry, separators=(",", ":")), entry

    def __call__(self, *args, **kwargs):
        j = None
        try:
            j, entry = self._sig_json(args, kwargs)
            if j not in _RECORDED:
                with _LOCK:
                    _RECORDED.setdefault(j, entry)
        except Exception:
            pass    # recording must never break the call
        if j is not None and self._compiled:
            comp = self._compiled.get(j)
            if comp is not None:
                try:
                    out = comp(
                        *[a for i, a in enumerate(args)
                          if i not in self.statics],
                        **{k: v for k, v in kwargs.items()
                           if k not in self.static_names})
                    STATS["hit"] += 1
                    return out
                except Exception:
                    # pop, not del: the 32-thread warm pool and tracer
                    # contexts can race the same failing entry; eviction
                    # must be idempotent (ADVICE r3)
                    self._compiled.pop(j, None)
                    STATS["fail"] += 1      # fall back to pjit path
            else:
                STATS["miss"] += 1
        # the axon remote-compile RPC occasionally drops mid-response
        # ("response body closed before all bytes were read") -- a
        # transient service failure that killed the round-3 vgg11 run.
        # Retry with backoff; a deterministic error resurfaces.
        # Donating programs never retry: a failed attempt may already
        # have donated its input buffers, and the retry would mask the
        # root cause with a "buffer deleted" error (ADVICE r4).
        attempts = 1 if self.donated else 3
        for attempt in range(attempts):
            try:
                return self._jit(*args, **kwargs)
            except Exception as e:
                msg = str(e)
                if attempt == attempts - 1 or (
                        "remote_compile" not in msg
                        and "DEADLINE" not in msg
                        and "UNAVAILABLE" not in msg):
                    raise
                import time as _time
                STATS["retry"] = STATS.get("retry", 0) + 1
                _time.sleep(5.0 * (attempt + 1))

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
        if os.environ.get("ZKCNN_TPU_NO_DONATE") == "1":
            jit_kwargs.pop("donate_argnums", None)
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


def _deep_tuple(a):
    """JSON round-trip turns nested tuples into lists; factory args are
    hashable tuples all the way down (lru_cache keys -- ADVICE r3)."""
    return tuple(_deep_tuple(x) for x in a) if isinstance(a, list) else a


def _resolve(entry: dict):
    """Manifest entry -> (callable, dummy args, dummy kwargs)."""
    name, fa = entry["f"], _deep_tuple(entry["fa"])
    if name in _FACTORIES:
        fn = _FACTORIES[name](*fa)
    else:
        import importlib
        parts = name.split(".")
        obj = None
        for cut in range(len(parts) - 1, 0, -1):
            try:
                obj = importlib.import_module(".".join(parts[:cut]))
                break
            except ImportError:
                continue
        if obj is None:
            raise ImportError(name)
        for attr in parts[cut:]:
            obj = getattr(obj, attr)
        fn = obj
    if not isinstance(fn, _Wrapped):
        raise TypeError(f"{name} is not zjit-wrapped")
    args = [(_dec_static(s[1]) if s[0] == "s" else _dummy_of_sig(s))
            for s in entry["sig"]]
    kwargs = {k: _dummy_of_sig(v) for k, v in entry.get("kw", {}).items()}
    return fn, args, kwargs


def warm_from_manifest(path: str, threads: int = 32,
                       verbose: bool = False) -> Tuple[int, int]:
    """Pre-load every program in the manifest with a thread pool.

    Entries with an export blob (save_blobs) skip Python tracing
    entirely: the blob deserializes in C++ and compiles through the
    persistent cache, and the resulting AOT executable is installed on
    the wrapped program for direct dispatch.  Entries without a blob
    fall back to a dummy first-call (pays one trace+lower inline).

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
            entry = json.loads(line)
            fn, args, kwargs = _resolve(entry)
            bp = _blob_path(path, line)
            if isinstance(fn, _Wrapped) and os.path.exists(bp):
                with open(bp, "rb") as bf:
                    comp = _compile_blob(fn, entry, bf.read())
                # first-execute with dummies NOW: the tunnel finalizes
                # a program server-side on its first run (~0.5-2s),
                # and that cost overlaps across warm threads
                import jax
                execs = int(os.environ.get("ZKCNN_TPU_WARM_EXECS", "1"))
                for _ in range(max(1, execs)):
                    jax.block_until_ready(comp(
                        *[a for i, a in enumerate(args)
                          if i not in fn.statics],
                        **{k: v for k, v in kwargs.items()
                           if k not in fn.static_names}))
                fn._compiled[line] = comp
            else:
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


_CODE_FP: Optional[str] = None


def _code_fingerprint() -> str:
    """Content hash of the package's Python sources.  Blob artifacts
    are AOT-frozen programs: after ANY source change they could silently
    serve stale code, so they are keyed by this fingerprint and a code
    change orphans them (the pjit fallback path takes over until new
    blobs are saved)."""
    global _CODE_FP
    if _CODE_FP is None:
        import hashlib
        h = hashlib.sha256()
        root = os.path.dirname(os.path.abspath(__file__))
        # only modules whose source becomes traced program bodies --
        # driver-layer files (prover/verifier/builder/cli/warm) feed
        # arguments in, they don't change the jaxprs
        prog_dirs = ("field", "mle", "ntt", "circuit", "pcs", "parallel")
        prog_files = ("gkr/engine.py", "gkr/fused.py", "gkr/kernels.py")
        paths = [os.path.join(root, f) for f in prog_files]
        for d in prog_dirs:
            dd = os.path.join(root, d)
            if os.path.isdir(dd):
                paths += [os.path.join(dd, f)
                          for f in sorted(os.listdir(dd))
                          if f.endswith(".py")]
        for p in sorted(paths):
            if os.path.exists(p):
                h.update(p.encode())
                with open(p, "rb") as fh:
                    h.update(fh.read())
        import jax
        h.update(jax.__version__.encode())
        _CODE_FP = h.hexdigest()[:16]
    return _CODE_FP


def _blob_dir(path: str) -> str:
    return os.path.join(os.path.dirname(os.path.abspath(path)), "blobs",
                        _code_fingerprint())


def _blob_path(path: str, line: str) -> str:
    import hashlib
    h = hashlib.sha256(line.encode()).hexdigest()[:24]
    return os.path.join(_blob_dir(path), h + ".mlir.zst")


def _prune_stale_blobs(path: str):
    """Drop blob dirs for other code fingerprints (orphaned AOT
    artifacts; they can never be loaded again)."""
    import shutil
    base = os.path.join(os.path.dirname(os.path.abspath(path)), "blobs")
    cur = _code_fingerprint()
    if not os.path.isdir(base):
        return
    for d in os.listdir(base):
        if d != cur:
            shutil.rmtree(os.path.join(base, d), ignore_errors=True)


def _entry_dummies(fn: "_Wrapped", entry: dict):
    args = [(_dec_static(s[1]) if s[0] == "s" else _dummy_of_sig(s))
            for s in entry["sig"]]
    kwargs = {k: _dummy_of_sig(v) for k, v in entry.get("kw", {}).items()}
    return args, kwargs


def save_blobs(path: str, verbose: bool = False) -> Tuple[int, int]:
    """Serialize an AOT export blob for every manifest entry that lacks
    one (jax.export StableHLO, zstd-compressed).  Run after a proof in
    the recording process -- exporting re-lowers each program once.
    Blobs are LOCAL artifacts (like .xla_cache), not for git: they are
    machine/jax-version-specific and ~MBs each.  Returns
    (written, failed)."""
    import zstandard
    from jax import export as jexport
    if not os.path.exists(path):
        return 0, 0
    _prune_stale_blobs(path)
    os.makedirs(_blob_dir(path), exist_ok=True)
    cctx = zstandard.ZstdCompressor(level=6)
    written = failed = 0
    with open(path) as fh:
        lines = [ln.strip() for ln in fh if ln.strip()]
    for line in lines:
        bp = _blob_path(path, line)
        if os.path.exists(bp):
            continue
        try:
            entry = json.loads(line)
            fn, args, kwargs = _resolve(entry)
            ex = jexport.export(fn._jit)(*args, **kwargs)
            blob = cctx.compress(ex.serialize())
            tmp = bp + ".tmp"
            with open(tmp, "wb") as bf:
                bf.write(blob)
            os.replace(tmp, bp)
            written += 1
        except Exception as e:
            failed += 1
            if verbose:
                print(f"blob skip: {e}: {line[:100]}")
    return written, failed


def _compile_blob(fn: "_Wrapped", entry: dict, blob: bytes):
    """Deserialized export -> AOT Compiled matching the entry's
    signature (statics dropped -- they are baked into the module)."""
    import jax
    import zstandard
    from jax import export as jexport
    ex = jexport.deserialize(zstandard.ZstdDecompressor().decompress(blob))
    args, kwargs = _entry_dummies(fn, entry)
    call_args = [a for i, a in enumerate(args) if i not in fn.statics]
    call_kwargs = {k: v for k, v in kwargs.items()
                   if k not in fn.static_names}
    # re-apply donate_argnums, re-indexed for the dropped statics, so
    # accumulator kernels keep buffer reuse on the AOT path (ADVICE r3)
    donate = tuple(
        d - sum(1 for s in fn.statics if s < d)
        for d in fn.donated if d not in fn.statics)
    comp = jax.jit(ex.call, donate_argnums=donate or None).lower(
        *call_args, **call_kwargs).compile()
    # exactness guard: the exported module was specialized on the
    # recorded signature, so a match here is structural
    return comp


def manifest_path(tag: str) -> str:
    """Canonical manifest location for a model/config tag."""
    root = os.environ.get("ZKCNN_TPU_WARM_DIR",
                          os.path.join(os.path.dirname(__file__), "..",
                                       "warm"))
    return os.path.join(os.path.abspath(root), f"{tag}.jsonl")
