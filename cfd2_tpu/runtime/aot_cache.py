"""AOT-compiled executable cache: persist Mosaic/XLA compiles across processes.

JAX's persistent compilation cache (JAX_COMPILATION_CACHE_DIR) caches *XLA*
programs but, through this environment's remote-compile tunnel, does NOT
capture Pallas/Mosaic kernel compiles — every process re-pays minutes of
Mosaic lowering on the banded/unstructured path (ROADMAP #7/#8, VERDICT r3
weak #4).  This module closes that at the executable level:
``jax.jit(f).lower(args).compile()`` is serialized with
``jax.experimental.serialize_executable`` (PJRT executable bytes, which
INCLUDE the compiled Mosaic kernels) and reloaded by any later process with
the same program.

Cache key = sha256 of the lowered StableHLO text + backend/device kind +
jax version.  Lowering (tracing) is cheap — the 1M-cell fused step is ~3k
StableHLO lines — so hashing the text is exact and costs ~seconds, vs
minutes of compile.

The reference has no equivalent concern (wgpu pipelines compile in
milliseconds at startup, init/pipelines.rs); on TPU this is what makes
cold-start practical.

Usage (used by CoupledSolver when CFD2_AOT_CACHE=1, and by bench tools):

    compiled = cached_compile(step_jit, mesh, state, params,
                              config=config, amg=amg)
    out = compiled(mesh, state, params, amg)   # static args now baked in
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle

import jax

log = logging.getLogger(__name__)

DEFAULT_DIR = os.environ.get("CFD2_AOT_CACHE_DIR", ".aot_cache")


def _key(lowered) -> str:
    dev = jax.devices()[0]
    tag = f"{jax.__version__}|{dev.platform}|{getattr(dev, 'device_kind', '')}"
    h = hashlib.sha256(tag.encode())
    h.update(lowered.as_text().encode())
    return h.hexdigest()[:32]


def _trace(msg):
    if os.environ.get("CFD2_AOT_TIME"):
        import sys
        print(f"# aot_cache: {msg}", file=sys.stderr, flush=True)


def _compile_and_store(lowered, path: str, store: bool = True):
    from jax.experimental import serialize_executable as se
    import time

    t0 = time.time()
    compiled = lowered.compile()
    _trace(f"compile {time.time() - t0:.1f}s")
    if not store:
        return compiled
    try:
        t0 = time.time()
        payload = se.serialize(compiled)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)
        _trace(f"serialize+store {time.time() - t0:.1f}s")
        log.info("aot_cache store %s", path)
    except Exception as e:
        log.warning("aot_cache store failed (%s); executable not persisted", e)
    return compiled


class _SelfHealingCompiled:
    """A deserialized executable that validates itself on first call.

    Some backends deserialize happily but fail at execution (XLA:CPU AOT
    rejects machine-feature drift at run time).  The first invocation IS the
    validation: on failure the stale cache entry is replaced by a fresh
    compile of the kept ``lowered`` and the call is retried — the caller
    never sees the difference beyond one compile's latency."""

    def __init__(self, compiled, lowered, path):
        self._compiled = compiled
        self._lowered = lowered
        self._path = path
        self._validated = False

    def __call__(self, *args):
        if self._validated:
            return self._compiled(*args)
        try:
            out = self._compiled(*args)
            # Async dispatch: force completion so execution errors surface
            # here, not at a later use site.
            import jax as _jax
            _jax.block_until_ready(out)
        except Exception as e:
            log.warning("aot_cache stale executable (%s); recompiling", e)
            self._compiled = _compile_and_store(self._lowered, self._path)
            out = self._compiled(*args)
        self._validated = True
        self._lowered = None   # free the trace
        return out


def cached_compile(jitfn, *args, cache_dir: str | None = None, **kwargs):
    """Lower ``jitfn(*args, **kwargs)``, then load the compiled executable
    from the cache or compile-and-store it.  Returns a callable taking the
    same-structure *dynamic* arguments (static args are baked in).  Falls
    back to a plain compile if the backend cannot serialize/deserialize
    executables."""
    from jax.experimental import serialize_executable as se
    import time

    cache_dir = cache_dir or DEFAULT_DIR
    # CFD2_AOT_STORE=0: compile through the same path but skip executable
    # serialization — a cold single-run process (the driver bench) pays the
    # store cost with zero chance of a later hit.
    store = os.environ.get("CFD2_AOT_STORE", "1") != "0"
    t0 = time.time()
    lowered = jitfn.lower(*args, **kwargs)
    _trace(f"lower {time.time() - t0:.1f}s")
    key = _key(lowered)
    path = os.path.join(cache_dir, f"{key}.pjrt")

    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                payload = pickle.load(f)
            compiled = se.deserialize_and_load(*payload)
            log.info("aot_cache hit %s", path)
            return _SelfHealingCompiled(compiled, lowered, path)
        except Exception as e:   # stale jaxlib, truncated file, ...
            log.warning("aot_cache load failed (%s); recompiling", e)

    return _compile_and_store(lowered, path, store=store)
