"""kvazaar_tpu — a TPU-native HEVC (H.265) encoder.

A from-scratch re-design of the capabilities of the Kvazaar HEVC encoder
(reference: 1314wu/kvazaar, analyzed in SURVEY.md) for TPU hardware:

- per-CTU compute (intra/inter search, transform, quant, reconstruction,
  in-loop filters) runs as batched JAX/XLA/Pallas programs over whole
  wavefronts of CTUs at once (reference: per-LCU pthread jobs,
  src/encoderstate.c:612);
- the serial-by-nature CABAC entropy stage runs host-side, fed by
  device-computed syntax-element tensors (reference: src/cabac.c,
  src/encode_coding_tree.c);
- multi-chip scaling uses jax.sharding meshes (tiles / CTU-row shards
  within a frame, GOP pipelining across hosts) instead of the reference's
  pthread threadqueue (src/threadqueue.c).
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: encoder programs are large (the
# wavefront scan) and geometry-keyed; caching across processes turns
# ~minutes of first-frame compile into milliseconds on re-runs.
_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       _os.path.expanduser("~/.cache/kvazaar_tpu_xla"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
# Canonical cache keys across call paths: Pallas/Mosaic custom-call
# payloads embed the Python call stack as MLIR debug locations, and the
# outer strip-debuginfo pass cannot reach inside the serialized kernel
# body — so the SAME program traced from bench.py vs cli.py vs a test
# got a different persistent-cache key (measured: every entry point
# paid the full ~7 min remote compile).  Dropping tracebacks from
# locations makes the payload, and hence the key, call-site-invariant.
_os.environ.setdefault("JAX_INCLUDE_FULL_TRACEBACKS_IN_LOCATIONS",
                       "false")
_os.environ.setdefault("JAX_TRACEBACK_IN_LOCATIONS_LIMIT", "0")

# The fused wavefront kernel's VMEM working set (edge-state scratch is
# (blocks+1, 128) int32 x2 after lane padding, plus the 35-mode
# prediction temporaries) exceeds XLA's default 16 MB scoped-vmem
# budget at 1080p+.  v5e has 128 MB of VMEM; raise the scoped budget.
# Passed as per-jit compiler options (XLA_FLAGS can't carry TPU-only
# flags here: the client-side CPU XLA rejects unknown flags at
# startup, while compiler options ride the compile request).
TPU_COMPILER_OPTIONS = {"xla_tpu_scoped_vmem_limit_kib": "24576"}


def tpu_jit(fun, **kw):
    """jax.jit with the encoder's TPU compiler options (no-op off-TPU:
    the CPU backend ignores unknown TPU options at compile time would
    error, so options are only attached when a TPU backend is live)."""
    import jax

    if jax.default_backend() == "tpu":
        kw.setdefault("compiler_options", TPU_COMPILER_OPTIONS)
    return jax.jit(fun, **kw)


def serialize_jax_compiles() -> None:
    """Serialize XLA compile + persistent-cache access with a process
    lock.  The encoder's pipelined paths compile from worker threads;
    concurrent cache reads have crashed the interpreter inside the
    zstd/deserialize path (segfault in
    compilation_cache.get_executable_and_time).  Compiles are bound by
    the (remote) compiler service anyway, so serializing them costs
    nothing measurable."""
    import threading

    import jax._src.compiler as _compiler
    if getattr(_compiler, "_kvz_serialized", False):
        return
    lock = threading.Lock()
    orig = _compiler.compile_or_get_cached

    def locked(*a, **kw):
        with lock:
            # The axon remote-compile HTTP service occasionally drops
            # a response mid-body; one failed compile would otherwise
            # kill a whole encode/bench run.  Retry transient errors.
            import time as _t
            for attempt in range(3):
                try:
                    return orig(*a, **kw)
                except Exception as e:     # noqa: BLE001
                    transient = ("remote_compile" in str(e)
                                 or "read body" in str(e)
                                 or "DEADLINE" in str(e))
                    if attempt == 2 or not transient:
                        raise
                    _t.sleep(2.0 * (attempt + 1))

    _compiler.compile_or_get_cached = locked
    _compiler._kvz_serialized = True


def enable_compile_cache() -> None:
    """Explicitly enable the persistent compile cache (the env var is
    not always honored by every platform plugin)."""
    import jax
    try:
        # Default to a per-user cache dir when the env var is unset;
        # an EMPTY env var is an explicit disable (the CPU test suite
        # sets "" — deserializing on the 8-virtual-device CPU backend
        # has segfaulted, see tests/conftest.py).  On the TPU tunnel a
        # cold veryslow-1080p warm-up is ~6 min of remote compiles, so
        # the persistent cache is the difference between a usable and
        # an unusable bench budget.
        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/kvazaar_tpu_xla"))
        if cache_dir and jax.config.jax_compilation_cache_dir is None:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        if cache_dir:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 0.0)
            # Call-site-invariant cache keys (see the env defaults at
            # module import; config.update here covers the case where
            # jax was imported before kvazaar_tpu).
            jax.config.update(
                "jax_include_full_tracebacks_in_locations", False)
            jax.config.update("jax_traceback_in_locations_limit", 0)
    except Exception:
        pass
    try:
        serialize_jax_compiles()
    except Exception:
        pass

from kvazaar_tpu.config import Config  # noqa: F401
