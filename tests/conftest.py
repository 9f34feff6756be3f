"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py; tests must be deterministic
and runnable anywhere, so we force the CPU backend with 8 virtual devices
(the analogue of the reference's thread-count sweeps in
tests/test_owf_wpp_tiles.sh — sharding layouts must not change results).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# NO persistent compilation cache for the suite: deserializing cached
# executables on the 8-virtual-device CPU backend segfaults the
# interpreter deterministically mid-suite (crash inside
# compilation_cache.get_executable_and_time / zstd).  Cold compiles
# are the stable trade.  (The TPU bench paths keep their own cache.)
os.environ["JAX_COMPILATION_CACHE_DIR"] = ""
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin (sitecustomize on PYTHONPATH) registers itself at
# interpreter start and overrides the env var; force the selection back
# to CPU through the live config so tests never ride the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Concurrent jit compiles from the encoder's worker threads have
# crashed inside the persistent-cache read path (zstd/deserialize
# segfault); serialize compiles process-wide for the whole suite.
import kvazaar_tpu  # noqa: E402

kvazaar_tpu.serialize_jax_compiles()
