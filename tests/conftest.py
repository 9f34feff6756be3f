"""Test configuration: run all tests on a virtual 8-device CPU mesh.

Real-TPU execution is exercised by bench.py; tests must be deterministic
and runnable anywhere, so we force the CPU backend with 8 virtual devices
(the analogue of the reference's thread-count sweeps in
tests/test_owf_wpp_tiles.sh — sharding layouts must not change results).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

# Persistent compilation cache: this box has a single CPU core and XLA
# compiles are the dominant test cost; cache them across runs.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/tmp/kvazaar_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
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
