"""Test environment: force a deterministic 8-device CPU mesh.

Must run before any jax import: tests validate bit-exactness and sharding
invariance on virtual CPU devices; the real-TPU path is exercised by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
# Persistent compilation cache keeps repeated suite runs fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache_vfg")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# Environments with a PJRT plugin baked into sitecustomize may force their
# platform via jax.config at interpreter start; override it explicitly.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
