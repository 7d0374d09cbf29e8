"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding tests use `jax.sharding.Mesh` over these virtual devices,
mirroring how the driver validates the multi-chip path (SURVEY.md §4).
"""

import os

# Must be set before jax is imported anywhere.  FORCE (not setdefault): the
# ambient environment carries JAX_PLATFORMS=axon (the tunneled TPU), and the
# CLIs honor $JAX_PLATFORMS via respect_jax_platforms_env() mid-test — a
# setdefault would let e2e CLI tests silently switch to the TPU backend,
# which hangs forever whenever the tunnel is wedged.
os.environ["JAX_PLATFORMS"] = "cpu"
# The axon TPU plugin registers whenever $PALLAS_AXON_POOL_IPS is set — even
# under JAX_PLATFORMS=cpu — and the tunnel is single-client: a concurrent
# test process that registers the plugin can crash an ACTIVE TPU job on the
# same box (observed: long e2e runs dying mid-queue while the CPU suite ran).
# Unset it before jax import so tests can never touch the tunnel.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# A sitecustomize.py in this image force-appends the 'axon' TPU plugin to
# jax_platforms regardless of the env var; override it explicitly so tests
# really run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

# Persistent compilation cache: XLA-CPU compiles dominate test wall-clock;
# repeat runs hit the disk cache instead.  Same dir as the CLI runtime's
# setup_jax_cache so test-driven and manual runs share compiles.
from villandiffusion_tpu.utils.jaxruntime import setup_jax_cache  # noqa: E402

setup_jax_cache()
