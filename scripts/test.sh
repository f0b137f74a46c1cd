#!/usr/bin/env bash
# Run the test suite on a virtual 8-device CPU mesh (the full configuration,
# including multi-chip sharding tests). See tests/conftest.py.
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORM_NAME=cpu
export JAX_PLATFORMS=cpu
# The axon sitecustomize registers the TPU-tunnel backend whenever
# PALLAS_AXON_POOL_IPS is set and then FORCE-overrides jax_platforms via
# jax.config.update — JAX_PLATFORMS=cpu alone no longer wins. Blank the
# trigger so CPU runs never touch (or wait on) the tunnel.
export PALLAS_AXON_POOL_IPS=
export XLA_FLAGS="${XLA_FLAGS:-} --xla_force_host_platform_device_count=8"
exec python -m pytest tests/ -q "$@"
