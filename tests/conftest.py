"""Test configuration.

Preferred: run on a virtual 8-device CPU mesh —

    JAX_PLATFORM_NAME=cpu JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python -m pytest tests/ -q        (or: scripts/test.sh)

The axon TPU tunnel preloads jax at interpreter startup, so the platform
cannot be switched from inside conftest; when the suite runs on the live
TPU backend instead, everything still passes because:
  * x64 is enabled (TPU emulates f64; golden comparisons stay exact),
  * default matmul precision is forced to HIGHEST (otherwise TPU f32
    matmuls use bf16 passes and row-equivalence/decode tests drift),
  * tests needing an 8-device mesh self-skip (the driver validates the
    multi-chip path separately via __graft_entry__.dryrun_multichip with
    env set at process start).
"""

import os

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

ON_CPU_MESH = jax.default_backend() == "cpu" and len(jax.devices()) >= 8

requires_cpu_mesh = pytest.mark.skipif(
    not ON_CPU_MESH,
    reason="needs the 8-device virtual CPU mesh (see conftest docstring)",
)


@pytest.fixture(scope="session")
def synth_scene():
    from multi_spatialmllm_tpu.core.synthetic import make_scene

    return make_scene(seed=0)


@pytest.fixture(scope="session")
def synth_scene_big():
    from multi_spatialmllm_tpu.core.synthetic import make_scene

    return make_scene(
        scene_id="synth0001_00", n_background=8000, n_objects=6,
        n_images=20, seed=1,
    )


@pytest.fixture(scope="session")
def tapvid_record():
    from multi_spatialmllm_tpu.core.synthetic import make_tapvid_npz

    return make_tapvid_npz(seed=0)


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
