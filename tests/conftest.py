"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax initializes. x64 is enabled so the geometry
golden tests can compare against float64 NumPy oracles exactly; TPU runs use
float32 (tolerances asserted separately in the f32 tests).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


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
