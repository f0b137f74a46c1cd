"""multi_spatialmllm_tpu — a TPU-native (JAX/XLA/Pallas/pjit) rebuild of the
Multi-SpatialMLLM spatial-QA data engine and multi-frame MLLM stack.

Layer map (mirrors the reference's five-layer pipeline, see SURVEY.md):

  L1  ingest/    raw-data ingestion (.sens streams, PLY meshes, TAPVid npz)
  L2  core/      scene data model + batched geometry kernels
  L3  stages/    derived spatial indices (visibility, frame relations,
                 object visibility, minimal coverage)
  L4  engines/   QA generation engines (camera movement, depth perception,
                 visual correspondence, object perception, object movement)
  L5  models/    multi-frame ViT+LLM (InternVL-style) forward/train/eval
      parallel/  device-mesh sharding, pjit train step
      ops/       Pallas kernels for the hot paths

Unlike the reference (per-scene Python loops over NumPy/OpenCV), every
geometry-heavy path here is expressed as batched, statically-shaped JAX
programs that XLA tiles onto the TPU MXU/VPU, with scenes padded into packed
arrays and visibility/overlap computed as dense matrix programs.
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache (idempotent).

    The float64 stage programs are compile-heavy on TPU; caching them on
    disk makes repeated pipeline/bench runs start hot."""
    import os

    import jax

    cache_dir = path or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR", "/tmp/jax_compilation_cache")
    if jax.config.jax_compilation_cache_dir is None:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
