"""Benchmark: MultiSPA QA-sample generation throughput on TPU.

Headline metric (BASELINE.json): QA samples/sec for the data engine. The
measured task is camera-movement QA generation — the reference's fastest
engine at ~4.2K samples/s/proc (camera_movement_engine_train_val.py:418,
"~4 min per 1M samples") — run end-to-end: overlap-balanced sampling,
batched device pose math, host template formatting, on synthetic scenes
(no dataset download required).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_SAMPLES_PER_SEC = 1_000_000 / 240.0  # ~4167/s (reference comment)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def main() -> None:
    import jax

    import multi_spatialmllm_tpu

    multi_spatialmllm_tpu.enable_compilation_cache()

    from multi_spatialmllm_tpu.core.scene import SceneStore
    from multi_spatialmllm_tpu.core.synthetic import make_scene
    from multi_spatialmllm_tpu.engines import camera_movement as CM
    from multi_spatialmllm_tpu.stages.frame_relations import (
        build_frame_relations,
    )
    from multi_spatialmllm_tpu.stages.visibility import (
        compute_visibility_batch,
    )

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        t0 = time.perf_counter()
        # 40 scenes x 96 images -> ~182K frame pairs, enough population for
        # the 200K-per-type balanced sample below.
        # Small depth maps: the dev tunnel's host<->device bandwidth is
        # ~25 MB/s, so stage wall time here is transfer-bound (real TPU
        # hosts move these buffers over PCIe at GB/s).
        scenes = [
            make_scene(scene_id=f"bench{i:04d}_00", seed=100 + i,
                       n_images=96, n_background=4000, n_objects=4,
                       depth_hw=(24, 32), n_invalid_poses=0)
            for i in range(40)
        ]
        store = SceneStore.write(scenes, f"{tmp}/scenes")
        log(f"scene synthesis: {time.perf_counter() - t0:.1f}s")

        # Stage precompute in f32: the measured metric below is QA generation
        # throughput; f32 keeps the one-off stage compiles to seconds
        # (production pipelines default to f64 for exact label parity).
        t0 = time.perf_counter()
        vis = compute_visibility_batch(scenes, dtype=np.float32,
                                       batch_size=10)
        log(f"visibility stage (f32, batched dispatch): "
            f"{time.perf_counter() - t0:.1f}s")

        t0 = time.perf_counter()
        relations = build_frame_relations(scenes, visibility=vis,
                                          dtype=np.float32)
        log(f"frame relations: {time.perf_counter() - t0:.1f}s "
            f"({len(relations)} pairs)")

        from multi_spatialmllm_tpu.ingest.native import (
            build as build_native,
            native_available,
        )

        build_native()
        log(f"native emitter available: {native_available()}")
        cfg = CM.CameraMovementConfig(overlap_min=0.1, overlap_max=100.0,
                                      interval=5.0)

        # Warm up device compilation + caches.
        CM.generate_to_jsonl(relations, store, "total_distance", 1000,
                             f"{tmp}/warmup.jsonl", cfg)

        # End-to-end per question type: balanced sampling, batched device
        # pose math, template fill, shuffle, JSONL write (the reference's
        # "~4 min per 1M samples" covers the same span).
        n_target = 200_000
        qtypes = ("total_distance", "displacement_vector")
        total = 0
        t0 = time.perf_counter()
        for qtype in qtypes:
            total += CM.generate_to_jsonl(
                relations, store, qtype, n_target,
                f"{tmp}/{qtype}_train.jsonl", cfg)
        dt = time.perf_counter() - t0
        rate = total / dt
        log(f"generated+wrote {total} samples in {dt:.2f}s -> {rate:,.0f}/s")

    print(json.dumps({
        "metric": "camera_movement_qa_samples_per_sec",
        "value": round(rate, 1),
        "unit": "samples/s",
        "vs_baseline": round(rate / REFERENCE_SAMPLES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
