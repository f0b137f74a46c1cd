"""Warm the persistent compilation cache for bench.py's stage shapes.

Covers every device program the bench dispatches: the 40-scene bench
corpus (f32 batched visibility + relations), the real-scale f64
visibility scene (296 x 202K, chunked dispatch), the annotated-engine
scenes, and the f64 single-scene path used by tests.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import time
import multi_spatialmllm_tpu
multi_spatialmllm_tpu.enable_compilation_cache()
import numpy as np
from multi_spatialmllm_tpu.core.synthetic import make_scene
from multi_spatialmllm_tpu.stages.visibility import (
    compute_scene_visibility,
    compute_visibility_batch,
)
from multi_spatialmllm_tpu.stages.frame_relations import compute_scene_relations

t0 = time.time()
s = make_scene(scene_id="warm0000_00", seed=1, n_images=96,
               n_background=4000, n_objects=4, depth_hw=(24, 32),
               n_invalid_poses=0)
print("scene", round(time.time() - t0, 1), flush=True)
vis = compute_scene_visibility(s, dtype=np.float32)
print("visibility f32 cached", round(time.time() - t0, 1), flush=True)
# bench batch shape: 10 scenes per dispatch
batch = [make_scene(scene_id=f"warm{i:04d}_00", seed=1 + i, n_images=96,
                    n_background=4000, n_objects=4, depth_hw=(24, 32),
                    n_invalid_poses=0) for i in range(10)]
compute_visibility_batch(batch, dtype=np.float32, batch_size=10)
print("visibility f32 batch-10 cached", round(time.time() - t0, 1), flush=True)
from multi_spatialmllm_tpu.stages.frame_relations import build_frame_relations
build_frame_relations(
    batch, visibility={b.scene_id: compute_scene_visibility(b, np.float32)
                       for b in batch}, dtype=np.float32)
print("relations f32 batch-10 cached", round(time.time() - t0, 1), flush=True)
rel = compute_scene_relations(s, vis=vis, dtype=np.float32)
print("relations f32 cached", round(time.time() - t0, 1), flush=True)
vis64 = compute_scene_visibility(s, dtype=np.float64)
print("visibility f64 cached", round(time.time() - t0, 1), flush=True)
rel64 = compute_scene_relations(s, vis=vis64, dtype=np.float64)
print("relations f64 cached", round(time.time() - t0, 1), flush=True)
# real-scale f64 scene (bench stage metric): chunked dispatch shape
real = make_scene(scene_id="warmreal_00", seed=7, n_images=296,
                  n_background=200_000, n_objects=8, image_hw=(968, 1296),
                  depth_hw=(480, 640), n_invalid_poses=0)
compute_scene_visibility(real, dtype=np.float64)
print("visibility f64 real-scale cached", round(time.time() - t0, 1),
      flush=True)
compute_scene_relations(real, dtype=np.float64,
                        vis=np.zeros((296, 202400), dtype=bool))
print("relations f64 real-scale cached", round(time.time() - t0, 1),
      flush=True)
# annotated-engine scenes (480x640 color, 120x160 depth, batch 2)
ann = [make_scene(scene_id=f"warmann{i:02d}_00", seed=300 + i, n_images=48,
                  n_background=4000, n_objects=4, image_hw=(480, 640),
                  depth_hw=(120, 160), n_invalid_poses=0) for i in range(2)]
compute_visibility_batch(ann, dtype=np.float32, batch_size=2)
print("visibility f32 annotated-scenes cached", round(time.time() - t0, 1),
      flush=True)
# object-movement engine shapes (rigid segmentation programs)
from multi_spatialmllm_tpu.core.synthetic import make_tapvid_npz
from multi_spatialmllm_tpu.engines import object_movement as OM
import tempfile
with tempfile.TemporaryDirectory() as _tmp:
    OM.generate({"warmseq": make_tapvid_npz(seed=0, n_frames=24, n_groups=4,
                                            points_per_group=10, n_static=20)},
                f"{_tmp}/om.jsonl",
                OM.ObjectMovementConfig(
                    question_type="tapvid3d_total_distance",
                    npoints_per_group=15, npairs_per_bin=2))
print("object-movement programs cached", round(time.time() - t0, 1),
      flush=True)
from multi_spatialmllm_tpu.stages.visibility import (
    compute_scene_visibility_hybrid,
)
compute_scene_visibility_hybrid(real)
print("visibility hybrid real-scale cached", round(time.time() - t0, 1),
      flush=True)
# object visibility + coverage programs on the real-scale shapes
from multi_spatialmllm_tpu.stages.object_visibility import (
    build_object_visibility,
)
from multi_spatialmllm_tpu.stages.coverage import build_object_coverage
vis_real = compute_scene_visibility(real, dtype=np.float64)
ovis = build_object_visibility([real],
                               visibility={real.scene_id: vis_real})
build_object_coverage([real], ovis, visibility={real.scene_id: vis_real})
print("object visibility + coverage cached", round(time.time() - t0, 1),
      flush=True)
# model path: chained train step + serving programs (bench `model` block)
import jax
# earlier stages flipped x64 on; the model path traces in 32-bit (Pallas
# kernels reject 64-bit types) — mirror bench.py
jax.config.update("jax_enable_x64", False)
from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.parallel.mesh import make_mesh
from multi_spatialmllm_tpu.parallel.train import (
    TrainConfig, init_train_state, make_chained_train_step,
)
cfg_m = M.bench_1chip_config()
batch = M.make_example_batch(cfg_m, batch=4, n_tiles=2, seq_len=2048)
mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
model, params, opt_state, tx = init_train_state(
    cfg_m, TrainConfig(warmup_steps=10), batch, mesh)
step = make_chained_train_step(model, tx, mesh, 8)
params, opt_state, losses = step(params, opt_state, batch)
float(losses[-1])
del params, opt_state, step
print("train chain cached", round(time.time() - t0, 1), flush=True)

# serving programs: paged continuous batcher exactly as bench.py's
# serving block dispatches them (prefill buckets + fused decode chunk);
# request shapes + config come from the SHARED helpers so the warmed
# programs cannot drift from the bench's
from multi_spatialmllm_tpu.models.paged_kv import (
    PagedBatcher, bench_paged_config, make_serve_requests)

smodel = M.MultiFrameMLLM(cfg_m)
b0 = M.make_example_batch(cfg_m, batch=1, n_tiles=1, seq_len=512)
sparams = jax.jit(smodel.init)(jax.random.key(0), b0["input_ids"],
                               b0["tiles"])
requests = make_serve_requests(cfg_m, 8)
PagedBatcher(smodel, sparams, bench_paged_config()).generate_all(requests)
print("serving programs cached", round(time.time() - t0, 1), flush=True)
PagedBatcher(smodel, sparams,
             bench_paged_config(kv_dtype="int8")).generate_all(requests)
print("int8 serving programs cached", round(time.time() - t0, 1), flush=True)
# the resume program specializes on (shared pages, prompt bucket):
# warm with the bench's EXACT 16-request list so every combo compiles
reqs_px = make_serve_requests(cfg_m, 16, questions_per_image=4)
PagedBatcher(smodel, sparams,
             bench_paged_config(prefix_cache=True)).generate_all(reqs_px)
print("prefix serving programs cached", round(time.time() - t0, 1),
      flush=True)
