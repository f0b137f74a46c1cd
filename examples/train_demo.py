"""End-to-end demo: synthesize scenes -> generate MultiSPA QA -> train the
multi-frame MLLM -> score it with the eval harness.

Runs on any backend (a few minutes on the dev TPU or the CPU mesh):

    python examples/train_demo.py --steps 30

Demonstrates the full L1->L5 loop with no dataset downloads: the same code
paths scale to the real ScanNet/TAPVid data and the flagship model config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--batch-size", type=int, default=4)
    parser.add_argument("--eval-samples", type=int, default=8)
    args = parser.parse_args()

    import multi_spatialmllm_tpu

    multi_spatialmllm_tpu.enable_compilation_cache()

    import jax
    import numpy as np

    from multi_spatialmllm_tpu.core.scene import SceneStore
    from multi_spatialmllm_tpu.core.synthetic import make_scene
    from multi_spatialmllm_tpu.engines import camera_movement as CM
    from multi_spatialmllm_tpu.models import mllm as M
    from multi_spatialmllm_tpu.models.data import DataConfig, batch_iterator
    from multi_spatialmllm_tpu.models.eval_harness import evaluate
    from multi_spatialmllm_tpu.models.llm import LLMConfig
    from multi_spatialmllm_tpu.models.preprocess import PreprocessConfig
    from multi_spatialmllm_tpu.models.runner import EvalRunConfig, run_eval
    from multi_spatialmllm_tpu.models.tokenizer import SpatialTokenizer
    from multi_spatialmllm_tpu.models.vit import ViTConfig
    from multi_spatialmllm_tpu.parallel.mesh import make_mesh
    from multi_spatialmllm_tpu.parallel.train import (
        TrainConfig,
        init_train_state,
        make_train_step,
    )
    from multi_spatialmllm_tpu.stages.frame_relations import (
        build_frame_relations,
    )
    from multi_spatialmllm_tpu.stages.visibility import (
        compute_visibility_batch,
    )

    print(f"backend: {jax.default_backend()}, devices: {len(jax.devices())}")

    # ---- L1-L4: data engine ------------------------------------------
    with tempfile.TemporaryDirectory() as tmp:
        scenes = [make_scene(scene_id=f"demo{i:02d}_00", seed=i,
                             n_images=12, n_background=3000)
                  for i in range(2)]
        store = SceneStore.write(scenes, f"{tmp}/scenes")
        vis = compute_visibility_batch(scenes, dtype=np.float32)
        relations = build_frame_relations(scenes, visibility=vis,
                                          dtype=np.float32)
        cfg_cm = CM.CameraMovementConfig(overlap_min=0.1, overlap_max=100,
                                         interval=5)
        samples = CM.build_samples_for_question_type(
            relations, store, "x_movement", 64, cfg_cm)
        print(f"generated {len(samples)} x_movement samples")

    # ---- L5: tokenizer, model, train ---------------------------------
    tok = SpatialTokenizer()
    model_cfg = M.MLLMConfig(
        vit=ViTConfig(image_size=56, patch_size=14, hidden_size=96,
                      num_layers=2, num_heads=4),
        llm=LLMConfig(vocab_size=tok.vocab_size, hidden_size=128,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      ffn_size=256, max_seq_len=512, dtype="float32"),
        img_context_id=tok.img_context_id,
    )
    data_cfg = DataConfig(
        max_seq_len=512, max_tiles=4,
        preprocess=PreprocessConfig(tile_size=56, max_tiles=1,
                                    resize_hw=None))
    rng = np.random.default_rng(0)

    def image_loader(path):
        seed = abs(hash(path)) % (2 ** 32)
        r = np.random.default_rng(seed)
        return r.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)

    batches = list(batch_iterator(samples, tok, model_cfg, image_loader,
                                  args.batch_size, data_cfg))
    print(f"{len(batches)} training batches of {args.batch_size}")

    mesh = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    model, params, opt_state, tx = init_train_state(
        model_cfg, TrainConfig(learning_rate=3e-4, warmup_steps=2),
        batches[0], mesh)
    step_fn = make_train_step(model, tx, mesh)
    losses = []
    for step in range(args.steps):
        batch = batches[step % len(batches)]
        params, opt_state, metrics = step_fn(params, opt_state, batch)
        losses.append(float(metrics["loss"]))
        if step % 5 == 0 or step == args.steps - 1:
            print(f"step {step:3d}  loss {losses[-1]:.4f}")
    assert losses[-1] < losses[0], "training should reduce loss"

    # ---- eval ---------------------------------------------------------
    from multi_spatialmllm_tpu.engines.base import to_eval_sample

    eval_samples = [to_eval_sample(s) for s in samples[: args.eval_samples]]
    report = run_eval(
        model, params, tok, eval_samples, image_loader,
        EvalRunConfig(max_new_tokens=8, length_bucket=128, data=data_cfg))
    preds = report.pop("predictions")
    print("eval report:", json.dumps(report, indent=2))
    print("sample prediction:", repr(preds[0][:80]))


if __name__ == "__main__":
    main()
