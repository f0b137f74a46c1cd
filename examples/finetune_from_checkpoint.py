"""Fine-tune from a pretrained InternVL-2-style checkpoint, end to end.

The reference's training recipe is "download InternVL-2, run its SFT
stack on the MultiSPA JSONL" (/root/reference/README.md:194-200). This is
the equivalent flow here, runnable without a download (a random fixture
checkpoint stands in for the real shards — point `--checkpoint` at an
actual InternVL2 directory to use released weights):

  1. safetensors -> flax params (models/checkpoint_import; layer scales
     folded, GQA wqkv unpacked),
  2. tokenizer.json -> HFTokenizer (or the self-contained fallback),
  3. MultiSPA JSONL -> prefetched static-shape batches (models/data),
  4. pjit train steps on a (data, model) mesh with the Pallas flash
     kernels, orbax checkpointing,
  5. MultiSPA eval via the batched serving path.

    python examples/finetune_from_checkpoint.py --steps 10
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--checkpoint", default=None,
                        help="dir with *.safetensors (+ tokenizer.json); "
                             "default: generate a tiny random fixture")
    parser.add_argument("--steps", type=int, default=10)
    parser.add_argument("--batch-size", type=int, default=2)
    parser.add_argument("--lora-rank", type=int, default=0,
                        help="LoRA adapter rank (0 = full finetune); the "
                             "reference's main-paper runs use LoRA "
                             "(README.md:199)")
    args = parser.parse_args()

    import multi_spatialmllm_tpu

    multi_spatialmllm_tpu.enable_compilation_cache()

    import jax
    import numpy as np

    from multi_spatialmllm_tpu.core.scene import SceneStore
    from multi_spatialmllm_tpu.core.synthetic import make_scene
    from multi_spatialmllm_tpu.engines import depth_perception as DP
    from multi_spatialmllm_tpu.models import checkpoint_import as CI
    from multi_spatialmllm_tpu.models import mllm as M
    from multi_spatialmllm_tpu.models.data import (
        DataConfig,
        prefetch_batches,
    )
    from multi_spatialmllm_tpu.models.llm import LLMConfig
    from multi_spatialmllm_tpu.models.preprocess import PreprocessConfig
    from multi_spatialmllm_tpu.models.runner import EvalRunConfig, run_eval
    from multi_spatialmllm_tpu.models.tokenizer import (
        SpatialTokenizer,
        load_tokenizer,
    )
    from multi_spatialmllm_tpu.models.vit import ViTConfig
    from multi_spatialmllm_tpu.stages.visibility import (
        VisibilityIndex,
        compute_scene_visibility,
    )

    # -- 1/2: checkpoint + tokenizer --------------------------------------
    tok = SpatialTokenizer()
    cfg = M.MLLMConfig(
        vit=ViTConfig(image_size=56, patch_size=14, hidden_size=64,
                      num_layers=2, num_heads=4),
        llm=LLMConfig(vocab_size=tok.vocab_size, hidden_size=64,
                      num_layers=2, num_heads=4, num_kv_heads=2,
                      ffn_size=128, dtype="float32"),
        img_context_id=tok.img_context_id,
    )
    if args.checkpoint:
        tok = load_tokenizer(args.checkpoint)
        cfg = M.flagship_config()
        params = CI.load_internvl2_checkpoint(args.checkpoint, cfg)
        print(f"loaded pretrained params from {args.checkpoint}")
    else:
        state = CI.make_fixture_state_dict(cfg, seed=0)
        params = CI.convert_state_dict(state, cfg)
        print("using a random fixture checkpoint (pass --checkpoint for "
              "real InternVL-2 shards)")
    model = M.MultiFrameMLLM(cfg)
    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    print(f"model: {n_params:,} parameters")

    with tempfile.TemporaryDirectory() as tmp:
        # -- 3: MultiSPA data ---------------------------------------------
        scenes = [make_scene(scene_id=f"ft{i:04d}_00", seed=20 + i,
                             n_images=10, n_background=2500, n_objects=2,
                             image_hw=(96, 128))
                  for i in range(3)]
        store = SceneStore.write(scenes, f"{tmp}/scenes")
        index = VisibilityIndex()
        for s in scenes:
            index.add_scene(s.scene_id, s.image_ids,
                            compute_scene_visibility(s))
        out = DP.generate_depth_estimation_to_jsonl(
            store, index, f"{tmp}/train.jsonl", "coor",
            DP.DepthEngineConfig(all_max_samples=24))
        import json as _json

        samples = [_json.loads(l) for l in open(out.train_path)]
        print(f"training samples: {len(samples)}")

        def loader(path):
            seed = abs(hash(path)) % (2 ** 32)
            return np.random.default_rng(seed).integers(
                0, 255, (96, 128, 3), dtype=np.uint8)

        dc = DataConfig(max_seq_len=256, max_tiles=1,
                        preprocess=PreprocessConfig(
                            tile_size=cfg.vit.image_size, max_tiles=1,
                            resize_hw=None))

        # -- 4: pjit fine-tuning ------------------------------------------
        import optax

        from multi_spatialmllm_tpu.models.mllm import loss_fn

        if args.lora_rank:
            # adapter-only training (parallel/lora.py): grads + optimizer
            # state cover the adapters; the base stays frozen
            from multi_spatialmllm_tpu.parallel.lora import (
                LoRAConfig,
                init_lora,
                lora_param_count,
                merge_lora,
            )

            lcfg = LoRAConfig(rank=args.lora_rank)
            lora = init_lora(params, lcfg, jax.random.key(1))
            print(f"LoRA rank {lcfg.rank}: "
                  f"{lora_param_count(lora):,} trainable parameters")
            tx = optax.adamw(1e-3)
            opt_state = tx.init(lora)

            @jax.jit
            def step(lora, opt_state, batch):
                loss, grads = jax.value_and_grad(
                    lambda lo: loss_fn(
                        model, merge_lora(params, lo, lcfg),
                        batch))(lora)
                updates, opt_state = tx.update(grads, opt_state, lora)
                return (optax.apply_updates(lora, updates), opt_state,
                        loss)

            trained = lora
        else:
            tx = optax.adamw(1e-4)
            opt_state = tx.init(params)

            @jax.jit
            def step(params, opt_state, batch):
                loss, grads = jax.value_and_grad(
                    lambda p: loss_fn(model, p, batch))(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state,
                        loss)

            trained = params

        i = 0
        losses = []
        while i < args.steps:
            for batch in prefetch_batches(samples, tok, cfg, loader,
                                          args.batch_size, dc):
                batch = {k: jax.numpy.asarray(v) for k, v in batch.items()}
                trained, opt_state, loss = step(trained, opt_state, batch)
                losses.append(float(loss))
                i += 1
                if i >= args.steps:
                    break
        if args.lora_rank:
            params = merge_lora(params, trained, lcfg)  # mergeable export
        else:
            params = trained
        print(f"fine-tuned {args.steps} steps: loss "
              f"{losses[0]:.3f} -> {losses[-1]:.3f}")
        assert losses[-1] < losses[0], "loss did not improve"

        # -- 5: eval via batched serving -----------------------------------
        eval_out = DP.generate_depth_estimation_to_jsonl(
            store, index, f"{tmp}/val.jsonl", "coor",
            DP.DepthEngineConfig(all_max_samples=6), eval_mode=True)
        eval_samples = [_json.loads(l) for l in open(eval_out.val_path)]
        report = run_eval(
            model, params, tok, eval_samples, loader,
            EvalRunConfig(max_new_tokens=8, length_bucket=256, data=dc),
            batch_size=len(eval_samples))
        print(f"eval: accuracy {report['accuracy']:.2f} over "
              f"{report['count']} samples")


if __name__ == "__main__":
    main()
