"""Eval runner tests: padded prefill correctness + end-to-end scoring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.generate import greedy_generate, pad_to_bucket
from multi_spatialmllm_tpu.models.tokenizer import SpatialTokenizer


class TestPaddedPrefill:
    def test_padding_does_not_change_generation(self):
        cfg = M.tiny_config()
        model = M.MultiFrameMLLM(cfg)
        batch = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=30)
        params = model.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])
        plain = greedy_generate(model, params, batch["input_ids"],
                                batch["tiles"], max_new_tokens=4)
        padded_ids = pad_to_bucket(np.asarray(batch["input_ids"]), 16, 0)
        assert padded_ids.shape[1] == 32
        padded = greedy_generate(model, params, jnp.asarray(padded_ids),
                                 batch["tiles"], max_new_tokens=4,
                                 prompt_len=30)
        np.testing.assert_array_equal(np.asarray(plain), np.asarray(padded))


class TestRunEval:
    def test_end_to_end_scoring(self, rng):
        from multi_spatialmllm_tpu.models.runner import (
            EvalRunConfig,
            run_eval,
        )
        from multi_spatialmllm_tpu.models.data import DataConfig
        from multi_spatialmllm_tpu.models.preprocess import PreprocessConfig

        tok = SpatialTokenizer()
        cfg = M.MLLMConfig(
            vit=M.ViTConfig(image_size=56, patch_size=14, hidden_size=32,
                            num_layers=1, num_heads=2),
            llm=M.LLMConfig(vocab_size=tok.vocab_size, hidden_size=32,
                            num_layers=1, num_heads=2, num_kv_heads=2,
                            ffn_size=64, dtype="float32"),
            img_context_id=tok.img_context_id,
        )
        model = M.MultiFrameMLLM(cfg)
        batch = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=64)
        params = model.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])

        samples = [
            {"id": "a", "image": ["s/0.jpg"],
             "text": "<image>\nHow deep is the point?",
             "question_type": "depth_estimation_coor", "gt_value": 1000,
             "height_list": [96], "width_list": [128]},
            {"id": "b", "image": ["s/1.jpg"],
             "text": "<image>\nWhich way did the camera move?",
             "question_type": "x_movement", "gt_value": "left",
             "height_list": [96], "width_list": [128]},
        ]
        run_cfg = EvalRunConfig(
            max_new_tokens=4, length_bucket=64,
            data=DataConfig(preprocess=PreprocessConfig(
                tile_size=56, max_tiles=1, resize_hw=None)))
        report = run_eval(
            model, params, tok, samples,
            lambda p: rng.integers(0, 255, (96, 128, 3), dtype=np.uint8),
            run_cfg)
        assert report["count"] == 2
        assert len(report["predictions"]) == 2
        assert 0.0 <= report["accuracy"] <= 1.0
        assert set(report["per_type"]) == {"depth_estimation_coor",
                                           "x_movement"}


class TestBatchedServing:
    def test_batched_matches_per_sample(self):
        """Multi-row eval with PER-ROW prompt lengths produces identical
        per-sample answers to the B=1 path (VERDICT r1 #9)."""
        from multi_spatialmllm_tpu.models.data import DataConfig
        from multi_spatialmllm_tpu.models.preprocess import PreprocessConfig
        from multi_spatialmllm_tpu.models.runner import (
            EvalRunConfig,
            predict_batch,
            predict_sample,
        )

        tok = SpatialTokenizer()
        cfg = M.MLLMConfig(
            vit=M.ViTConfig(image_size=56, patch_size=14, hidden_size=32,
                            num_layers=1, num_heads=2),
            llm=M.LLMConfig(vocab_size=tok.vocab_size, hidden_size=32,
                            num_layers=1, num_heads=2, num_kv_heads=2,
                            ffn_size=64, dtype="float32"),
            img_context_id=tok.img_context_id,
        )
        model = M.MultiFrameMLLM(cfg)
        batch = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=64)
        params = model.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])

        # three single-image samples with DIFFERENT prompt lengths, plus
        # one two-image sample (lands in its own tile-shape group)
        samples = [
            {"id": "a", "image": ["s/0.jpg"],
             "text": "<image>\nHow deep is the point?"},
            {"id": "b", "image": ["s/1.jpg"],
             "text": "<image>\nWhich way did the camera move, and by how "
                     "many millimeters did it travel in total?"},
            {"id": "c", "image": ["s/2.jpg"], "text": "<image>\nDepth?"},
            {"id": "d", "image": ["s/3.jpg", "s/4.jpg"],
             "text": "<image>\n<image>\nSame point?"},
        ]

        def loader(path):
            seed = int(path.split("/")[-1].split(".")[0])
            return np.random.default_rng(seed).integers(
                0, 255, (96, 128, 3), dtype=np.uint8)

        run_cfg = EvalRunConfig(
            max_new_tokens=5, length_bucket=32,
            data=DataConfig(preprocess=PreprocessConfig(
                tile_size=56, max_tiles=1, resize_hw=None)))
        single = [predict_sample(model, params, tok, s, loader, run_cfg)
                  for s in samples]
        batched = predict_batch(model, params, tok, samples, loader,
                                run_cfg)
        assert batched == single


class TestContinuousBatching:
    def test_matches_per_request_greedy(self):
        """Slot-based continuous batching returns the same tokens as
        greedy_generate run request-by-request, across mixed prompt
        lengths and more requests than slots (slot reuse)."""
        import numpy as np

        from multi_spatialmllm_tpu.models.generate import (
            greedy_generate,
            pad_to_bucket,
        )
        from multi_spatialmllm_tpu.models.serving import (
            ContinuousBatcher,
            ServeConfig,
        )

        cfg = M.tiny_config()
        model = M.MultiFrameMLLM(cfg)
        init_batch = M.make_example_batch(cfg, batch=1, n_tiles=1,
                                          seq_len=64)
        params = model.init(jax.random.key(0), init_batch["input_ids"],
                            init_batch["tiles"])

        t_img = cfg.tokens_per_tile
        rng = np.random.default_rng(5)
        requests = []
        for i, seq_len in enumerate((40, 56, 48, 64, 44, 60, 52)):
            ids = rng.integers(10, cfg.llm.vocab_size,
                               size=seq_len).astype(np.int32)
            ids[1:1 + t_img] = cfg.img_context_id
            tiles = np.asarray(jax.random.normal(
                jax.random.key(100 + i),
                (1, cfg.vit.image_size, cfg.vit.image_size, 3),
                dtype=jnp.float32))
            requests.append((ids, tiles))

        eos = 2
        batcher = ContinuousBatcher(
            model, params,
            ServeConfig(slots=3, max_prompt_len=128, max_new_tokens=6,
                        chunk=2, length_bucket=64),
            pad_id=0, eos_id=eos)
        got = batcher.generate_all(requests)

        for (ids, tiles), tokens in zip(requests, got):
            prompt = pad_to_bucket(ids[None], 64, 0)
            want = np.asarray(greedy_generate(
                model, params, jnp.asarray(prompt),
                jnp.asarray(tiles[None]), max_new_tokens=6, eos_id=eos,
                prompt_len=len(ids)))[0]
            if eos in want:
                want = want[: int(np.where(want == eos)[0][0])]
            np.testing.assert_array_equal(tokens, want)
