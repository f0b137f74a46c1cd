"""Eval runner tests: padded prefill correctness + end-to-end scoring."""

import dataclasses

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


class TestSampling:
    """sample_generate: temperature / top-k / top-p truncated sampling
    (beyond-reference serving surface; greedy stays the eval path)."""

    @staticmethod
    def _setup(batch=2, seq_len=30):
        cfg = M.tiny_config()
        model = M.MultiFrameMLLM(cfg)
        b = M.make_example_batch(cfg, batch=batch, n_tiles=1,
                                 seq_len=seq_len)
        params = model.init(jax.random.key(0), b["input_ids"], b["tiles"])
        return cfg, model, params, b

    def test_near_zero_temperature_equals_greedy(self):
        from multi_spatialmllm_tpu.models.generate import sample_generate

        cfg, model, params, b = self._setup()
        greedy = greedy_generate(model, params, b["input_ids"], b["tiles"],
                                 max_new_tokens=5)
        sampled = sample_generate(model, params, b["input_ids"],
                                  b["tiles"], jax.random.key(7),
                                  max_new_tokens=5, temperature=0.0)
        np.testing.assert_array_equal(np.asarray(greedy),
                                      np.asarray(sampled))

    def test_top_k_one_equals_greedy(self):
        from multi_spatialmllm_tpu.models.generate import sample_generate

        cfg, model, params, b = self._setup()
        greedy = greedy_generate(model, params, b["input_ids"], b["tiles"],
                                 max_new_tokens=5)
        sampled = sample_generate(model, params, b["input_ids"],
                                  b["tiles"], jax.random.key(3),
                                  max_new_tokens=5, temperature=2.0,
                                  top_k=1)
        np.testing.assert_array_equal(np.asarray(greedy),
                                      np.asarray(sampled))

    def test_top_p_draw_support(self):
        """_draw on a hand distribution: a vanishing nucleus collapses
        to the argmax for every key, and a 0.6 nucleus only ever emits
        tokens from the exact expected support (both of which appear)."""
        from multi_spatialmllm_tpu.models.generate import _draw

        logits = jnp.log(jnp.asarray(
            [[0.05, 0.45, 0.05, 0.35, 0.10],
             [0.70, 0.05, 0.15, 0.05, 0.05]]))
        t = jnp.asarray(1.0, jnp.float32)
        seen = set()
        for s in range(30):
            tok = np.asarray(_draw(jax.random.key(s), logits, t,
                                   None, 1e-9))
            np.testing.assert_array_equal(tok, [1, 0])
            tok = np.asarray(_draw(jax.random.key(s), logits, t,
                                   None, 0.6))
            # row 0 nucleus: {1 (.45), 3 (.35)}; row 1: {0 (.70)}
            assert tok[0] in (1, 3) and tok[1] == 0
            seen.add(int(tok[0]))
        assert seen == {1, 3}

    def test_reproducible_and_key_sensitive(self):
        from multi_spatialmllm_tpu.models.generate import sample_generate

        cfg, model, params, b = self._setup()
        kw = dict(max_new_tokens=8, temperature=5.0)
        a1 = sample_generate(model, params, b["input_ids"], b["tiles"],
                             jax.random.key(1), **kw)
        a2 = sample_generate(model, params, b["input_ids"], b["tiles"],
                             jax.random.key(1), **kw)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        b2 = sample_generate(model, params, b["input_ids"], b["tiles"],
                             jax.random.key(2), **kw)
        assert not np.array_equal(np.asarray(a1), np.asarray(b2))

    def test_mask_logits_truncation(self):
        """Hand-checked top-k and nucleus masks on a known row."""
        from multi_spatialmllm_tpu.models.generate import _mask_logits

        logits = jnp.log(jnp.asarray([[0.4, 0.3, 0.2, 0.05, 0.05]]))
        t = jnp.asarray(1.0, jnp.float32)
        m = np.asarray(_mask_logits(logits, t, 2, None))
        assert np.isfinite(m[0, :2]).all() and np.isinf(m[0, 2:]).all()
        # nucleus 0.65: keep tokens until exclusive mass reaches 0.65
        # (0.4, then 0.3 since 0.4 < 0.65; 0.2's exclusive mass 0.7 > .65)
        m = np.asarray(_mask_logits(logits, t, None, 0.65))
        assert np.isfinite(m[0, :2]).all() and np.isinf(m[0, 2:]).all()
        # nucleus 0.95 keeps the first three plus the tied 0.05s' cutoff
        m = np.asarray(_mask_logits(logits, t, None, 0.9))
        assert np.isfinite(m[0, :3]).all()
        # every kept token respects the sampled support (>= cutoff logit)
        assert np.isinf(m[0, 4]) or np.isfinite(m[0, 3])

    def test_per_row_prompt_lens(self):
        """Right-padded rows with per-row lengths sample from each row's
        true last-token logits (near-zero temperature vs per-row greedy)."""
        from multi_spatialmllm_tpu.models.generate import sample_generate

        cfg, model, params, b = self._setup(batch=1, seq_len=28)
        ids = np.asarray(b["input_ids"])
        padded = pad_to_bucket(ids, 16, 0)
        greedy = greedy_generate(model, params, b["input_ids"], b["tiles"],
                                 max_new_tokens=4)
        sampled = sample_generate(model, params, jnp.asarray(padded),
                                  b["tiles"], jax.random.key(5),
                                  max_new_tokens=4, temperature=0.0,
                                  prompt_lens=np.asarray([28]))
        np.testing.assert_array_equal(np.asarray(greedy),
                                      np.asarray(sampled))


class TestServingSampling:
    """Per-request sampling in the continuous batcher: mixed
    greedy/sampled batches, and draw streams keyed by (seed, position)
    so results are independent of slot assignment, chunking, and batch
    composition."""

    @staticmethod
    def _setup(n=5, seed=5):
        from multi_spatialmllm_tpu.models.serving import SamplingParams

        cfg = M.tiny_config()
        model = M.MultiFrameMLLM(cfg)
        b0 = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=64)
        params = model.init(jax.random.key(0), b0["input_ids"],
                            b0["tiles"])
        t_img = cfg.tokens_per_tile
        rng = np.random.default_rng(seed)
        requests = []
        sps = [SamplingParams(),                       # greedy
               SamplingParams(temperature=5.0, seed=7),
               SamplingParams(),                       # greedy
               SamplingParams(temperature=5.0, seed=7),  # same seed
               SamplingParams(temperature=5.0, seed=8)]
        for i, L in enumerate((40, 40, 48, 40, 44)[:n]):
            ids = rng.integers(10, cfg.llm.vocab_size,
                               size=L).astype(np.int32)
            ids[1:1 + t_img] = cfg.img_context_id
            tiles = np.asarray(jax.random.normal(
                jax.random.key(100 + i),
                (1, cfg.vit.image_size, cfg.vit.image_size, 3),
                dtype=jnp.float32))
            requests.append((ids, tiles, sps[i]))
        if n > 3:
            # requests 1 and 3: identical prompt/tiles/params ->
            # identical streams (position-keyed draws)
            requests[3] = (requests[1][0], requests[1][1], sps[3])
        return cfg, model, params, requests

    def test_mixed_batch_and_slot_invariance(self):
        from multi_spatialmllm_tpu.models.serving import (
            ContinuousBatcher,
            ServeConfig,
        )
        from multi_spatialmllm_tpu.models.generate import greedy_generate

        cfg, model, params, requests = self._setup()
        got = ContinuousBatcher(
            model, params,
            ServeConfig(slots=3, max_prompt_len=64, max_new_tokens=6,
                        chunk=2, length_bucket=64, sampling=True),
            pad_id=0, eos_id=2).generate_all(requests)
        # greedy rows equal per-request greedy_generate
        for rid in (0, 2):
            ids, tiles, _ = requests[rid]
            prompt = pad_to_bucket(ids[None], 64, 0)
            want = np.asarray(greedy_generate(
                model, params, jnp.asarray(prompt),
                jnp.asarray(tiles[None]), max_new_tokens=6, eos_id=2,
                prompt_len=len(ids)))[0]
            if 2 in want:
                want = want[: int(np.where(want == 2)[0][0])]
            np.testing.assert_array_equal(got[rid], want)
        # same seed + same prompt -> identical sampled stream
        np.testing.assert_array_equal(got[1], got[3])
        # different slot/chunk geometry -> identical results
        got2 = ContinuousBatcher(
            model, params,
            ServeConfig(slots=1, max_prompt_len=64, max_new_tokens=6,
                        chunk=3, length_bucket=64, sampling=True),
            pad_id=0, eos_id=2).generate_all(requests)
        for a, b in zip(got, got2):
            np.testing.assert_array_equal(a, b)

    def test_sampling_guard(self):
        from multi_spatialmllm_tpu.models.serving import (
            ContinuousBatcher,
            SamplingParams,
            ServeConfig,
        )

        cfg, model, params, requests = self._setup(n=1)
        ids, tiles, _ = requests[0]
        batcher = ContinuousBatcher(
            model, params,
            ServeConfig(slots=1, max_prompt_len=64, max_new_tokens=4,
                        chunk=2, length_bucket=64),  # sampling off
            pad_id=0, eos_id=2)
        with pytest.raises(AssertionError, match="sampling"):
            batcher.generate_all(
                [(ids, tiles, SamplingParams(temperature=1.0))])


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


class TestEvalThroughBatcher:
    def _setup(self):
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
        # 6 records over 2 images: 3 questions per image, all sharing
        # the long instruction stem MultiSPA prompts carry (the
        # eval-campaign shape prefix caching serves)
        stem = ("These are two views of one indoor scene and every "
                "distance in your answer must be reported in millimeters "
                "measured from the first camera center. ")
        qs = ["How deep is the point?", "Which way did the camera move?",
              "Depth at the marked pixel?"]
        samples = [{"id": f"{img}-{qi}", "image": [f"s/{img}.jpg"],
                    "text": f"<image>\n{stem}{q}",
                    "question_type": "depth_estimation_coor",
                    "gt_value": 1000 + 10 * qi,
                    "height_list": [96], "width_list": [128]}
                   for img in (0, 1) for qi, q in enumerate(qs)]

        def loader(path):
            seed = int(path.split("/")[-1].split(".")[0])
            return np.random.default_rng(seed).integers(
                0, 255, (96, 128, 3), dtype=np.uint8)

        from multi_spatialmllm_tpu.models.data import DataConfig
        from multi_spatialmllm_tpu.models.preprocess import PreprocessConfig
        from multi_spatialmllm_tpu.models.runner import EvalRunConfig

        run_cfg = EvalRunConfig(
            max_new_tokens=5, length_bucket=32,
            data=DataConfig(preprocess=PreprocessConfig(
                tile_size=56, max_tiles=1, resize_hw=None)))
        return tok, model, params, samples, loader, run_cfg

    def test_paged_batcher_matches_per_sample(self):
        from multi_spatialmllm_tpu.models.paged_kv import (
            PagedBatcher,
            PagedConfig,
        )
        from multi_spatialmllm_tpu.models.runner import (
            predict_sample,
            run_eval,
        )

        tok, model, params, samples, loader, run_cfg = self._setup()
        single = [predict_sample(model, params, tok, s, loader, run_cfg)
                  for s in samples]
        batcher = PagedBatcher(
            model, params,
            PagedConfig(slots=2, page_size=16, num_pages=64,
                        max_prompt_len=160, max_new_tokens=5, chunk=2,
                        length_bucket=32),
            pad_id=tok.pad_id, eos_id=tok.eos_id)
        report = run_eval(model, params, tok, samples, loader, run_cfg,
                          batcher=batcher)
        assert report["predictions"] == single

    def test_prefix_cache_engages_on_repeated_images(self):
        from multi_spatialmllm_tpu.models.paged_kv import (
            PagedBatcher,
            PagedConfig,
        )
        from multi_spatialmllm_tpu.models.runner import run_eval

        tok, model, params, samples, loader, run_cfg = self._setup()
        batcher = PagedBatcher(
            model, params,
            PagedConfig(slots=2, page_size=16, num_pages=64,
                        max_prompt_len=160, max_new_tokens=5, chunk=2,
                        length_bucket=32, prefix_cache=True),
            pad_id=tok.pad_id, eos_id=tok.eos_id)
        report = run_eval(model, params, tok, samples, loader, run_cfg,
                          batcher=batcher)
        assert len(report["predictions"]) == len(samples)
        # 2 images x 3 questions: at most one full prefill per image
        # (slot scheduling may resume the rest off the shared pages)
        assert batcher.stats["prefill_resumed"] >= len(samples) - 2
        assert batcher.stats["pages_reused"] > 0

    def test_logprobs_confidences_in_report(self):
        """A batcher with logprobs=True surfaces report['confidences']
        (per-sample mean token logprob, finite <= 0, predictions
        unchanged) and the aggregate mean_token_logprob."""
        from multi_spatialmllm_tpu.models.paged_kv import (
            PagedBatcher,
            PagedConfig,
        )
        from multi_spatialmllm_tpu.models.runner import run_eval

        tok, model, params, samples, loader, run_cfg = self._setup()
        pcfg = PagedConfig(slots=2, page_size=16, num_pages=64,
                           max_prompt_len=160, max_new_tokens=5, chunk=2,
                           length_bucket=32)
        base = run_eval(model, params, tok, samples, loader, run_cfg,
                        batcher=PagedBatcher(model, params, pcfg,
                                             pad_id=tok.pad_id,
                                             eos_id=tok.eos_id))
        assert "confidences" not in base
        rep = run_eval(
            model, params, tok, samples, loader, run_cfg,
            batcher=PagedBatcher(
                model, params,
                dataclasses.replace(pcfg, logprobs=True),
                pad_id=tok.pad_id, eos_id=tok.eos_id))
        assert rep["predictions"] == base["predictions"]
        confs = rep["confidences"]
        assert len(confs) == len(samples)
        assert all(c is None or (np.isfinite(c) and c <= 0.0)
                   for c in confs)
        known = [c for c in confs if c is not None]
        assert known, "all outputs empty?"
        np.testing.assert_allclose(rep["mean_token_logprob"],
                                   np.mean(known))


class TestEvalCLI:
    def test_eval_subcommand_end_to_end(self, tmp_path, monkeypatch,
                                        capsys):
        """`python -m multi_spatialmllm_tpu eval`: orbax checkpoint +
        eval JSONL + images on disk -> scored report, served through
        the paged batcher with prefix caching + chunked prefill."""
        import dataclasses
        import json
        import sys

        import cv2

        from multi_spatialmllm_tpu.__main__ import main
        from multi_spatialmllm_tpu.parallel.train import save_checkpoint

        tok = SpatialTokenizer()
        cfg = M.tiny_config()
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, vocab_size=800))
        model = M.MultiFrameMLLM(cfg)
        batch = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=64)
        params = model.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])
        save_checkpoint(str(tmp_path / "ckpt"), params)

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rng = np.random.default_rng(4)
        for i in range(2):
            cv2.imwrite(str(img_dir / f"{i}.jpg"),
                        rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
        samples = [
            {"id": f"{i}-{q}", "image": [f"{i}.jpg"],
             "text": f"<image>\nQuestion variant number {q} here?",
             "question_type": "depth_estimation_coor",
             "gt_value": 900 + q, "height_list": [96],
             "width_list": [128]}
            for i in range(2) for q in range(2)
        ]
        jsonl = tmp_path / "eval.jsonl"
        jsonl.write_text("\n".join(json.dumps(s) for s in samples))

        out = tmp_path / "report.json"
        monkeypatch.setattr(sys, "argv", [
            "multi_spatialmllm_tpu", "eval",
            "--checkpoint", str(tmp_path / "ckpt"),
            "--config", "tiny", "--vocab-size", "800",
            "--eval-jsonl", str(jsonl),
            "--images-root", str(img_dir),
            "--output", str(out),
            "--max-new-tokens", "4", "--max-tiles", "1",
            "--paged", "--slots", "2", "--page-size", "16",
            "--num-pages", "64", "--max-prompt-len", "128",
            "--prefix-cache", "--prefill-chunk", "16",
            "--vision-cache", "2",
        ])
        main()
        printed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert printed["count"] == 4
        assert "serving_stats" in printed
        assert printed["serving_stats"]["vision_hits"] >= 2
        saved = json.loads(out.read_text())
        assert len(saved["predictions"]) == 4

        # --eval-root: whole evaluation_data tree -> per-engine reports
        # + weighted aggregate; *_orig.jsonl (full pre-subsample dumps)
        # are skipped
        root = tmp_path / "evaluation_data"
        for engine, qt in (("depth_perception", "depth_estimation_coor"),
                           ("camera_movement", "x_movement")):
            d = root / engine
            d.mkdir(parents=True)
            recs = [dict(samples[i], question_type=qt,
                         gt_value="left" if qt == "x_movement" else 900)
                    for i in range(2)]
            (d / "val.jsonl").write_text(
                "\n".join(json.dumps(s) for s in recs))
            (d / "val_orig.jsonl").write_text(
                "\n".join(json.dumps(s) for s in recs * 50))
        monkeypatch.setattr(sys, "argv", [
            "multi_spatialmllm_tpu", "eval",
            "--checkpoint", str(tmp_path / "ckpt"),
            "--config", "tiny", "--vocab-size", "800",
            "--eval-root", str(root),
            "--images-root", str(img_dir),
            "--max-new-tokens", "4", "--max-tiles", "1",
        ])
        main()
        agg = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert agg["count"] == 4              # _orig dumps skipped
        assert set(agg["engines"]) == {"camera_movement",
                                       "depth_perception"}
        assert all(r["count"] == 2 for r in agg["engines"].values())


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


class TestMCLogprobScoring:
    """Multiple-choice scoring by candidate logprob (runner.
    score_candidates / EvalRunConfig(mc_logprob=True)): each option's
    teacher-forced sum log-probability after the prompt, prediction =
    argmax — no free decoding, no answer-extraction failures."""

    @staticmethod
    def _setup(rng):
        from multi_spatialmllm_tpu.models.data import DataConfig
        from multi_spatialmllm_tpu.models.preprocess import (
            PreprocessConfig,
        )
        from multi_spatialmllm_tpu.models.runner import EvalRunConfig

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
        run_cfg = EvalRunConfig(
            max_new_tokens=4, length_bucket=64, mc_logprob=True,
            data=DataConfig(preprocess=PreprocessConfig(
                tile_size=56, max_tiles=1, resize_hw=None)))
        loader = lambda p: rng.integers(0, 255, (96, 128, 3),
                                        dtype=np.uint8)  # noqa: E731
        return tok, cfg, model, params, run_cfg, loader

    def test_scores_match_manual_log_softmax(self, rng):
        from multi_spatialmllm_tpu.models.preprocess import tile_image
        from multi_spatialmllm_tpu.models.runner import (
            build_prompt_ids,
            score_candidates,
        )

        tok, cfg, model, params, run_cfg, loader = self._setup(rng)
        sample = {"id": "m", "image": ["s/0.jpg"],
                  "text": "<image>\nWhich dot matches? Answer A or B.",
                  "question_type": "visual_correspondence_multiple_choice",
                  "gt_value": "A"}
        img = loader("s/0.jpg")
        cands = ["A", "B", "C", "D"]
        got = score_candidates(model, params, tok, sample, cands,
                               lambda p: img, run_cfg)

        tiles = tile_image(img, run_cfg.data.preprocess)
        ids = build_prompt_ids(sample, tok, cfg, [tiles.shape[0]])
        manual = []
        for c in cands:
            ci = tok.encode(c)
            full = np.asarray([ids + ci], np.int32)
            full = np.pad(full, ((0, 0), (0, 64 - full.shape[1])))
            logits = model.apply(params, jnp.asarray(full),
                                 jnp.asarray(tiles[None]))
            logp = np.asarray(
                jax.nn.log_softmax(np.asarray(logits, np.float32),
                                   axis=-1))
            manual.append(sum(logp[0, len(ids) - 1 + j, t]
                              for j, t in enumerate(ci)))
        # the batched (B=4) forward reassociates reductions vs the B=1
        # manual pass — values agree to float tolerance, ranking exactly
        np.testing.assert_allclose(got, manual, atol=5e-2)
        np.testing.assert_array_equal(np.argsort(got), np.argsort(manual))

    def test_run_eval_mixes_mc_and_decode(self, rng):
        from multi_spatialmllm_tpu.models.runner import (
            mc_candidates,
            run_eval,
            score_candidates,
        )

        tok, cfg, model, params, run_cfg, loader = self._setup(rng)
        img = loader("x")
        samples = [
            {"id": "a", "image": ["s/0.jpg"],
             "text": "<image>\nHow deep is the point?",
             "question_type": "depth_estimation_coor", "gt_value": 1000},
            {"id": "m", "image": ["s/1.jpg"],
             "text": "<image>\nWhich dot matches?",
             "question_type": "visual_correspondence_multiple_choice",
             "gt_value": "B"},
            {"id": "d", "image": ["s/2.jpg"],
             "text": "<image>\nWhich is closer, A or B?",
             "question_type": "depth_comparison_annotated",
             "gt_value": "A"},
        ]
        report = run_eval(model, params, tok, samples, lambda p: img,
                          run_cfg)
        preds = report["predictions"]
        assert len(preds) == 3
        assert preds[1] in ("A", "B", "C", "D")
        assert preds[2] in ("A", "B")
        # MC predictions equal the standalone argmax
        for i in (1, 2):
            cands = mc_candidates(samples[i])
            scores = score_candidates(model, params, tok, samples[i],
                                      cands, lambda p: img, run_cfg)
            assert preds[i] == cands[int(np.argmax(scores))]
        # options override wins over the letter bank
        assert mc_candidates({"question_type": "x", "options": [1, 2]}) \
            == ["1", "2"]
        assert mc_candidates({"question_type": "x_movement"}) is None
        # an EMPTY options list is not MC (would crash max() in scoring)
        assert mc_candidates({"question_type": "x", "options": []}) is None


class TestServeCLI:
    def test_serve_stdin_jsonl(self, tmp_path, monkeypatch, capsys):
        """`python -m multi_spatialmllm_tpu serve`: stdin JSONL requests
        -> per-request result lines; --stream chunks concatenate to the
        non-streamed outputs exactly."""
        import dataclasses
        import io
        import json
        import sys

        import cv2

        from multi_spatialmllm_tpu.__main__ import main
        from multi_spatialmllm_tpu.parallel.train import save_checkpoint

        tok = SpatialTokenizer()
        cfg = M.tiny_config()
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, vocab_size=800))
        model = M.MultiFrameMLLM(cfg)
        batch = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=64)
        params = model.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])
        save_checkpoint(str(tmp_path / "ckpt"), params)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        rng = np.random.default_rng(9)
        for i in range(2):
            cv2.imwrite(str(img_dir / f"{i}.jpg"),
                        rng.integers(0, 255, (96, 128, 3), dtype=np.uint8))
        reqs = [{"id": f"q{i}", "text": "<image>\nWhat is here?",
                 "image": [f"{i % 2}.jpg"]} for i in range(3)]
        stdin_text = "\n".join(json.dumps(r) for r in reqs) + "\n"

        base_argv = [
            "prog", "serve", "--checkpoint", str(tmp_path / "ckpt"),
            "--config", "tiny", "--vocab-size", "800",
            "--images-root", str(img_dir), "--max-tiles", "1",
            "--max-new-tokens", "4", "--slots", "2",
            "--page-size", "16", "--num-pages", "64",
            "--max-prompt-len", "128"]

        monkeypatch.setattr(sys, "stdin", io.StringIO(stdin_text))
        monkeypatch.setattr(sys, "argv", base_argv)
        main()
        lines = [json.loads(l) for l in
                 capsys.readouterr().out.strip().splitlines()]
        finals = {r["id"]: r["token_ids"] for r in lines}
        assert set(finals) == {"q0", "q1", "q2"}
        assert finals["q0"] == finals["q2"]   # same image+prompt

        monkeypatch.setattr(sys, "stdin", io.StringIO(stdin_text))
        monkeypatch.setattr(sys, "argv", base_argv + ["--stream"])
        main()
        chunks = [json.loads(l) for l in
                  capsys.readouterr().out.strip().splitlines()]
        acc: dict = {}
        done: set = set()
        for c in chunks:
            acc.setdefault(c["id"], []).extend(c["delta_ids"])
            if c["done"]:
                done.add(c["id"])
        assert done == set(finals)
        for rid, toks in finals.items():
            assert acc[rid] == toks


class TestContinuousBudget:
    def test_per_request_budget_prefix_and_validation(self):
        """ContinuousBatcher: an int request extra caps that request's
        tokens at the exact prefix of its unbudgeted output (same
        surface as PagedBatcher)."""
        from multi_spatialmllm_tpu.models.serving import (
            ContinuousBatcher,
            ServeConfig,
        )

        cfg = M.tiny_config()
        model = M.MultiFrameMLLM(cfg)
        b0 = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=64)
        params = model.init(jax.random.key(0), b0["input_ids"],
                            b0["tiles"])
        t_img = cfg.tokens_per_tile
        rng = np.random.default_rng(3)
        reqs = []
        for i, n in enumerate((40, 52)):
            ids = rng.integers(10, cfg.llm.vocab_size,
                               size=n).astype(np.int32)
            ids[1:1 + t_img] = cfg.img_context_id
            tiles = np.asarray(jax.random.normal(
                jax.random.key(30 + i),
                (1, cfg.vit.image_size, cfg.vit.image_size, 3),
                dtype=jnp.float32))
            reqs.append((ids, tiles))
        scfg = ServeConfig(slots=2, max_prompt_len=128, max_new_tokens=6,
                           chunk=2, length_bucket=64)

        def run(rq):
            return ContinuousBatcher(model, params, scfg, pad_id=0,
                                     eos_id=2).generate_all(rq)

        full = run(list(reqs))
        mixed = run([(*reqs[0], 3), reqs[1]])
        np.testing.assert_array_equal(mixed[0], full[0][:3])
        np.testing.assert_array_equal(mixed[1], full[1])
        with pytest.raises(ValueError, match="max_new_tokens"):
            run([(*reqs[0], 99)])
        with pytest.raises(TypeError, match="extras"):
            run([(*reqs[0], 1.5)])


class TestServeErrors:
    def test_bad_lines_answered_not_fatal(self, tmp_path, monkeypatch,
                                          capsys):
        """Malformed JSON / out-of-range budgets get per-request error
        replies; the window's good requests still serve (review r3)."""
        import dataclasses
        import io
        import json
        import sys

        import cv2

        from multi_spatialmllm_tpu.__main__ import main
        from multi_spatialmllm_tpu.parallel.train import save_checkpoint

        tok = SpatialTokenizer()
        cfg = M.tiny_config()
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, vocab_size=800))
        model = M.MultiFrameMLLM(cfg)
        b0 = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=64)
        params = model.init(jax.random.key(0), b0["input_ids"],
                            b0["tiles"])
        save_checkpoint(str(tmp_path / "ckpt"), params)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        cv2.imwrite(str(img_dir / "0.jpg"),
                    np.random.default_rng(0).integers(
                        0, 255, (96, 128, 3), dtype=np.uint8))
        good = {"id": "ok", "text": "<image>\nWhat?", "image": ["0.jpg"]}
        lines = [
            "this is not json",
            json.dumps({**good, "id": "big", "max_new_tokens": 999}),
            json.dumps({"id": "noimg", "text": "<image>\nQ?",
                        "image": ["missing.jpg"]}),
            json.dumps(good),
        ]
        monkeypatch.setattr(sys, "stdin",
                            io.StringIO("\n".join(lines) + "\n"))
        monkeypatch.setattr(sys, "argv", [
            "prog", "serve", "--checkpoint", str(tmp_path / "ckpt"),
            "--config", "tiny", "--vocab-size", "800",
            "--images-root", str(img_dir), "--max-tiles", "1",
            "--max-new-tokens", "4", "--slots", "2",
            "--page-size", "16", "--num-pages", "64",
            "--max-prompt-len", "128"])
        main()
        out = [json.loads(l) for l in
               capsys.readouterr().out.strip().splitlines()]
        by_id = {r["id"]: r for r in out}
        assert "error" in by_id["line1"]          # unparseable line
        assert "max_new_tokens" in by_id["big"]["error"]
        assert "unreadable image" in by_id["noimg"]["error"]
        assert by_id["ok"]["token_ids"]           # still served
