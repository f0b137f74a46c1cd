"""Speculative decoding (prompt-lookup drafting) — greedy-exact parity.

The invariant: `speculative_generate` emits BIT-identical tokens to
`greedy_generate_batched` up to each row's eos — speculation changes how
many device forwards run, never the output. Verified on repetitive
(high-acceptance) and random (low-acceptance) continuations, mixed
per-row prompt lengths, and eos early-exit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.generate import (
    greedy_generate_batched,
    speculative_generate,
)
from multi_spatialmllm_tpu.models.llm import LLMConfig
from multi_spatialmllm_tpu.models.vit import ViTConfig


def _f32_config():
    vit = ViTConfig(image_size=56, patch_size=14, hidden_size=128,
                    num_layers=2, num_heads=4, dtype="float32")
    llm = LLMConfig(vocab_size=512, hidden_size=128, num_layers=2,
                    num_heads=4, num_kv_heads=2, ffn_size=256,
                    max_seq_len=512, dtype="float32")
    return M.MLLMConfig(vit=vit, llm=llm)


@pytest.fixture(scope="module")
def setup():
    cfg = _f32_config()
    model = M.MultiFrameMLLM(cfg)
    batch = M.make_example_batch(cfg, batch=3, n_tiles=1, seq_len=64)
    params = model.init(jax.random.key(0), batch["input_ids"],
                        batch["tiles"])
    return cfg, model, batch, params


def _trim(row, eos_id):
    row = np.asarray(row)
    if eos_id is not None and (row == eos_id).any():
        return row[: int(np.argmax(row == eos_id))]
    return row


class TestSpeculativeGreedyParity:
    @pytest.mark.parametrize("n_draft", [1, 3, 5])
    def test_matches_greedy_random_prompts(self, setup, n_draft):
        cfg, model, batch, params = setup
        lens = np.asarray([50, 64, 40], np.int32)
        base = greedy_generate_batched(
            model, params, batch["input_ids"], batch["tiles"], lens,
            max_new_tokens=12, eos_id=2)
        spec, iters = speculative_generate(
            model, params, batch["input_ids"], batch["tiles"],
            max_new_tokens=12, eos_id=2, prompt_lens=lens,
            n_draft=n_draft, return_stats=True)
        assert 0 < iters <= 12
        for r in range(3):
            np.testing.assert_array_equal(
                _trim(base[r], 2), _trim(spec[r], 2))

    def test_loopy_model_accepts_drafts(self, setup):
        """The real win, measured honestly: overfit the tiny model on a
        repeating token cycle (60 Adam steps — its greedy continuation
        then echoes the prompt's pattern, the predictable-text regime
        MultiSPA's formulaic answers live in), and the lookup drafts all
        verify: 20 tokens in ceil(20/(n_draft+1)) = 4 forwards, tokens
        still bit-equal to greedy."""
        import optax

        cfg, model, batch, params = setup
        ids = np.array(batch["input_ids"][:2])  # writable copy
        t_img = cfg.tokens_per_tile + 2
        pat = np.asarray([7, 8, 9, 10, 11, 12], np.int32)
        ids[:, t_img:] = np.tile(pat, 20)[: ids.shape[1] - t_img]
        labels = np.where(ids == cfg.img_context_id, -100, ids)
        labels[:, :t_img] = -100
        tr = {"input_ids": jnp.asarray(ids), "tiles": batch["tiles"][:2],
              "labels": jnp.asarray(labels)}

        tx = optax.adam(3e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            loss, g = jax.value_and_grad(
                lambda p: M.loss_fn(model, p, tr))(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt, loss

        for _ in range(60):
            params, opt, loss = step(params, opt)
        assert float(loss) < 0.2, float(loss)  # pattern learned

        lens = np.asarray([64, 58], np.int32)
        base = greedy_generate_batched(
            model, params, jnp.asarray(ids), tr["tiles"], lens,
            max_new_tokens=20, eos_id=None)
        spec, iters = speculative_generate(
            model, params, jnp.asarray(ids), tr["tiles"],
            max_new_tokens=20, eos_id=None, prompt_lens=lens,
            n_draft=4, return_stats=True)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(spec))
        assert iters <= 6, iters  # ~4 forwards for 20 tokens

    def test_batcher_speculate_bit_identical(self, setup):
        """ServeConfig(speculate=n): the continuous batcher's outputs are
        bit-identical to the plain greedy batcher across mixed prompt
        lengths, more requests than slots (slot reuse resets the history
        row), and eos early exit."""
        from multi_spatialmllm_tpu.models.serving import (
            ContinuousBatcher,
            ServeConfig,
        )

        cfg, model, batch, params = setup
        lens = np.asarray([50, 64, 40], np.int32)
        reqs = [(np.asarray(batch["input_ids"][i % 3][: lens[i % 3]]),
                 np.asarray(batch["tiles"][i % 3])) for i in range(5)]
        base_sc = ServeConfig(slots=2, max_prompt_len=128,
                              max_new_tokens=10, chunk=3, length_bucket=16)
        spec_sc = ServeConfig(slots=2, max_prompt_len=128,
                              max_new_tokens=10, chunk=3, length_bucket=16,
                              speculate=3)
        base = ContinuousBatcher(model, params, base_sc,
                                 eos_id=2).generate_all(reqs)
        spec = ContinuousBatcher(model, params, spec_sc,
                                 eos_id=2).generate_all(reqs)
        assert len(base) == len(spec) == 5
        for a, b in zip(base, spec):
            np.testing.assert_array_equal(a, b)

    def test_batcher_speculate_rejects_sampling(self, setup):
        from multi_spatialmllm_tpu.models.serving import (
            ContinuousBatcher,
            ServeConfig,
        )

        cfg, model, batch, params = setup
        with pytest.raises(AssertionError):
            ContinuousBatcher(model, params,
                              ServeConfig(speculate=2, sampling=True))

    def test_eval_runner_speculate_flag_identical_predictions(self):
        """EvalRunConfig(speculate=n) routes the eval decode through
        speculation; predictions are string-identical to the greedy
        runner."""
        from multi_spatialmllm_tpu.models.data import DataConfig
        from multi_spatialmllm_tpu.models.preprocess import PreprocessConfig
        from multi_spatialmllm_tpu.models.runner import (
            EvalRunConfig,
            predict_batch,
        )
        from multi_spatialmllm_tpu.models.tokenizer import SpatialTokenizer

        tok = SpatialTokenizer()
        cfg = M.MLLMConfig(
            vit=ViTConfig(image_size=56, patch_size=14, hidden_size=32,
                          num_layers=1, num_heads=2),
            llm=LLMConfig(vocab_size=tok.vocab_size, hidden_size=32,
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
             "text": "<image>\nHow deep is the point at (10, 20)?"},
            {"id": "b", "image": ["s/1.jpg"],
             "text": "<image>\nWhich way did the camera move?"},
        ]

        def loader(path):
            seed = int(path.split("/")[-1].split(".")[0])
            return np.random.default_rng(seed).integers(
                0, 255, (96, 128, 3), dtype=np.uint8)

        pp = DataConfig(preprocess=PreprocessConfig(
            tile_size=56, max_tiles=1, resize_hw=None))
        greedy_cfg = EvalRunConfig(max_new_tokens=6, length_bucket=32,
                                   data=pp)
        spec_cfg = EvalRunConfig(max_new_tokens=6, length_bucket=32,
                                 speculate=3, data=pp)
        base = predict_batch(model, params, tok, samples, loader,
                             greedy_cfg)
        spec = predict_batch(model, params, tok, samples, loader,
                             spec_cfg)
        assert base == spec

    def test_single_row_matches_batched(self, setup):
        cfg, model, batch, params = setup
        lens = np.asarray([50], np.int32)
        ids = batch["input_ids"][:1]
        tiles = batch["tiles"][:1]
        base = greedy_generate_batched(
            model, params, ids, tiles, lens, max_new_tokens=10, eos_id=2)
        spec = speculative_generate(
            model, params, ids, tiles, max_new_tokens=10, eos_id=2,
            prompt_lens=lens, n_draft=3)
        np.testing.assert_array_equal(
            _trim(base[0], 2), _trim(spec[0], 2))
