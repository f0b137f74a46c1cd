"""Weight-only int8 serving quantization (models/quantize): roundtrip
error bounds, the bit-exact in-jit == host-dequant oracle, size
accounting, and composition with the serving stack (paged batcher,
sampling, int8 kv, prefix cache, multi-LoRA)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.paged_kv import PagedBatcher, PagedConfig
from multi_spatialmllm_tpu.models.quantize import (
    dequantize_weights,
    is_quantized,
    maybe_dequantize,
    quantize_weights,
    tree_nbytes,
)


@pytest.fixture(scope="module")
def setup():
    cfg = M.tiny_config()
    model = M.MultiFrameMLLM(cfg)
    b0 = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=64)
    params = model.init(jax.random.key(0), b0["input_ids"], b0["tiles"])
    rng = np.random.default_rng(5)
    t_img = cfg.tokens_per_tile
    requests = []
    for i, n in enumerate((40, 56, 48)):
        ids = rng.integers(10, cfg.llm.vocab_size, size=n).astype(np.int32)
        ids[1:1 + t_img] = cfg.img_context_id
        tiles = np.asarray(jax.random.normal(
            jax.random.key(100 + i),
            (1, cfg.vit.image_size, cfg.vit.image_size, 3),
            dtype=jnp.float32))
        requests.append((ids, tiles))
    return cfg, model, params, requests


class TestQuantizeTree:
    def test_roundtrip_error_bound(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((512, 384)).astype(np.float32)
        q = quantize_weights({"m": {"kernel": w}}, min_size=1)
        assert is_quantized(q)
        back = np.asarray(dequantize_weights(q)["m"]["kernel"])
        # symmetric per-channel int8: |err| <= s/2 = max|w_col|/254
        bound = np.abs(w).max(axis=0, keepdims=True) / 254 + 1e-8
        assert (np.abs(back - w) <= bound).all()

    def test_small_and_skipped_leaves_untouched(self, setup):
        cfg, model, params, _ = setup
        q = quantize_weights(params)
        flat_q = jax.tree_util.tree_flatten_with_path(q)[0]
        paths = {jax.tree_util.keystr(p) for p, _ in flat_q}
        # embedding table stays dense (gather path), norm scales too
        assert not any("embed" in p and "w_int8" in p for p in paths)
        assert any("w_int8" in p for p in paths)
        # every lm_head / attention / mlp kernel above the size floor
        # is int8
        assert any("lm_head" in p and "w_int8" in p for p in paths)

    def test_nbytes_shrink(self, setup):
        cfg, model, params, _ = setup
        q = quantize_weights(params, min_size=1 << 12)
        # int8 + small scale vs f32: quantized leaves shrink ~4x; with
        # the dense embed kept, the whole tree must still drop >2x
        assert tree_nbytes(q) < tree_nbytes(params) / 2

    def test_maybe_dequantize_identity_for_plain_trees(self, setup):
        cfg, model, params, _ = setup
        assert maybe_dequantize(params) is params
        assert not is_quantized(params)


class TestQuantizedServing:
    """The central hook (MultiFrameMLLM.apply -> maybe_dequantize) makes
    every serving program accept quantized trees; outputs must be
    BIT-identical to the same program on host-dequantized params."""

    def _pcfg(self, **kw):
        return PagedConfig(slots=2, page_size=16, num_pages=64,
                           max_prompt_len=128, max_new_tokens=6, chunk=2,
                           length_bucket=64, **kw)

    def test_paged_batcher_matches_host_dequant_oracle(self, setup):
        cfg, model, params, requests = setup
        pq = quantize_weights(params)
        got = PagedBatcher(model, pq, self._pcfg(), pad_id=0,
                           eos_id=2).generate_all(requests)
        want = PagedBatcher(model, dequantize_weights(pq), self._pcfg(),
                            pad_id=0, eos_id=2).generate_all(requests)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    def test_composes_with_serving_features(self, setup):
        """int8 weights x int8 kv x prefix cache x chunked prefill x
        sampling in one batcher, still bit-equal to the dequant oracle
        under the same config."""
        from multi_spatialmllm_tpu.models.serving import SamplingParams

        cfg, model, params, requests = setup
        pq = quantize_weights(params)
        pcfg = self._pcfg(kv_dtype="int8", prefix_cache=True,
                          prefill_chunk=16, sampling=True)
        tagged = [requests[0],
                  (*requests[1], SamplingParams(temperature=0.7, seed=3)),
                  (*requests[2], SamplingParams(temperature=1.1, seed=9))]
        got = PagedBatcher(model, pq, pcfg, pad_id=0,
                           eos_id=2).generate_all(tagged)
        want = PagedBatcher(model, dequantize_weights(pq), pcfg, pad_id=0,
                            eos_id=2).generate_all(tagged)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)

    def test_continuous_batcher_and_runner_path(self, setup):
        from multi_spatialmllm_tpu.models.generate import (
            greedy_generate_batched,
            pad_to_bucket,
        )
        from multi_spatialmllm_tpu.models.serving import (
            ContinuousBatcher,
            ServeConfig,
        )

        cfg, model, params, requests = setup
        pq = quantize_weights(params)
        scfg = ServeConfig(slots=2, max_prompt_len=128, max_new_tokens=6,
                           chunk=2, length_bucket=64)
        got = ContinuousBatcher(model, pq, scfg, pad_id=0,
                                eos_id=2).generate_all(requests)
        want = ContinuousBatcher(model, dequantize_weights(pq), scfg,
                                 pad_id=0, eos_id=2).generate_all(requests)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
        # batched greedy (runner/eval non-batcher path)
        ids = pad_to_bucket(requests[0][0][None], 64, 0)
        lens = jnp.asarray([len(requests[0][0])], jnp.int32)
        tq = greedy_generate_batched(
            model, pq, jnp.asarray(ids),
            jnp.asarray(requests[0][1][None]), lens, max_new_tokens=4,
            eos_id=2)
        tw = greedy_generate_batched(
            model, dequantize_weights(pq), jnp.asarray(ids),
            jnp.asarray(requests[0][1][None]), lens, max_new_tokens=4,
            eos_id=2)
        np.testing.assert_array_equal(np.asarray(tq), np.asarray(tw))

    def test_multi_lora_over_quantized_base(self, setup):
        """Adapter deltas apply on top of the dequantized base kernels;
        quantized-base + adapter == dequant-base + adapter exactly."""
        from multi_spatialmllm_tpu.parallel.lora import (
            LoRAConfig,
            init_lora,
        )

        cfg, model, params, requests = setup
        lcfg = LoRAConfig(rank=4, alpha=8.0, targets=("wq", "wv"))
        tree = init_lora(params, lcfg, jax.random.key(2))
        tree = jax.tree_util.tree_map(
            lambda x: x + 0.1 if x.ndim else x, tree)
        pq = quantize_weights(params)
        tagged = [requests[0], (*requests[1], "ad")]

        def run(p):
            return PagedBatcher(model, p, self._pcfg(), pad_id=0, eos_id=2,
                                adapters={"ad": tree},
                                lora_config=lcfg).generate_all(tagged)

        got, want = run(pq), run(dequantize_weights(pq))
        for g, w in zip(got, want):
            np.testing.assert_array_equal(g, w)
