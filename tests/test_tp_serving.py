"""Tensor-parallel SERVING: decode with params sharded on the mesh
"model" axis.

No serving-specific sharding code exists (by design): `shard_params`
commits the Megatron layout from parallel/sharding.py and GSPMD
propagates it through the jitted prefill / while_loop decode programs,
inserting the row-parallel all-reduces (wo/down) over ICI. These tests
pin the two invariants that make that safe:

  * numerics: teacher-forced decode logits match the single-device
    program (up to partitioned-reduction reassociation; f32 here),
  * semantics: the continuous batcher is BIT-identical to per-request
    `greedy_generate` under the same sharded params — slot caches,
    bucketing, and chunked decode introduce no TP-dependent divergence.

The reference delegates all serving to the external InternVL-2 stack
(/root/reference/README.md:194-200); multi-chip decode is
beyond-reference surface.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.generate import (
    _prefill_fn,
    decode_logits,
    greedy_generate,
    pad_to_bucket,
)
from multi_spatialmllm_tpu.models.llm import LLMConfig, init_cache
from multi_spatialmllm_tpu.models.paged_kv import PagedBatcher, PagedConfig
from multi_spatialmllm_tpu.models.serving import ContinuousBatcher, ServeConfig
from multi_spatialmllm_tpu.models.vit import ViTConfig
from multi_spatialmllm_tpu.parallel.mesh import make_mesh
from multi_spatialmllm_tpu.parallel.sharding import shard_params

from conftest import requires_cpu_mesh


def _f32_config():
    """tiny_config shape in f32 so TP-vs-single-device logit comparisons
    are tight (bf16 activations turn reassociation into ~1e-2 noise)."""
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
    batch = M.make_example_batch(cfg, batch=2, n_tiles=1, seq_len=48)
    params = model.init(jax.random.key(0), batch["input_ids"],
                        batch["tiles"])
    return cfg, model, batch, params


@requires_cpu_mesh
class TestTensorParallelServing:
    def test_forced_decode_logits_match_single_device(self, setup):
        """Prefill + 6 teacher-forced decode steps: the TP program's
        logits equal the single-device program's at every step."""
        cfg, model, batch, params = setup
        mesh = make_mesh(n_data=4, n_model=2)
        sharded = shard_params(params, mesh)
        lens = jnp.asarray([40, 48], jnp.int32)

        def forced(pp):
            caches = init_cache(cfg.llm, 2, 64)
            logits, caches = _prefill_fn(model)(
                pp, batch["input_ids"], batch["tiles"], caches, lens)
            outs = [np.asarray(jnp.take_along_axis(
                logits, (lens - 1)[:, None, None], axis=1)[:, 0],
                np.float32)]
            pos = lens
            for t in range(6):
                tok = jnp.asarray([[7 + t], [11 + t]], jnp.int32)
                lg, caches = decode_logits(model, pp, tok, pos, caches)
                outs.append(np.asarray(lg, np.float32))
                pos = pos + 1
            return outs

        base, tp = forced(params), forced(sharded)
        for a, b in zip(base, tp):
            np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-4)

    def test_batcher_bit_identical_to_tp_greedy(self, setup):
        """Under the SAME sharded params, the continuous batcher's tokens
        are bit-identical to per-request greedy_generate: slot insertion,
        prompt bucketing, and chunked decode add only exact-zero attention
        terms, and identical shardings fix the reduction order."""
        cfg, model, batch, params = setup
        mesh = make_mesh(n_data=4, n_model=2)
        sharded = shard_params(params, mesh)
        lens = np.asarray([40, 48], np.int32)
        reqs = [(np.asarray(batch["input_ids"][i][: lens[i]]),
                 np.asarray(batch["tiles"][i])) for i in range(2)]
        sc = ServeConfig(slots=2, max_prompt_len=128, max_new_tokens=8,
                         chunk=4, length_bucket=16)
        got = ContinuousBatcher(model, sharded, sc,
                                eos_id=2).generate_all(reqs)
        for i, (ids_i, tiles_i) in enumerate(reqs):
            padded = pad_to_bucket(ids_i[None], sc.length_bucket, 0)
            ref = np.asarray(greedy_generate(
                model, sharded, jnp.asarray(padded),
                jnp.asarray(tiles_i[None]), max_new_tokens=8, eos_id=2,
                prompt_len=len(ids_i)))[0]
            cut = np.argmax(ref == 2) if (ref == 2).any() else len(ref)
            np.testing.assert_array_equal(got[i], ref[:cut])

    def test_paged_batcher_bit_identical_under_tp(self, setup):
        """The PAGED batcher needs zero TP-specific code either: its
        insert/decode programs are pure XLA gather/scatter on the CPU
        mesh, so GSPMD propagates the Megatron layout through them.
        Under sharded params the tokens are bit-identical to the
        unsharded paged run AND invariant to pool pressure (deferral +
        preemption replay identically)."""
        cfg, model, batch, params = setup
        mesh = make_mesh(n_data=4, n_model=2)
        sharded = shard_params(params, mesh)
        lens = np.asarray([40, 48], np.int32)
        reqs = [(np.asarray(batch["input_ids"][i][: lens[i]]),
                 np.asarray(batch["tiles"][i])) for i in range(2)]

        def run(pp, slots, num_pages):
            return PagedBatcher(
                model, pp,
                PagedConfig(slots=slots, page_size=16, num_pages=num_pages,
                            max_prompt_len=128, max_new_tokens=8, chunk=4,
                            length_bucket=16),
                pad_id=0, eos_id=2).generate_all(reqs)

        base = run(params, 2, 64)
        tp = run(sharded, 2, 64)
        tp_pressure = run(sharded, 2, 9)
        for b, t, tpr in zip(base, tp, tp_pressure):
            np.testing.assert_array_equal(b, t)
            np.testing.assert_array_equal(b, tpr)
