"""Model + parallel tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.llm import (
    DecoderLM,
    LLMConfig,
    apply_rope,
    cross_entropy_loss,
    init_cache,
)
from multi_spatialmllm_tpu.ops.attention import reference_attention


class TestLLM:
    def test_forward_shapes(self):
        cfg = LLMConfig(vocab_size=128, hidden_size=64, num_layers=2,
                        num_heads=4, num_kv_heads=2, ffn_size=128,
                        dtype="float32")
        model = DecoderLM(cfg)
        ids = jnp.arange(2 * 16).reshape(2, 16) % 128
        params = model.init(jax.random.key(0), ids)
        logits = model.apply(params, ids)
        assert logits.shape == (2, 16, 128)

    def test_rope_rotation_invariant_norm(self):
        x = jax.random.normal(jax.random.key(0), (1, 2, 8, 16))
        pos = jnp.arange(8)[None, :]
        y = apply_rope(x, pos, 1e4)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(x)), np.linalg.norm(np.asarray(y)),
            rtol=1e-5)
        # position 0 is identity
        np.testing.assert_allclose(np.asarray(y[:, :, 0]),
                                   np.asarray(x[:, :, 0]), atol=1e-6)

    def test_causality(self):
        cfg = LLMConfig(vocab_size=64, hidden_size=32, num_layers=1,
                        num_heads=2, num_kv_heads=2, ffn_size=64,
                        dtype="float32")
        model = DecoderLM(cfg)
        ids = jnp.zeros((1, 8), dtype=jnp.int32)
        params = model.init(jax.random.key(0), ids)
        base = model.apply(params, ids)
        # perturbing a later token must not change earlier logits
        ids2 = ids.at[0, 5].set(7)
        out2 = model.apply(params, ids2)
        np.testing.assert_allclose(np.asarray(base[0, :5]),
                                   np.asarray(out2[0, :5]), atol=1e-5)
        assert not np.allclose(np.asarray(base[0, 5:]),
                               np.asarray(out2[0, 5:]))

    def test_kv_cache_decode_matches_full_forward(self):
        cfg = LLMConfig(vocab_size=64, hidden_size=32, num_layers=2,
                        num_heads=4, num_kv_heads=2, ffn_size=64,
                        dtype="float32")
        model = DecoderLM(cfg)
        ids = jax.random.randint(jax.random.key(1), (1, 10), 0, 64)
        params = model.init(jax.random.key(0), ids)
        full = model.apply(params, ids)
        caches = init_cache(cfg, 1, 16)
        outs = []
        for t in range(10):
            pos = jnp.full((1, 1), t)
            logits, caches = model.apply(
                params, ids[:, t:t + 1], positions=pos, caches=caches)
            outs.append(logits[:, 0])
        step = jnp.stack(outs, axis=1)
        np.testing.assert_allclose(np.asarray(full), np.asarray(step),
                                   atol=1e-4)

    def test_cross_entropy_masking(self):
        logits = jnp.zeros((1, 4, 8))
        labels = jnp.asarray([[-100, 2, -100, 3]])
        loss = cross_entropy_loss(logits, labels)
        np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-6)


class TestAttentionKernel:
    def test_reference_matches_naive(self):
        q = jax.random.normal(jax.random.key(0), (2, 3, 16, 8))
        k = jax.random.normal(jax.random.key(1), (2, 3, 16, 8))
        v = jax.random.normal(jax.random.key(2), (2, 3, 16, 8))
        out = reference_attention(q, k, v, causal=True)
        # naive causal softmax
        s = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(8)
        mask = np.tril(np.ones((16, 16), bool))
        s = np.where(mask, s, -1e30)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        expect = np.einsum("bhqk,bhkd->bhqd", p, v)
        np.testing.assert_allclose(np.asarray(out), expect, atol=1e-4)

    def test_flash_kernel_interpret_mode(self):
        # Run the Pallas kernel in interpreter mode on CPU.
        from jax.experimental.pallas import tpu as pltpu

        from multi_spatialmllm_tpu.ops.attention import flash_attention

        q = jax.random.normal(jax.random.key(0), (1, 2, 256, 64),
                              dtype=jnp.float32)
        k = jax.random.normal(jax.random.key(1), (1, 2, 256, 64),
                              dtype=jnp.float32)
        v = jax.random.normal(jax.random.key(2), (1, 2, 256, 64),
                              dtype=jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            out = flash_attention(q, k, v, causal=True)
        expect = reference_attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=2e-3)

    @pytest.mark.parametrize("causal", [True, False])
    @pytest.mark.parametrize("kvh", [3, 1])
    def test_flash_backward_matches_reference_grads(self, causal, kvh):
        """Fused Pallas dq and dk/dv kernels vs the XLA VJP (interpreter
        mode on CPU; the same kernels run compiled on TPU). kvh < heads
        exercises the GQA-native path: unrepeated kv in, group-summed
        dk/dv out."""
        from jax.experimental.pallas import tpu as pltpu

        from multi_spatialmllm_tpu.ops import attention as A

        q = jax.random.normal(jax.random.key(0), (2, 3, 256, 64),
                              dtype=jnp.float32)
        k = jax.random.normal(jax.random.key(1), (2, kvh, 256, 64),
                              dtype=jnp.float32)
        v = jax.random.normal(jax.random.key(2), (2, kvh, 256, 64),
                              dtype=jnp.float32)
        g = jax.random.normal(jax.random.key(3), (2, 3, 256, 64),
                              dtype=jnp.float32)
        sm = 64 ** -0.5
        with pltpu.force_tpu_interpret_mode():
            o, lse = A._flash_fwd(q, k, v, causal, sm, 128, 128)
            dq, dk, dv = A._flash_bwd(q, k, v, o, lse, g, causal, sm,
                                      128, 128)
        assert dk.shape == k.shape and dv.shape == v.shape
        ref, vjp = jax.vjp(
            lambda q_, k_, v_: reference_attention(q_, k_, v_,
                                                   causal=causal), q, k, v)
        rdq, rdk, rdv = vjp(g)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref), atol=2e-5)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk), atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv), atol=2e-4)


class TestMLLM:
    def test_forward_and_loss(self):
        cfg = M.tiny_config()
        model = M.MultiFrameMLLM(cfg)
        batch = M.make_example_batch(cfg, batch=1, n_tiles=2, seq_len=64)
        params = model.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])
        logits = model.apply(params, batch["input_ids"], batch["tiles"])
        assert logits.shape == (1, 64, cfg.llm.vocab_size)
        loss = cross_entropy_loss(logits[:, :-1], batch["labels"][:, 1:])
        assert np.isfinite(float(loss))

    def test_vision_tokens_influence_output(self):
        cfg = M.tiny_config()
        model = M.MultiFrameMLLM(cfg)
        batch = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=32)
        params = model.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])
        out1 = model.apply(params, batch["input_ids"], batch["tiles"])
        out2 = model.apply(params, batch["input_ids"], batch["tiles"] + 1.0)
        assert not np.allclose(np.asarray(out1), np.asarray(out2))

    def test_remat_matches_plain_loss_and_grads(self):
        """LLMConfig.remat / ViTConfig.remat checkpoint each layer: the
        param tree, loss, and gradients must match the plain model (same
        math, recomputed activations)."""
        import dataclasses as dc

        cfg = M.tiny_config()
        pol = "dots_with_no_batch_dims_saveable"
        rcfg = M.MLLMConfig(
            vit=dc.replace(cfg.vit, remat=True),
            llm=dc.replace(cfg.llm, remat=True),
            img_context_id=cfg.img_context_id)
        pcfg = M.MLLMConfig(
            vit=dc.replace(cfg.vit, remat=True, remat_policy=pol),
            llm=dc.replace(cfg.llm, remat=True, remat_policy=pol),
            img_context_id=cfg.img_context_id)
        batch = M.make_example_batch(cfg, batch=2, n_tiles=1, seq_len=48)

        def loss_of(model):
            m = M.MultiFrameMLLM(model)
            params = m.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])

            def f(p):
                logits = m.apply(p, batch["input_ids"], batch["tiles"])
                return cross_entropy_loss(logits[:, :-1],
                                          batch["labels"][:, 1:])

            return params, jax.value_and_grad(f)(params)

        p0, (l0, g0) = loss_of(cfg)
        p1, (l1, g1) = loss_of(rcfg)
        assert jax.tree_util.tree_structure(p0) == \
            jax.tree_util.tree_structure(p1)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)
        # selective policy (keep matmul outputs): same math again
        _, (l2, g2) = loss_of(pcfg)
        np.testing.assert_allclose(float(l0), float(l2), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)
        # repo-composite policy (matmul outputs + flash-attention fwd
        # products via the remat_opt primitive): same math once more —
        # this is bench_1chip_config's shipped policy
        fcfg = M.MLLMConfig(
            vit=dc.replace(cfg.vit, remat=True,
                           remat_policy="dots_and_flash_saveable"),
            llm=dc.replace(cfg.llm, remat=True,
                           remat_policy="dots_and_flash_saveable"),
            img_context_id=cfg.img_context_id)
        _, (l3, g3) = loss_of(fcfg)
        np.testing.assert_allclose(float(l0), float(l3), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(g3)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)

    def test_pixel_shuffle(self):
        x = jnp.arange(1 * 16 * 4, dtype=jnp.float32).reshape(1, 16, 4)
        y = M.pixel_shuffle(x, grid=4, factor=2)
        assert y.shape == (1, 4, 16)
        # first output token gathers the 2x2 top-left patch features
        expect = np.concatenate(
            [np.asarray(x[0, i]) for i in (0, 1, 4, 5)])
        np.testing.assert_array_equal(np.asarray(y[0, 0]), expect)


class TestParallel:
    def test_mesh_and_sharded_train_step(self):
        from multi_spatialmllm_tpu.parallel.mesh import make_mesh
        from multi_spatialmllm_tpu.parallel.sharding import params_shardings
        from multi_spatialmllm_tpu.parallel.train import (
            TrainConfig,
            init_train_state,
            make_train_step,
        )

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices (run scripts/test.sh)")
        mesh = make_mesh(n_data=4, n_model=2)
        cfg = M.tiny_config()
        batch = M.make_example_batch(cfg, batch=4, n_tiles=1, seq_len=32)
        model, params, opt_state, tx = init_train_state(
            cfg, TrainConfig(learning_rate=1e-3, warmup_steps=1), batch, mesh)
        # at least one parameter actually sharded on the model axis
        shardings = params_shardings(params, mesh)
        specs = [s.spec for s in jax.tree_util.tree_leaves(shardings)]
        assert any("model" in str(s) for s in specs)
        step = make_train_step(model, tx, mesh)
        losses = []
        for _ in range(4):  # step 0 uses warmup lr=0; later steps learn
            params, opt_state, metrics = step(params, opt_state, batch)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]  # AdamW on a fixed batch reduces loss


class TestHFTokenizerAdapter:
    def _train_tiny_bpe(self, path):
        """Build a real BPE tokenizer.json in-test (stands in for the
        InternVL-2 checkpoint's tokenizer file; no download needed)."""
        from tokenizers import Tokenizer, models, pre_tokenizers, trainers
        from tokenizers import decoders

        tk = Tokenizer(models.BPE(unk_token="<unk>"))
        tk.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
        tk.decoder = decoders.ByteLevel()
        trainer = trainers.BpeTrainer(
            vocab_size=600,
            special_tokens=["<unk>", "<pad>", "<s>", "</s>"])
        corpus = ["How far is the camera from the point at (500, 400)?",
                  "The camera moved 123 millimeters to the left.",
                  "Which point is closer, A or B?"] * 20
        tk.train_from_iterator(corpus, trainer)
        tk.save(path)

    def test_roundtrip_and_special_ids(self, tmp_path):
        from multi_spatialmllm_tpu.models.tokenizer import (
            IMG_CONTEXT,
            load_tokenizer,
        )

        path = str(tmp_path / "tokenizer.json")
        self._train_tiny_bpe(path)
        tok = load_tokenizer(path)
        assert tok.pad_id is not None and tok.bos_id != tok.eos_id
        assert tok.img_context_id is not None
        text = "The camera moved 123 millimeters to the left."
        ids = tok.encode(text, add_bos=True, add_eos=True)
        assert ids[0] == tok.bos_id and ids[-1] == tok.eos_id
        assert tok.decode(ids) == text
        # vision placeholder tokens survive encode->decode
        ctx = tok.encode(IMG_CONTEXT * 3)
        assert ctx == [tok.img_context_id] * 3

    def test_factory_default_is_self_contained(self):
        from multi_spatialmllm_tpu.models.tokenizer import (
            SpatialTokenizer,
            load_tokenizer,
        )

        assert isinstance(load_tokenizer(None), SpatialTokenizer)


class TestFlashAttentionXL:
    @pytest.mark.parametrize("causal", [True, False])
    @pytest.mark.parametrize("kvh", [2, 1])
    def test_xl_kernels_match_reference(self, causal, kvh):
        """Streaming (3-D grid) kernels vs the XLA VJP and vs the
        resident-KV kernels (interpret mode; multi-block on both axes;
        kvh < heads exercises the GQA-native streaming path)."""
        from jax.experimental.pallas import tpu as pltpu

        from multi_spatialmllm_tpu.ops import attention as A

        q = jax.random.normal(jax.random.key(0), (1, 2, 512, 64),
                              dtype=jnp.float32)
        k = jax.random.normal(jax.random.key(1), (1, kvh, 512, 64),
                              dtype=jnp.float32)
        v = jax.random.normal(jax.random.key(2), (1, kvh, 512, 64),
                              dtype=jnp.float32)
        g = jax.random.normal(jax.random.key(3), (1, 2, 512, 64),
                              dtype=jnp.float32)
        sm = 64 ** -0.5
        with pltpu.force_tpu_interpret_mode():
            o, lse = A._flash_fwd_xl(q, k, v, causal, sm, 128, 128)
            dq, dk, dv = A._flash_bwd_xl(q, k, v, o, lse, g, causal, sm,
                                         128, 128)
            o_res, lse_res = A._flash_fwd(q, k, v, causal, sm, 128, 128)
        # streaming forward is bit-identical to the resident forward
        np.testing.assert_array_equal(np.asarray(lse), np.asarray(lse_res))
        np.testing.assert_array_equal(np.asarray(o), np.asarray(o_res))
        ref, vjp = jax.vjp(
            lambda q_, k_, v_: reference_attention(q_, k_, v_,
                                                   causal=causal), q, k, v)
        rdq, rdk, rdv = vjp(g)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv),
                                   atol=2e-4)

    def test_xl_block_divides_any_128_multiple(self):
        from multi_spatialmllm_tpu.ops.attention import _xl_block

        for s in (8448, 8192, 8320, 16384, 128, 640, 8576):
            for rep in (1, 4, 8):
                b = _xl_block(s, rep)
                assert s % b == 0 and b in (1024, 512, 256, 128)
                # dkv q/do blocks (rep, b, d) must stay VMEM-safe
                assert b * rep <= 4096 or b == 128
        assert _xl_block(16384, 1) == 1024
        assert _xl_block(16384, 8) == 512  # 1024-wide fails at rep 8
        assert _xl_block(8448) == 256  # 8448 = 512*16.5
        assert _xl_block(8320) == 128
