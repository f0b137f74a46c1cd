"""Packed-sequence SFT training: pack_samples layout, block-diagonal
attention parity with per-sample forwards, loss equivalence, and the
sharded train step on packed batches. (The reference delegates SFT to
InternVL-2's stack — packing is this repo's TPU-native training-
throughput feature; see models/data.pack_samples.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.data import (
    DataConfig,
    IGNORE_INDEX,
    encode_unpadded,
    pack_samples,
    packed_batch_iterator,
)
from multi_spatialmllm_tpu.models.llm import cross_entropy_loss
from multi_spatialmllm_tpu.models.preprocess import PreprocessConfig
from multi_spatialmllm_tpu.models.tokenizer import SpatialTokenizer


@pytest.fixture(scope="module")
def tok():
    return SpatialTokenizer()


def _f32_cfg(tok):
    return M.MLLMConfig(
        vit=M.ViTConfig(image_size=56, patch_size=14, hidden_size=32,
                        num_layers=1, num_heads=2),
        llm=M.LLMConfig(vocab_size=tok.vocab_size, hidden_size=32,
                        num_layers=2, num_heads=4, num_kv_heads=2,
                        ffn_size=64, dtype="float32"),
        img_context_id=tok.img_context_id,
    )


def _samples():
    return [
        {"image": ["s/0.jpg"],
         "conversations": [
             {"from": "human", "value": "<image>\nHow far is the point?"},
             {"from": "gpt", "value": "It is `1234` mm away."}]},
        {"image": ["s/1.jpg"],
         "conversations": [
             {"from": "human", "value": "<image>\nWhich moved left?"},
             {"from": "gpt", "value": "The camera moved left."}]},
        {"image": ["s/2.jpg"],
         "conversations": [
             {"from": "human", "value": "<image>\nDepth?"},
             {"from": "gpt", "value": "`77` millimeters."}]},
    ]


def _loader(path):
    seed = int(path.split("/")[-1].split(".")[0])
    return np.random.default_rng(seed).integers(
        0, 255, (56, 56, 3), dtype=np.uint8)


def _dc(max_seq_len=160, max_tiles=4):
    return DataConfig(max_seq_len=max_seq_len, max_tiles=max_tiles,
                      preprocess=PreprocessConfig(tile_size=56, max_tiles=1,
                                                  resize_hw=None))


class TestPackSamples:
    def test_layout_budgets_and_split(self):
        tile = np.zeros((1, 4, 4, 3), dtype=np.float32)
        enc = [
            (np.arange(1, 6, dtype=np.int32),
             np.full(5, IGNORE_INDEX, np.int32), tile),
            (np.arange(10, 14, dtype=np.int32),
             np.arange(10, 14, dtype=np.int32), tile),
            (np.arange(20, 27, dtype=np.int32),
             np.full(7, IGNORE_INDEX, np.int32), tile),
        ]
        cfg = _dc(max_seq_len=10, max_tiles=4)
        rows = list(pack_samples(iter(enc), cfg, pad_id=0))
        # 5+4 fit one row; 7 starts a second
        assert len(rows) == 2
        r0 = rows[0]
        np.testing.assert_array_equal(r0["segment_ids"],
                                      [1] * 5 + [2] * 4 + [0])
        np.testing.assert_array_equal(r0["positions"],
                                      list(range(5)) + list(range(4)) + [0])
        np.testing.assert_array_equal(r0["input_ids"][:9],
                                      list(range(1, 6)) +
                                      list(range(10, 14)))
        assert r0["input_ids"][9] == 0
        assert r0["labels"][9] == IGNORE_INDEX
        assert r0["tiles"].shape == (4, 4, 4, 3)
        r1 = rows[1]
        np.testing.assert_array_equal(r1["segment_ids"],
                                      [1] * 7 + [0] * 3)

    def test_tile_budget_forces_split(self):
        tile3 = np.zeros((3, 4, 4, 3), dtype=np.float32)
        enc = [(np.arange(3, dtype=np.int32),
                np.full(3, IGNORE_INDEX, np.int32), tile3)] * 2
        rows = list(pack_samples(iter(enc), _dc(max_seq_len=32,
                                                max_tiles=4), pad_id=0))
        assert len(rows) == 2          # 3+3 tiles exceed the 4-tile budget


class TestPackedForwardParity:
    def test_packed_logits_match_per_sample(self, tok):
        """Each segment's logits inside a packed row equal the same
        sample's solo forward: the block-diagonal mask and per-segment
        RoPE restart make packing invisible to the model."""
        cfg = _f32_cfg(tok)
        model = M.MultiFrameMLLM(cfg)
        dc = _dc()
        encs = [encode_unpadded(s, tok, cfg, _loader, dc)
                for s in _samples()]
        assert all(e is not None for e in encs)
        rows = list(pack_samples(iter(encs), dc, tok.pad_id))
        assert len(rows) == 1          # all three fit one row
        row = rows[0]

        params = model.init(jax.random.key(0),
                            row["input_ids"][None],
                            row["tiles"][None])
        packed = model.apply(params, row["input_ids"][None],
                             row["tiles"][None],
                             positions=row["positions"][None],
                             segment_ids=row["segment_ids"][None])

        at = 0
        for seg, (ids, labels, tiles) in enumerate(encs, start=1):
            solo = model.apply(params, ids[None], tiles[None])
            got = np.asarray(packed[0, at:at + len(ids)])
            np.testing.assert_allclose(got, np.asarray(solo[0]),
                                       atol=2e-4, rtol=2e-4)
            at += len(ids)

    def test_packed_loss_equals_stitched_per_sample_loss(self, tok):
        cfg = _f32_cfg(tok)
        model = M.MultiFrameMLLM(cfg)
        dc = _dc()
        encs = [encode_unpadded(s, tok, cfg, _loader, dc)
                for s in _samples()]
        row = next(pack_samples(iter(encs), dc, tok.pad_id))
        params = model.init(jax.random.key(0), row["input_ids"][None],
                            row["tiles"][None])
        packed = model.apply(params, row["input_ids"][None],
                             row["tiles"][None],
                             positions=row["positions"][None],
                             segment_ids=row["segment_ids"][None])
        packed_loss = float(cross_entropy_loss(
            packed[:, :-1], row["labels"][None, 1:]))

        total_nll = 0.0
        total_cnt = 0
        for ids, labels, tiles in encs:
            solo = model.apply(params, ids[None], tiles[None])
            loss = cross_entropy_loss(solo[:, :-1], labels[None, 1:])
            cnt = int((labels[1:] != IGNORE_INDEX).sum())
            total_nll += float(loss) * cnt
            total_cnt += cnt
        assert total_cnt > 0
        np.testing.assert_allclose(packed_loss, total_nll / total_cnt,
                                   atol=1e-4, rtol=1e-4)


class TestPackedIterator:
    def test_batches_have_segment_arrays_and_actually_pack(self, tok):
        cfg = _f32_cfg(tok)
        dc = _dc(max_seq_len=256, max_tiles=8)
        batches = list(packed_batch_iterator(
            _samples() * 4, tok, cfg, _loader, batch_size=1, config=dc,
            drop_remainder=False))
        n_rows = sum(b["input_ids"].shape[0] for b in batches)
        assert n_rows < 12             # 12 samples packed into fewer rows
        b = batches[0]
        assert set(b) == {"input_ids", "labels", "segment_ids",
                          "positions", "tiles"}
        assert b["segment_ids"].max() >= 2
        # packing efficiency: real (non-pad) tokens dominate the rows
        # (unpacked, these ~30-token samples would fill 256-token rows
        # at ~12%)
        fill = (b["segment_ids"] > 0).mean()
        assert fill > 0.6

    def test_sharded_train_step_accepts_packed_batch(self, tok):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices (run scripts/test.sh)")
        from multi_spatialmllm_tpu.parallel.mesh import make_mesh
        from multi_spatialmllm_tpu.parallel.train import (
            TrainConfig,
            init_train_state,
            make_train_step,
        )

        cfg = M.tiny_config()
        tok_ = tok
        dc = DataConfig(max_seq_len=96, max_tiles=4,
                        preprocess=PreprocessConfig(tile_size=56,
                                                    max_tiles=1,
                                                    resize_hw=None))
        vocab = -(-tok_.vocab_size // 8) * 8  # model-axis divisible
        cfg = M.MLLMConfig(vit=cfg.vit,
                           llm=M.LLMConfig(vocab_size=vocab,
                                           hidden_size=128, num_layers=2,
                                           num_heads=4, num_kv_heads=2,
                                           ffn_size=256),
                           img_context_id=tok_.img_context_id)
        batch = next(packed_batch_iterator(
            _samples() * 8, tok_, cfg, _loader, batch_size=4, config=dc))
        assert batch["input_ids"].shape[0] == 4
        mesh = make_mesh(n_data=4, n_model=2)
        model, params, opt_state, tx = init_train_state(
            cfg, TrainConfig(warmup_steps=1), batch, mesh)
        step = make_train_step(model, tx, mesh)
        losses = []
        for _ in range(3):
            params, opt_state, metrics = step(params, opt_state, batch)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]


class TestSegmentedFlashKernels:
    """The Pallas kernels with segment_ids (block-diagonal + causal,
    fully-masked-block skipping) vs the XLA segmented reference —
    interpret mode on CPU; the same kernels run compiled on TPU."""

    def _data(self, s, kvh, key0=0):
        q = jax.random.normal(jax.random.key(key0), (1, 2, s, 64),
                              dtype=jnp.float32)
        k = jax.random.normal(jax.random.key(key0 + 1), (1, kvh, s, 64),
                              dtype=jnp.float32)
        v = jax.random.normal(jax.random.key(key0 + 2), (1, kvh, s, 64),
                              dtype=jnp.float32)
        g = jax.random.normal(jax.random.key(key0 + 3), (1, 2, s, 64),
                              dtype=jnp.float32)
        return q, k, v, g

    @pytest.mark.parametrize("kvh", [2, 1])
    def test_resident_kernels_match_reference(self, kvh):
        from jax.experimental.pallas import tpu as pltpu

        from multi_spatialmllm_tpu.ops import attention as A
        from multi_spatialmllm_tpu.ops.attention import reference_attention

        s = 256
        q, k, v, g = self._data(s, kvh)
        # segments cross the 128-wide block boundary on purpose
        seg = np.concatenate([np.full(100, 1), np.full(60, 2),
                              np.full(96, 3)]).astype(np.int32)[None]
        sm = 64 ** -0.5
        with pltpu.force_tpu_interpret_mode():
            o, lse = A._flash_fwd(q, k, v, True, sm, 128, 128,
                                  segment_ids=jnp.asarray(seg))
            dq, dk, dv = A._flash_bwd(q, k, v, o, lse, g, True, sm,
                                      128, 128,
                                      segment_ids=jnp.asarray(seg))
        ref, vjp = jax.vjp(
            lambda q_, k_, v_: reference_attention(
                q_, k_, v_, causal=True, segment_ids=jnp.asarray(seg)),
            q, k, v)
        rdq, rdk, rdv = vjp(g)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv),
                                   atol=2e-4)

    @pytest.mark.parametrize("kvh", [2, 1])
    def test_xl_kernels_match_reference(self, kvh):
        from jax.experimental.pallas import tpu as pltpu

        from multi_spatialmllm_tpu.ops import attention as A
        from multi_spatialmllm_tpu.ops.attention import reference_attention

        s = 512
        q, k, v, g = self._data(s, kvh, key0=10)
        seg = np.concatenate([np.full(200, 1), np.full(112, 2),
                              np.full(200, 3)]).astype(np.int32)[None]
        sm = 64 ** -0.5
        with pltpu.force_tpu_interpret_mode():
            o, lse = A._flash_fwd_xl(q, k, v, True, sm, 128, 128,
                                     segment_ids=jnp.asarray(seg))
            dq, dk, dv = A._flash_bwd_xl(q, k, v, o, lse, g, True, sm,
                                         128, 128,
                                         segment_ids=jnp.asarray(seg))
        ref, vjp = jax.vjp(
            lambda q_, k_, v_: reference_attention(
                q_, k_, v_, causal=True, segment_ids=jnp.asarray(seg)),
            q, k, v)
        rdq, rdk, rdv = vjp(g)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv),
                                   atol=2e-4)

    @pytest.mark.parametrize("kvh", [2, 1])
    def test_noncausal_segmented_matches_reference(self, kvh):
        """causal=False + trailing-pad segment (the ViT use: real tokens
        in segment 0, pads in segment 1) — bidirectional block-diagonal
        attention, with the suffix/prefix block skips active."""
        from jax.experimental.pallas import tpu as pltpu

        from multi_spatialmllm_tpu.ops import attention as A
        from multi_spatialmllm_tpu.ops.attention import reference_attention

        s = 384
        q, k, v, g = self._data(s, kvh, key0=20)
        # 260 real tokens + 124 pads: the pad boundary crosses block 2
        seg = np.concatenate([np.zeros(260), np.ones(124)]) \
            .astype(np.int32)[None]
        sm = 64 ** -0.5
        with pltpu.force_tpu_interpret_mode():
            o, lse = A._flash_fwd(q, k, v, False, sm, 128, 128,
                                  segment_ids=jnp.asarray(seg))
            dq, dk, dv = A._flash_bwd(q, k, v, o, lse, g, False, sm,
                                      128, 128,
                                      segment_ids=jnp.asarray(seg))
            oxl, lsexl = A._flash_fwd_xl(q, k, v, False, sm, 128, 128,
                                         segment_ids=jnp.asarray(seg))
        ref, vjp = jax.vjp(
            lambda q_, k_, v_: reference_attention(
                q_, k_, v_, causal=False, segment_ids=jnp.asarray(seg)),
            q, k, v)
        rdq, rdk, rdv = vjp(g)
        np.testing.assert_allclose(np.asarray(o), np.asarray(ref),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(oxl), np.asarray(ref),
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rdq),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rdk),
                                   atol=2e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rdv),
                                   atol=2e-4)

    @pytest.mark.parametrize("kvh", [2, 1])
    def test_trailing_pad_zero_segment_row(self, kvh):
        """Regression: pack_samples emits trailing pads as segment id 0
        AFTER the 1-based real segments ([1,..,2,..,0,0]) — a
        non-monotone row that used to poison the resident kernels'
        prefix/suffix block-skip counts (pad blocks counted into the
        prefix skip -> real kv blocks dropped; fwd error ~3, dk ~1e2).
        _seg_rows now normalizes rows to run indices; full arrays must
        match the XLA reference on the RAW ids (the equality mask is
        relabel-invariant)."""
        from jax.experimental.pallas import tpu as pltpu

        from multi_spatialmllm_tpu.ops import attention as A
        from multi_spatialmllm_tpu.ops.attention import reference_attention

        s = 256
        q, k, v, g = self._data(s, kvh, key0=30)
        # pack_samples shape: 1-based segments then trailing pad zeros,
        # with the pad run covering the last block entirely and part of
        # the one before (both skip bounds exercised)
        seg = np.concatenate([np.full(72, 1), np.full(40, 2),
                              np.zeros(144)]).astype(np.int32)[None]
        sm = 64 ** -0.5
        with pltpu.force_tpu_interpret_mode():
            o, lse = A._flash_fwd(q, k, v, True, sm, 128, 128,
                                  segment_ids=jnp.asarray(seg))
            dq, dk, dv = A._flash_bwd(q, k, v, o, lse, g, True, sm,
                                      128, 128,
                                      segment_ids=jnp.asarray(seg))
            oxl, _ = A._flash_fwd_xl(q, k, v, True, sm, 128, 128,
                                     segment_ids=jnp.asarray(seg))
            dqx, dkx, dvx = A._flash_bwd_xl(q, k, v, o, lse, g, True, sm,
                                            128, 128,
                                            segment_ids=jnp.asarray(seg))
        ref, vjp = jax.vjp(
            lambda q_, k_, v_: reference_attention(
                q_, k_, v_, causal=True, segment_ids=jnp.asarray(seg)),
            q, k, v)
        rdq, rdk, rdv = vjp(g)
        for got, want, tol in [(o, ref, 2e-5), (oxl, ref, 2e-5),
                               (dq, rdq, 2e-4), (dk, rdk, 2e-4),
                               (dv, rdv, 2e-4), (dqx, rdq, 2e-4),
                               (dkx, rdk, 2e-4), (dvx, rdv, 2e-4)]:
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=tol)

    def test_xl_block_returns_none_when_no_vmem_safe_block(self):
        """Extreme GQA ratios with s only divisible by 128 have no
        VMEM-safe streaming block: _xl_block signals None (callers then
        fail _kernel_ok and take the XLA reference) instead of raising."""
        from multi_spatialmllm_tpu.ops import attention as A

        assert A._xl_block(384, 64) is None
        assert A._xl_block(4096, 4) in (512, 1024)

    def test_vit_flash_flag_matches_unpadded_path(self):
        """ViT forward with use_flash_attention (off-TPU: the masked XLA
        fallback over the pad-extended row) equals the plain path."""
        from multi_spatialmllm_tpu.models.vit import (
            ViTConfig,
            VisionTransformer,
        )

        base = ViTConfig(image_size=56, patch_size=14, hidden_size=64,
                         num_layers=2, num_heads=4, dtype="float32")
        vit0 = VisionTransformer(base)
        vit1 = VisionTransformer(
            ViTConfig(**{**base.__dict__, "use_flash_attention": True}))
        px = jax.random.normal(jax.random.key(0), (2, 56, 56, 3),
                               dtype=jnp.float32)
        params = vit0.init(jax.random.key(1), px)
        a = vit0.apply(params, px)
        b = vit1.apply(params, px)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5)

    def test_packed_wrapper_grads_off_tpu_fallback(self):
        """Off-TPU the packed wrapper routes to the XLA reference with a
        float0 cotangent for segment_ids (int input)."""
        from multi_spatialmllm_tpu.ops.attention import (
            reference_attention,
            trainable_flash_attention_packed,
        )

        q, k, v, g = self._data(256, 1, key0=20)
        seg = jnp.asarray(np.repeat([1, 2], 128)[None].astype(np.int32))

        def loss(q_, k_, v_):
            return jnp.sum(trainable_flash_attention_packed(
                q_, k_, v_, seg, True))

        def ref_loss(q_, k_, v_):
            return jnp.sum(reference_attention(q_, k_, v_, causal=True,
                                               segment_ids=seg))

        got = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)
