"""Multi-frame spatial MLLM: InternVL-2-style ViT + projector + decoder.

The reference delegates model training/eval to the external InternVL-2
stack (README.md:194-200); this module is the TPU-native equivalent: tiles
from multiple frames are encoded by the ViT, pixel-shuffled 2x2 -> 4C,
projected into the LLM embedding space, and spliced into the token stream
at IMG_CONTEXT positions. Loss is masked next-token cross-entropy over the
assistant turns, exactly what the MultiSPA JSONL conversations train.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from .llm import DecoderLM, LLMConfig, cross_entropy_loss
from .vit import ViTConfig, VisionTransformer

IMG_CONTEXT_ID_DEFAULT = 3  # reserved token id for vision-token slots


@dataclasses.dataclass(frozen=True)
class MLLMConfig:
    vit: ViTConfig = ViTConfig()
    llm: LLMConfig = LLMConfig()
    img_context_id: int = IMG_CONTEXT_ID_DEFAULT
    downsample: int = 2  # pixel-shuffle factor (InternVL uses 0.5 scale)

    @property
    def tokens_per_tile(self) -> int:
        return self.vit.num_patches // (self.downsample ** 2)


def pixel_shuffle(x: jax.Array, grid: int, factor: int) -> jax.Array:
    """`[B, P, D] -> [B, P/f^2, D*f^2]` spatial-to-depth on the patch grid
    (InternVL's 0.5-scale pixel shuffle)."""
    b, p, d = x.shape
    x = x.reshape(b, grid, grid, d)
    x = x.reshape(b, grid // factor, factor, grid // factor, factor, d)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (grid // factor) ** 2, d * factor * factor)


class Projector(nn.Module):
    cfg: MLLMConfig

    @nn.compact
    def __call__(self, vision_tokens):
        dtype = jnp.dtype(self.cfg.llm.dtype)
        x = nn.LayerNorm(dtype=dtype, name="norm")(vision_tokens)
        x = nn.Dense(self.cfg.llm.hidden_size, dtype=dtype, name="fc1")(x)
        x = nn.gelu(x)
        return nn.Dense(self.cfg.llm.hidden_size, dtype=dtype, name="fc2")(x)


class MultiFrameMLLM(nn.Module):
    cfg: MLLMConfig

    def apply(self, variables, *args, **kwargs):
        """nn.Module.apply with one extra step: variables go through
        models/quantize.maybe_dequantize first, so EVERY entry point
        (training, prefill, decode chunks, paged programs) transparently
        accepts weight-only-int8 trees (quantize.quantize_weights).
        Identity — same object, no copy — for ordinary params."""
        from .quantize import maybe_dequantize

        return super().apply(maybe_dequantize(variables), *args, **kwargs)

    def setup(self):
        self.vision = VisionTransformer(self.cfg.vit)
        self.projector = Projector(self.cfg)
        self.llm = DecoderLM(self.cfg.llm)

    def encode_tiles(self, tiles: jax.Array) -> jax.Array:
        """`[N_tiles, H, W, 3] -> [N_tiles, tokens_per_tile, llm_hidden]`."""
        feats = self.vision(tiles)[:, 1:]  # drop cls
        feats = pixel_shuffle(feats, self.cfg.vit.grid, self.cfg.downsample)
        return self.projector(feats)

    def spliced_embeds(self, input_ids: jax.Array, tiles: jax.Array):
        """Token embeddings with vision features scattered into the
        IMG_CONTEXT slots (statically shaped via cumsum slot indexing)."""
        b, t = input_ids.shape
        n_tiles = tiles.shape[1]
        vision_embeds = self.encode_tiles(
            tiles.reshape((b * n_tiles,) + tiles.shape[2:]))
        vision_embeds = vision_embeds.reshape(
            b, n_tiles * vision_embeds.shape[1], -1)

        embeds = self.llm.embed(input_ids)
        is_ctx = input_ids == self.cfg.img_context_id
        slot_order = jnp.cumsum(is_ctx, axis=1) - 1          # [B, T]
        slot_order = jnp.clip(slot_order, 0, vision_embeds.shape[1] - 1)
        gathered = jnp.take_along_axis(
            vision_embeds, slot_order[..., None], axis=1)
        return jnp.where(is_ctx[..., None], gathered, embeds)

    def __call__(self, input_ids: jax.Array, tiles: jax.Array,
                 positions: jax.Array | None = None,
                 segment_ids: jax.Array | None = None):
        """Training forward.

        Args:
          input_ids: `[B, T]` with `img_context_id` at vision-token slots.
          tiles: `[B, N_tiles, H, W, 3]` image tiles; B*N_tiles*tokens_per_
            tile must equal the per-batch count of img_context positions.
          positions / segment_ids: `[B, T]` for packed-sequence training
            (models/data.pack_samples): per-segment RoPE positions and a
            block-diagonal attention mask.
        Returns logits `[B, T, vocab]`.
        """
        return self.llm(input_embeds=self.spliced_embeds(input_ids, tiles),
                        positions=positions, segment_ids=segment_ids)

    def prefill(self, input_ids: jax.Array, tiles: jax.Array, caches,
                true_length=None, lora=None):
        """Prompt prefill: fills the KV caches and returns (logits, caches).

        `true_length` marks the real prompt length inside a padded
        `input_ids` block: pad keys are masked out of attention and the
        cache index is rewound to `true_length` so decoding overwrites the
        pad slots. A scalar shares one length across rows; a `[B]` array
        gives each row its own prompt length (batched serving).
        `lora` is a multi-adapter serving bundle
        (parallel/lora_serving.stack_adapters + per-row "idx").
        """
        embeds = self.spliced_embeds(input_ids, tiles)
        b, t, _ = embeds.shape
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        attn_valid = None
        if true_length is not None:
            lens = jnp.asarray(true_length)
            lens_col = lens[:, None] if lens.ndim else lens
            attn_valid = jnp.broadcast_to(
                jnp.arange(t)[None, :] < lens_col, (b, t))
        logits, caches = self.llm(input_embeds=embeds, positions=positions,
                                  attn_valid=attn_valid, caches=caches,
                                  lora=lora)
        if true_length is not None:
            caches = [{"k": c["k"], "v": c["v"], "index": true_length}
                      for c in caches]
        return logits, caches

    def decode_step(self, input_ids, positions, caches):
        """One greedy-decode step: `[B, 1]` token -> logits + new caches."""
        embeds = self.llm.embed(input_ids)
        return self.llm(input_embeds=embeds, positions=positions,
                        caches=caches)


def loss_fn(model: MultiFrameMLLM, params, batch):
    """Masked next-token loss over a batch dict with `input_ids`, `tiles`,
    `labels` (already shifted, -100 = ignore); packed batches additionally
    carry `positions` + `segment_ids`."""
    logits = model.apply(params, batch["input_ids"], batch["tiles"],
                         positions=batch.get("positions"),
                         segment_ids=batch.get("segment_ids"))
    return cross_entropy_loss(logits[:, :-1], batch["labels"][:, 1:])


def make_example_batch(cfg: MLLMConfig, batch: int = 1, n_tiles: int = 2,
                       seq_len: int = 512, seed: int = 0):
    """Synthetic batch whose IMG_CONTEXT layout matches `tiles`."""
    rng = jax.random.key(seed)
    t_img = cfg.tokens_per_tile * n_tiles
    assert seq_len > t_img + 2
    ids = jax.random.randint(rng, (batch, seq_len), 10,
                             cfg.llm.vocab_size)
    ids = ids.at[:, 1:1 + t_img].set(cfg.img_context_id)
    tiles = jax.random.normal(
        rng, (batch, n_tiles, cfg.vit.image_size, cfg.vit.image_size, 3),
        dtype=jnp.float32)
    labels = jnp.where(ids == cfg.img_context_id, -100, ids)
    return {"input_ids": ids, "tiles": tiles, "labels": labels}


def tiny_config(**overrides) -> MLLMConfig:
    """Small config for tests/dry runs (same code path as full scale)."""
    vit = ViTConfig(image_size=56, patch_size=14, hidden_size=128,
                    num_layers=2, num_heads=4)
    llm = LLMConfig(vocab_size=512, hidden_size=128, num_layers=2,
                    num_heads=4, num_kv_heads=2, ffn_size=256,
                    max_seq_len=512)
    return MLLMConfig(vit=vit, llm=llm, **overrides)


def tiny_moe_config(num_experts: int = 4, **overrides) -> MLLMConfig:
    """tiny_config with every decoder MLP replaced by a top-2 routed
    MoE (models/moe.py) — the expert-parallel test/dryrun shape."""
    base = tiny_config(**overrides)
    llm = dataclasses.replace(base.llm, moe_experts=num_experts)
    return dataclasses.replace(base, llm=llm)


def bench_1chip_config() -> MLLMConfig:
    """Flagship-SHAPED config sized for a full AdamW train step on ONE
    v5e (16 GB HBM): f32 params + Adam moments + grads cost ~16 B/param,
    bounding the model to ~700M params. Same architecture family and
    kernel paths as flagship_config (GQA 2:1, SwiGLU, flash kernels,
    hd=128 so the paged decode kernel engages), with remat so the
    activation footprint stays O(1) layers. This is the config behind
    bench.py's `model` block (train tokens/s + MFU, serve tokens/s)."""
    # selective remat: keeping matmul outputs (recompute only elementwise
    # ops) fits this model on one v5e and is 15% faster than full-layer
    # recompute — 313 vs 359 ms/step (scripts/profiles/_remat_drive.py).
    # "dots_and_flash_saveable" additionally saves the flash-attention
    # fwd products (o, lse) so the backward never re-launches a forward
    # attention kernel (models/llm._dots_and_flash_policy).
    pol = "dots_and_flash_saveable"
    vit = ViTConfig(image_size=448, patch_size=14, hidden_size=1024,
                    num_layers=6, num_heads=16, use_flash_attention=True,
                    remat=True, remat_policy=pol)
    llm = LLMConfig(vocab_size=32000, hidden_size=2048, num_layers=8,
                    num_heads=16, num_kv_heads=8, ffn_size=8192,
                    max_seq_len=4096, use_flash_attention=True, remat=True,
                    remat_policy=pol)
    return MLLMConfig(vit=vit, llm=llm)


def bench_1chip_moe_config(num_experts: int = 4,
                           impl: str = "einsum",
                           kernel: str = "xla") -> MLLMConfig:
    """bench_1chip_config with every decoder MLP swapped for top-2
    routed MoE (models/moe.py) at the SAME total parameter count:
    ffn_size 8192/E per expert, so params + AdamW memory match the
    dense bench config on one v5e and the step-time delta isolates
    routing + dispatch/combine cost against halved activated-FFN
    compute (top-2 of E same-width experts). Behind
    scripts/profiles/_moe_drive.py's real-chip measurement."""
    base = bench_1chip_config()
    # einsum: full-layer recompute — the dispatch/combine einsums are
    # dots too, and saving their [E,B*G,C,D]-sized outputs across 8
    # layers OOMs one v5e. ragged has no capacity buffers, so the dense
    # config's save-matmul-outputs policy fits and is 2% faster
    # (358 vs 367 ms/step measured; docs/profiles/moe_train.md)
    pol = base.llm.remat_policy if impl == "ragged" else None
    llm = dataclasses.replace(base.llm, moe_experts=num_experts,
                              ffn_size=base.llm.ffn_size // num_experts,
                              moe_group=256, moe_impl=impl,
                              moe_kernel=kernel, remat_policy=pol)
    return dataclasses.replace(base, llm=llm)


def flagship_config() -> MLLMConfig:
    """InternVL2-8B-like shape (InternViT-300M + 7-8B decoder).

    Trains through the Pallas flash kernels (fused forward + dq/dkv
    backward, ops/attention.py) on TPU; past the resident-KV VMEM budget
    (8K seq x 128 head dim) the XL streaming kernels take over, and
    off-TPU the XLA path is used automatically."""
    vit = ViTConfig(image_size=448, patch_size=14, hidden_size=1024,
                    num_layers=24, num_heads=16, use_flash_attention=True)
    llm = LLMConfig(vocab_size=92544, hidden_size=4096, num_layers=32,
                    num_heads=32, num_kv_heads=8, ffn_size=14336,
                    max_seq_len=8192, use_flash_attention=True)
    return MLLMConfig(vit=vit, llm=llm)
