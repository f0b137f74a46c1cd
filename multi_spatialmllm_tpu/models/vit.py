"""InternViT-style vision transformer encoder in Flax.

Encodes 448x448 tiles into patch tokens for the MLLM (reference training
setup: images resized to 1296x968 then tiled, <=6 tiles per image,
README.md:197-198). Pre-norm ViT with learned position embeddings and a
class token (dropped downstream by the pixel-shuffle projector).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from ..ops.attention import reference_attention


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 448
    patch_size: int = 14
    hidden_size: int = 1024
    num_layers: int = 6
    num_heads: int = 16
    mlp_ratio: float = 4.0
    norm_eps: float = 1e-6
    dtype: str = "bfloat16"
    use_flash_attention: bool = False  # Pallas kernels on TPU (see below)
    remat: bool = False  # checkpoint each block (see LLMConfig.remat)
    remat_policy: str | None = None  # see LLMConfig.remat_policy

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size


class ViTBlock(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        h = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=dtype, name="norm1")(x)
        b, t, d = h.shape
        hd = cfg.hidden_size // cfg.num_heads
        qkv = nn.DenseGeneral((3, cfg.num_heads, hd), axis=-1, dtype=dtype,
                              name="qkv")(h)
        q, k, v = [qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3)]
        if cfg.use_flash_attention:
            # the token count (1 cls + grid^2 = 1025 at 448/14) is not
            # kernel-aligned: pad to a multiple of 128 with the pads in
            # their OWN segment — the segment-aware kernels then mask
            # them out exactly AND skip the fully-masked blocks on both
            # sides, so the XLA path's [B, H, T, T] f32 score tensor is
            # never materialized. Off-TPU this falls back to the masked
            # XLA reference (same math; tested equal to the unpadded
            # path).
            from ..ops.attention import trainable_flash_attention_packed

            pad = (-t) % 128
            qp, kp, vp = (
                jnp.pad(a, ((0, 0), (0, 0), (0, pad), (0, 0)))
                for a in (q, k, v))
            seg = jnp.concatenate(
                [jnp.zeros((b, t), jnp.int32),
                 jnp.ones((b, pad), jnp.int32)], axis=1)
            attn = trainable_flash_attention_packed(
                qp, kp, vp, seg, False)[:, :, :t]
        else:
            attn = reference_attention(q, k, v, causal=False)
        attn = attn.transpose(0, 2, 1, 3)
        x = x + nn.DenseGeneral(d, axis=(-2, -1), dtype=dtype,
                                name="proj")(attn)
        h = nn.LayerNorm(epsilon=cfg.norm_eps, dtype=dtype, name="norm2")(x)
        h = nn.Dense(int(cfg.hidden_size * cfg.mlp_ratio), dtype=dtype,
                     name="fc1")(h)
        h = nn.gelu(h)
        x = x + nn.Dense(cfg.hidden_size, dtype=dtype, name="fc2")(h)
        return x


class VisionTransformer(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, pixels):
        """pixels: `[B, H, W, 3]` normalized tiles -> `[B, 1+P, D]`."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=(cfg.patch_size, cfg.patch_size), dtype=dtype,
                    name="patch_embed")(pixels.astype(dtype))
        b = x.shape[0]
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param("cls_token", nn.initializers.zeros,
                         (1, 1, cfg.hidden_size))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, cfg.hidden_size)).astype(dtype), x],
            axis=1)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, 1 + cfg.num_patches, cfg.hidden_size))
        x = x + pos.astype(dtype)
        from .llm import _remat_policy

        block_cls = (nn.remat(ViTBlock, policy=_remat_policy(cfg))
                     if cfg.remat else ViTBlock)
        for i in range(cfg.num_layers):
            x = block_cls(cfg, name=f"block_{i}")(x)
        return x
