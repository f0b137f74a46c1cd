"""Ring attention: causal attention over a sequence-sharded mesh axis.

Context parallelism for sequences longer than one chip's HBM: q/k/v are
sharded `[B, H, S/n, D]` over a mesh "seq" axis; each device computes
blockwise online-softmax attention against its local kv block, then the kv
blocks rotate around the ring with `ppermute` (ICI neighbor exchange) for
n-1 steps. Causality is enforced per (query-block, key-block) pair: full
attention for earlier blocks, triangular mask on the diagonal block, and a
skip (fully masked) for later blocks.

The reference has no sequence parallelism (max context 8192 tokens,
SURVEY.md §5.7); this is the optional mesh axis the TPU design keeps open
for longer multi-frame contexts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..parallel.mesh import shard_map_compat

NEG_INF = -1e30

SEQ_AXIS = "seq"


def _block_attention(q, k, v, mask, m_prev, l_prev, acc_prev, sm_scale):
    """One online-softmax accumulation step over a kv block.

    q: [B,H,Tq,D]; k,v: [B,H,Tk,D]; mask: [Tq,Tk] bool (True = attend).
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k).astype(jnp.float32) * sm_scale
    s = jnp.where(mask[None, None], s, NEG_INF)
    m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_cur)
    alpha = jnp.exp(m_prev - m_cur)
    l_cur = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_cur = acc_prev * alpha + jnp.einsum(
        "bhqk,bhkd->bhqd", p, v.astype(jnp.float32))
    return m_cur, l_cur, acc_cur


# --- training integration: trace-time ring-mesh context --------------------
# parallel/train.make_train_step sets this while tracing a step whose mesh
# carries a "seq" axis; models/llm.Attention reads it to route the training
# forward through ring attention (the context manager runs at TRACE time,
# which is exactly when the module code executes under jit).

_ACTIVE_RING_MESH: list = [None]


class ring_context:
    def __init__(self, mesh: Mesh | None):
        self.mesh = None
        if mesh is not None and SEQ_AXIS in mesh.axis_names \
                and mesh.shape[SEQ_AXIS] > 1:
            self.mesh = mesh

    def __enter__(self):
        _ACTIVE_RING_MESH.append(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        _ACTIVE_RING_MESH.pop()
        return False


def active_ring_mesh() -> Mesh | None:
    return _ACTIVE_RING_MESH[-1]


def ring_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mesh: Mesh,
    sm_scale: float | None = None,
) -> jax.Array:
    """Causal attention with q/k/v sequence-sharded over `mesh`'s "seq"
    axis. Shapes `[B, H, S, D]` globally; S must divide by the axis size.
    k/v may carry fewer (GQA) heads — they are repeated here (the rotated
    payload stays at kv width would be the further optimization).
    Differentiable: the rotation loop has static bounds (lowered via
    scan), so reverse-mode autodiff works through `ppermute`.
    """
    if k.shape[1] != q.shape[1]:
        rep = q.shape[1] // k.shape[1]
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    b, h, s, d = q.shape
    n = mesh.shape[SEQ_AXIS]
    assert s % n == 0, (s, n)
    block = s // n
    if sm_scale is None:
        sm_scale = d ** -0.5

    # inside a multi-axis train-step mesh, go manual over "data" as well:
    # the batch dim stays device-local (full-manual-over-seq-only would
    # all-gather it) and per-device b shrinks accordingly
    data_axes = [ax for ax in ("data",) if ax in mesh.axis_names]
    if data_axes:
        spec = P(tuple(data_axes), None, SEQ_AXIS, None)
        b = b // int(np.prod([mesh.shape[ax] for ax in data_axes]))
    else:
        spec = P(None, None, SEQ_AXIS, None)

    def local_fn(q_blk, k_blk, v_blk):
        # q_blk/k_blk/v_blk: [B, H, block, D] on this device
        my_idx = jax.lax.axis_index(SEQ_AXIS)
        tri = jnp.tril(jnp.ones((block, block), dtype=bool))
        full = jnp.ones((block, block), dtype=bool)
        none = jnp.zeros((block, block), dtype=bool)

        m0 = jnp.full((b, h, block, 1), NEG_INF, dtype=jnp.float32)
        l0 = jnp.zeros((b, h, block, 1), dtype=jnp.float32)
        a0 = jnp.zeros((b, h, block, d), dtype=jnp.float32)

        perm = [(i, (i + 1) % n) for i in range(n)]

        def body(t, carry):
            m, l, acc, k_cur, v_cur = carry
            # explicit int32 arithmetic: under jax_enable_x64 the loop
            # counter is int64, and the mixed-width scalar select crashed
            # XLA's SPMD partitioner (CHECK IsScalarWithElementType)
            t32 = jnp.asarray(t, jnp.int32)
            src = (jnp.asarray(my_idx, jnp.int32) - t32) % jnp.int32(n)
            mask = jnp.where(
                src < my_idx, full, jnp.where(src == my_idx, tri, none))
            m, l, acc = _block_attention(
                q_blk, k_cur, v_cur, mask, m, l, acc, sm_scale)
            # rotate kv to the next device (last rotation is harmless)
            k_nxt = jax.lax.ppermute(k_cur, SEQ_AXIS, perm)
            v_nxt = jax.lax.ppermute(v_cur, SEQ_AXIS, perm)
            return m, l, acc, k_nxt, v_nxt

        m, l, acc, _, _ = jax.lax.fori_loop(
            0, n, body, (m0, l0, a0, k_blk, v_blk))
        return (acc / jnp.maximum(l, 1e-30)).astype(q_blk.dtype)

    axis_names = None
    if len(mesh.axis_names) > 1:
        axis_names = {SEQ_AXIS} | set(data_axes)
    fn = shard_map_compat(
        local_fn, mesh, in_specs=(spec, spec, spec), out_specs=spec,
        axis_names=axis_names)
    return fn(q, k, v)


def make_seq_mesh(n_seq: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the sequence axis (context parallelism)."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if n_seq is None:
        n_seq = len(devices)
    return Mesh(np.asarray(devices[:n_seq]), (SEQ_AXIS,))
