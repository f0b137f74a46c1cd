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
    payload stays at kv width would be the further optimization; the
    repeat's VJP performs the group sum for dk/dv automatically).
    Differentiable with a FLASH-STYLE custom VJP (`_ring_core`): the
    backward re-materializes probabilities from the saved logsumexp and
    runs one extra ring pass with dk/dv partial sums riding alongside
    their kv blocks — per-device memory stays O(S/n), where plain
    autodiff through the rotation scan would stash O(S) of kv.
    """
    if k.shape[1] != q.shape[1]:
        rep = q.shape[1] // k.shape[1]
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    if sm_scale is None:
        sm_scale = q.shape[-1] ** -0.5
    return _ring_core(q, k, v, mesh, float(sm_scale))


def _mesh_layout(mesh: Mesh, q_shape):
    """(local_b, block, n, spec, axis_names) for a ring over `mesh`."""
    b, h, s, d = q_shape
    n = mesh.shape[SEQ_AXIS]
    assert s % n == 0, (s, n)
    # inside a multi-axis train-step mesh, go manual over "data" as well:
    # the batch dim stays device-local (full-manual-over-seq-only would
    # all-gather it) and per-device b shrinks accordingly
    data_axes = [ax for ax in ("data",) if ax in mesh.axis_names]
    if data_axes:
        spec = P(tuple(data_axes), None, SEQ_AXIS, None)
        b = b // int(np.prod([mesh.shape[ax] for ax in data_axes]))
    else:
        spec = P(None, None, SEQ_AXIS, None)
    axis_names = None
    if len(mesh.axis_names) > 1:
        axis_names = {SEQ_AXIS} | set(data_axes)
    return b, s // n, n, spec, axis_names


def _block_mask(block: int, n: int, my_idx, t):
    """Causal mask for (my q block, kv block that arrived at step t).
    Explicit int32 arithmetic: under jax_enable_x64 the loop counter is
    int64, and the mixed-width scalar select crashed XLA's SPMD
    partitioner (CHECK IsScalarWithElementType)."""
    tri = jnp.tril(jnp.ones((block, block), dtype=bool))
    full = jnp.ones((block, block), dtype=bool)
    none = jnp.zeros((block, block), dtype=bool)
    t32 = jnp.asarray(t, jnp.int32)
    my32 = jnp.asarray(my_idx, jnp.int32)
    src = (my32 - t32) % jnp.int32(n)  # origin index of the current kv
    return jnp.where(src < my32, full, jnp.where(src == my32, tri, none))


def _ring_fwd_local(q_blk, k_blk, v_blk, *, b, h, d, block, n, sm_scale):
    """Forward online-softmax ring pass; returns (out, lse)."""
    my_idx = jax.lax.axis_index(SEQ_AXIS)
    m0 = jnp.full((b, h, block, 1), NEG_INF, dtype=jnp.float32)
    l0 = jnp.zeros((b, h, block, 1), dtype=jnp.float32)
    a0 = jnp.zeros((b, h, block, d), dtype=jnp.float32)
    perm = [(i, (i + 1) % n) for i in range(n)]

    def body(t, carry):
        m, l, acc, k_cur, v_cur = carry
        mask = _block_mask(block, n, my_idx, t)
        m, l, acc = _block_attention(
            q_blk, k_cur, v_cur, mask, m, l, acc, sm_scale)
        # rotate kv to the next device (last rotation is harmless)
        k_nxt = jax.lax.ppermute(k_cur, SEQ_AXIS, perm)
        v_nxt = jax.lax.ppermute(v_cur, SEQ_AXIS, perm)
        return m, l, acc, k_nxt, v_nxt

    m, l, acc, _, _ = jax.lax.fori_loop(
        0, n, body, (m0, l0, a0, k_blk, v_blk))
    l_safe = jnp.maximum(l, 1e-30)
    out = (acc / l_safe).astype(q_blk.dtype)
    return out, m + jnp.log(l_safe)


import functools as _functools


@_functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _ring_core(q, k, v, mesh, sm_scale):
    """Ring attention with a FLASH-STYLE custom backward: the forward
    saves only (q, k, v, out, lse) — O(local block) per device — and the
    backward re-materializes each probability block from the saved lse
    while dk/dv partial sums travel around the ring WITH their kv block
    (one extra rotation pass; autodiff through the forward scan would
    instead stash every rotated kv, O(global kv) per device)."""
    b, h, s, d = q.shape
    lb, block, n, spec, axis_names = _mesh_layout(mesh, q.shape)
    fn = shard_map_compat(
        _functools.partial(_ring_fwd_local, b=lb, h=h, d=d, block=block,
                           n=n, sm_scale=sm_scale),
        mesh, in_specs=(spec, spec, spec), out_specs=(spec, spec),
        axis_names=axis_names)
    out, _ = fn(q, k, v)
    return out


def _ring_core_fwd(q, k, v, mesh, sm_scale):
    b, h, s, d = q.shape
    lb, block, n, spec, axis_names = _mesh_layout(mesh, q.shape)
    fn = shard_map_compat(
        _functools.partial(_ring_fwd_local, b=lb, h=h, d=d, block=block,
                           n=n, sm_scale=sm_scale),
        mesh, in_specs=(spec, spec, spec), out_specs=(spec, spec),
        axis_names=axis_names)
    out, lse = fn(q, k, v)
    return out, (q, k, v, out, lse)


def _ring_core_bwd(mesh, sm_scale, residuals, g):
    q, k, v, out, lse = residuals
    b, h, s, d = q.shape
    lb, block, n, spec, axis_names = _mesh_layout(mesh, q.shape)
    lse_spec = spec  # [B, H, block, 1] shards like q (seq dim is dim 2)

    def local_bwd(q_blk, k_blk, v_blk, g_blk, lse_blk, delta_blk):
        my_idx = jax.lax.axis_index(SEQ_AXIS)
        perm = [(i, (i + 1) % n) for i in range(n)]
        qf = q_blk.astype(jnp.float32)
        gf = g_blk.astype(jnp.float32)
        dq0 = jnp.zeros((lb, h, block, d), jnp.float32)
        dk0 = jnp.zeros_like(dq0)
        dv0 = jnp.zeros_like(dq0)

        def body(t, carry):
            dq, k_cur, v_cur, dk_cur, dv_cur = carry
            mask = _block_mask(block, n, my_idx, t)
            kf = k_cur.astype(jnp.float32)
            vf = v_cur.astype(jnp.float32)
            s_ = jnp.einsum("bhqd,bhkd->bhqk", qf, kf) * sm_scale
            s_ = jnp.where(mask[None, None], s_, NEG_INF)
            p = jnp.exp(s_ - lse_blk)          # exact probs, 0 where masked
            dp = jnp.einsum("bhqd,bhkd->bhqk", gf, vf)
            ds = p * (dp - delta_blk) * sm_scale
            dq = dq + jnp.einsum("bhqk,bhkd->bhqd", ds, kf)
            dk_cur = dk_cur + jnp.einsum("bhqk,bhqd->bhkd", ds, qf)
            dv_cur = dv_cur + jnp.einsum("bhqk,bhqd->bhkd", p, gf)
            # dk/dv ride the ring with their kv block (all return to
            # their origin after n rotations)
            k_cur = jax.lax.ppermute(k_cur, SEQ_AXIS, perm)
            v_cur = jax.lax.ppermute(v_cur, SEQ_AXIS, perm)
            dk_cur = jax.lax.ppermute(dk_cur, SEQ_AXIS, perm)
            dv_cur = jax.lax.ppermute(dv_cur, SEQ_AXIS, perm)
            return dq, k_cur, v_cur, dk_cur, dv_cur

        dq, _, _, dk, dv = jax.lax.fori_loop(
            0, n, body, (dq0, k_blk, v_blk, dk0, dv0))
        return (dq.astype(q_blk.dtype), dk.astype(k_blk.dtype),
                dv.astype(v_blk.dtype))

    # delta = rowsum(g * out) in f32 — computed globally (elementwise)
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    fn = shard_map_compat(
        local_bwd, mesh,
        in_specs=(spec, spec, spec, spec, lse_spec, lse_spec),
        out_specs=(spec, spec, spec), axis_names=axis_names)
    return fn(q, k, v, g, lse, delta)


_ring_core.defvjp(_ring_core_fwd, _ring_core_bwd)


def make_seq_mesh(n_seq: int | None = None, devices=None) -> Mesh:
    """1-D mesh over the sequence axis (context parallelism)."""
    import numpy as np

    devices = list(devices if devices is not None else jax.devices())
    if n_seq is None:
        n_seq = len(devices)
    return Mesh(np.asarray(devices[:n_seq]), (SEQ_AXIS,))
