"""Ring attention vs full causal attention on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_spatialmllm_tpu.ops.attention import reference_attention
from multi_spatialmllm_tpu.ops.ring_attention import (
    make_seq_mesh,
    ring_attention,
)

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (run scripts/test.sh)")


@needs_mesh
class TestRingAttention:
    @pytest.mark.parametrize("n_seq", [2, 4, 8])
    def test_matches_reference(self, n_seq):
        mesh = make_seq_mesh(n_seq)
        b, h, s, d = 2, 3, 64, 16
        q = jax.random.normal(jax.random.key(0), (b, h, s, d),
                              dtype=jnp.float32)
        k = jax.random.normal(jax.random.key(1), (b, h, s, d),
                              dtype=jnp.float32)
        v = jax.random.normal(jax.random.key(2), (b, h, s, d),
                              dtype=jnp.float32)
        out = ring_attention(q, k, v, mesh)
        expect = reference_attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=2e-5)

    @pytest.mark.parametrize("kvh", [3, 1])
    def test_flash_style_backward_matches_reference_grads(self, kvh):
        """The custom VJP (probabilities re-materialized from the saved
        lse; dk/dv riding the ring) must equal autodiff through the full
        reference attention — including the GQA group-sum for dk/dv."""
        mesh = make_seq_mesh(4)
        b, h, s, d = 2, 3, 64, 16
        q = jax.random.normal(jax.random.key(0), (b, h, s, d),
                              dtype=jnp.float32)
        k = jax.random.normal(jax.random.key(1), (b, kvh, s, d),
                              dtype=jnp.float32)
        v = jax.random.normal(jax.random.key(2), (b, kvh, s, d),
                              dtype=jnp.float32)
        g = jax.random.normal(jax.random.key(3), (b, h, s, d),
                              dtype=jnp.float32)

        def loss_ring(q, k, v):
            return jnp.sum(ring_attention(q, k, v, mesh) * g)

        def loss_ref(q, k, v):
            return jnp.sum(
                reference_attention(q, k, v, causal=True) * g)

        got = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
        want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for name, a, b_ in zip(("dq", "dk", "dv"), got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       atol=5e-5, err_msg=name)

    def test_jit_with_sharded_inputs(self):
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = make_seq_mesh(8)
        b, h, s, d = 1, 2, 128, 8
        q = jax.random.normal(jax.random.key(0), (b, h, s, d))
        k = jax.random.normal(jax.random.key(1), (b, h, s, d))
        v = jax.random.normal(jax.random.key(2), (b, h, s, d))
        sharding = NamedSharding(mesh, P(None, None, "seq", None))
        qs, ks, vs = (jax.device_put(x.astype(jnp.float32), sharding)
                      for x in (q, k, v))
        out = jax.jit(lambda a, b_, c: ring_attention(a, b_, c, mesh))(
            qs, ks, vs)
        expect = reference_attention(
            q.astype(jnp.float32), k.astype(jnp.float32),
            v.astype(jnp.float32), causal=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=2e-5)
