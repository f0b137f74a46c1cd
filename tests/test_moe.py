"""Mixture-of-Experts FFN + expert parallelism (models/moe.py).

The reference has no MoE (it delegates training entirely,
README.md:194-200); this is the beyond-reference sparse-FFN axis. The
ground truths here are mathematical: identical experts must reproduce
the dense MLP, routing invariants must hold, and the expert-parallel
train step must equal the single-device step.
"""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.llm import MLP
from multi_spatialmllm_tpu.models.moe import MoEMLP, top_k_routing
from multi_spatialmllm_tpu.parallel.mesh import make_mesh
from multi_spatialmllm_tpu.parallel.sharding import params_shardings
from multi_spatialmllm_tpu.parallel.train import (
    TrainConfig,
    init_train_state,
    make_train_step,
)

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (run scripts/test.sh)")


def _f32_moe_cfg(num_experts=4):
    base = M.tiny_moe_config(num_experts=num_experts)
    return M.MLLMConfig(vit=dc.replace(base.vit, dtype="float32"),
                        llm=dc.replace(base.llm, dtype="float32"))


class TestRouting:
    def test_dispatch_invariants(self):
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(2, 16, 4)), jnp.float32)
        dispatch, combine, aux = top_k_routing(logits, top_k=2, capacity=16)
        d = np.asarray(dispatch)
        c = np.asarray(combine)
        # each token occupies at most top_k buffer slots, each exactly once
        assert d.sum(axis=(2, 3)).max() <= 2 + 1e-6
        # buffer slots hold at most one token
        assert d.sum(axis=1).max() <= 1 + 1e-6
        # with ample capacity every token is fully routed: combine sums to 1
        np.testing.assert_allclose(c.sum(axis=(2, 3)), 1.0, atol=1e-5)
        assert np.isfinite(float(aux))

    def test_capacity_drops_overflow_tokens(self):
        # all tokens prefer expert 0 -> only `capacity` of them fit
        logits = jnp.zeros((1, 8, 4), jnp.float32).at[:, :, 0].set(10.0)
        dispatch, combine, _ = top_k_routing(logits, top_k=1, capacity=3)
        d = np.asarray(dispatch)
        assert d[0, :, 0].sum() == 3  # first 3 tokens kept (cumsum order)
        np.testing.assert_allclose(d[0, :3, 0].sum(axis=-1), 1.0)
        np.testing.assert_allclose(d[0, 3:].sum(), 0.0)
        np.testing.assert_allclose(np.asarray(combine)[0, 3:].sum(), 0.0)

    def test_valid_mask_excludes_pads(self):
        """Padding tokens (valid=False) consume no expert capacity, get
        zero dispatch/combine, and are excluded from the aux fractions
        (ADVICE r3: pad-heavy batches must not bias the router stats)."""
        rng = np.random.default_rng(1)
        logits = jnp.asarray(rng.normal(size=(1, 8, 4)), jnp.float32)
        valid = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]], bool)
        d, c, aux = top_k_routing(logits, top_k=2, capacity=8, valid=valid)
        np.testing.assert_allclose(np.asarray(d)[0, 4:].sum(), 0.0)
        np.testing.assert_allclose(np.asarray(c)[0, 4:].sum(), 0.0)
        # aux equals routing the real tokens alone
        d2, c2, aux2 = top_k_routing(logits[:, :4], top_k=2, capacity=8)
        np.testing.assert_allclose(float(aux), float(aux2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(d)[0, :4],
                                   np.asarray(d2)[0])

    def test_pads_do_not_steal_capacity(self):
        """A pad-heavy PREFIX must not drop later real tokens: all
        tokens prefer expert 0 and capacity fits exactly the real ones."""
        logits = jnp.zeros((1, 8, 4), jnp.float32).at[:, :, 0].set(10.0)
        valid = jnp.asarray([[0, 0, 0, 0, 0, 1, 1, 1]], bool)
        d, _, _ = top_k_routing(logits, top_k=1, capacity=3, valid=valid)
        # without the mask the 5 pads would fill expert 0's 3 slots
        np.testing.assert_allclose(
            np.asarray(d)[0, 5:, 0].sum(axis=-1), 1.0)

    def test_inference_capacity_is_no_drop_for_chunks(self):
        from multi_spatialmllm_tpu.models.moe import (
            NO_DROP_MAX_T, moe_capacity)

        cfg = _f32_moe_cfg().llm
        assert moe_capacity(cfg, 1, inference=True) == cfg.moe_top_k
        assert moe_capacity(cfg, 32, inference=True) == 32 * cfg.moe_top_k
        # past the chunk bound it falls back to the capped formula
        big = NO_DROP_MAX_T * 2
        assert moe_capacity(cfg, big, inference=True) == \
            moe_capacity(cfg, big, inference=False)

    def test_moe_mlp_rejects_mlp_lora_tables(self):
        """Serving adapters targeting the dense SwiGLU kernels must fail
        loudly on a routed FFN, not silently serve an un-adapted MLP."""
        cfg = _f32_moe_cfg().llm
        mlp = MoEMLP(cfg)
        x = jnp.zeros((1, 4, cfg.hidden_size), jnp.float32)
        params = mlp.init(jax.random.key(0), x)
        bad_lora = {"scale": 1.0, "idx": jnp.zeros((1,), jnp.int32),
                    "tables": {"gate": None}}
        with pytest.raises(ValueError, match="routed MoE"):
            mlp.apply(params, x, lora=bad_lora)

    def test_aux_loss_uniform_routing_is_one(self):
        # perfectly balanced first-choice routing + uniform probs -> aux=1
        b, t, e = 1, 8, 4
        logits = jnp.asarray(
            10.0 * np.eye(e)[np.arange(t) % e][None], jnp.float32)
        _, _, aux = top_k_routing(logits, top_k=1, capacity=8)
        # probs are one-hot-ish; route_frac uniform (1/e each); aux =
        # sum(route_frac * prob_frac) * e ~= 1
        np.testing.assert_allclose(float(aux), 1.0, atol=1e-3)


class TestMoEMLP:
    def test_identical_experts_match_dense_mlp(self):
        """E copies of one SwiGLU + renormalized top-2 gates == the dense
        MLP (the routing/dispatch machinery cancels exactly)."""
        cfg = _f32_moe_cfg(num_experts=4).llm
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 8, cfg.hidden_size)),
                        jnp.float32)

        dense = MLP(dc.replace(cfg, moe_experts=0))
        dp = dense.init(jax.random.key(0), x)
        y_dense = dense.apply(dp, x)

        e, d_, f = cfg.moe_experts, cfg.hidden_size, cfg.ffn_size
        k = dp["params"]
        mp = {"params": {
            "router": jnp.zeros((d_, e), jnp.float32),
            "wi_gate": jnp.broadcast_to(k["gate"]["kernel"], (e, d_, f)),
            "wi_up": jnp.broadcast_to(k["up"]["kernel"], (e, d_, f)),
            "wo": jnp.broadcast_to(k["down"]["kernel"], (e, f, d_)),
        }}
        y_moe = MoEMLP(cfg).apply(mp, x)
        np.testing.assert_allclose(np.asarray(y_moe), np.asarray(y_dense),
                                   atol=1e-5, rtol=1e-5)

    def test_grouped_routing_matches_ungrouped_when_no_drop(self):
        """moe_group changes WHERE capacity binds, nothing else: with an
        ample capacity factor (cap >= E means no drops in either
        formulation) the grouped and whole-row outputs are identical —
        buffer positions differ, the combine result does not."""
        cfg = dc.replace(_f32_moe_cfg(4).llm, moe_capacity=4.0)
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(2, 32, cfg.hidden_size)),
                        jnp.float32)
        m = MoEMLP(cfg)
        p = m.init(jax.random.key(0), x)
        y0 = m.apply(p, x)
        yg = MoEMLP(dc.replace(cfg, moe_group=8)).apply(p, x)
        np.testing.assert_allclose(np.asarray(yg), np.asarray(y0),
                                   atol=1e-5, rtol=1e-5)

    def test_identical_experts_match_dense_mlp_grouped(self):
        """The dense-MLP oracle holds through grouped dispatch too."""
        cfg = dc.replace(_f32_moe_cfg(num_experts=4).llm, moe_group=4)
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 8, cfg.hidden_size)),
                        jnp.float32)
        dense = MLP(dc.replace(cfg, moe_experts=0))
        dp = dense.init(jax.random.key(0), x)
        y_dense = dense.apply(dp, x)
        e, d_, f = cfg.moe_experts, cfg.hidden_size, cfg.ffn_size
        k = dp["params"]
        mp = {"params": {
            "router": jnp.zeros((d_, e), jnp.float32),
            "wi_gate": jnp.broadcast_to(k["gate"]["kernel"], (e, d_, f)),
            "wi_up": jnp.broadcast_to(k["up"]["kernel"], (e, d_, f)),
            "wo": jnp.broadcast_to(k["down"]["kernel"], (e, f, d_)),
        }}
        y_moe = MoEMLP(cfg).apply(mp, x)
        np.testing.assert_allclose(np.asarray(y_moe), np.asarray(y_dense),
                                   atol=1e-5, rtol=1e-5)

    def test_inference_ignores_moe_group(self):
        """Inference chunk-invariance guarantees depend on whole-chunk
        routing: moe_group must not change inference outputs."""
        cfg = _f32_moe_cfg().llm
        x = jnp.asarray(np.random.default_rng(4).normal(
            size=(1, 16, cfg.hidden_size)), jnp.float32)
        m = MoEMLP(cfg)
        p = m.init(jax.random.key(0), x)
        y0 = m.apply(p, x, inference=True)
        yg = MoEMLP(dc.replace(cfg, moe_group=4)).apply(p, x,
                                                        inference=True)
        np.testing.assert_array_equal(np.asarray(yg), np.asarray(y0))

    def test_moe_group_must_divide_training_seq_len(self):
        """A non-divisor moe_group must error, not silently fall back to
        whole-row O(k*T^2) dispatch (the regime grouping exists to
        avoid); inference stays exempt (groups are ignored there)."""
        cfg = dc.replace(_f32_moe_cfg().llm, moe_group=5)
        x = jnp.zeros((1, 16, cfg.hidden_size), jnp.float32)
        m = MoEMLP(cfg)
        with pytest.raises(ValueError, match="must divide"):
            m.init(jax.random.key(0), x)
        # inference ignores moe_group entirely, divisor or not
        p = MoEMLP(dc.replace(cfg, moe_group=0)).init(jax.random.key(0), x)
        m.apply(p, x, inference=True)

    def test_ragged_identical_experts_match_dense_mlp(self):
        """The dense-MLP oracle holds through the dropless sorted
        ragged_dot path (moe_impl="ragged") too."""
        cfg = dc.replace(_f32_moe_cfg(num_experts=4).llm,
                         moe_impl="ragged")
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 8, cfg.hidden_size)),
                        jnp.float32)
        dense = MLP(dc.replace(cfg, moe_experts=0))
        dp = dense.init(jax.random.key(0), x)
        y_dense = dense.apply(dp, x)
        e, d_, f = cfg.moe_experts, cfg.hidden_size, cfg.ffn_size
        k = dp["params"]
        mp = {"params": {
            "router": jnp.zeros((d_, e), jnp.float32),
            "wi_gate": jnp.broadcast_to(k["gate"]["kernel"], (e, d_, f)),
            "wi_up": jnp.broadcast_to(k["up"]["kernel"], (e, d_, f)),
            "wo": jnp.broadcast_to(k["down"]["kernel"], (e, f, d_)),
        }}
        y_moe = MoEMLP(cfg).apply(mp, x)
        np.testing.assert_allclose(np.asarray(y_moe), np.asarray(y_dense),
                                   atol=1e-5, rtol=1e-5)

    def test_ragged_matches_einsum_when_no_drops(self):
        """Cross-impl oracle: with ample capacity the GShard einsum path
        drops nothing, so both impls compute the same gate-weighted sum
        of expert MLPs for every token."""
        base = dc.replace(_f32_moe_cfg(4).llm, moe_capacity=4.0)
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.normal(size=(2, 16, base.hidden_size)),
                        jnp.float32)
        m = MoEMLP(base)
        p = m.init(jax.random.key(0), x)
        y_einsum = m.apply(p, x)
        y_ragged = MoEMLP(dc.replace(base, moe_impl="ragged")).apply(p, x)
        np.testing.assert_allclose(np.asarray(y_ragged),
                                   np.asarray(y_einsum),
                                   atol=1e-5, rtol=1e-5)

    def test_ragged_aux_matches_einsum(self):
        """The load-balance statistic is the same formula in both
        impls — sow'n values must agree on the same params/input."""
        base = _f32_moe_cfg(4).llm
        rng = np.random.default_rng(9)
        x = jnp.asarray(rng.normal(size=(1, 12, base.hidden_size)),
                        jnp.float32)
        p = MoEMLP(base).init(jax.random.key(0), x)

        def aux_of(cfg):
            _, mut = MoEMLP(cfg).apply(p, x, mutable=["intermediates"])
            return float(mut["intermediates"]["moe_aux_loss"][0])

        np.testing.assert_allclose(
            aux_of(dc.replace(base, moe_impl="ragged")), aux_of(base),
            rtol=1e-6)

    def test_ragged_pads_do_not_change_real_tokens(self):
        """Ragged rows are per-token independent: appending pads (valid
        False) must leave every real token's output unchanged and
        produce zero output on the pads."""
        cfg = dc.replace(_f32_moe_cfg(4).llm, moe_impl="ragged")
        rng = np.random.default_rng(3)
        x4 = jnp.asarray(rng.normal(size=(1, 4, cfg.hidden_size)),
                         jnp.float32)
        pad = jnp.asarray(rng.normal(size=(1, 4, cfg.hidden_size)),
                          jnp.float32)
        x8 = jnp.concatenate([x4, pad], axis=1)
        valid = jnp.asarray([[1, 1, 1, 1, 0, 0, 0, 0]], bool)
        m = MoEMLP(cfg)
        p = m.init(jax.random.key(0), x4)
        y4 = m.apply(p, x4)
        y8 = m.apply(p, x8, valid=valid)
        np.testing.assert_allclose(np.asarray(y8)[:, :4], np.asarray(y4),
                                   atol=1e-6, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(y8)[:, 4:], 0.0, atol=1e-6)

    def test_ragged_chunk_invariant_at_inference(self):
        """Dropless per-token routing is trivially chunk-invariant:
        halves processed separately equal the whole chunk."""
        cfg = dc.replace(_f32_moe_cfg(4).llm, moe_impl="ragged")
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(1, 16, cfg.hidden_size)),
                        jnp.float32)
        m = MoEMLP(cfg)
        p = m.init(jax.random.key(0), x)
        y_full = m.apply(p, x, inference=True)
        y_halves = jnp.concatenate(
            [m.apply(p, x[:, :8], inference=True),
             m.apply(p, x[:, 8:], inference=True)], axis=1)
        np.testing.assert_allclose(np.asarray(y_halves),
                                   np.asarray(y_full),
                                   atol=1e-6, rtol=1e-6)

    def test_ragged_grads_finite(self):
        cfg = dc.replace(_f32_moe_cfg(4).llm, moe_impl="ragged")
        rng = np.random.default_rng(11)
        x = jnp.asarray(rng.normal(size=(2, 8, cfg.hidden_size)),
                        jnp.float32)
        m = MoEMLP(cfg)
        p = m.init(jax.random.key(0), x)
        g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(p)
        for leaf in jax.tree_util.tree_leaves(g):
            assert np.isfinite(np.asarray(leaf)).all()
        # router must receive gradient through the gate weights
        assert float(jnp.abs(g["params"]["router"]).sum()) > 0

    def test_forward_finite_and_sows_aux(self):
        cfg = _f32_moe_cfg().llm
        x = jnp.asarray(np.random.default_rng(2).normal(
            size=(2, 16, cfg.hidden_size)), jnp.float32)
        m = MoEMLP(cfg)
        p = m.init(jax.random.key(0), x)
        y, mut = m.apply(p, x, mutable=["intermediates"])
        assert np.isfinite(np.asarray(y)).all()
        leaves = jax.tree_util.tree_leaves(mut)
        assert len(leaves) == 1 and np.isfinite(float(leaves[0]))


@needs_mesh
class TestExpertParallelTraining:
    def test_ep_step_matches_single_device(self):
        cfg = _f32_moe_cfg(num_experts=4)
        batch = M.make_example_batch(cfg, batch=2, n_tiles=1, seq_len=32)
        tc = TrainConfig(learning_rate=1e-3, warmup_steps=1)

        mesh_ep = make_mesh(n_data=2, n_model=1, n_expert=4)
        model, p_ep, o_ep, tx = init_train_state(cfg, tc, batch, mesh_ep)
        step_ep = make_train_step(model, tx, mesh_ep)
        p_ep, o_ep, m_ep = step_ep(p_ep, o_ep, batch)

        mesh_1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
        model, p_1, o_1, tx1 = init_train_state(cfg, tc, batch, mesh_1)
        step_1 = make_train_step(model, tx1, mesh_1)
        p_1, o_1, m_1 = step_1(p_1, o_1, batch)

        np.testing.assert_allclose(float(m_ep["loss"]), float(m_1["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m_ep["grad_norm"]),
                                   float(m_1["grad_norm"]), rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p_ep),
                        jax.tree_util.tree_leaves(p_1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-6, rtol=1e-5)

    def test_ragged_dp_step_matches_single_device(self):
        """The dropless ragged impl under a data-sharded pjit step (the
        mesh it is designed for) equals the single-device step: the
        global sort/gather/ragged_dot pipeline must survive SPMD
        partitioning bit-for-bit at f32 tolerances."""
        cfg = _f32_moe_cfg(num_experts=4)
        cfg = M.MLLMConfig(vit=cfg.vit,
                           llm=dc.replace(cfg.llm, moe_impl="ragged"))
        batch = M.make_example_batch(cfg, batch=2, n_tiles=1, seq_len=32)
        tc = TrainConfig(learning_rate=1e-3, warmup_steps=1)

        mesh_dp = make_mesh(n_data=2, n_model=1,
                            devices=jax.devices()[:2])
        model, p_dp, o_dp, tx = init_train_state(cfg, tc, batch, mesh_dp)
        step_dp = make_train_step(model, tx, mesh_dp)
        p_dp, o_dp, m_dp = step_dp(p_dp, o_dp, batch)

        mesh_1 = make_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
        model, p_1, o_1, tx1 = init_train_state(cfg, tc, batch, mesh_1)
        step_1 = make_train_step(model, tx1, mesh_1)
        p_1, o_1, m_1 = step_1(p_1, o_1, batch)

        np.testing.assert_allclose(float(m_dp["loss"]), float(m_1["loss"]),
                                   rtol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(p_dp),
                        jax.tree_util.tree_leaves(p_1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-6, rtol=1e-5)

    def test_ragged_rejects_expert_parallel_mesh(self):
        """moe_impl='ragged' cannot use the expert axis (global sort +
        ragged_dot don't shard over it); make_train_step must fail
        loudly instead of compiling a weight-allgathering program."""
        import pytest

        cfg = _f32_moe_cfg(num_experts=4)
        cfg = M.MLLMConfig(vit=cfg.vit,
                           llm=dc.replace(cfg.llm, moe_impl="ragged"))
        batch = M.make_example_batch(cfg, batch=2, n_tiles=1, seq_len=32)
        tc = TrainConfig(learning_rate=1e-3, warmup_steps=1)
        mesh_ep = make_mesh(n_data=2, n_model=1, n_expert=4)
        model, _, _, tx = init_train_state(cfg, tc, batch, mesh_ep)
        with pytest.raises(ValueError, match="ragged"):
            make_train_step(model, tx, mesh_ep)

    def test_expert_specs_shard_expert_axis(self):
        cfg = M.tiny_moe_config()
        batch = M.make_example_batch(cfg, batch=2, n_tiles=1, seq_len=32)
        model = M.MultiFrameMLLM(cfg)
        params = model.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])
        mesh = make_mesh(n_data=1, n_model=2, n_expert=4)
        specs = params_shardings(params, mesh)
        flat = {
            "/".join(str(getattr(k, "key", k)) for k in path): s.spec
            for path, s in jax.tree_util.tree_flatten_with_path(specs)[0]}
        moe = {k: str(v) for k, v in flat.items() if "/moe/" in k}
        assert moe, "no MoE params found"
        assert all("expert" in v for k, v in moe.items()
                   if k.endswith(("wi_gate", "wi_up", "wo")))
        # the same specs degrade gracefully on a mesh without the axis
        specs2 = params_shardings(params, make_mesh(n_data=4, n_model=2))
        assert all("expert" not in str(s.spec)
                   for s in jax.tree_util.tree_leaves(specs2))

    def test_ep_composes_with_tp_and_learns(self):
        cfg = M.tiny_moe_config()
        batch = M.make_example_batch(cfg, batch=2, n_tiles=1, seq_len=32)
        mesh = make_mesh(n_data=2, n_model=2, n_expert=2)
        model, params, opt_state, tx = init_train_state(
            cfg, TrainConfig(learning_rate=1e-3, warmup_steps=1), batch,
            mesh)
        step = make_train_step(model, tx, mesh)
        losses = []
        for _ in range(4):
            params, opt_state, metrics = step(params, opt_state, batch)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]


class TestMoEDecode:
    def test_greedy_decode_matches_teacher_forcing(self):
        """The MoE decoder serves through the unchanged cache path:
        prefill+decode logits equal the full forward."""
        cfg = _f32_moe_cfg()
        model = M.MultiFrameMLLM(cfg)
        batch = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=24)
        params = model.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])
        full = model.apply(params, batch["input_ids"], batch["tiles"])

        from multi_spatialmllm_tpu.models.llm import init_cache
        t = batch["input_ids"].shape[1]
        caches = init_cache(cfg.llm, 1, t + 4)
        logits_pf, caches = model.apply(
            params, batch["input_ids"], batch["tiles"], caches,
            method=model.prefill)
        np.testing.assert_allclose(np.asarray(logits_pf[:, -1]),
                                   np.asarray(full[:, -1]),
                                   atol=2e-4, rtol=2e-4)


class TestRaggedPallasKernel:
    """moe_kernel="pallas" swaps the ragged impl's three lax.ragged_dot
    calls for the megablox Pallas grouped matmul (interpret mode off-TPU).
    Same math — outputs and grads must match the xla kernel to float
    tolerance on every shape the engine produces, including empty
    expert groups."""

    def _pair(self, seed=3, b=2, t=16):
        cfg_x = dc.replace(_f32_moe_cfg(4).llm, moe_impl="ragged")
        cfg_p = dc.replace(cfg_x, moe_kernel="pallas")
        rng = np.random.default_rng(seed)
        x = jnp.asarray(rng.normal(size=(b, t, cfg_x.hidden_size)),
                        jnp.float32)
        m = MoEMLP(cfg_x)
        p = m.init(jax.random.key(0), x)
        return cfg_x, cfg_p, p, x

    def test_forward_matches_xla_kernel(self):
        cfg_x, cfg_p, p, x = self._pair()
        y_x = MoEMLP(cfg_x).apply(p, x)
        y_p = MoEMLP(cfg_p).apply(p, x)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                                   atol=1e-5, rtol=1e-5)

    def test_forward_with_empty_groups(self):
        # a router bias that starves two experts: their group_sizes are 0
        cfg_x, cfg_p, p, x = self._pair(seed=5)
        pp = jax.tree_util.tree_map(lambda a: a, p)
        router = np.zeros_like(np.asarray(pp["params"]["router"]))
        router[:, 2:] = -1e9  # experts 2,3 never chosen
        pp = {"params": {**pp["params"], "router": jnp.asarray(router)}}
        y_x = MoEMLP(cfg_x).apply(pp, x)
        y_p = MoEMLP(cfg_p).apply(pp, x)
        np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x),
                                   atol=1e-5, rtol=1e-5)

    def test_grads_match_xla_kernel(self):
        cfg_x, cfg_p, p, x = self._pair(seed=9)

        def loss(cfg):
            def f(params):
                return jnp.sum(MoEMLP(cfg).apply(params, x) ** 2)
            return jax.grad(f)(p)

        g_x = loss(cfg_x)
        g_p = loss(cfg_p)
        flat_x = jax.tree_util.tree_leaves(g_x)
        flat_p = jax.tree_util.tree_leaves(g_p)
        for a, b_ in zip(flat_x, flat_p):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                       atol=2e-4, rtol=2e-4)

    def test_identical_experts_dense_oracle_through_pallas(self):
        cfg = dc.replace(_f32_moe_cfg(4).llm, moe_impl="ragged",
                         moe_kernel="pallas")
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(2, 8, cfg.hidden_size)),
                        jnp.float32)
        dense = MLP(dc.replace(cfg, moe_experts=0))
        dp = dense.init(jax.random.key(0), x)
        y_dense = dense.apply(dp, x)
        e, d_, f = cfg.moe_experts, cfg.hidden_size, cfg.ffn_size
        k = dp["params"]
        mp = {"params": {
            "router": jnp.zeros((d_, e), jnp.float32),
            "wi_gate": jnp.broadcast_to(k["gate"]["kernel"], (e, d_, f)),
            "wi_up": jnp.broadcast_to(k["up"]["kernel"], (e, d_, f)),
            "wo": jnp.broadcast_to(k["down"]["kernel"], (e, f, d_)),
        }}
        y_moe = MoEMLP(cfg).apply(mp, x)
        np.testing.assert_allclose(np.asarray(y_moe), np.asarray(y_dense),
                                   atol=1e-5, rtol=1e-5)
