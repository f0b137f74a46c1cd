"""Pipeline-parallel forward vs sequential execution on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_spatialmllm_tpu.parallel.pipeline_parallel import (
    make_pipe_mesh,
    pipeline_forward,
    stack_stage_params,
)

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (run scripts/test.sh)")


def _mlp_layer(params, x):
    """Simple residual MLP block as the pipelined unit."""
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return x + h @ params["w2"]


def _make_layers(n_layers, d, key):
    layers = []
    for i in range(n_layers):
        k1, k2, key = jax.random.split(jax.random.fold_in(key, i), 3)
        layers.append({
            "w1": jax.random.normal(k1, (d, 2 * d)) * 0.1,
            "b1": jnp.zeros((2 * d,)),
            "w2": jax.random.normal(k2, (2 * d, d)) * 0.1,
        })
    return layers


@needs_mesh
class TestPipelineParallel:
    @pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 4), (8, 3)])
    def test_matches_sequential(self, n_stages, n_micro):
        d = 16
        n_layers = 8
        layers = _make_layers(n_layers, d, jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (n_micro, 2, d))

        # sequential oracle
        expect = x
        for layer in layers:
            expect = jax.vmap(lambda xb: _mlp_layer(layer, xb))(expect)

        mesh = make_pipe_mesh(n_stages)
        stacked = stack_stage_params(layers, n_stages)
        got = pipeline_forward(stacked, x, mesh, _mlp_layer)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   atol=1e-5)

    def test_jit_compatible(self):
        d, n_layers, n_stages = 8, 4, 4
        layers = _make_layers(n_layers, d, jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (2, 2, d))
        mesh = make_pipe_mesh(n_stages)
        stacked = stack_stage_params(layers, n_stages)
        fn = jax.jit(
            lambda p, x_: pipeline_forward(p, x_, mesh, _mlp_layer))
        out = fn(stacked, x)
        expect = x
        for layer in layers:
            expect = jax.vmap(lambda xb: _mlp_layer(layer, xb))(expect)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                                   atol=1e-5)


@needs_mesh
class TestPipeline1F1B:
    @pytest.mark.parametrize("n_stages,n_micro", [(2, 4), (4, 6), (8, 3)])
    def test_loss_and_grads_match_single_device(self, n_stages, n_micro):
        """1F1B training step vs the unpipelined oracle: identical loss
        and parameter gradients (grads compared in stage layout)."""
        from multi_spatialmllm_tpu.parallel.pipeline_parallel import (
            pipeline_train_grads,
        )

        d, mb = 16, 2
        n_layers = 8
        layers = _make_layers(n_layers, d, jax.random.key(0))
        x = jax.random.normal(jax.random.key(1), (n_micro, mb, d))
        y = jax.random.normal(jax.random.key(2), (n_micro, mb, d))

        def loss_fn(out, tgt):
            return jnp.mean((out - tgt) ** 2)

        # oracle: mean microbatch loss through the full stack
        def oracle_loss(stacked_flat):
            def full(xb):
                h = xb
                for i in range(n_layers):
                    p = jax.tree_util.tree_map(lambda l: l[i], stacked_flat)
                    h = _mlp_layer(p, h)
                return h
            losses = jax.vmap(lambda xm, ym: loss_fn(full(xm), ym))(x, y)
            return jnp.mean(losses)

        flat_layers = jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *layers)  # [L, ...]
        want_loss, want_grads = jax.value_and_grad(oracle_loss)(flat_layers)

        mesh = make_pipe_mesh(n_stages)
        stacked = stack_stage_params(layers, n_stages)
        got_loss, got_grads = jax.jit(
            lambda p, x_, y_: pipeline_train_grads(
                p, x_, y_, mesh, _mlp_layer, loss_fn))(stacked, x, y)

        np.testing.assert_allclose(float(got_loss), float(want_loss),
                                   rtol=1e-5)
        # reshape oracle grads [L, ...] -> [P, L/P, ...] stage layout
        per_stage = n_layers // n_stages
        want_staged = jax.tree_util.tree_map(
            lambda l: l.reshape((n_stages, per_stage) + l.shape[1:]),
            want_grads)
        for got, want in zip(jax.tree_util.tree_leaves(got_grads),
                             jax.tree_util.tree_leaves(want_staged)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=1e-5)


@needs_mesh
class TestPipeline1F1BDecoder:
    def test_decoder_stack_training_matches_single_device(self):
        """1F1B training through the REAL DecoderLayer stack (RoPE/GQA/
        SwiGLU): loss and grads equal the unpipelined oracle."""
        from multi_spatialmllm_tpu.models.llm import DecoderLayer, LLMConfig
        from multi_spatialmllm_tpu.parallel.pipeline_parallel import (
            pipeline_train_grads,
        )

        cfg = LLMConfig(vocab_size=64, hidden_size=32, num_layers=8,
                        num_heads=4, num_kv_heads=2, ffn_size=64,
                        dtype="float32")
        layer = DecoderLayer(cfg)
        b, t, n_micro = 2, 8, 4
        x0 = jax.random.normal(jax.random.key(0),
                               (n_micro, b, t, cfg.hidden_size))
        y0 = jax.random.normal(jax.random.key(1),
                               (n_micro, b, t, cfg.hidden_size))
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        layer_params = [
            layer.init(jax.random.key(100 + i),
                       x0[0], positions)["params"]
            for i in range(cfg.num_layers)
        ]

        def apply_layer(params, x):
            out, _ = layer.apply({"params": params}, x, positions)
            return out

        def loss_fn(out, tgt):
            return jnp.mean((out - tgt) ** 2)

        def oracle(stacked_flat):
            def full(xm):
                h = xm
                for i in range(cfg.num_layers):
                    p = jax.tree_util.tree_map(lambda l: l[i], stacked_flat)
                    h = apply_layer(p, h)
                return h
            losses = jax.vmap(
                lambda xm, ym: loss_fn(full(xm), ym))(x0, y0)
            return jnp.mean(losses)

        flat = jax.tree_util.tree_map(
            lambda *ls: jnp.stack(ls), *layer_params)
        want_loss, want_grads = jax.value_and_grad(oracle)(flat)

        mesh = make_pipe_mesh(4)
        stacked = stack_stage_params(layer_params, 4)
        got_loss, got_grads = jax.jit(
            lambda p, x_, y_: pipeline_train_grads(
                p, x_, y_, mesh, apply_layer, loss_fn))(stacked, x0, y0)
        np.testing.assert_allclose(float(got_loss), float(want_loss),
                                   rtol=1e-5)
        per_stage = cfg.num_layers // 4
        want_staged = jax.tree_util.tree_map(
            lambda l: l.reshape((4, per_stage) + l.shape[1:]), want_grads)
        for got, want in zip(jax.tree_util.tree_leaves(got_grads),
                             jax.tree_util.tree_leaves(want_staged)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       atol=2e-5)


@needs_mesh
class TestPipelinedDecoder:
    def test_real_decoder_layers_match_sequential(self):
        """Pipeline the actual DecoderLayer stack across 4 stages."""
        from multi_spatialmllm_tpu.models.llm import DecoderLayer, LLMConfig

        cfg = LLMConfig(vocab_size=64, hidden_size=32, num_layers=8,
                        num_heads=4, num_kv_heads=2, ffn_size=64,
                        dtype="float32")
        layer = DecoderLayer(cfg)
        b, t = 2, 8
        x0 = jax.random.normal(jax.random.key(0), (b, t, cfg.hidden_size))
        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        layer_params = []
        for i in range(cfg.num_layers):
            p = layer.init(jax.random.key(100 + i), x0, positions)
            layer_params.append(p["params"])

        def apply_layer(params, x):
            out, _ = layer.apply({"params": params}, x, positions)
            return out

        expect = x0
        for p in layer_params:
            expect = apply_layer(p, expect)

        mesh = make_pipe_mesh(4)
        stacked = stack_stage_params(layer_params, 4)
        got = pipeline_forward(stacked, x0[None], mesh, apply_layer)[0]
        np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                                   atol=1e-4)


@needs_mesh
class TestMLLMPipelineTraining:
    def test_full_model_grads_match_single_device(self):
        """The FULL MLLM (vision + projector + embed + pipelined decoder
        stack + head) trained through the pipe axis: loss and every
        parameter gradient equal the single-device loss_fn grads."""
        from multi_spatialmllm_tpu.models import mllm as M
        from multi_spatialmllm_tpu.models.llm import LLMConfig
        from multi_spatialmllm_tpu.models.mllm import loss_fn
        from multi_spatialmllm_tpu.models.vit import ViTConfig
        from multi_spatialmllm_tpu.parallel.pipeline_mllm import (
            mllm_pipeline_loss_and_grads,
            split_params,
        )
        from multi_spatialmllm_tpu.parallel.pipeline_parallel import (
            make_pipe_mesh,
        )

        cfg = M.MLLMConfig(
            vit=ViTConfig(image_size=56, patch_size=14, hidden_size=32,
                          num_layers=1, num_heads=2, dtype="float32"),
            llm=LLMConfig(vocab_size=128, hidden_size=32, num_layers=8,
                          num_heads=4, num_kv_heads=2, ffn_size=64,
                          dtype="float32"),
        )
        model = M.MultiFrameMLLM(cfg)
        n_micro, mb = 4, 2
        batch = M.make_example_batch(cfg, batch=n_micro * mb, n_tiles=1,
                                     seq_len=32)
        params = model.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])

        want_loss, want_grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch))(params)

        mesh = make_pipe_mesh(4)
        got_loss, (pre_g, stage_g, head_g) = jax.jit(
            lambda p, b: mllm_pipeline_loss_and_grads(
                model, p, b, mesh, n_micro),
            static_argnames=())(params, batch)

        # equal supervised-token counts per microbatch (make_example_batch
        # masks the same IMG_CONTEXT layout in every row), so the
        # per-microbatch mean equals the global masked mean
        np.testing.assert_allclose(float(got_loss), float(want_loss),
                                   rtol=1e-5)
        want_pre, want_stage, want_head = split_params(want_grads, cfg, 4)
        for name, got, want in (("pre", pre_g, want_pre),
                                ("stage", stage_g, want_stage),
                                ("head", head_g, want_head)):
            for gl, wl in zip(jax.tree_util.tree_leaves(got),
                              jax.tree_util.tree_leaves(want)):
                np.testing.assert_allclose(
                    np.asarray(gl), np.asarray(wl), atol=3e-5,
                    err_msg=name)

    @pytest.mark.parametrize("n_data,n_model,n_pipe",
                             [(1, 2, 4), (2, 2, 2)])
    def test_tensor_parallel_stages_match_single_device(
            self, n_data, n_model, n_pipe):
        """(data x model x pipe) MLLM pipeline step — decoder head/ffn
        dims sharded over "model" with explicit Megatron f/g collectives
        (tp_decoder_layer) — loss and EVERY parameter gradient equal the
        single-device loss_fn grads (ROADMAP gap #5)."""
        from multi_spatialmllm_tpu.models import mllm as M
        from multi_spatialmllm_tpu.models.llm import LLMConfig
        from multi_spatialmllm_tpu.models.mllm import loss_fn
        from multi_spatialmllm_tpu.models.vit import ViTConfig
        from multi_spatialmllm_tpu.parallel.pipeline_mllm import (
            mllm_pipeline_loss_and_grads,
            split_params,
        )
        from multi_spatialmllm_tpu.parallel.pipeline_parallel import (
            make_pipe_mesh,
        )

        cfg = M.MLLMConfig(
            vit=ViTConfig(image_size=56, patch_size=14, hidden_size=32,
                          num_layers=1, num_heads=2, dtype="float32"),
            llm=LLMConfig(vocab_size=128, hidden_size=32,
                          num_layers=n_pipe, num_heads=4, num_kv_heads=2,
                          ffn_size=64, dtype="float32"),
        )
        model = M.MultiFrameMLLM(cfg)
        n_micro, mb = 4, 2
        batch = M.make_example_batch(cfg, batch=n_micro * mb, n_tiles=1,
                                     seq_len=32)
        params = model.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])

        want_loss, want_grads = jax.value_and_grad(
            lambda p: loss_fn(model, p, batch))(params)

        mesh = make_pipe_mesh(n_pipe, n_data=n_data, n_model=n_model)
        got_loss, (pre_g, stage_g, head_g) = jax.jit(
            lambda p, b: mllm_pipeline_loss_and_grads(
                model, p, b, mesh, n_micro))(params, batch)

        np.testing.assert_allclose(float(got_loss), float(want_loss),
                                   rtol=1e-5)
        want_pre, want_stage, want_head = split_params(
            want_grads, cfg, n_pipe)
        for name, got, want in (("pre", pre_g, want_pre),
                                ("stage", stage_g, want_stage),
                                ("head", head_g, want_head)):
            for gl, wl in zip(jax.tree_util.tree_leaves(got),
                              jax.tree_util.tree_leaves(want)):
                np.testing.assert_allclose(
                    np.asarray(gl), np.asarray(wl), atol=3e-5,
                    err_msg=name)

    def test_combined_data_pipe_matches_pipe_only(self):
        """(data=2 x pipe=4) pipeline step: microbatch rows sharded over
        "data", grads pmean'd across replicas — loss and every grad equal
        the pipe-only run on the same batch."""
        from multi_spatialmllm_tpu.models import mllm as M
        from multi_spatialmllm_tpu.models.llm import LLMConfig
        from multi_spatialmllm_tpu.models.vit import ViTConfig
        from multi_spatialmllm_tpu.parallel.pipeline_mllm import (
            mllm_pipeline_loss_and_grads,
        )
        from multi_spatialmllm_tpu.parallel.pipeline_parallel import (
            make_pipe_mesh,
        )

        cfg = M.MLLMConfig(
            vit=ViTConfig(image_size=56, patch_size=14, hidden_size=32,
                          num_layers=1, num_heads=2, dtype="float32"),
            llm=LLMConfig(vocab_size=128, hidden_size=32, num_layers=4,
                          num_heads=4, num_kv_heads=2, ffn_size=64,
                          dtype="float32"),
        )
        model = M.MultiFrameMLLM(cfg)
        batch = M.make_example_batch(cfg, batch=8, n_tiles=1, seq_len=32)
        params = model.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])

        pipe_only = make_pipe_mesh(4, devices=jax.devices()[:4])
        want_loss, want_grads = jax.jit(
            lambda p, b: mllm_pipeline_loss_and_grads(
                model, p, b, pipe_only, 4))(params, batch)

        combined = make_pipe_mesh(4, n_data=2)
        got_loss, got_grads = jax.jit(
            lambda p, b: mllm_pipeline_loss_and_grads(
                model, p, b, combined, 4))(params, batch)

        np.testing.assert_allclose(float(got_loss), float(want_loss),
                                   rtol=1e-5)
        for gl, wl in zip(jax.tree_util.tree_leaves(got_grads),
                          jax.tree_util.tree_leaves(want_grads)):
            np.testing.assert_allclose(np.asarray(gl), np.asarray(wl),
                                       atol=3e-5)
