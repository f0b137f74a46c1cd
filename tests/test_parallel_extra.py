"""FSDP sharding + checkpointing tests on the virtual CPU mesh."""

import jax
import numpy as np
import pytest

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.parallel.mesh import make_mesh
from multi_spatialmllm_tpu.parallel.sharding import params_shardings
from multi_spatialmllm_tpu.parallel.train import (
    TrainConfig,
    init_train_state,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
)

needs_mesh = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 devices (run scripts/test.sh)")


@needs_mesh
class TestFSDP:
    def test_fsdp_specs_add_data_axis(self):
        mesh = make_mesh(n_data=4, n_model=2)
        cfg = M.tiny_config()
        batch = M.make_example_batch(cfg, batch=4, n_tiles=1, seq_len=32)
        model = M.MultiFrameMLLM(cfg)
        params = model.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])
        plain = params_shardings(params, mesh, fsdp=False)
        full = params_shardings(params, mesh, fsdp=True, fsdp_min_size=1024)
        plain_specs = [str(s.spec) for s in jax.tree_util.tree_leaves(plain)]
        full_specs = [str(s.spec) for s in jax.tree_util.tree_leaves(full)]
        assert any("data" in s for s in full_specs)
        assert not any("data" in s for s in plain_specs)
        # model-axis TP assignments are preserved under fsdp
        n_model_plain = sum("model" in s for s in plain_specs)
        n_model_full = sum("model" in s for s in full_specs)
        assert n_model_full >= n_model_plain

    def test_fsdp_train_step_runs_and_learns(self):
        mesh = make_mesh(n_data=4, n_model=2)
        cfg = M.tiny_config()
        batch = M.make_example_batch(cfg, batch=4, n_tiles=1, seq_len=32)
        model, params, opt_state, tx = init_train_state(
            cfg, TrainConfig(learning_rate=1e-3, warmup_steps=1, fsdp=True),
            batch, mesh)
        step = make_train_step(model, tx, mesh)
        losses = []
        for _ in range(4):
            params, opt_state, metrics = step(params, opt_state, batch)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]


@needs_mesh
class TestSequenceParallelTraining:
    """Optional "seq" mesh axis: the decoder's training attention runs
    through ops/ring_attention (kv rotating over the ring) while the rest
    of the step is the ordinary pjit program. Loss and gradients must
    match the single-device step (VERDICT r2 #6: sequence parallelism
    wired into training, not a standalone demo)."""

    def test_seq_parallel_step_matches_single_device(self):
        import dataclasses as dc

        base = M.tiny_config()
        # f32 compute: the bf16 default would add ~3e-4 accumulation-
        # order noise (ring online softmax vs one-shot softmax) on top
        # of the layout difference under test
        cfg = M.MLLMConfig(
            vit=dc.replace(base.vit, dtype="float32"),
            llm=dc.replace(base.llm, dtype="float32"))
        batch = M.make_example_batch(cfg, batch=2, n_tiles=1, seq_len=64)

        mesh_sp = make_mesh(n_data=2, n_model=1, n_seq=4)
        model, p_sp, opt_sp, tx = init_train_state(
            cfg, TrainConfig(learning_rate=1e-3, warmup_steps=1), batch,
            mesh_sp)
        step_sp = make_train_step(model, tx, mesh_sp)
        p_sp, opt_sp, m_sp = step_sp(p_sp, opt_sp, batch)

        mesh_1 = make_mesh(n_data=1, n_model=1,
                           devices=jax.devices()[:1])
        model, p_1, opt_1, tx1 = init_train_state(
            cfg, TrainConfig(learning_rate=1e-3, warmup_steps=1), batch,
            mesh_1)
        step_1 = make_train_step(model, tx1, mesh_1)
        p_1, opt_1, m_1 = step_1(p_1, opt_1, batch)

        np.testing.assert_allclose(float(m_sp["loss"]), float(m_1["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m_sp["grad_norm"]),
                                   float(m_1["grad_norm"]), rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p_sp),
                        jax.tree_util.tree_leaves(p_1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-6, rtol=1e-5)

    def test_seq_axis_composes_with_tensor_parallel(self):
        cfg = M.tiny_config()
        batch = M.make_example_batch(cfg, batch=2, n_tiles=1, seq_len=32)
        mesh = make_mesh(n_data=2, n_model=2, n_seq=2)
        model, params, opt_state, tx = init_train_state(
            cfg, TrainConfig(learning_rate=1e-3, warmup_steps=1), batch,
            mesh)
        step = make_train_step(model, tx, mesh)
        losses = []
        for _ in range(3):
            params, opt_state, metrics = step(params, opt_state, batch)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]


@needs_mesh
class TestGradAccumulation:
    def test_accum_equals_single_pass(self):
        """accum_steps=2 over one batch produces the same loss and
        post-update params as the single-pass step up to float
        reassociation (the accumulation sums unnormalized nll/grads and
        divides by the global token count once — NOT a
        mean-of-microbatch-means, which would diverge whenever
        microbatches carry different unmasked-token counts)."""
        mesh = make_mesh(n_data=4, n_model=2)
        cfg = M.tiny_config()
        batch = M.make_example_batch(cfg, batch=8, n_tiles=1, seq_len=32)
        model, params, opt_state, tx = init_train_state(
            cfg, TrainConfig(learning_rate=1e-3, warmup_steps=1), batch,
            mesh)
        step1 = make_train_step(model, tx, mesh)
        step2 = make_train_step(model, tx, mesh, accum_steps=2)
        # the step donates params/opt_state: snapshot for the second run
        snap_p = jax.tree_util.tree_map(np.asarray, params)
        snap_o = jax.tree_util.tree_map(np.asarray, opt_state)
        p1, o1, m1 = step1(params, opt_state, batch)
        params2 = jax.tree_util.tree_map(jax.numpy.asarray, snap_p)
        opt2 = jax.tree_util.tree_map(jax.numpy.asarray, snap_o)
        p2, o2, m2 = step2(params2, opt2, batch)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-4)
        np.testing.assert_allclose(float(m1["grad_norm"]),
                                   float(m2["grad_norm"]), rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(p1),
                        jax.tree_util.tree_leaves(p2)):
            np.testing.assert_allclose(
                np.asarray(a, dtype=np.float32),
                np.asarray(b, dtype=np.float32), atol=1e-5)

    def test_accum_learns(self):
        mesh = make_mesh(n_data=4, n_model=2)
        cfg = M.tiny_config()
        batch = M.make_example_batch(cfg, batch=4, n_tiles=1, seq_len=32)
        model, params, opt_state, tx = init_train_state(
            cfg, TrainConfig(learning_rate=1e-3, warmup_steps=1), batch,
            mesh)
        step = make_train_step(model, tx, mesh, accum_steps=4)
        losses = []
        for _ in range(3):
            params, opt_state, metrics = step(params, opt_state, batch)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(l) for l in losses)
        assert losses[-1] < losses[0]


@needs_mesh
class TestCheckpoint:
    def test_save_restore_roundtrip(self, tmp_path):
        mesh = make_mesh(n_data=8, n_model=1)
        cfg = M.tiny_config()
        batch = M.make_example_batch(cfg, batch=8, n_tiles=1, seq_len=32)
        model, params, opt_state, tx = init_train_state(
            cfg, TrainConfig(), batch, mesh)
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, params, step=7)
        restored = restore_checkpoint(path, like={"params": params, "step": 7})
        assert restored["step"] == 7
        orig = jax.tree_util.tree_leaves(params)
        back = jax.tree_util.tree_leaves(restored["params"])
        for a, b in zip(orig, back):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
