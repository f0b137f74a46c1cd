"""LoRA adapter tests (parallel/lora.py): zero-init equivalence, pruned
adapter tree shapes, adapter-only training on the pjit mesh step, and
merged export. (Reference anchor: /root/reference/README.md:199 — the
main-paper runs train InternVL-2 with LoRA; this is the TPU-native
equivalent.)"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from conftest import requires_cpu_mesh
from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.parallel.lora import (
    LoRAConfig,
    init_lora,
    lora_param_count,
    lora_shardings,
    make_lora_train_step,
    merge_lora,
)


def _setup(batch=2, seq_len=32):
    cfg = M.tiny_config()
    model = M.MultiFrameMLLM(cfg)
    b = M.make_example_batch(cfg, batch=batch, n_tiles=1, seq_len=seq_len)
    params = model.init(jax.random.key(0), b["input_ids"], b["tiles"])
    b["labels"] = np.asarray(b["input_ids"]).copy()
    b["labels"] = jnp.asarray(b["labels"])
    return cfg, model, params, b


class TestLoRAStructure:
    def test_zero_init_is_identity(self):
        """B starts at zero: merged params are BIT-IDENTICAL to the base
        (the standard LoRA guarantee), so the adapted model's forward is
        the base forward at step 0."""
        cfg, model, params, b = _setup()
        lcfg = LoRAConfig(rank=4)
        lora = init_lora(params, lcfg, jax.random.key(1))
        merged = merge_lora(params, lora, lcfg)
        for (pa, la), (pb, lb) in zip(
                jax.tree_util.tree_flatten_with_path(params)[0],
                jax.tree_util.tree_flatten_with_path(merged)[0]):
            assert pa == pb
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    def test_adapter_tree_shapes(self):
        cfg, model, params, b = _setup()
        lcfg = LoRAConfig(rank=4, targets=("wq", "wo"))
        lora = init_lora(params, lcfg, jax.random.key(1))
        flat = jax.tree_util.tree_flatten_with_path(lora)[0]
        names = {tuple(str(getattr(k, "key", k)) for k in path)
                 for path, _ in flat}
        # every LLM layer contributes wq and wo adapters, nothing else
        assert all(any(n in ("wq", "wo") for n in path) for path in names)
        hidden = cfg.llm.hidden_size
        hd = cfg.llm.head_dim
        for path, leaf in flat:
            keys = [str(getattr(k, "key", k)) for k in path]
            if "wq" in keys and keys[-1] == "a":
                assert leaf.shape == (hidden, 4)
            if "wq" in keys and keys[-1] == "b":
                assert leaf.shape == (4, cfg.llm.num_heads * hd)
            if "wo" in keys and keys[-1] == "a":
                assert leaf.shape == (cfg.llm.num_heads * hd, 4)
            if "wo" in keys and keys[-1] == "b":
                assert leaf.shape == (4, hidden)

    def test_adapters_are_small(self):
        cfg, model, params, b = _setup()
        lora = init_lora(params, LoRAConfig(rank=4), jax.random.key(1))
        base_n = sum(int(np.prod(x.shape))
                     for x in jax.tree_util.tree_leaves(params))
        assert lora_param_count(lora) < base_n // 10

    def test_nonzero_b_changes_only_targets(self):
        """A random-B merge changes exactly the targeted kernels."""
        cfg, model, params, b = _setup()
        lcfg = LoRAConfig(rank=4, targets=("wq",))
        lora = init_lora(params, lcfg, jax.random.key(1))
        lora = jax.tree_util.tree_map(
            lambda x: x + 0.1 if x.shape[0] == lcfg.rank else x, lora)
        merged = merge_lora(params, lora, lcfg)
        for (path, base_leaf), (_, m_leaf) in zip(
                jax.tree_util.tree_flatten_with_path(params)[0],
                jax.tree_util.tree_flatten_with_path(merged)[0]):
            keys = [str(getattr(k, "key", k)) for k in path]
            changed = not np.array_equal(np.asarray(base_leaf),
                                         np.asarray(m_leaf))
            assert changed == ("wq" in keys and keys[-1] == "kernel"), keys


@requires_cpu_mesh
class TestLoRATraining:
    def test_adapter_only_training_reduces_loss(self):
        from multi_spatialmllm_tpu.parallel.mesh import make_mesh

        cfg, model, params, batch = _setup(batch=4)
        mesh = make_mesh(n_data=4, n_model=2)
        lcfg = LoRAConfig(rank=4)
        lora = init_lora(params, lcfg, jax.random.key(1))
        lora = jax.tree_util.tree_map(jax.device_put, lora,
                                      lora_shardings(lora, mesh))
        tx = optax.adam(1e-2)
        opt_state = tx.init(lora)
        step = make_lora_train_step(model, tx, mesh, lcfg)
        base_flat = [np.asarray(x)
                     for x in jax.tree_util.tree_leaves(params)]
        losses = []
        for _ in range(5):
            lora, opt_state, metrics = step(lora, opt_state, params, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0], losses
        # frozen base untouched by adapter training
        for before, after in zip(base_flat,
                                 jax.tree_util.tree_leaves(params)):
            np.testing.assert_array_equal(before, np.asarray(after))
        # merged export runs as a plain model
        merged = merge_lora(params, lora, lcfg)
        logits = model.apply(merged, batch["input_ids"], batch["tiles"])
        assert np.isfinite(np.asarray(logits).astype(np.float32)).all()
