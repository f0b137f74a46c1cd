"""HF InternVL-2 checkpoint mapping: shape/structure parity with
model.init, algebraic correctness of every layout translation, layer-scale
folding equivalence, round-trip, and safetensors file streaming."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_spatialmllm_tpu.models import checkpoint_import as CI
from multi_spatialmllm_tpu.models import mllm as M


@pytest.fixture(scope="module")
def tiny():
    cfg = M.tiny_config()
    state = CI.make_fixture_state_dict(cfg, seed=3)
    params = CI.convert_state_dict(state, cfg)
    return {"cfg": cfg, "state": state, "params": params}


class TestStructure:
    def test_matches_model_init_tree(self, tiny):
        cfg = tiny["cfg"]
        model = M.MultiFrameMLLM(cfg)
        batch = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=32)
        ref = model.init(jax.random.key(0), batch["input_ids"],
                         batch["tiles"])
        ref_flat = {"/".join(str(k.key) for k in path): leaf.shape
                    for path, leaf in
                    jax.tree_util.tree_flatten_with_path(ref)[0]}
        got_flat = {"/".join(str(k.key) for k in path): leaf.shape
                    for path, leaf in
                    jax.tree_util.tree_flatten_with_path(tiny["params"])[0]}
        assert ref_flat == got_flat

    def test_forward_runs_with_imported_params(self, tiny):
        cfg = tiny["cfg"]
        model = M.MultiFrameMLLM(cfg)
        batch = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=32)
        logits = model.apply(tiny["params"], batch["input_ids"],
                             batch["tiles"])
        assert logits.shape == (1, 32, cfg.llm.vocab_size)
        assert bool(jnp.isfinite(logits.astype(jnp.float32)).all())


class TestLayoutAlgebra:
    """Each reshape/transpose checked against torch-Linear semantics
    (y = x @ W.T + b) in plain NumPy."""

    def test_vit_qkv_packing(self, tiny):
        cfg, st, p = tiny["cfg"], tiny["state"], tiny["params"]
        D, H = cfg.vit.hidden_size, cfg.vit.num_heads
        hd = D // H
        W = st["vision_model.encoder.layers.0.attn.qkv.weight"]
        b = st["vision_model.encoder.layers.0.attn.qkv.bias"]
        x = np.random.default_rng(0).standard_normal((5, D)).astype(
            np.float32)
        torch_qkv = x @ W.T + b                       # [5, 3D]
        kern = np.asarray(p["params"]["vision"]["block_0"]["qkv"]["kernel"])
        bias = np.asarray(p["params"]["vision"]["block_0"]["qkv"]["bias"])
        ours = np.einsum("nd,dchk->nchk", x, kern) + bias  # [5, 3, H, hd]
        np.testing.assert_allclose(
            ours.reshape(5, 3 * D), torch_qkv, atol=1e-4)

    def test_layer_scale_folding_exact(self, tiny):
        cfg, st, p = tiny["cfg"], tiny["state"], tiny["params"]
        D, H = cfg.vit.hidden_size, cfg.vit.num_heads
        hd = D // H
        lp = "vision_model.encoder.layers.0."
        attn = np.random.default_rng(1).standard_normal(
            (3, H, hd)).astype(np.float32)
        # torch semantics: ls1 * (attn_flat @ proj.weight.T + proj.bias)
        torch_out = st[lp + "ls1"] * (
            attn.reshape(3, D) @ st[lp + "attn.proj.weight"].T
            + st[lp + "attn.proj.bias"])
        kern = np.asarray(p["params"]["vision"]["block_0"]["proj"]["kernel"])
        bias = np.asarray(p["params"]["vision"]["block_0"]["proj"]["bias"])
        ours = np.einsum("nhk,hkd->nd", attn, kern) + bias
        np.testing.assert_allclose(ours, torch_out, atol=1e-4)

    def test_internlm2_wqkv_unpacking(self, tiny):
        cfg, st, p = tiny["cfg"], tiny["state"], tiny["params"]
        lc = cfg.llm
        rep = lc.num_heads // lc.num_kv_heads
        W = st["language_model.model.layers.0.attention.wqkv.weight"]
        x = np.random.default_rng(2).standard_normal(
            (4, lc.hidden_size)).astype(np.float32)
        packed = (x @ W.T).reshape(4, lc.num_kv_heads, rep + 2, lc.head_dim)
        llm = p["params"]["llm"]["layer_0"]["attn"]
        q = np.einsum("nd,dhk->nhk", x, np.asarray(llm["wq"]["kernel"]))
        k = np.einsum("nd,dhk->nhk", x, np.asarray(llm["wk"]["kernel"]))
        v = np.einsum("nd,dhk->nhk", x, np.asarray(llm["wv"]["kernel"]))
        np.testing.assert_allclose(
            q, packed[:, :, :rep].reshape(4, lc.num_heads, lc.head_dim),
            atol=1e-4)
        np.testing.assert_allclose(k, packed[:, :, rep], atol=1e-4)
        np.testing.assert_allclose(v, packed[:, :, rep + 1], atol=1e-4)

    def test_lm_head_and_embed(self, tiny):
        st, p = tiny["state"], tiny["params"]
        np.testing.assert_array_equal(
            np.asarray(p["params"]["llm"]["embed"]["embedding"]),
            st["language_model.model.tok_embeddings.weight"])
        np.testing.assert_allclose(
            np.asarray(p["params"]["llm"]["lm_head"]["kernel"]),
            st["language_model.output.weight"].T, atol=0)


class TestRoundTrip:
    def test_export_inverts_convert(self):
        cfg = M.tiny_config()
        # without layer scales the mapping is exactly invertible
        state = CI.make_fixture_state_dict(cfg, seed=7,
                                           with_layer_scale=False)
        params = CI.convert_state_dict(state, cfg)
        back = CI.export_state_dict(params, cfg)
        assert set(back) == set(state)
        for key in state:
            np.testing.assert_allclose(back[key], state[key], atol=1e-6,
                                       err_msg=key)

    def test_folded_layer_scale_function_preserved(self):
        """With layer scales, convert->export loses ls as separate tensors
        but the exported proj/fc2 weights are the folded ones, so the
        function is unchanged."""
        cfg = M.tiny_config()
        state = CI.make_fixture_state_dict(cfg, seed=8)
        params = CI.convert_state_dict(state, cfg)
        back = CI.export_state_dict(params, cfg)
        lp = "vision_model.encoder.layers.0."
        np.testing.assert_allclose(
            back[lp + "attn.proj.weight"],
            state[lp + "ls1"][:, None] * state[lp + "attn.proj.weight"],
            atol=1e-5)


class TestSafetensorsIO:
    def test_load_from_file_and_shards(self, tiny, tmp_path):
        from safetensors.numpy import save_file

        cfg, state = tiny["cfg"], tiny["state"]
        one = str(tmp_path / "model.safetensors")
        save_file(state, one)
        params = CI.load_internvl2_checkpoint(one, cfg)
        for (pa, la), (pb, lb) in zip(
                jax.tree_util.tree_flatten_with_path(params)[0],
                jax.tree_util.tree_flatten_with_path(tiny["params"])[0]):
            assert pa == pb
            np.testing.assert_allclose(la, lb, atol=1e-6)

        # sharded layout in a directory
        keys = sorted(state)
        half = len(keys) // 2
        d = tmp_path / "shards"
        d.mkdir()
        save_file({k: state[k] for k in keys[:half]},
                  str(d / "model-00001-of-00002.safetensors"))
        save_file({k: state[k] for k in keys[half:]},
                  str(d / "model-00002-of-00002.safetensors"))
        params2 = CI.load_internvl2_checkpoint(str(d), cfg)
        for la, lb in zip(jax.tree_util.tree_leaves(params2),
                          jax.tree_util.tree_leaves(params)):
            np.testing.assert_allclose(la, lb, atol=0)


class TestExportCLI:
    def test_export_subcommand_round_trips(self, tiny, tmp_path,
                                           monkeypatch, capsys):
        """orbax -> `export-checkpoint` -> safetensors dir ->
        load_internvl2_checkpoint == the original params (f32 exact),
        for both save layouts (import bare vars / train wrapped), with
        forced multi-shard output + HF index."""
        import json
        import os
        import sys

        from multi_spatialmllm_tpu.__main__ import main
        from multi_spatialmllm_tpu.parallel.train import save_checkpoint

        cfg, params = tiny["cfg"], tiny["params"]

        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(str(tmp_path / "bare"), params)   # import-CLI layout
        ckptr.wait_until_finished()
        save_checkpoint(str(tmp_path / "wrapped"), params, step=7)

        for src in ("bare", "wrapped"):
            out = tmp_path / f"hf_{src}"
            monkeypatch.setattr(sys, "argv", [
                "prog", "export-checkpoint",
                "--checkpoint", str(tmp_path / src),
                "--output", str(out), "--config", "tiny",
                "--dtype", "float32", "--shard-gb", "0.0005"])
            main()
            report = json.loads(
                capsys.readouterr().out.strip().splitlines()[-1])
            assert report["shards"] > 1       # tiny budget forces shards
            assert os.path.exists(out / "model.safetensors.index.json")
            back = CI.load_internvl2_checkpoint(str(out), cfg)
            for (pa, la), (pb, lb) in zip(
                    jax.tree_util.tree_flatten_with_path(back)[0],
                    jax.tree_util.tree_flatten_with_path(params)[0]):
                assert pa == pb
                np.testing.assert_array_equal(np.asarray(la),
                                              np.asarray(lb))

    def test_export_rejects_moe_checkpoints(self, tmp_path, monkeypatch):
        """HF InternVL-2 has no routed-expert layout: exporting a tree
        whose decoder layers carry a 'moe' module must exit with a
        clear message, not a KeyError deep inside export_state_dict."""
        import dataclasses
        import sys

        import orbax.checkpoint as ocp

        from multi_spatialmllm_tpu.__main__ import main

        cfg = M.tiny_config()
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, moe_experts=2,
                                         ffn_size=cfg.llm.ffn_size // 2))
        model = M.MultiFrameMLLM(cfg)
        b, t = 1, 8
        variables = model.init(
            jax.random.key(0),
            jnp.zeros((b, t), jnp.int32),
            jnp.zeros((b, 1, cfg.vit.image_size, cfg.vit.image_size, 3),
                      jnp.float32),
            jnp.zeros((b, 1), jnp.int32))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(str(tmp_path / "moe_ckpt"), variables)
        ckptr.wait_until_finished()

        monkeypatch.setattr(sys, "argv", [
            "prog", "export-checkpoint",
            "--checkpoint", str(tmp_path / "moe_ckpt"),
            "--output", str(tmp_path / "hf"), "--config", "tiny",
            "--dtype", "float32"])
        with pytest.raises(SystemExit, match="routed-MoE"):
            main()
