"""Data-mixture tests: meta parsing, deterministic epoch shuffles,
repeat_time ratios, root-resolved streaming, and the `train` CLI on a
real two-dataset mixture (the reference's mix3M.json surface,
/root/reference/README.md:199)."""

import json
import os

import numpy as np
import pytest

from multi_spatialmllm_tpu.models.mixture import (
    JsonlIndex,
    MixtureEntry,
    epoch_order,
    load_meta,
    mixture_batches,
    mixture_samples,
    mixture_stats,
)


def _write_jsonl(path, names):
    with open(path, "w") as f:
        for i, n in enumerate(names):
            rec = {"id": f"{n}{i}", "image": [f"{n}_{i}.jpg"],
                   "conversations": [
                       {"from": "human", "value": f"<image>\nwhere is {n}?"},
                       {"from": "gpt", "value": f"{n} at {i}"}]}
            f.write(json.dumps(rec) + "\n")
    return path


@pytest.fixture
def meta_dir(tmp_path):
    (tmp_path / "imgs_a").mkdir()
    (tmp_path / "imgs_b").mkdir()
    _write_jsonl(tmp_path / "a.jsonl", ["a"] * 8)
    _write_jsonl(tmp_path / "b.jsonl", ["b"] * 4)
    meta = {
        "spa_a": {"root": "imgs_a", "annotation": "a.jsonl",
                  "repeat_time": 1, "length": 8},
        "general_b": {"root": "imgs_b", "annotation": "b.jsonl",
                      "repeat_time": 2.5, "data_augment": False},
    }
    mp = tmp_path / "mix.json"
    mp.write_text(json.dumps(meta))
    return tmp_path, mp


class TestMeta:
    def test_load_resolves_and_orders(self, meta_dir):
        tmp, mp = meta_dir
        entries = load_meta(str(mp))
        assert [e.name for e in entries] == ["spa_a", "general_b"]
        assert entries[0].annotation == str(tmp / "a.jsonl")
        assert entries[1].root == str(tmp / "imgs_b")
        assert entries[1].repeat_time == 2.5

    def test_jsonl_index_random_access(self, meta_dir):
        tmp, _ = meta_dir
        ix = JsonlIndex(str(tmp / "a.jsonl"))
        assert len(ix) == 8
        assert ix[5]["id"] == "a5"
        assert ix[0]["id"] == "a0"          # backwards seek works

    def test_stats(self, meta_dir):
        _, mp = meta_dir
        st = mixture_stats(load_meta(str(mp)))
        assert st["rows"] == {"spa_a": 8, "general_b": 4}
        # 2.5 x 4 = 10 rows of b per epoch
        assert st["rows_per_epoch"] == {"spa_a": 8, "general_b": 10}
        assert st["epoch_size"] == 18


class TestEpochOrder:
    def _entries(self):
        return [MixtureEntry("x", "x.jsonl", repeat_time=1.0),
                MixtureEntry("y", "y.jsonl", repeat_time=2.5)]

    def test_deterministic_and_epoch_varying(self):
        e = self._entries()
        o1 = epoch_order([8, 4], e, seed=3, epoch=0)
        o2 = epoch_order([8, 4], e, seed=3, epoch=0)
        np.testing.assert_array_equal(o1, o2)
        o3 = epoch_order([8, 4], e, seed=3, epoch=1)
        assert not np.array_equal(o1, o3)
        o4 = epoch_order([8, 4], e, seed=4, epoch=0)
        assert not np.array_equal(o1, o4)

    def test_repeat_time_counts(self):
        e = self._entries()
        order = epoch_order([8, 4], e, seed=0, epoch=0)
        ds, counts = np.unique(order[:, 0], return_counts=True)
        assert dict(zip(ds.tolist(), counts.tolist())) == {0: 8, 1: 10}
        # full copies: every y row appears at least twice
        y_rows = order[order[:, 0] == 1][:, 1]
        _, per_row = np.unique(y_rows, return_counts=True)
        assert per_row.min() >= 2 and per_row.max() <= 3

    def test_fractional_subsample(self):
        e = [MixtureEntry("x", "x.jsonl", repeat_time=0.5)]
        order = epoch_order([8], e, seed=0, epoch=0)
        assert len(order) == 4
        assert len(set(order[:, 1].tolist())) == 4   # distinct rows


class TestStreaming:
    def test_roots_joined_and_tagged(self, meta_dir):
        tmp, mp = meta_dir
        entries = load_meta(str(mp))
        recs = list(mixture_samples(entries, seed=1, epochs=1))
        assert len(recs) == 18
        a = next(r for r in recs if r["_dataset"] == "spa_a")
        assert a["image"][0].startswith(str(tmp / "imgs_a"))
        names = {r["_dataset"] for r in recs}
        assert names == {"spa_a", "general_b"}

    def test_two_epochs_differ_but_replay_exactly(self, meta_dir):
        _, mp = meta_dir
        entries = load_meta(str(mp))
        two = [r["id"] for r in mixture_samples(entries, seed=7, epochs=2)]
        again = [r["id"] for r in mixture_samples(entries, seed=7,
                                                  epochs=2)]
        assert two == again
        assert two[:18] != two[18:]          # epoch shuffles differ

    def test_batches_assemble(self, meta_dir):
        import jax

        from multi_spatialmllm_tpu.models import mllm as M
        from multi_spatialmllm_tpu.models.data import DataConfig
        from multi_spatialmllm_tpu.models.preprocess import (
            PreprocessConfig,
        )
        from multi_spatialmllm_tpu.models.tokenizer import SpatialTokenizer

        tmp, mp = meta_dir
        entries = load_meta(str(mp))
        tok = SpatialTokenizer()
        cfg = M.tiny_config()
        import dataclasses

        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm,
                                         vocab_size=tok.vocab_size),
            img_context_id=tok.img_context_id)
        rng = np.random.default_rng(0)
        loader = lambda p: rng.integers(  # noqa: E731
            0, 255, (64, 96, 3), dtype=np.uint8)
        dc = DataConfig(max_seq_len=128, max_tiles=2,
                        preprocess=PreprocessConfig(
                            tile_size=cfg.vit.image_size, max_tiles=1,
                            resize_hw=None))
        bs = list(mixture_batches(entries, tok, cfg, loader, 4, dc,
                                  seed=0, epochs=1))
        assert len(bs) == 4                  # 18 samples // 4
        assert bs[0]["input_ids"].shape == (4, 128)
        packed = list(mixture_batches(entries, tok, cfg, loader, 2, dc,
                                      seed=0, epochs=1, packed=True))
        assert packed and "segment_ids" in packed[0]
        # packing reduces rows: fewer batches than padded at half size
        assert len(packed) <= len(bs) * 2


class TestTrainCLI:
    def test_train_subcommand_end_to_end(self, tmp_path, monkeypatch,
                                         capsys):
        """`python -m multi_spatialmllm_tpu train` over a real mixture:
        jsonl + ACTUAL image files, tiny config, 3 steps, orbax save,
        then 1 more step initialized from the save."""
        import cv2

        import multi_spatialmllm_tpu.__main__ as cli

        (tmp_path / "imgs").mkdir()
        rng = np.random.default_rng(3)
        recs = []
        for i in range(6):
            name = f"im{i}.jpg"
            cv2.imwrite(str(tmp_path / "imgs" / name),
                        rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
            recs.append({"id": f"s{i}", "image": [name],
                         "conversations": [
                             {"from": "human",
                              "value": "<image>\nhow far is the point?"},
                             {"from": "gpt", "value": f"{100 + i} mm"}]})
        with open(tmp_path / "train.jsonl", "w") as f:
            f.writelines(json.dumps(r) + "\n" for r in recs)
        meta = {"spa": {"root": "imgs", "annotation": "train.jsonl",
                        "repeat_time": 1}}
        (tmp_path / "mix.json").write_text(json.dumps(meta))

        out = tmp_path / "ckpt"
        argv = ["prog", "train", "--meta", str(tmp_path / "mix.json"),
                "--config", "tiny", "--steps", "3", "--batch-size", "2",
                "--seq-len", "128", "--max-tiles", "1",
                "--tiles-per-image", "1", "--warmup", "1",
                "--lr", "1e-3", "--log-every", "1",
                "--data-parallel", "2",
                "--vocab-size", "800", "--output", str(out)]
        monkeypatch.setattr("sys.argv", argv)
        cli.main()
        line = [l for l in capsys.readouterr().out.splitlines()
                if l.startswith("{")][-1]
        report = json.loads(line)
        assert report["steps"] == 3
        assert np.isfinite(report["last_loss"])
        assert os.path.isdir(out)

        # resume: one more step from the saved state
        argv_resume = argv[:1] + ["train", "--meta",
                                  str(tmp_path / "mix.json"),
                                  "--config", "tiny", "--steps", "4",
                                  "--batch-size", "2", "--seq-len", "128",
                                  "--max-tiles", "1",
                                  "--tiles-per-image", "1",
                                  "--warmup", "1", "--lr", "1e-3",
                                  "--log-every", "1",
                                  "--vocab-size", "800",
                                  "--data-parallel", "2",
                                  "--init-checkpoint", str(out),
                                  "--resume"]
        monkeypatch.setattr("sys.argv", argv_resume)
        cli.main()
        line = [l for l in capsys.readouterr().out.splitlines()
                if l.startswith("{")][-1]
        resumed = json.loads(line)
        assert resumed["steps"] == 1          # steps 3 -> 4

    def test_train_lora_mode(self, tmp_path, monkeypatch, capsys):
        import cv2

        import multi_spatialmllm_tpu.__main__ as cli

        (tmp_path / "imgs").mkdir()
        rng = np.random.default_rng(5)
        recs = []
        for i in range(4):
            name = f"im{i}.jpg"
            cv2.imwrite(str(tmp_path / "imgs" / name),
                        rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
            recs.append({"id": f"s{i}", "image": [name],
                         "conversations": [
                             {"from": "human", "value": "<image>\nwhat?"},
                             {"from": "gpt", "value": "a wall"}]})
        with open(tmp_path / "train.jsonl", "w") as f:
            f.writelines(json.dumps(r) + "\n" for r in recs)
        (tmp_path / "mix.json").write_text(json.dumps(
            {"spa": {"root": "imgs", "annotation": "train.jsonl"}}))
        out = tmp_path / "lora_ckpt"
        monkeypatch.setattr("sys.argv", [
            "prog", "train", "--meta", str(tmp_path / "mix.json"),
            "--config", "tiny", "--steps", "2", "--batch-size", "2",
            "--seq-len", "128", "--max-tiles", "1",
            "--tiles-per-image", "1", "--warmup", "1",
            "--lora-rank", "2", "--log-every", "1",
            "--vocab-size", "800", "--data-parallel", "1",
            "--output", str(out)])
        cli.main()
        line = [l for l in capsys.readouterr().out.splitlines()
                if l.startswith("{")][-1]
        assert json.loads(line)["steps"] == 2
        assert os.path.isdir(out)             # merged-params export


class TestValidate:
    def test_validate_mixture_flags_problems(self, meta_dir, tmp_path):
        from multi_spatialmllm_tpu.models.mixture import validate_mixture

        tmp, mp = meta_dir
        entries = load_meta(str(mp))
        # clean schema, but image files don't exist on disk
        ok_no_images = validate_mixture(entries)      # no image check
        assert ok_no_images["ok"]
        bad_loader = validate_mixture(
            entries, image_loader=lambda p: (_ for _ in ()).throw(
                FileNotFoundError(p)), sample=2)
        assert not bad_loader["ok"]
        assert any("unreadable image" in i["problem"]
                   for i in bad_loader["issues"])

        # schema problems: bad roles, placeholder/image mismatch
        bad = tmp_path / "bad.jsonl"
        recs = [
            {"id": "a", "image": ["x.jpg"], "conversations": [
                {"from": "gpt", "value": "answer first"}]},
            {"id": "b", "image": ["x.jpg", "y.jpg"], "conversations": [
                {"from": "human", "value": "<image>\nq"},
                {"from": "gpt", "value": "a"}]},
            {"id": "c", "conversations": []},
        ]
        bad.write_text("\n".join(json.dumps(r) for r in recs))
        rep = validate_mixture(
            [load_meta(str(mp))[0].__class__(
                name="bad", annotation=str(bad))])
        probs = [i["problem"] for i in rep["issues"]]
        assert any("role sequence" in p for p in probs)
        assert any("placeholders" in p for p in probs)
        assert any("conversations" in p for p in probs)

    def test_train_validate_only_cli(self, tmp_path, monkeypatch,
                                     capsys):
        import sys

        import cv2

        import multi_spatialmllm_tpu.__main__ as cli

        (tmp_path / "imgs").mkdir()
        rng = np.random.default_rng(1)
        cv2.imwrite(str(tmp_path / "imgs" / "im0.jpg"),
                    rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
        rec = {"id": "s", "image": ["im0.jpg"], "conversations": [
            {"from": "human", "value": "<image>\nq?"},
            {"from": "gpt", "value": "a"}]}
        (tmp_path / "t.jsonl").write_text(json.dumps(rec) + "\n")
        (tmp_path / "mix.json").write_text(json.dumps(
            {"d": {"root": "imgs", "annotation": "t.jsonl"}}))
        monkeypatch.setattr(sys, "argv", [
            "prog", "train", "--meta", str(tmp_path / "mix.json"),
            "--config", "tiny", "--vocab-size", "800",
            "--validate-only"])
        cli.main()
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["ok"] and rep["stats"]["epoch_size"] == 1

        # a missing image file makes it exit nonzero
        rec2 = dict(rec, image=["missing.jpg"])
        (tmp_path / "t.jsonl").write_text(json.dumps(rec2) + "\n")
        monkeypatch.setattr(sys, "argv", [
            "prog", "train", "--meta", str(tmp_path / "mix.json"),
            "--config", "tiny", "--vocab-size", "800",
            "--validate-only"])
        with pytest.raises(SystemExit):
            cli.main()


class TestSharding:
    def test_shards_disjoint_and_covering(self, meta_dir):
        """Multi-host striding: shards partition each epoch exactly —
        disjoint, covering, and every host derives them from the same
        deterministic order with no coordination."""
        _, mp = meta_dir
        entries = load_meta(str(mp))
        whole = [r["id"] for r in mixture_samples(entries, seed=9,
                                                  epochs=1)]
        parts = [[r["id"] for r in mixture_samples(
            entries, seed=9, epochs=1, shard_index=i, num_shards=3)]
            for i in range(3)]
        # strided interleave reassembles the exact epoch order
        rebuilt = [None] * len(whole)
        for i, part in enumerate(parts):
            rebuilt[i::3] = part
        assert rebuilt == whole
        assert sum(len(p) for p in parts) == len(whole)


class TestReviewRegressions:
    """r3 self-review fixes: init-from-import layout, text-only
    records, malformed-record validation."""

    def test_init_checkpoint_accepts_import_layout(self, tmp_path,
                                                   monkeypatch, capsys):
        """--init-checkpoint with an import-checkpoint output (bare
        {"params": tree} — no "step" wrapper) must warm-start, not
        crash on a pytree mismatch."""
        import sys

        import cv2
        import jax
        import orbax.checkpoint as ocp

        import multi_spatialmllm_tpu.__main__ as cli
        from multi_spatialmllm_tpu.models import mllm as M

        (tmp_path / "imgs").mkdir()
        rng = np.random.default_rng(2)
        cv2.imwrite(str(tmp_path / "imgs" / "im0.jpg"),
                    rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
        rec = {"id": "s", "image": ["im0.jpg"], "conversations": [
            {"from": "human", "value": "<image>\nq?"},
            {"from": "gpt", "value": "a"}]}
        (tmp_path / "t.jsonl").write_text(json.dumps(rec) + "\n")
        (tmp_path / "mix.json").write_text(json.dumps(
            {"d": {"root": "imgs", "annotation": "t.jsonl"}}))

        import dataclasses
        cfg = M.tiny_config()
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm, vocab_size=800))
        model = M.MultiFrameMLLM(cfg)
        b0 = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=64)
        params = model.init(jax.random.key(0), b0["input_ids"],
                            b0["tiles"])
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(str(tmp_path / "bare"), params)  # import-CLI layout
        ckptr.wait_until_finished()

        monkeypatch.setattr(sys, "argv", [
            "prog", "train", "--meta", str(tmp_path / "mix.json"),
            "--config", "tiny", "--vocab-size", "800", "--steps", "1",
            "--batch-size", "1", "--seq-len", "128", "--max-tiles", "1",
            "--tiles-per-image", "1", "--warmup", "1",
            "--data-parallel", "1", "--log-every", "1",
            "--init-checkpoint", str(tmp_path / "bare")])
        cli.main()
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["steps"] == 1

    def test_text_only_records_train(self, tmp_path):
        """General instruction data (no "image" key) encodes, packs,
        and batches alongside vision records."""
        import dataclasses

        from multi_spatialmllm_tpu.models import mllm as M
        from multi_spatialmllm_tpu.models.data import DataConfig
        from multi_spatialmllm_tpu.models.preprocess import (
            PreprocessConfig,
        )
        from multi_spatialmllm_tpu.models.tokenizer import SpatialTokenizer

        tok = SpatialTokenizer()
        cfg = M.tiny_config()
        cfg = dataclasses.replace(
            cfg, llm=dataclasses.replace(cfg.llm,
                                         vocab_size=tok.vocab_size),
            img_context_id=tok.img_context_id)
        (tmp_path / "t.jsonl").write_text("\n".join(json.dumps(r) for r in [
            {"id": "v", "image": ["a.jpg"], "conversations": [
                {"from": "human", "value": "<image>\nwhere?"},
                {"from": "gpt", "value": "left"}]},
            {"id": "t", "conversations": [
                {"from": "human", "value": "what is two plus two?"},
                {"from": "gpt", "value": "four"}]},
        ]))
        (tmp_path / "mix.json").write_text(json.dumps(
            {"d": {"annotation": "t.jsonl"}}))
        entries = load_meta(str(tmp_path / "mix.json"))
        # validation accepts both shapes
        from multi_spatialmllm_tpu.models.mixture import validate_mixture
        assert validate_mixture(entries)["ok"]
        rng = np.random.default_rng(0)
        loader = lambda p: rng.integers(  # noqa: E731
            0, 255, (64, 96, 3), dtype=np.uint8)
        dc = DataConfig(max_seq_len=128, max_tiles=1,
                        preprocess=PreprocessConfig(
                            tile_size=cfg.vit.image_size, max_tiles=1,
                            resize_hw=None))
        bs = list(mixture_batches(entries, tok, cfg, loader, 2, dc,
                                  seed=0, epochs=1))
        assert bs and bs[0]["input_ids"].shape[0] == 2
        # packed: both short records share one row (text-only segment
        # has zero tiles), so batch_size=1 keeps the single packed row
        pk = list(mixture_batches(entries, tok, cfg, loader, 1, dc,
                                  seed=0, epochs=1, packed=True))
        assert pk and int(pk[0]["segment_ids"].max()) == 2

    def test_validate_handles_malformed_messages(self, tmp_path):
        from multi_spatialmllm_tpu.models.mixture import (
            MixtureEntry,
            validate_mixture,
        )

        bad = tmp_path / "bad.jsonl"
        bad.write_text("\n".join([
            json.dumps({"conversations": [{"from": "human",
                                           "value": None}]}),
            json.dumps({"conversations": ["not a dict"]}),
            json.dumps({"conversations": [
                {"from": "human", "value": "ok?"},
                {"from": "gpt", "value": "ok"}]}),
        ]))
        rep = validate_mixture(
            [MixtureEntry(name="b", annotation=str(bad))])
        assert not rep["ok"]
        assert len(rep["issues"]) == 2      # third record is clean


class TestRollingCheckpoints:
    def test_rolling_save_prune_and_resolve(self, tmp_path):
        import jax

        from multi_spatialmllm_tpu.parallel.train import (
            resolve_checkpoint,
            restore_checkpoint,
            save_checkpoint_rolling,
        )

        params = {"w": jax.numpy.arange(4.0)}
        root = str(tmp_path / "ckpts")
        for step in (1, 2, 3):
            save_checkpoint_rolling(root, {"w": params["w"] * step},
                                    step=step, keep=2)
        dirs = sorted(d for d in os.listdir(root)
                      if d.startswith("step_"))
        assert dirs == ["step_00000002", "step_00000003"]  # pruned to 2
        assert resolve_checkpoint(root).endswith("step_00000003")
        got = restore_checkpoint(root)
        np.testing.assert_array_equal(np.asarray(got["params"]["w"]),
                                      np.arange(4.0) * 3)
        assert int(got["step"]) == 3
        # a plain orbax dir (no LATEST) resolves to itself
        direct = os.path.join(root, "step_00000002")
        assert resolve_checkpoint(direct) == direct

    def test_prune_ignores_orbax_tmp_dirs(self, tmp_path):
        """Stale `step_N.orbax-checkpoint-tmp-*` leftovers (crashed
        async save) must not consume `keep` slots — at keep=1 a
        startswith-based prune could leave ONLY the unusable tmp dir.
        AsyncRollingSaver also clears such leftovers at init."""
        import jax

        from multi_spatialmllm_tpu.parallel.train import (
            AsyncRollingSaver,
            resolve_checkpoint,
            save_checkpoint_rolling,
        )

        params = {"w": jax.numpy.arange(4.0)}
        root = str(tmp_path / "ckpts")
        save_checkpoint_rolling(root, params, step=1, keep=1)
        # simulate a crashed async write AFTER the good step-1 save
        stale = os.path.join(
            root, "step_00000002.orbax-checkpoint-tmp-1234567890")
        os.makedirs(stale)
        save_checkpoint_rolling(root, params, step=3, keep=1)
        dirs = sorted(d for d in os.listdir(root)
                      if d.startswith("step_"))
        # the real step-3 dir survives; the tmp dir did not displace it
        assert "step_00000003" in dirs
        assert "step_00000001" not in dirs  # pruned (keep=1)
        assert resolve_checkpoint(root).endswith("step_00000003")
        # saver init clears the leftover tmp dir
        AsyncRollingSaver(root, keep=1)
        assert not os.path.exists(stale)

    def test_async_rolling_saver(self, tmp_path):
        """AsyncRollingSaver: LATEST commits deferred (only after the
        write is durable), pruning honors keep, restore returns the
        values AT SAVE TIME even when the caller's arrays are donated
        away by later jitted steps (orbax's async contract snapshots to
        host before save() returns)."""
        import jax
        import jax.numpy as jnp

        from multi_spatialmllm_tpu.parallel.train import (
            AsyncRollingSaver,
            resolve_checkpoint,
            restore_checkpoint,
        )

        root = str(tmp_path / "ackpts")
        saver = AsyncRollingSaver(root, keep=2)

        bump_donating = jax.jit(
            lambda tree: jax.tree_util.tree_map(lambda x: x + 1.0, tree),
            donate_argnums=(0,))

        tree = {"w": jnp.arange(8.0)}
        for step in (1, 2, 3):
            saver.save(tree, step=step)
            if step == 1:
                # no LATEST yet OR it points at a COMPLETE step-1 save;
                # never at a half-written directory
                latest = os.path.join(root, "LATEST")
                assert not os.path.exists(latest)
            tree = bump_donating(tree)  # the saved buffers get donated
        saver.wait()

        dirs = sorted(d for d in os.listdir(root) if d.startswith("step_"))
        assert dirs == ["step_00000002", "step_00000003"]  # pruned
        assert resolve_checkpoint(root).endswith("step_00000003")
        got = restore_checkpoint(root)
        # values at save time: step 3 saved arange+2 (two bumps before)
        np.testing.assert_array_equal(np.asarray(got["params"]["w"]),
                                      np.arange(8.0) + 2.0)
        assert int(got["step"]) == 3
        got2 = restore_checkpoint(os.path.join(root, "step_00000002"))
        np.testing.assert_array_equal(np.asarray(got2["params"]["w"]),
                                      np.arange(8.0) + 1.0)

    def test_train_cli_async_save(self, tmp_path, monkeypatch, capsys):
        """`train --async-save --save-every 1`: overlapped saves through
        the donated train step, LATEST resolves, checkpoint restores."""
        import cv2

        import multi_spatialmllm_tpu.__main__ as cli
        from multi_spatialmllm_tpu.parallel.train import (
            resolve_checkpoint,
            restore_checkpoint,
        )

        (tmp_path / "imgs").mkdir()
        rng = np.random.default_rng(5)
        recs = []
        for i in range(4):
            name = f"im{i}.jpg"
            cv2.imwrite(str(tmp_path / "imgs" / name),
                        rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
            recs.append({"id": f"s{i}", "image": [name],
                         "conversations": [
                             {"from": "human", "value": "<image>\nq?"},
                             {"from": "gpt", "value": f"{i} mm"}]})
        (tmp_path / "t.jsonl").write_text(
            "\n".join(json.dumps(r) for r in recs))
        (tmp_path / "mix.json").write_text(json.dumps(
            {"d": {"root": "imgs", "annotation": "t.jsonl"}}))
        out = tmp_path / "ackpt"
        monkeypatch.setattr("sys.argv", [
            "prog", "train", "--meta", str(tmp_path / "mix.json"),
            "--config", "tiny", "--vocab-size", "800", "--steps", "3",
            "--batch-size", "2", "--seq-len", "128", "--max-tiles", "1",
            "--tiles-per-image", "1", "--warmup", "1",
            "--data-parallel", "1", "--log-every", "1",
            "--save-every", "1", "--keep", "2", "--async-save",
            "--output", str(out)])
        cli.main()
        report = json.loads([l for l in capsys.readouterr().out.splitlines()
                             if l.startswith("{")][-1])
        assert report["steps"] == 3
        assert resolve_checkpoint(str(out)).endswith("step_00000003")
        got = restore_checkpoint(str(out))
        assert int(got["step"]) == 3
        assert "opt_state" in got  # full state saved (non-LoRA run)


class TestTrainEval:
    def test_train_with_periodic_eval(self, tmp_path, monkeypatch,
                                      capsys):
        """--eval-jsonl/--eval-every score held-out records during and
        after training; summary carries eval_accuracy."""
        import sys

        import cv2

        import multi_spatialmllm_tpu.__main__ as cli

        (tmp_path / "imgs").mkdir()
        rng = np.random.default_rng(7)
        recs, evals = [], []
        for i in range(4):
            name = f"im{i}.jpg"
            cv2.imwrite(str(tmp_path / "imgs" / name),
                        rng.integers(0, 255, (64, 96, 3), dtype=np.uint8))
            recs.append({"id": f"s{i}", "image": [name],
                         "conversations": [
                             {"from": "human", "value": "<image>\nq?"},
                             {"from": "gpt", "value": f"{i} mm"}]})
            evals.append({"id": f"e{i}", "image": [name],
                          "text": "<image>\nq?",
                          "question_type": "depth_estimation_coor",
                          "gt_value": 100 + i,
                          "height_list": [64], "width_list": [96]})
        (tmp_path / "t.jsonl").write_text(
            "\n".join(json.dumps(r) for r in recs))
        (tmp_path / "e.jsonl").write_text(
            "\n".join(json.dumps(r) for r in evals))
        (tmp_path / "mix.json").write_text(json.dumps(
            {"d": {"root": "imgs", "annotation": "t.jsonl"}}))
        monkeypatch.setattr(sys, "argv", [
            "prog", "train", "--meta", str(tmp_path / "mix.json"),
            "--config", "tiny", "--vocab-size", "800", "--steps", "2",
            "--batch-size", "2", "--seq-len", "128", "--max-tiles", "1",
            "--tiles-per-image", "1", "--warmup", "1",
            "--data-parallel", "1", "--log-every", "1",
            "--eval-jsonl", str(tmp_path / "e.jsonl"),
            "--eval-images-root", str(tmp_path / "imgs"),
            "--eval-every", "1", "--eval-limit", "2",
            "--eval-max-new-tokens", "4"])
        cli.main()
        captured = capsys.readouterr()
        rep = json.loads(captured.out.strip().splitlines()[-1])
        assert rep["eval_accuracy"] is not None
        assert captured.err.count("[train] eval") == 2   # no repeat
