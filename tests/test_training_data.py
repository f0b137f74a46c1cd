"""Tokenizer + training-data assembly + engine->model integration."""

import numpy as np
import pytest

from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.data import (
    DataConfig,
    IGNORE_INDEX,
    batch_iterator,
    encode_sample,
)
from multi_spatialmllm_tpu.models.preprocess import PreprocessConfig
from multi_spatialmllm_tpu.models.tokenizer import (
    IMG_CONTEXT,
    SpatialTokenizer,
)


@pytest.fixture(scope="module")
def tok():
    return SpatialTokenizer()


class TestTokenizer:
    def test_roundtrip_template_text(self, tok):
        from multi_spatialmllm_tpu.engines.templates import camera_movement

        for text in camera_movement.TASK_DESCRIPTION[:3]:
            ids = tok.encode(text)
            assert tok.decode(ids) == text

    def test_roundtrip_numbers_and_unicode(self, tok):
        for text in ("The shift is `[ 100 , -5 , 42 ]` mm.",
                     "depth 1234 mm", "café ☃"):
            assert tok.decode(tok.encode(text)) == text

    def test_special_tokens(self, tok):
        ids = tok.encode(IMG_CONTEXT * 3)
        assert ids == [tok.img_context_id] * 3
        ids = tok.encode("x", add_bos=True, add_eos=True)
        assert ids[0] == tok.bos_id and ids[-1] == tok.eos_id

    def test_vocab_is_deterministic(self):
        a, b = SpatialTokenizer(), SpatialTokenizer()
        assert a.tokens == b.tokens
        assert a.vocab_size > 300


class TestEncodeSample:
    def _sample(self):
        return {
            "image": ["scene/a.jpg", "scene/b.jpg"],
            "conversations": [
                {"from": "human",
                 "value": "Image-1: <image>\nImage-2: <image>\nHow far?"},
                {"from": "gpt", "value": "It moved `42` mm."},
            ],
        }

    def _loader(self, rng):
        def load(path):
            return rng.integers(0, 255, size=(56, 56, 3), dtype=np.uint8)
        return load

    def test_masking_and_shapes(self, tok, rng):
        cfg = M.tiny_config(img_context_id=tok.img_context_id)
        dc = DataConfig(max_seq_len=256, max_tiles=4,
                        preprocess=PreprocessConfig(
                            tile_size=56, max_tiles=1, resize_hw=None))
        enc = encode_sample(self._sample(), tok, cfg, self._loader(rng), dc)
        assert enc is not None
        ids, labels, tiles, n_tiles = enc
        assert ids.shape == (256,) and labels.shape == (256,)
        assert tiles.shape == (4, 56, 56, 3)
        assert n_tiles == 2
        # img context count == tiles * tokens_per_tile
        assert (ids == tok.img_context_id).sum() == 2 * cfg.tokens_per_tile
        # every img-context and human position is masked
        assert (labels[ids == tok.img_context_id] == IGNORE_INDEX).all()
        # the assistant answer tokens are supervised
        answer_ids = tok.encode("It moved `42` mm.")
        sup = labels[labels != IGNORE_INDEX]
        assert len(sup) > len(answer_ids) - 2  # prefix + eos included

    def test_too_long_rejected(self, tok, rng):
        cfg = M.tiny_config(img_context_id=tok.img_context_id)
        dc = DataConfig(max_seq_len=8, max_tiles=4,
                        preprocess=PreprocessConfig(
                            tile_size=56, max_tiles=1, resize_hw=None))
        assert encode_sample(self._sample(), tok, cfg, self._loader(rng),
                             dc) is None


class TestEngineToModel:
    def test_train_on_generated_samples(self, tok, rng):
        """Full loop: camera-movement engine output -> batches -> train."""
        import jax

        from multi_spatialmllm_tpu.core.scene import SceneStore
        from multi_spatialmllm_tpu.core.synthetic import make_scene
        from multi_spatialmllm_tpu.engines import camera_movement as CM
        from multi_spatialmllm_tpu.models.llm import LLMConfig
        from multi_spatialmllm_tpu.models.vit import ViTConfig
        from multi_spatialmllm_tpu.parallel.mesh import make_mesh
        from multi_spatialmllm_tpu.parallel.train import (
            TrainConfig,
            init_train_state,
            make_train_step,
        )
        from multi_spatialmllm_tpu.stages.frame_relations import (
            build_frame_relations,
        )
        from multi_spatialmllm_tpu.stages.visibility import (
            compute_scene_visibility,
        )

        scene = make_scene(scene_id="t0000_00", seed=77, n_images=10,
                           n_background=2500, n_objects=2)
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            store = SceneStore.write([scene], tmp)
            vis = {scene.scene_id: compute_scene_visibility(scene)}
            rel = build_frame_relations([scene], visibility=vis)
            samples = CM.build_samples_for_question_type(
                rel, store, "total_distance", 8,
                CM.CameraMovementConfig(overlap_min=0.1, overlap_max=100,
                                        interval=5))
        assert len(samples) >= 4

        cfg = M.MLLMConfig(
            vit=ViTConfig(image_size=56, patch_size=14, hidden_size=64,
                          num_layers=1, num_heads=2),
            llm=LLMConfig(vocab_size=tok.vocab_size, hidden_size=64,
                          num_layers=1, num_heads=2, num_kv_heads=2,
                          ffn_size=128, max_seq_len=512, dtype="float32"),
            img_context_id=tok.img_context_id,
        )
        dc = DataConfig(max_seq_len=512, max_tiles=4,
                        preprocess=PreprocessConfig(
                            tile_size=56, max_tiles=1, resize_hw=None))

        def loader(path):
            return rng.integers(0, 255, size=(96, 128, 3), dtype=np.uint8)

        batches = list(batch_iterator(samples[:4], tok, cfg, loader,
                                      batch_size=2, config=dc))
        assert batches
        batch = batches[0]
        assert batch["input_ids"].shape == (2, 512)
        assert batch["tiles"].shape[0] == 2

        mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
        model, params, opt_state, tx = init_train_state(
            cfg, TrainConfig(warmup_steps=1), batch, mesh)
        step = make_train_step(model, tx, mesh)
        # batch must shard over the data axis: replicate rows to match
        ndev = len(jax.devices())
        if ndev > 1:
            batch = {k: np.concatenate([v] * (ndev // 2 or 1), axis=0)
                     for k, v in batch.items()}
        params, opt_state, metrics = step(params, opt_state, batch)
        assert np.isfinite(float(metrics["loss"]))


class TestPrefetchLoader:
    def test_identical_to_sync_iterator(self, rng):
        """prefetch_batches with 4 workers yields byte-identical batches
        in the same order as batch_iterator (deterministic composition
        regardless of worker count)."""
        from multi_spatialmllm_tpu.models import mllm as M
        from multi_spatialmllm_tpu.models.data import (
            DataConfig,
            batch_iterator,
            prefetch_batches,
        )
        from multi_spatialmllm_tpu.models.preprocess import PreprocessConfig
        from multi_spatialmllm_tpu.models.tokenizer import SpatialTokenizer

        tok = SpatialTokenizer()
        cfg = M.MLLMConfig(
            vit=M.ViTConfig(image_size=56, patch_size=14, hidden_size=32,
                            num_layers=1, num_heads=2),
            llm=M.LLMConfig(vocab_size=tok.vocab_size, hidden_size=32,
                            num_layers=1, num_heads=2, num_kv_heads=2,
                            ffn_size=64, dtype="float32"),
            img_context_id=tok.img_context_id,
        )
        samples = [
            {"id": str(i), "image": [f"s/{i}.jpg"],
             "conversations": [
                 {"from": "human",
                  "value": f"<image>\nQuestion {i} about depth?"},
                 {"from": "gpt", "value": f"The depth is {1000 + i} mm."},
             ]}
            for i in range(11)
        ]

        def loader(path):
            seed = int(path.split("/")[-1].split(".")[0])
            return np.random.default_rng(seed).integers(
                0, 255, (96, 128, 3), dtype=np.uint8)

        dc = DataConfig(max_seq_len=128, max_tiles=2,
                        preprocess=PreprocessConfig(tile_size=56,
                                                    max_tiles=1,
                                                    resize_hw=None))
        sync = list(batch_iterator(samples, tok, cfg, loader, 3, dc,
                                   drop_remainder=False))
        pre = list(prefetch_batches(samples, tok, cfg, loader, 3, dc,
                                    drop_remainder=False, num_workers=4,
                                    prefetch=2))
        assert len(sync) == len(pre) >= 3
        for a, b in zip(sync, pre):
            for key in ("input_ids", "labels", "tiles"):
                np.testing.assert_array_equal(a[key], b[key])

    def test_worker_error_propagates(self):
        from multi_spatialmllm_tpu.models import mllm as M
        from multi_spatialmllm_tpu.models.data import prefetch_batches
        from multi_spatialmllm_tpu.models.tokenizer import SpatialTokenizer
        import pytest as _pytest

        tok = SpatialTokenizer()
        cfg = M.tiny_config()

        def bad_loader(path):
            raise FileNotFoundError(path)

        samples = [{"id": "x", "image": ["a/b.jpg"],
                    "conversations": [{"from": "human", "value": "<image>"},
                                      {"from": "gpt", "value": "y"}]}]
        with _pytest.raises(FileNotFoundError):
            list(prefetch_batches(samples, tok, cfg, bad_loader, 1,
                                  num_workers=4))

    def test_abandoned_iterator_releases_producer(self):
        """Breaking out of the generator early must not leave the producer
        thread blocked on the bounded queue."""
        import threading
        import time

        from multi_spatialmllm_tpu.models import mllm as M
        from multi_spatialmllm_tpu.models.data import (
            DataConfig,
            prefetch_batches,
        )
        from multi_spatialmllm_tpu.models.preprocess import PreprocessConfig
        from multi_spatialmllm_tpu.models.tokenizer import SpatialTokenizer

        tok = SpatialTokenizer()
        cfg = M.MLLMConfig(
            vit=M.ViTConfig(image_size=56, patch_size=14, hidden_size=32,
                            num_layers=1, num_heads=2),
            llm=M.LLMConfig(vocab_size=tok.vocab_size, hidden_size=32,
                            num_layers=1, num_heads=2, num_kv_heads=2,
                            ffn_size=64, dtype="float32"),
            img_context_id=tok.img_context_id,
        )
        samples = [
            {"id": str(i), "image": [f"s/{i}.jpg"],
             "conversations": [
                 {"from": "human", "value": f"<image>\nQ{i}?"},
                 {"from": "gpt", "value": f"A{i}."},
             ]}
            for i in range(40)
        ]

        def loader(path):
            return np.zeros((96, 128, 3), dtype=np.uint8)

        dc = DataConfig(max_seq_len=128, max_tiles=2,
                        preprocess=PreprocessConfig(tile_size=56,
                                                    max_tiles=1,
                                                    resize_hw=None))
        before = threading.active_count()
        it = prefetch_batches(samples, tok, cfg, loader, 2, dc,
                              num_workers=4, prefetch=1)
        next(it)
        it.close()  # abandon
        deadline = time.time() + 10
        while threading.active_count() > before and time.time() < deadline:
            time.sleep(0.05)
        assert threading.active_count() <= before


class TestPrefetchIterator:
    """Generic producer-thread wrapper (data.prefetch_iterator): exact
    order, exception propagation, and no thread leak on abandonment —
    the train CLI overlaps mixture batch assembly with device steps
    through this."""

    def test_order_identity(self):
        from multi_spatialmllm_tpu.models.data import prefetch_iterator

        items = list(range(57))
        assert list(prefetch_iterator(iter(items), depth=3)) == items

    def test_exception_propagates(self):
        import pytest

        from multi_spatialmllm_tpu.models.data import prefetch_iterator

        def gen():
            yield 1
            raise RuntimeError("producer boom")

        it = prefetch_iterator(gen(), depth=2)
        assert next(it) == 1
        with pytest.raises(RuntimeError, match="producer boom"):
            list(it)

    def test_abandon_stops_producer(self):
        import threading

        from multi_spatialmllm_tpu.models.data import prefetch_iterator

        before = threading.active_count()

        def gen():
            i = 0
            while True:          # infinite producer
                yield i
                i += 1

        it = prefetch_iterator(gen(), depth=2)
        assert next(it) == 0
        it.close()               # generator finally -> stop + join
        assert threading.active_count() == before
