"""Tests for preprocessing, the eval harness, and greedy generation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multi_spatialmllm_tpu.models import preprocess as PP
from multi_spatialmllm_tpu.models import eval_harness as EH
from multi_spatialmllm_tpu.models import mllm as M


class TestPreprocess:
    def test_grid_selection(self):
        # wide image prefers wide grids; square prefers square
        assert PP.select_grid(1296, 968, 6, 448)[0] >= \
            PP.select_grid(1296, 968, 6, 448)[1]
        cols, rows = PP.select_grid(448, 448, 6, 448)
        assert (cols, rows) == (1, 1)
        for w, h in ((2000, 500), (500, 2000), (1296, 968)):
            c, r = PP.select_grid(w, h, 6, 448)
            assert 1 <= c * r <= 6

    def test_tile_image_shapes_and_norm(self, rng):
        img = rng.integers(0, 255, size=(968, 1296, 3), dtype=np.uint8)
        tiles = PP.tile_image(img)
        # grid tiles + thumbnail, <= 7 total
        assert tiles.shape[1:] == (448, 448, 3)
        assert 2 <= tiles.shape[0] <= 7
        assert tiles.dtype == np.float32
        # normalized data roughly centered
        assert abs(float(tiles.mean())) < 2.0

    def test_single_tile_no_thumbnail(self, rng):
        img = rng.integers(0, 255, size=(448, 448, 3), dtype=np.uint8)
        tiles = PP.tile_image(img, PP.PreprocessConfig(resize_hw=None))
        assert tiles.shape[0] == 1

    def test_tile_images_padding(self, rng):
        imgs = [rng.integers(0, 255, size=(968, 1296, 3), dtype=np.uint8)
                for _ in range(2)]
        stack, counts = PP.tile_images(imgs, pad_to=16)
        assert stack.shape[0] == 16
        assert counts.sum() <= 16 and len(counts) == 2


class TestEvalHarness:
    def test_extract_answer(self):
        assert EH.extract_answer("The camera moved `left`.") == "left"
        assert EH.extract_answer("It is `1150` mm away.") == 1150.0
        assert EH.extract_answer(
            "The shift is `[ 10 , -5 , 3 ]` mm.") == [10.0, -5.0, 3.0]
        assert EH.extract_answer("The correct point is `A`.") == "A"
        assert EH.extract_answer("about 42 mm total") == 42.0
        assert EH.extract_answer("The camera moved right.") == "right"

    def test_score_numeric_and_direction(self):
        s = {"question_type": "total_distance", "gt_value": 1000}
        assert EH.score_sample(s, "The distance is `1050` mm.")
        assert not EH.score_sample(s, "The distance is `1200` mm.")
        s = {"question_type": "x_movement", "gt_value": "left"}
        assert EH.score_sample(s, "The camera shifted `left`.")
        assert not EH.score_sample(s, "The camera shifted `right`.")

    def test_score_vector_and_letter(self):
        s = {"question_type": "displacement_vector",
             "gt_value": [0.1, -0.05, 0.2]}  # meters (engine parity)
        assert EH.score_sample(s, "Shift: `[ 100 , -50 , 205 ]` mm.")
        assert not EH.score_sample(s, "Shift: `[ 500 , -50 , 205 ]` mm.")
        s = {"question_type": "visual_correspondence_multiple_choice",
             "gt_value": "C"}
        assert EH.score_sample(s, "The matching point is `C`.")
        s = {"question_type": "depth_comparison_coordinate",
             "gt_value": [512, 400]}
        assert EH.score_sample(s, "`[ 512 , 401 ]` is closer.")

    def test_evaluate_aggregation(self):
        samples = [
            {"question_type": "total_distance", "gt_value": 100},
            {"question_type": "total_distance", "gt_value": 200},
            {"question_type": "x_movement", "gt_value": "left"},
        ]
        preds = ["`100` mm", "`500` mm", "`left`"]
        res = EH.evaluate(samples, preds)
        assert res["count"] == 3
        np.testing.assert_allclose(res["accuracy"], 2 / 3)
        assert res["per_type"]["total_distance"]["accuracy"] == 0.5


class TestGenerate:
    def test_greedy_matches_argmax_of_full_forward(self):
        from multi_spatialmllm_tpu.models.generate import greedy_generate

        cfg = M.tiny_config()
        model = M.MultiFrameMLLM(cfg)
        batch = M.make_example_batch(cfg, batch=1, n_tiles=1, seq_len=32)
        params = model.init(jax.random.key(0), batch["input_ids"],
                            batch["tiles"])
        out = greedy_generate(model, params, batch["input_ids"],
                              batch["tiles"], max_new_tokens=3)
        assert out.shape == (1, 3)
        # first generated token must equal argmax of the training forward's
        # last-position logits
        logits = model.apply(params, batch["input_ids"], batch["tiles"])
        expect = int(jnp.argmax(logits[0, -1]))
        assert int(out[0, 0]) == expect


class TestExtractAnswerAdversarial:
    """Model outputs in the wild ramble, repeat the question's numbers,
    add units, or bury the answer mid-sentence — not just the clean
    backtick-quoted strings this repo's templates emit."""

    def test_rambling_numeric(self):
        from multi_spatialmllm_tpu.models.eval_harness import extract_answer

        # question numbers repeated before the actual answer
        out = extract_answer(
            "The point at [ 512 , 440 ] is quite far away. After "
            "considering the geometry, the depth is `2350` mm.")
        assert out == 2350.0
        # no backticks at all: last number wins
        out = extract_answer(
            "Looking at coordinates 512, 440, I estimate the depth to be "
            "approximately 2350 millimeters.")
        assert out == 2350.0

    def test_vector_in_prose(self):
        from multi_spatialmllm_tpu.models.eval_harness import extract_answer

        out = extract_answer(
            "The camera moved by the displacement vector "
            "[ 120 , -45 , 300 ] in millimeters.")
        assert out == [120.0, -45.0, 300.0]
        out = extract_answer("The matching point is at `[ 512 , 440 ]`.")
        assert out == [512.0, 440.0]

    def test_direction_with_noise(self):
        from multi_spatialmllm_tpu.models.eval_harness import extract_answer

        out = extract_answer("The camera clearly moved to the `left`.")
        assert out == "left"
        # unquoted single direction word in prose
        out = extract_answer("It moved left by a small amount.")
        assert out == "left"

    def test_letter_answers(self):
        from multi_spatialmllm_tpu.models.eval_harness import extract_answer

        assert extract_answer("The correct answer is `B`.") == "B"
        assert extract_answer("I believe the answer is C") == "C"

    def test_garbage_returns_none(self):
        from multi_spatialmllm_tpu.models.eval_harness import extract_answer

        assert extract_answer("I am not sure about this one.") is None
        assert extract_answer("") is None

    def test_scoring_tolerates_extraction_from_noisy_text(self):
        from multi_spatialmllm_tpu.models.eval_harness import score_sample

        sample = {"question_type": "depth_estimation_coor",
                  "gt_value": 2350}
        assert score_sample(sample, "the depth is roughly 2350 mm") is True
        assert score_sample(sample, "the depth is roughly 9999 mm") is False
        vec = {"question_type": "displacement_vector",
               "gt_value": [0.12, -0.045, 0.3]}  # meters; answers in mm
        assert score_sample(
            vec, "moved by [ 120 , -45 , 300 ] millimeters") is True
