"""MultiSPA evaluation runner: model x eval JSONL -> predictions + scores.

Completes the L5 loop the reference delegates externally: reads the eval
records the engines emit (`text` + image list + gt_value), builds padded
prompts with vision-token expansion, greedy-decodes answers, and scores
them with models/eval_harness. Prompt lengths are bucketed so an eval run
compiles only a handful of prefill shapes.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from .data import DataConfig
from .eval_harness import ScoreConfig, evaluate
from .generate import pad_to_bucket
from .mllm import MLLMConfig, MultiFrameMLLM
from .preprocess import tile_image
from .tokenizer import (
    ASSISTANT,
    HUMAN,
    IMG_CONTEXT,
    IMG_END,
    IMG_START,
    SpatialTokenizer,
)


@dataclasses.dataclass
class EvalRunConfig:
    max_new_tokens: int = 24
    length_bucket: int = 128
    speculate: int = 0  # >0: prompt-lookup speculative decoding with this
    #   many draft tokens per forward (generate.speculative_generate) —
    #   answers stay BIT-identical to greedy (test-asserted); formulaic
    #   MultiSPA answers verify at high acceptance, cutting forwards
    # score multiple-choice records by candidate logprob instead of
    # free decoding: each option's teacher-forced sum log-probability
    # after the prompt, prediction = argmax (one B=n_options forward,
    # no sampling noise, no answer-extraction failures). Non-MC
    # records keep the decode path.
    mc_logprob: bool = False
    data: DataConfig = dataclasses.field(default_factory=DataConfig)


def _decode_batched(model, params, prompt, tiles, lens, eos_id, config):
    """Greedy decode, optionally accelerated by speculation (identical
    outputs either way)."""
    if config.speculate > 0:
        from .generate import speculative_generate

        return speculative_generate(
            model, params, prompt, tiles,
            max_new_tokens=config.max_new_tokens, eos_id=eos_id,
            prompt_lens=lens, n_draft=config.speculate)
    from .generate import greedy_generate_batched

    return greedy_generate_batched(
        model, params, prompt, tiles, lens,
        max_new_tokens=config.max_new_tokens, eos_id=eos_id)


def build_prompt_ids(
    sample: dict,
    tokenizer: SpatialTokenizer,
    model_cfg: MLLMConfig,
    tiles_per_image: list[int],
) -> list[int]:
    """Eval prompt: human turn with vision blocks + assistant cue."""
    text = sample["text"]
    img_idx = 0
    while "<image>" in text:
        n_ctx = model_cfg.tokens_per_tile * tiles_per_image[img_idx]
        text = text.replace(
            "<image>", IMG_START + IMG_CONTEXT * n_ctx + IMG_END, 1)
        img_idx += 1
    return [tokenizer.bos_id] + tokenizer.encode(HUMAN + text + ASSISTANT)


def predict_sample(
    model: MultiFrameMLLM,
    params,
    tokenizer: SpatialTokenizer,
    sample: dict,
    image_loader: Callable[[str], np.ndarray],
    config: EvalRunConfig,
) -> str:
    stacks = [tile_image(image_loader(p), config.data.preprocess)
              for p in sample["image"]]
    tiles_per_image = [s.shape[0] for s in stacks]
    tiles = np.concatenate(stacks, axis=0)[None]          # [1, n, H, W, 3]

    ids = build_prompt_ids(sample, tokenizer, model.cfg, tiles_per_image)
    prompt = np.asarray([ids], dtype=np.int32)
    real_len = prompt.shape[1]
    prompt = pad_to_bucket(prompt, config.length_bucket, tokenizer.pad_id)
    out = _decode_batched(
        model, params, prompt, tiles,
        np.asarray([real_len], np.int32), tokenizer.eos_id, config)
    gen = np.asarray(out[0])
    if tokenizer.eos_id in gen:
        gen = gen[: int(np.where(gen == tokenizer.eos_id)[0][0])]
    return tokenizer.decode(gen)


def _decode_row(gen: np.ndarray, eos_id: int) -> np.ndarray:
    if eos_id in gen:
        gen = gen[: int(np.where(gen == eos_id)[0][0])]
    return gen


def predict_batch(
    model: MultiFrameMLLM,
    params,
    tokenizer: SpatialTokenizer,
    samples: list[dict],
    image_loader: Callable[[str], np.ndarray],
    config: EvalRunConfig,
) -> list[str]:
    """Batched greedy decoding with per-row prompt lengths.

    Rows are grouped by tile-stack shape (samples with different image /
    tile counts cannot share a `tiles` tensor) and padded to a shared
    length bucket; within a group one prefill + decode serves every row.
    Per-sample outputs are identical to `predict_sample` (test-asserted).
    """
    prepped = []
    for s in samples:
        stacks = [tile_image(image_loader(p), config.data.preprocess)
                  for p in s["image"]]
        tiles_per_image = [st.shape[0] for st in stacks]
        tiles = np.concatenate(stacks, axis=0)
        ids = build_prompt_ids(s, tokenizer, model.cfg, tiles_per_image)
        prepped.append((tiles, ids))

    predictions: list[str | None] = [None] * len(samples)
    groups: dict[tuple, list[int]] = {}
    for i, (tiles, ids) in enumerate(prepped):
        bucket_len = ((len(ids) + config.length_bucket - 1)
                      // config.length_bucket) * config.length_bucket
        groups.setdefault((tiles.shape, bucket_len), []).append(i)

    for (_, bucket_len), rows in groups.items():
        lens = np.asarray([len(prepped[i][1]) for i in rows], np.int32)
        prompt = np.full((len(rows), bucket_len), tokenizer.pad_id,
                         dtype=np.int32)
        for r, i in enumerate(rows):
            prompt[r, : lens[r]] = prepped[i][1]
        tiles = np.stack([prepped[i][0] for i in rows])
        out = np.asarray(_decode_batched(
            model, params, prompt, tiles, lens, tokenizer.eos_id, config))
        for r, i in enumerate(rows):
            predictions[i] = tokenizer.decode(
                _decode_row(out[r], tokenizer.eos_id))
    return predictions


def mc_candidates(sample: dict) -> list[str] | None:
    """Candidate answer strings for a multiple-choice eval record: the
    record's own "options" list when present, else the letter bank of
    its question type (the MC engines' answer format: correspondence
    dot->MC labels A-D, annotated depth comparison A/B; gt_value is the
    correct letter — visual_correspondence.py:389, reference
    visual_correspondence_qa_engine_dot_2_multichoice.py:362-391).
    None for non-MC records."""
    if "options" in sample:
        opts = [str(o) for o in sample["options"]]
        return opts or None          # empty options list -> not MC
    qt = sample.get("question_type", "")
    if qt == "visual_correspondence_multiple_choice":
        return ["A", "B", "C", "D"]
    if qt == "depth_comparison_annotated":
        return ["A", "B"]
    return None


@functools.lru_cache(maxsize=16)
def _score_fn(model: MultiFrameMLLM, n: int, t: int, k: int):
    """[n, t] candidate-spliced rows -> per-row sum logprob over the k
    candidate-token slots starting at prompt_len (causal mask: trailing
    pads cannot influence the scored positions). The rows share one
    prompt and one tile stack, so the ViT runs ONCE over `[n_tiles]`
    tiles and its projected features are broadcast across candidate
    rows — not re-encoded per candidate."""

    def scored(m: MultiFrameMLLM, rows, tiles):
        vis = m.encode_tiles(tiles)                 # [n_tiles, tpt, D]
        vis = vis.reshape(1, -1, vis.shape[-1])
        embeds = m.llm.embed(rows)
        is_ctx = rows == m.cfg.img_context_id
        slot = jnp.clip(jnp.cumsum(is_ctx, axis=1) - 1,
                        0, vis.shape[1] - 1)
        gathered = jnp.take_along_axis(
            jnp.broadcast_to(vis, (n,) + vis.shape[1:]),
            slot[..., None], axis=1)
        x = jnp.where(is_ctx[..., None], gathered, embeds)
        return m.llm(input_embeds=x)

    @jax.jit
    def fn(params, rows, tiles, prompt_len, cand_tok, cand_mask):
        logits = model.apply(params, rows, tiles, method=scored)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        pos = prompt_len - 1 + jnp.arange(k)[None]              # [1, k]
        pos = jnp.broadcast_to(pos, (n, k))
        at = jnp.take_along_axis(logp, pos[..., None], axis=1)  # [n,k,V]
        tok = jnp.take_along_axis(at, cand_tok[..., None],
                                  axis=2)[..., 0]               # [n, k]
        return (tok * cand_mask).sum(axis=1)

    return fn


def score_candidates(
    model: MultiFrameMLLM,
    params,
    tokenizer: SpatialTokenizer,
    sample: dict,
    candidates: list[str],
    image_loader: Callable[[str], np.ndarray],
    config: EvalRunConfig,
) -> np.ndarray:
    """Teacher-forced sum log-probability of each candidate answer
    continuation after the sample's prompt — ONE [n_candidates, T]
    forward sharing the prompt and tiles across rows."""
    stacks = [tile_image(image_loader(p), config.data.preprocess)
              for p in sample["image"]]
    tiles_per_image = [s.shape[0] for s in stacks]
    tiles = np.concatenate(stacks, axis=0)
    ids = build_prompt_ids(sample, tokenizer, model.cfg, tiles_per_image)
    cand_ids = [tokenizer.encode(c) for c in candidates]
    assert all(ci for ci in cand_ids), candidates
    k = max(len(ci) for ci in cand_ids)
    n = len(candidates)
    bucket = config.length_bucket
    t = ((len(ids) + k + bucket - 1) // bucket) * bucket

    rows = np.full((n, t), tokenizer.pad_id, dtype=np.int32)
    cand_tok = np.zeros((n, k), dtype=np.int32)
    cand_mask = np.zeros((n, k), dtype=np.float32)
    for r, ci in enumerate(cand_ids):
        rows[r, : len(ids)] = ids
        rows[r, len(ids): len(ids) + len(ci)] = ci
        cand_tok[r, : len(ci)] = ci
        cand_mask[r, : len(ci)] = 1.0
    scores = _score_fn(model, n, t, k)(
        params, jnp.asarray(rows), jnp.asarray(tiles),
        jnp.asarray(len(ids), jnp.int32), jnp.asarray(cand_tok),
        jnp.asarray(cand_mask))
    return np.asarray(scores)


def predict_with_batcher(
    batcher,
    tokenizer: SpatialTokenizer,
    samples: list[dict],
    image_loader: Callable[[str], np.ndarray],
    config: EvalRunConfig,
) -> list[str]:
    """Serve an eval campaign through a continuous batcher (models/
    serving.ContinuousBatcher or models/paged_kv.PagedBatcher).

    This is where the paged features earn their keep on MultiSPA eval:
    many records reference the same image pair, so
    `PagedConfig(prefix_cache=True)` pays the image-context prefill
    once per image; `speculate`/`kv_dtype` compose the same way. The
    batcher's own config governs max_new_tokens and decode behavior.

    Returns (texts, confidences): `confidences` is the per-sample mean
    token logprob when the batcher runs with `logprobs=True` (None for
    empty outputs), else None.
    """
    assert batcher.eos_id == tokenizer.eos_id, \
        (batcher.eos_id, tokenizer.eos_id)
    requests = []
    for s in samples:
        stacks = [tile_image(image_loader(p), config.data.preprocess)
                  for p in s["image"]]
        tiles_per_image = [st.shape[0] for st in stacks]
        tiles = np.concatenate(stacks, axis=0)
        ids = build_prompt_ids(s, tokenizer, batcher.model.cfg,
                               tiles_per_image)
        requests.append((np.asarray(ids, dtype=np.int32), tiles))
    outs = batcher.generate_all(requests)     # eos-cut, request order
    confs = None
    if getattr(batcher.config, "logprobs", False):
        lps = batcher.request_logprobs
        confs = [float(np.mean(lps[rid])) if lps.get(rid) else None
                 for rid in range(len(requests))]
    return [tokenizer.decode(np.asarray(o)) for o in outs], confs


def run_eval(
    model: MultiFrameMLLM,
    params,
    tokenizer: SpatialTokenizer,
    samples: Iterable[dict],
    image_loader: Callable[[str], np.ndarray],
    config: EvalRunConfig | None = None,
    score_config: ScoreConfig | None = None,
    batch_size: int = 1,
    batcher=None,
) -> dict:
    """Greedy-decode every sample and return eval_harness aggregates,
    plus the raw predictions under "predictions". `batch_size > 1` uses
    the batched serving path (per-row prompt lengths) in chunks;
    `batcher` routes the whole campaign through a continuous/paged
    batcher instead (see predict_with_batcher). A batcher running with
    `logprobs=True` additionally yields report["confidences"]: per
    sample, the mean token logprob of its decoded answer (None for
    MC-logprob-scored records and empty outputs) plus the aggregate
    "mean_token_logprob"."""
    config = config or EvalRunConfig()
    samples = list(samples)
    batcher_confs: list | None = None

    def decode_all(subset: list[dict]) -> list[str]:
        nonlocal batcher_confs
        if not subset:
            return []
        if batcher is not None:
            texts, batcher_confs = predict_with_batcher(
                batcher, tokenizer, subset, image_loader, config)
            return texts
        if batch_size <= 1:
            return [predict_sample(model, params, tokenizer, s,
                                   image_loader, config)
                    for s in subset]
        out: list[str] = []
        for lo in range(0, len(subset), batch_size):
            out.extend(predict_batch(
                model, params, tokenizer, subset[lo: lo + batch_size],
                image_loader, config))
        return out

    mc_set = ({i for i, s in enumerate(samples)
               if mc_candidates(s) is not None}
              if config.mc_logprob else set())
    rest_pred = iter(decode_all(
        [s for i, s in enumerate(samples) if i not in mc_set]))
    predictions = []
    for i, s in enumerate(samples):
        if i in mc_set:
            cands = mc_candidates(s)
            scores = score_candidates(model, params, tokenizer, s,
                                      cands, image_loader, config)
            predictions.append(cands[int(np.argmax(scores))])
        else:
            predictions.append(next(rest_pred))
    report = evaluate(samples, predictions, score_config)
    report["predictions"] = predictions
    if batcher_confs is not None:
        conf_iter = iter(batcher_confs)
        confidences = [None if i in mc_set else next(conf_iter)
                       for i in range(len(samples))]
        known = [c for c in confidences if c is not None]
        report["confidences"] = confidences
        report["mean_token_logprob"] = (
            float(np.mean(known)) if known else None)
    return report
