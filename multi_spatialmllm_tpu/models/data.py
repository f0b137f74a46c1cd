"""Training-batch assembly: MultiSPA JSONL -> model-ready arrays.

Bridges the data engine (L4 JSONL with `conversations` + image paths) to
the model (L5): tokenizes the conversation with IMG_CONTEXT expansion at
every `<image>` placeholder, tiles the frames, masks the loss to assistant
turns, and pads everything to static shapes for jit. The reference leaves
this to InternVL-2's SFT stack (README.md:194-200).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Iterator, Sequence

import numpy as np

from .mllm import MLLMConfig
from .preprocess import PreprocessConfig, tile_image
from .tokenizer import (
    ASSISTANT,
    HUMAN,
    IMG_CONTEXT,
    IMG_END,
    IMG_START,
    SpatialTokenizer,
)

IGNORE_INDEX = -100


@dataclasses.dataclass
class DataConfig:
    max_seq_len: int = 2048
    max_tiles: int = 14           # per sample, across all frames
    preprocess: PreprocessConfig = PreprocessConfig(resize_hw=None)


def render_conversation(
    sample: dict,
    tokens_per_tile: int,
    tiles_per_image: Sequence[int],
) -> list[tuple[str, str]]:
    """(role, text) turns with every `<image>` placeholder replaced by
    `<img><IMG_CONTEXT>*n</img>` for that frame's tile count (InternVL
    convention)."""
    turns = []
    img_idx = 0
    for msg in sample["conversations"]:
        text = msg["value"]
        while "<image>" in text:
            n_ctx = tokens_per_tile * tiles_per_image[img_idx]
            block = IMG_START + IMG_CONTEXT * n_ctx + IMG_END
            text = text.replace("<image>", block, 1)
            img_idx += 1
        turns.append((msg["from"], text))
    return turns


def encode_sample(
    sample: dict,
    tokenizer: SpatialTokenizer,
    model_cfg: MLLMConfig,
    image_loader: Callable[[str], np.ndarray],
    config: DataConfig | None = None,
):
    """One JSONL record -> (input_ids, labels, tiles, n_tiles) or None if
    it does not fit the static budget."""
    config = config or DataConfig()
    tile_stacks = []
    tiles_per_image = []
    for rel_path in sample["image"]:
        img = image_loader(rel_path)
        tiles = tile_image(img, config.preprocess)
        tile_stacks.append(tiles)
        tiles_per_image.append(tiles.shape[0])
    total_tiles = int(sum(tiles_per_image))
    if total_tiles > config.max_tiles:
        return None

    turns = render_conversation(sample, model_cfg.tokens_per_tile,
                                tiles_per_image)
    ids: list[int] = [tokenizer.bos_id]
    labels: list[int] = [IGNORE_INDEX]
    for role, text in turns:
        prefix = HUMAN if role == "human" else ASSISTANT
        toks = tokenizer.encode(prefix + text)
        ids.extend(toks)
        if role == "human":
            labels.extend([IGNORE_INDEX] * len(toks))
        else:
            # supervise the answer + eos, not the role-prefix token
            labels.extend([IGNORE_INDEX] + toks[1:])
            ids.append(tokenizer.eos_id)
            labels.append(tokenizer.eos_id)
    if len(ids) > config.max_seq_len:
        return None

    pad = config.max_seq_len - len(ids)
    input_ids = np.asarray(ids + [tokenizer.pad_id] * pad, dtype=np.int32)
    label_arr = np.asarray(labels + [IGNORE_INDEX] * pad, dtype=np.int32)
    # IMG_CONTEXT positions carry no text loss
    label_arr[input_ids == tokenizer.img_context_id] = IGNORE_INDEX

    tile_tensor = np.concatenate(tile_stacks, axis=0)
    pad_tiles = np.zeros(
        (config.max_tiles - total_tiles,) + tile_tensor.shape[1:],
        dtype=tile_tensor.dtype)
    tiles_out = np.concatenate([tile_tensor, pad_tiles], axis=0)
    return input_ids, label_arr, tiles_out, total_tiles


def batch_iterator(
    samples: Sequence[dict],
    tokenizer: SpatialTokenizer,
    model_cfg: MLLMConfig,
    image_loader: Callable[[str], np.ndarray],
    batch_size: int,
    config: DataConfig | None = None,
    drop_remainder: bool = True,
) -> Iterator[dict]:
    """Static-shape batches: input_ids [B,T] int32, labels [B,T] int32,
    tiles [B, max_tiles, H, W, 3] float32."""
    config = config or DataConfig()
    buf_ids, buf_labels, buf_tiles = [], [], []
    for sample in samples:
        enc = encode_sample(sample, tokenizer, model_cfg, image_loader,
                            config)
        if enc is None:
            continue
        input_ids, labels, tiles, _ = enc
        buf_ids.append(input_ids)
        buf_labels.append(labels)
        buf_tiles.append(tiles)
        if len(buf_ids) == batch_size:
            yield {
                "input_ids": np.stack(buf_ids),
                "labels": np.stack(buf_labels),
                "tiles": np.stack(buf_tiles),
            }
            buf_ids, buf_labels, buf_tiles = [], [], []
    if buf_ids and not drop_remainder:
        yield {
            "input_ids": np.stack(buf_ids),
            "labels": np.stack(buf_labels),
            "tiles": np.stack(buf_tiles),
        }


def prefetch_batches(
    samples: Sequence[dict],
    tokenizer: SpatialTokenizer,
    model_cfg: MLLMConfig,
    image_loader: Callable[[str], np.ndarray],
    batch_size: int,
    config: DataConfig | None = None,
    drop_remainder: bool = True,
    num_workers: int | None = None,
    prefetch: int = 2,
) -> Iterator[dict]:
    """`batch_iterator` with the host work overlapped against device
    compute (SURVEY.md §7 hard part #4: JPEG decode / tiling / tokenize
    are host-bound and must not starve the TPU).

    Worker threads run `encode_sample` (cv2 and the tokenizers library
    release the GIL); results are consumed strictly in submission order,
    so batch composition is IDENTICAL to the synchronous iterator for any
    worker count (test-asserted). A producer thread keeps up to
    `prefetch` assembled batches queued ahead of the consumer.
    """
    import queue as queue_mod
    import threading
    from concurrent.futures import ThreadPoolExecutor

    config = config or DataConfig()
    if num_workers is None:
        num_workers = min(8, __import__("os").cpu_count() or 1)
    if num_workers <= 1:
        yield from batch_iterator(samples, tokenizer, model_cfg,
                                  image_loader, batch_size, config,
                                  drop_remainder)
        return

    out_q: queue_mod.Queue = queue_mod.Queue(maxsize=prefetch)
    _END = object()
    stop = threading.Event()  # set when the consumer abandons the iterator

    class _Abandoned(Exception):
        pass

    def put(item):
        # bounded put that aborts once the consumer is gone, so the
        # producer thread and its executor never leak
        while True:
            if stop.is_set():
                raise _Abandoned()
            try:
                out_q.put(item, timeout=0.1)
                return
            except queue_mod.Full:
                continue

    def produce():
        try:
            with ThreadPoolExecutor(max_workers=num_workers) as pool:
                window = 4 * num_workers
                futures: list = []
                buf_ids, buf_labels, buf_tiles = [], [], []

                def drain_one():
                    enc = futures.pop(0).result()
                    if enc is None:
                        return
                    input_ids, labels, tiles, _ = enc
                    buf_ids.append(input_ids)
                    buf_labels.append(labels)
                    buf_tiles.append(tiles)
                    if len(buf_ids) == batch_size:
                        put({
                            "input_ids": np.stack(buf_ids),
                            "labels": np.stack(buf_labels),
                            "tiles": np.stack(buf_tiles),
                        })
                        buf_ids.clear()
                        buf_labels.clear()
                        buf_tiles.clear()

                for sample in samples:
                    if stop.is_set():
                        raise _Abandoned()
                    futures.append(pool.submit(
                        encode_sample, sample, tokenizer, model_cfg,
                        image_loader, config))
                    if len(futures) >= window:
                        drain_one()
                while futures:
                    drain_one()
                if buf_ids and not drop_remainder:
                    put({
                        "input_ids": np.stack(buf_ids),
                        "labels": np.stack(buf_labels),
                        "tiles": np.stack(buf_tiles),
                    })
            put(_END)
        except _Abandoned:
            pass
        except BaseException as exc:  # surface worker failures
            try:
                put(exc)
            except _Abandoned:
                pass

    thread = threading.Thread(target=produce, daemon=True)
    thread.start()
    try:
        while True:
            item = out_q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        thread.join()
