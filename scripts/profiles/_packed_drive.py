import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))
import multi_spatialmllm_tpu; multi_spatialmllm_tpu.enable_compilation_cache()
import jax, numpy as np
print("backend:", jax.default_backend(), flush=True)
from multi_spatialmllm_tpu.models import mllm as M
from multi_spatialmllm_tpu.models.data import DataConfig, encode_unpadded, pack_samples
from multi_spatialmllm_tpu.models.preprocess import PreprocessConfig
from multi_spatialmllm_tpu.models.tokenizer import SpatialTokenizer
from multi_spatialmllm_tpu.models.llm import cross_entropy_loss

tok = SpatialTokenizer()
cfg = M.MLLMConfig(
    vit=M.ViTConfig(image_size=56, patch_size=14, hidden_size=32, num_layers=1, num_heads=2),
    llm=M.LLMConfig(vocab_size=tok.vocab_size, hidden_size=32, num_layers=2,
                    num_heads=4, num_kv_heads=2, ffn_size=64, dtype="float32"),
    img_context_id=tok.img_context_id)
model = M.MultiFrameMLLM(cfg)
dc = DataConfig(max_seq_len=160, max_tiles=4,
                preprocess=PreprocessConfig(tile_size=56, max_tiles=1, resize_hw=None))
samples = [
    {"image": ["s/0.jpg"], "conversations": [
        {"from": "human", "value": "<image>\nHow far is the point?"},
        {"from": "gpt", "value": "It is `1234` mm away."}]},
    {"image": ["s/1.jpg"], "conversations": [
        {"from": "human", "value": "<image>\nWhich moved left?"},
        {"from": "gpt", "value": "The camera moved left."}]},
]
def loader(p):
    seed = int(p.split("/")[-1].split(".")[0])
    return np.random.default_rng(seed).integers(0, 255, (56, 56, 3), dtype=np.uint8)
encs = [encode_unpadded(s, tok, cfg, loader, dc) for s in samples]
row = next(pack_samples(iter(encs), dc, tok.pad_id))
params = model.init(jax.random.key(0), row["input_ids"][None], row["tiles"][None])
packed = model.apply(params, row["input_ids"][None], row["tiles"][None],
                     positions=row["positions"][None], segment_ids=row["segment_ids"][None])
at = 0
for ids, labels, tiles in encs:
    solo = model.apply(params, ids[None], tiles[None])
    np.testing.assert_allclose(np.asarray(packed[0, at:at+len(ids)]),
                               np.asarray(solo[0]), atol=5e-4, rtol=5e-4)
    at += len(ids)
loss = float(cross_entropy_loss(packed[:, :-1], row["labels"][None, 1:]))
print("packed forward matches per-sample on TPU; packed loss", round(loss, 4), flush=True)
