"""MLLM VQA eval harness (tools/eval_vlm.py) + native Qwen3-VL preprocessing.

Covers reference P16 (llava/eval benchmark drivers): scoring/aggregation,
pixel-patch parity vs transformers' Qwen2VLImageProcessor, and an
end-to-end accuracy run over a tiny random Qwen3-VL checkpoint dir with
10 bundled image questions.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
import eval_vlm  # noqa: E402


# ---------------------------------------------------------------------------
# scoring
# ---------------------------------------------------------------------------


def test_score_answer():
    assert eval_vlm.score_answer("Yes", "yes")
    assert eval_vlm.score_answer("yes, it is.", "yes")
    assert not eval_vlm.score_answer("no", "yes")
    assert eval_vlm.score_answer("The cat", "cat")  # article-stripped
    assert not eval_vlm.score_answer("maybe yes", "yes")


def test_aggregate_per_category():
    results = [
        {"correct": True, "category": "color"},
        {"correct": False, "category": "color"},
        {"correct": True, "category": None},
    ]
    s = eval_vlm.aggregate(results)
    assert s["n"] == 3
    assert abs(s["accuracy"] - 2 / 3) < 1e-3  # aggregate rounds to 4 decimals
    assert s["per_category"]["color"] == 0.5
    assert s["per_category"]["all"] == 1.0


# ---------------------------------------------------------------------------
# native preprocessing parity vs HF Qwen2VLImageProcessor
# ---------------------------------------------------------------------------


def test_patches_match_hf_image_processor():
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import (
        Qwen2VLImageProcessor,
    )

    from omnivideo_tpu.models.qwen3vl.preprocess import preprocess_image

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
    from PIL import Image

    pil = Image.fromarray(img)

    hf = Qwen2VLImageProcessor(patch_size=4, temporal_patch_size=2, merge_size=2,
                               min_pixels=56 * 56, max_pixels=28 * 28 * 128)
    out = hf(images=[pil], return_tensors="np")
    ours, grid = preprocess_image(pil, patch_size=4, temporal_patch_size=2,
                                  merge_size=2, min_pixels=56 * 56,
                                  max_pixels=28 * 28 * 128)
    assert tuple(out["image_grid_thw"][0]) == grid
    np.testing.assert_allclose(ours, out["pixel_values"], rtol=0, atol=2e-2)


# ---------------------------------------------------------------------------
# end-to-end over a tiny random checkpoint dir + 10-sample fixture
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_ckpt_dir(tmp_path_factory) -> Path:
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers.models.qwen2.tokenization_qwen2_fast import Qwen2TokenizerFast
    from transformers.models.qwen3_vl.configuration_qwen3_vl import (
        Qwen3VLConfig as HFConfig,
    )
    from transformers.models.qwen3_vl.modeling_qwen3_vl import (
        Qwen3VLForConditionalGeneration,
    )

    d = tmp_path_factory.mktemp("tiny_qwen3vl")

    hf_cfg = HFConfig(
        text_config=dict(
            vocab_size=160, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, rope_theta=10000.0, tie_word_embeddings=False,
            rope_scaling={"rope_type": "default", "mrope_section": [2, 3, 3],
                          "mrope_interleaved": True},
        ),
        vision_config=dict(
            hidden_size=32, intermediate_size=64, depth=2, num_heads=4,
            in_channels=3, patch_size=4, temporal_patch_size=2,
            spatial_merge_size=2, out_hidden_size=48,
            num_position_embeddings=36, deepstack_visual_indexes=[0],
        ),
        image_token_id=151, video_token_id=152, vision_start_token_id=150,
        vision_end_token_id=153,
    )
    torch.manual_seed(0)
    Qwen3VLForConditionalGeneration(hf_cfg).eval().float().save_pretrained(d)

    vocab = {f"tok{i}": i for i in range(149)}
    vocab.update({"user": 149, "<|vision_start|>": 150, "<|image_pad|>": 151,
                  "<|video_pad|>": 152, "<|vision_end|>": 153,
                  "<|im_start|>": 154, "<|im_end|>": 155,
                  "yes": 156, "no": 157, "<unk>": 158, "assistant": 159})
    tk = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tk.pre_tokenizer = pre_tokenizers.WhitespaceSplit()
    tok = Qwen2TokenizerFast(
        tokenizer_object=tk, unk_token="<unk>", pad_token="<unk>",
        eos_token="<|im_end|>",
        additional_special_tokens=[
            "<|vision_start|>", "<|vision_end|>", "<|image_pad|>",
            "<|video_pad|>", "<|im_start|>"],
    )
    tok.save_pretrained(d)
    return d


@pytest.fixture(scope="module")
def vqa_fixture(tiny_ckpt_dir) -> Path:
    from PIL import Image

    rng = np.random.default_rng(1)
    rows = []
    for i in range(10):
        img = Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8))
        img.save(tiny_ckpt_dir / f"q{i}.png")
        rows.append({
            "question_id": i,
            "text": "yes no ?",
            "image": f"q{i}.png",
            "answer": "yes" if i % 2 == 0 else "no",
            "category": "existence" if i < 5 else "color",
        })
    qf = tiny_ckpt_dir / "questions.jsonl"
    qf.write_text("\n".join(json.dumps(r) for r in rows))
    return qf


def test_eval_vlm_end_to_end(tiny_ckpt_dir, vqa_fixture):
    rows = [json.loads(l) for l in open(vqa_fixture)]
    for r in rows:
        r["image"] = str(tiny_ckpt_dir / r["image"])

    answer_fn = eval_vlm.make_jax_answer_fn(
        str(tiny_ckpt_dir), max_new_tokens=3, min_pixels=1)
    results, summary = eval_vlm.evaluate(rows, answer_fn)

    assert summary["n"] == 10
    assert 0.0 <= summary["accuracy"] <= 1.0
    assert set(summary["per_category"]) == {"existence", "color"}
    # every prediction decoded something deterministic from the tiny model
    assert all(isinstance(r["prediction"], str) for r in results)
    preds = [r["prediction"] for r in results]
    assert len(set(preds)) >= 1  # decode ran (values are model-dependent)
