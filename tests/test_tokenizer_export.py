"""spiece.model → fast tokenizer conversion without the sentencepiece runtime.

Covers reference C6 (omnivideo/modules/tokenizers.py:36): a checkpoint dir
shipping ONLY spiece.model must load. A tiny unigram ModelProto is built
in-test with transformers' bundled protobuf schema — no sentencepiece needed
to create or consume it.
"""

from pathlib import Path

import pytest


@pytest.fixture(scope="module")
def sp_only_dir(tmp_path_factory) -> Path:
    from transformers.convert_slow_tokenizer import import_protobuf

    pb2 = import_protobuf()
    m = pb2.ModelProto()

    def add(piece, score, ptype=1):  # 1=NORMAL 2=UNKNOWN 3=CONTROL
        p = m.pieces.add()
        p.piece, p.score, p.type = piece, score, ptype

    add("<pad>", 0.0, 3)
    add("</s>", 0.0, 3)
    add("<unk>", 0.0, 2)
    for i, w in enumerate(
        ["▁hello", "▁world", "▁a", "hello", "world",
         "▁", "h", "e", "l", "o", "w", "r", "d", "a"]
    ):
        add(w, -float(i + 1))

    m.trainer_spec.model_type = 1  # UNIGRAM
    m.trainer_spec.unk_id = 2
    m.trainer_spec.vocab_size = len(m.pieces)
    m.normalizer_spec.name = "identity"
    m.normalizer_spec.add_dummy_prefix = True

    d = tmp_path_factory.mktemp("sp_only_ckpt")
    (d / "spiece.model").write_bytes(m.SerializeToString())
    return d


def test_convert_spiece_to_fast(sp_only_dir):
    from omnivideo_tpu.utils.spm_convert import convert_spiece_to_fast

    out = convert_spiece_to_fast(sp_only_dir / "spiece.model")
    assert out.exists()

    from transformers import PreTrainedTokenizerFast

    tok = PreTrainedTokenizerFast(tokenizer_file=str(out), unk_token="<unk>",
                                  eos_token="</s>", pad_token="<pad>")
    ids = tok("hello world")["input_ids"]
    # unigram picks the whole-word pieces: ▁hello=3 ▁world=4, then </s>=1
    assert ids == [3, 4, 1]
    (out).unlink()


def test_hf_tokenizer_wrapper_auto_converts(sp_only_dir):
    import jax.numpy as jnp

    from omnivideo_tpu.models.t5 import HuggingfaceTokenizer

    tok = HuggingfaceTokenizer(str(sp_only_dir), seq_len=8)
    ids, mask = tok(["hello world"])
    assert ids.shape == (1, 8) and mask.shape == (1, 8)
    assert ids[0, :3].tolist() == [3, 4, 1]
    assert mask[0].tolist() == [1, 1, 1, 0, 0, 0, 0, 0]
    assert ids[0, 3:].tolist() == [0] * 5  # <pad>=0
    # and the converted file is cached in the dir for the next load
    assert (sp_only_dir / "tokenizer.json").exists()


def test_extra_ids_appended(sp_only_dir):
    from omnivideo_tpu.utils.spm_convert import convert_spiece_to_fast

    out = convert_spiece_to_fast(sp_only_dir / "spiece.model",
                                 sp_only_dir / "tok_extra.json", extra_ids=4)
    from transformers import PreTrainedTokenizerFast

    tok = PreTrainedTokenizerFast(tokenizer_file=str(out))
    n_pieces = 17
    assert tok.convert_tokens_to_ids("<extra_id_3>") == n_pieces
    assert tok.convert_tokens_to_ids("<extra_id_0>") == n_pieces + 3
