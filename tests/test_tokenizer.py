"""Tokenizer parity vs HF transformers BertTokenizer on a constructed vocab."""

import numpy as np
import pytest

from clip_for_dl_tpu.text import BertTokenizer, build_tiny_vocab

transformers = pytest.importorskip("transformers")

WORDS = [
    "the chest x-ray shows cardiomegaly and pleural effusion",
    "No acute cardiopulmonary abnormality.",
    "Heart size within normal limits, stable mediastinum; lungs are clear!",
    "Degenerative changes of the spine (mild), T12 compression?",
]


@pytest.fixture(scope="module", params=[False, True], ids=["cased", "uncased"])
def tokenizers(request, tmp_path_factory):
    lower = request.param
    vocab = build_tiny_vocab(
        [w for text in WORDS for w in text.split()]
        + ["cardio", "##megaly", "effu", "##sion", "medias", "##tinum"],
        do_lower_case=lower,
    )
    path = tmp_path_factory.mktemp("vocab") / f"vocab_{lower}.txt"
    path.write_text(
        "\n".join(sorted(vocab, key=vocab.get)) + "\n", encoding="utf-8"
    )
    ours = BertTokenizer(str(path), do_lower_case=lower)
    theirs = transformers.BertTokenizer(
        str(path), do_lower_case=lower, do_basic_tokenize=True
    )
    return ours, theirs


def test_tokenize_parity(tokenizers):
    ours, theirs = tokenizers
    for text in WORDS + ["cardiomegaly effusion mediastinum", "unknownwordhere"]:
        assert ours.tokenize(text) == theirs.tokenize(text), text


def test_encode_max_length_parity(tokenizers):
    ours, theirs = tokenizers
    enc_o = ours.encode(WORDS, max_length=24)
    enc_t = theirs(
        list(WORDS), padding="max_length", truncation=True, max_length=24,
        return_tensors="np",
    )
    np.testing.assert_array_equal(enc_o["input_ids"], enc_t["input_ids"])
    np.testing.assert_array_equal(enc_o["attention_mask"], enc_t["attention_mask"])


def test_encode_truncation_parity(tokenizers):
    ours, theirs = tokenizers
    long_text = " ".join(["cardiomegaly effusion"] * 50)
    enc_o = ours.encode([long_text], max_length=16)
    enc_t = theirs(
        [long_text], padding="max_length", truncation=True, max_length=16,
        return_tensors="np",
    )
    np.testing.assert_array_equal(enc_o["input_ids"], enc_t["input_ids"])


def test_decode_roundtrip(tokenizers):
    ours, _ = tokenizers
    enc = ours.encode(["cardiomegaly effusion"], max_length=12)
    text = ours.decode(enc["input_ids"][0])
    assert "cardiomegaly" in text.lower()
