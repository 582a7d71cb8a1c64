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


def test_encode_bucketed_selects_bucket(tokenizers):
    ours, _ = tokenizers
    enc = ours.encode_bucketed(["cardiomegaly effusion"], max_length=128,
                               buckets=(16, 32, 64))
    assert enc["input_ids"].shape[1] == 16
    long = " ".join(["cardiomegaly"] * 40)
    enc = ours.encode_bucketed([long], max_length=128, buckets=(16, 32, 64))
    assert enc["input_ids"].shape[1] in (64, 128)


def test_bucketed_equals_maxlength_through_bert(tokenizers, rng):
    """Masked attention makes the pad length invisible: BERT CLS features
    from bucketed encoding equal the max_length encoding."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_for_dl_tpu.models.bert import BertEncoder

    ours, _ = tokenizers
    texts = ["cardiomegaly effusion", "mediastinum lungs are clear"]
    full = ours.encode(texts, max_length=48)
    buck = ours.encode_bucketed(texts, max_length=48, buckets=(16,))
    assert buck["input_ids"].shape[1] < full["input_ids"].shape[1]

    model = BertEncoder(vocab_size=len(ours.vocab), hidden=32, layers=1,
                        heads=2, intermediate=64, max_position=64, dropout=0.0)
    variables = model.init(jax.random.key(0),
                           jnp.asarray(full["input_ids"]),
                           jnp.asarray(full["attention_mask"]))

    def cls(enc):
        h = model.apply(variables, jnp.asarray(enc["input_ids"]),
                        jnp.asarray(enc["attention_mask"]))
        return np.asarray(h[:, 0, :])

    np.testing.assert_allclose(cls(buck), cls(full), atol=1e-5)
