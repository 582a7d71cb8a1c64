"""BERT parity vs HuggingFace transformers BertModel (random weights,
constructed offline), through the import_hf_bert converter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from clip_for_dl_tpu.models.bert import BertEncoder, import_hf_bert

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_model():
    cfg = transformers.BertConfig(
        vocab_size=211,
        hidden_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=96,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    m = transformers.BertModel(cfg)
    m.eval()
    return m


@pytest.fixture(scope="module")
def flax_bert(hf_model):
    model = BertEncoder(
        vocab_size=211, hidden=64, layers=3, heads=4,
        intermediate=128, max_position=96, dropout=0.0,
    )
    params = import_hf_bert(hf_model.state_dict(), layers=3)
    return model, {"params": jax.tree.map(jnp.asarray, params)}


def test_last_hidden_state_parity(rng, hf_model, flax_bert):
    model, variables = flax_bert
    ids = rng.integers(0, 211, (2, 17), dtype=np.int64)
    mask = np.ones((2, 17), np.int64)
    mask[0, 12:] = 0  # padded sample
    with torch.no_grad():
        want = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()
    got = model.apply(
        variables, jnp.asarray(ids), jnp.asarray(mask)
    )
    # Padded positions attend too in both, but their outputs may diverge in
    # masked positions' keys only — compare valid positions.
    np.testing.assert_allclose(np.asarray(got)[1], want[1], atol=3e-5)
    np.testing.assert_allclose(np.asarray(got)[0, :12], want[0, :12], atol=3e-5)


def test_cls_pool_matches_hf_cls(rng, hf_model, flax_bert):
    model, variables = flax_bert
    ids = rng.integers(0, 211, (3, 9), dtype=np.int64)
    mask = np.ones((3, 9), np.int64)
    with torch.no_grad():
        want = hf_model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state[:, 0, :].numpy()
    hidden = model.apply(variables, jnp.asarray(ids), jnp.asarray(mask))
    got = model.cls_pool(hidden)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)


def test_attention_weights_sown(rng, flax_bert):
    model, variables = flax_bert
    ids = rng.integers(0, 211, (1, 8), dtype=np.int64)
    _, inter = model.apply(
        variables, jnp.asarray(ids), sow_weights=True, mutable=["intermediates"]
    )
    w = inter["intermediates"]["layer_0"]["attention"]["attention_weights"][0]
    assert w.shape == (1, 4, 8, 8)
    np.testing.assert_allclose(
        np.asarray(w.sum(-1)), np.ones((1, 4, 8)), atol=1e-5
    )
