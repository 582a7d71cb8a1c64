"""Parity tests: flax heads vs torch modules built to the reference's spec,
weights flowing through the torch_import converters."""

import flax.linen  # noqa: F401  (ensure flax importable before torch on some stacks)
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

from clip_for_dl_tpu.models.attention_fusion import (
    AdditiveMultiModalAttention,
    CrossModalTransformerFusion,
    MLDAdapterBlock,
)
from clip_for_dl_tpu.models.heads import (
    CAdapter,
    ImageProjection,
    MultiViewFusion,
    SharedEmbeddingAdapter,
    TextProjection,
)
from clip_for_dl_tpu.models import torch_import as ti

torch.manual_seed(0)


class TorchResidualProjection(tnn.Module):
    """Reference head shape: Linear→GELU→Linear→Dropout→+res→LayerNorm
    (02 nb cell 20)."""

    def __init__(self, in_dim, out_dim, attr="image_projection"):
        super().__init__()
        setattr(self, attr, tnn.Linear(in_dim, out_dim))
        self._attr = attr
        self.fc = tnn.Linear(out_dim, out_dim)
        self.layer_norm = tnn.LayerNorm(out_dim)

    def forward(self, x):
        p = getattr(self, self._attr)(x)
        h = F.gelu(p)
        h = self.fc(h)
        return self.layer_norm(h + p)


@pytest.mark.parametrize("cls,in_dim,attr", [
    (ImageProjection, 2048, "image_projection"),
    (TextProjection, 768, "text_projection"),
])
def test_residual_projection_parity(rng, cls, in_dim, attr):
    tmod = TorchResidualProjection(in_dim, 512, attr).eval()
    x = rng.standard_normal((4, in_dim)).astype(np.float32)
    want = tmod(torch.from_numpy(x)).detach().numpy()
    params = ti.import_residual_projection(tmod.state_dict(), attr)
    got = cls(out_dim=512).apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_image_projection_flattens_conv_output(rng):
    tmod = TorchResidualProjection(2048, 512).eval()
    params = ti.import_residual_projection(tmod.state_dict())
    x = rng.standard_normal((4, 2048, 1, 1)).astype(np.float32)
    got = ImageProjection(out_dim=512).apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)
    )
    want = tmod(torch.from_numpy(x.reshape(4, -1))).detach().numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


class TorchMultiViewFusion(tnn.Module):
    def __init__(self, dim=512, dropout=0.2):
        super().__init__()
        self.fusion = tnn.Sequential(
            tnn.Linear(dim * 2, dim), tnn.ReLU(), tnn.Dropout(dropout),
            tnn.Linear(dim, dim),
        )

    def forward(self, f, l):
        return self.fusion(torch.cat([f, l], dim=1))


def test_multiview_fusion_parity(rng):
    tmod = TorchMultiViewFusion().eval()
    f = rng.standard_normal((3, 512)).astype(np.float32)
    l = rng.standard_normal((3, 512)).astype(np.float32)
    want = tmod(torch.from_numpy(f), torch.from_numpy(l)).detach().numpy()
    params = ti.import_multiview_fusion(tmod.state_dict())
    got = MultiViewFusion().apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(f), jnp.asarray(l),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_cadapter_parity(rng):
    tmod = tnn.Linear(512, 16).eval()
    x = rng.standard_normal((5, 512)).astype(np.float32)
    want = tmod(torch.from_numpy(x)).detach().numpy()
    params = ti.import_linear_classifier(tmod.state_dict())
    got = CAdapter().apply(
        {"params": jax.tree.map(jnp.asarray, params)}, jnp.asarray(x)
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_shared_embedding_adapter_shape(rng):
    m = SharedEmbeddingAdapter()
    img = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
    params = m.init(jax.random.key(0), img, txt)
    out = m.apply(params, img, txt)
    assert out.shape == (4, 16)


from clip_for_dl_tpu.testing import TorchAdditiveAttention  # noqa: E402


def test_additive_attention_parity(rng):
    tmod = TorchAdditiveAttention().eval()
    img = rng.standard_normal((4, 512)).astype(np.float32)
    txt = rng.standard_normal((16, 512)).astype(np.float32)
    want_feat, want_w = tmod(torch.from_numpy(img), torch.from_numpy(txt))
    params = ti.import_additive_attention(tmod.state_dict())
    got_feat, got_w = AdditiveMultiModalAttention().apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(img), jnp.asarray(txt),
    )
    np.testing.assert_allclose(np.asarray(got_w), want_w.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(got_feat), want_feat.detach().numpy(), atol=2e-5
    )


class TorchCrossModalFusion(tnn.Module):
    """multimodal_attention/multimodal_attention.py:6-82 semantics."""

    def __init__(self, image_dim=256, text_dim=96, dim=64, heads=8):
        super().__init__()
        self.image_projection = tnn.Linear(image_dim, dim)
        self.text_projection = tnn.Linear(text_dim, dim)
        self.multihead_attn = tnn.MultiheadAttention(dim, heads, dropout=0.0,
                                                     batch_first=True)
        self.layer_norm1 = tnn.LayerNorm(dim)
        self.layer_norm2 = tnn.LayerNorm(dim)
        self.feed_forward = tnn.Sequential(
            tnn.Linear(dim, dim * 4), tnn.GELU(), tnn.Dropout(0.0),
            tnn.Linear(dim * 4, dim), tnn.Dropout(0.0),
        )
        # The reference declares Linear(dim*2, dim) which only type-checks
        # when image_dim == dim (the module is never imported there); size to
        # the actual concat width instead.
        self.output_projection = tnn.Linear(image_dim + dim, dim)

    def forward(self, img, txt):
        ip = self.image_projection(img)
        tp = self.text_projection(txt)
        te = tp.unsqueeze(0).expand(ip.size(0), -1, -1)
        ie = ip.unsqueeze(1)
        attn_out, attn_w = self.multihead_attn(query=ie, key=te, value=te)
        x = self.layer_norm1(ie + attn_out)
        ff = self.feed_forward(x.squeeze(1))
        x = self.layer_norm2(x.squeeze(1) + ff)
        fused = torch.cat([img, x], dim=1)
        return self.output_projection(fused), attn_w


def test_cross_modal_fusion_parity(rng):
    tmod = TorchCrossModalFusion().eval()
    img = rng.standard_normal((3, 256)).astype(np.float32)
    txt = rng.standard_normal((16, 96)).astype(np.float32)
    want_feat, want_w = tmod(torch.from_numpy(img), torch.from_numpy(txt))
    params = ti.import_cross_modal_fusion(tmod.state_dict(), dim=64)
    got_feat, got_w = CrossModalTransformerFusion(
        image_dim=256, text_dim=96, dim=64, num_heads=8
    ).apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(img), jnp.asarray(txt),
    )
    np.testing.assert_allclose(
        np.asarray(got_feat), want_feat.detach().numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_w), want_w.detach().numpy(), atol=3e-5
    )


class TorchMLD(tnn.Module):
    """02 nb cell 36 semantics (dropout off for determinism)."""

    def __init__(self, dim=64, heads=8):
        super().__init__()
        self.cross_attn = tnn.MultiheadAttention(dim, heads, batch_first=True)
        self.norm = tnn.LayerNorm(dim)
        self.fc = tnn.Linear(dim, 1)

    def forward(self, txt, img):
        a, _ = self.cross_attn(query=txt, key=img, value=img)
        x = self.norm(a + txt)
        return self.fc(x).squeeze(-1)


def test_mld_adapter_parity(rng):
    tmod = TorchMLD().eval()
    txt = rng.standard_normal((2, 16, 64)).astype(np.float32)
    img = rng.standard_normal((2, 1, 64)).astype(np.float32)
    want = tmod(torch.from_numpy(txt), torch.from_numpy(img)).detach().numpy()
    params = ti.import_mld_adapter(tmod.state_dict(), dim=64)
    got = MLDAdapterBlock(dim=64, num_heads=8).apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(txt), jnp.asarray(img),
    )
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5)
