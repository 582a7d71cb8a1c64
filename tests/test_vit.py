"""ViT parity vs a torch mirror of torchvision vit_b_16's topology and
state_dict naming (small geometry for CPU speed)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn

from clip_for_dl_tpu.models.vit import ViT, import_torchvision_vit_b16
from clip_for_dl_tpu.testing import TorchViT

torch.manual_seed(0)

H, HEADS, MLP, LAYERS, PATCH, IMG = 64, 4, 128, 2, 8, 32


def test_vit_parity(rng):
    tmod = TorchViT(image_size=IMG, patch=PATCH, hidden=H, layers=LAYERS,
                    heads=HEADS, mlp=MLP).eval()
    x = rng.standard_normal((2, 3, IMG, IMG)).astype(np.float32)
    with torch.no_grad():
        want = tmod(torch.from_numpy(x)).numpy()
    params = import_torchvision_vit_b16(tmod.state_dict(), LAYERS, H)
    model = ViT(
        image_size=IMG, patch=PATCH, hidden=H, layers=LAYERS,
        heads=HEADS, mlp_dim=MLP,
    )
    got = model.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(x.transpose(0, 2, 3, 1)),
    )
    assert got.shape == (2, H)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-4)


def test_vit_attention_sowing(rng):
    model = ViT(image_size=IMG, patch=PATCH, hidden=H, layers=LAYERS,
                heads=HEADS, mlp_dim=MLP)
    x = jnp.asarray(rng.standard_normal((1, IMG, IMG, 3)), jnp.float32)
    variables = model.init(jax.random.key(0), x)
    n = (IMG // PATCH) ** 2 + 1
    _, inter = model.apply(
        variables, x, sow_weights=True, mutable=["intermediates"]
    )
    for i in range(LAYERS):
        w = inter["intermediates"][f"layer_{i}"]["attention_weights"][0]
        assert w.shape == (1, HEADS, n, n)
        np.testing.assert_allclose(
            np.asarray(w).sum(-1), np.ones((1, HEADS, n)), atol=1e-5
        )


def test_gelu_approximate_knob_close_and_distinct(rng):
    """tanh-GELU serving knob: same weights load, outputs within the
    documented ~1e-3 relative envelope of the exact-erf tower, and the
    default (False) stays the torchvision-exact path."""
    exact = ViT(image_size=IMG, patch=PATCH, hidden=H, layers=LAYERS,
                heads=HEADS, mlp_dim=MLP)
    approx = ViT(image_size=IMG, patch=PATCH, hidden=H, layers=LAYERS,
                 heads=HEADS, mlp_dim=MLP, gelu_approximate=True)
    x = jnp.asarray(rng.standard_normal((2, IMG, IMG, 3)), jnp.float32)
    variables = exact.init(jax.random.key(0), x)
    a = np.asarray(exact.apply(variables, x))
    b = np.asarray(approx.apply(variables, x))
    assert not np.array_equal(a, b)  # the knob does something
    # stays close: small absolute drift on O(1)-magnitude CLS features
    assert np.abs(a - b).max() < 2e-2
    assert np.abs(a - b).mean() < 2e-3


def test_flash_flag_matches_plain_and_sows_fallback():
    """ViT(flash=True) reproduces the einsum formulation (CPU interpret
    kernel; deterministic, dropout off) and the sow_weights path falls
    back to the einsum form so rollout keeps working."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from clip_for_dl_tpu.models.vit import ViT

    kw = dict(image_size=32, patch=8, hidden=32, layers=2, heads=2,
              mlp_dim=64, dropout=0.0, dtype=jnp.float32)
    plain = ViT(**kw)
    flash = ViT(flash=True, **kw)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    variables = plain.init(jax.random.key(0), x)
    out_plain = plain.apply(variables, x)
    out_flash = flash.apply(variables, x)  # same params, same math
    np.testing.assert_allclose(
        np.asarray(out_flash), np.asarray(out_plain), atol=1e-5
    )
    # sow_weights path falls back to the einsum formulation (the kernel
    # never materializes probabilities) — rollout keeps working
    _, inter = flash.apply(
        variables, x, sow_weights=True, mutable=["intermediates"]
    )
    assert jax.tree.leaves(inter)  # attention weights sown (fallback path)
