"""Bidirectional checkpoint bridge: export → torch mirror load → identical
forward; and export → re-import roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from clip_for_dl_tpu.core.config import ModelConfig
from clip_for_dl_tpu.models import CXRClip
from clip_for_dl_tpu.models.torch_export import (
    export_reference_checkpoint,
    save_reference_checkpoint,
)
from clip_for_dl_tpu.testing import TorchResidualProjection, TorchResNet

CFG = ModelConfig(
    image_size=32, max_text_length=8, vocab_size=64, text_embedding_dim=16,
    text_layers=1, text_heads=2, text_intermediate_dim=32,
    shared_embedding_dim=64, text_max_position=16,
    resnet_stages=(1, 1, 1, 1), resnet_width=8,
)


def _variables():
    model = CXRClip(CFG)
    return model, model.init(
        jax.random.key(3), jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 8), jnp.int32)
    )


def test_exported_resnet_loads_into_torch_mirror(rng):
    model, variables = _variables()
    ckpt = export_reference_checkpoint(variables, epoch=5, text_layers=1)
    assert ckpt["epoch"] == 5
    t_resnet = TorchResNet(CFG.resnet_stages, CFG.resnet_width)
    t_resnet.load_state_dict(
        {k: torch.from_numpy(np.asarray(v, np.float32))
         if np.issubdtype(np.asarray(v).dtype, np.floating)
         else torch.from_numpy(np.asarray(v))
         for k, v in ckpt["models"]["resnet"].items()}
    )
    t_resnet.eval()
    x = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)
    want = model.apply(
        variables, jnp.asarray(x), method="encode_image_with_stage4"
    )[0]
    # torch mirror gives the pooled 2048-d embedding; compare tower outputs
    with torch.no_grad():
        got = t_resnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    tower_out = model.image_tower if hasattr(model, "image_tower") else None
    from clip_for_dl_tpu.models.resnet import ResNet

    tower = ResNet(stage_sizes=CFG.resnet_stages, width=CFG.resnet_width)
    ours = np.asarray(tower.apply(
        {"params": variables["params"]["image_tower"],
         "batch_stats": variables["batch_stats"]["image_tower"]},
        jnp.asarray(x),
    ))
    np.testing.assert_allclose(got, ours, atol=2e-5)


def test_pth_roundtrip_reimport(tmp_path, rng):
    """save → import_reference_checkpoint → identical params."""
    from clip_for_dl_tpu.train.checkpoint import import_reference_checkpoint

    model, variables = _variables()
    path = str(tmp_path / "exported.pth")
    save_reference_checkpoint(variables, path, epoch=2, text_layers=1)
    back = import_reference_checkpoint(path)
    assert back["epoch"] == 2
    orig = np.asarray(
        variables["params"]["image_projector"]["projection"]["kernel"]
    )
    np.testing.assert_allclose(
        back["params"]["image_projector"]["projection"]["kernel"], orig,
        atol=1e-6,
    )
    np.testing.assert_allclose(
        back["params"]["image_tower"]["conv1"]["kernel"],
        np.asarray(variables["params"]["image_tower"]["conv1"]["kernel"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        back["params"]["text_tower"]["layer_0"]["attention"]["query"]["kernel"],
        np.asarray(
            variables["params"]["text_tower"]["layer_0"]["attention"]["query"]["kernel"]
        ),
        atol=1e-6,
    )
