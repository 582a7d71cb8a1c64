"""Space-to-depth stem: exact equality with the standard 7×7/2 stem."""

import jax
import jax.numpy as jnp
import numpy as np

from clip_for_dl_tpu.models.resnet import ResNet, to_space_to_depth_params


def test_s2d_stem_exact_equality(rng):
    std = ResNet(stage_sizes=(1, 1, 1, 1), width=8)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = std.init(jax.random.key(0), x)
    want = std.apply(variables, x)

    s2d = ResNet(stage_sizes=(1, 1, 1, 1), width=8, space_to_depth=True)
    s2d_params = to_space_to_depth_params(variables["params"])
    got = s2d.apply(
        {"params": s2d_params, "batch_stats": variables["batch_stats"]}, x
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_s2d_train_mode_and_stage4(rng):
    s2d = ResNet(stage_sizes=(1, 1, 1, 1), width=8, space_to_depth=True)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)), jnp.float32)
    variables = s2d.init(jax.random.key(0), x)
    pooled, stage4 = s2d.apply(variables, x, capture_stage4=True)
    assert pooled.shape == (2, 256)
    _, mutated = s2d.apply(variables, x, train=True, mutable=["batch_stats"])
    assert "conv1_s2d" in variables["params"]
