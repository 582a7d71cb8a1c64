import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_for_dl_tpu.core import (
    DISEASE_LABELS,
    KeyChain,
    Policy,
    create_mesh,
    get_preset,
    shard_batch,
)


def test_disease_labels():
    assert len(DISEASE_LABELS) == 16
    assert DISEASE_LABELS[0] == "Cardiomegaly"
    assert DISEASE_LABELS[-1] == "Normal"


def test_presets_pin_reference_divergences():
    nb = get_preset("pretrain_clip")
    assert nb.data.batch_size == 16
    assert nb.model.max_text_length == 200
    assert nb.model.temperature == 2.0
    assert nb.augment.mean[0] == pytest.approx(0.48145466)
    sc = get_preset("scripts_train")
    assert sc.data.batch_size == 32
    assert sc.model.max_text_length == 512
    assert sc.model.temperature == 0.07
    assert sc.augment.mean[0] == pytest.approx(0.485)
    vit = get_preset("vit")
    assert vit.model.image_tower == "vit_b16"
    assert vit.model.image_embedding_dim == 768
    mm = get_preset("multimodal_attention")
    assert mm.model.use_multimodal_attention
    assert mm.zeroshot.dynamic_thresholds


def test_config_frozen():
    cfg = get_preset("pretrain_clip")
    with pytest.raises(dataclasses.FrozenInstanceError):
        cfg.name = "x"


def test_mesh_sharding(eight_devices):
    mesh = create_mesh(8)
    batch = {"x": np.zeros((16, 4), np.float32)}
    out = shard_batch(batch, mesh)
    assert out["x"].sharding.is_fully_replicated is False
    # Each device holds 16/8 = 2 rows.
    shard = out["x"].addressable_shards[0]
    assert shard.data.shape == (2, 4)


def test_keychain_deterministic_and_counted():
    a, b = KeyChain(7), KeyChain(7)
    assert jnp.array_equal(
        jax.random.key_data(a.fixed("init")), jax.random.key_data(b.fixed("init"))
    )
    k1, k2 = a.next("drop"), a.next("drop")
    assert not jnp.array_equal(jax.random.key_data(k1), jax.random.key_data(k2))
    # Different names → different keys.
    assert not jnp.array_equal(
        jax.random.key_data(a.fixed("x")), jax.random.key_data(a.fixed("y"))
    )


def test_policy():
    p = Policy()
    assert p.compute == jnp.bfloat16
    tree = {"w": jnp.ones((2, 2), jnp.float32), "step": jnp.array(3, jnp.int32)}
    cast = p.cast_to_compute(tree)
    assert cast["w"].dtype == jnp.bfloat16
    assert cast["step"].dtype == jnp.int32


def test_compile_cache_enable_from_env(tmp_path, monkeypatch):
    """CLIP_FOR_DL_TPU_COMPILE_CACHE turns on the persistent XLA cache and
    compiled programs land in it (verified on the real TPU backend too:
    fresh-process rehit of a cached program is ~0.1 s vs minutes)."""
    from clip_for_dl_tpu.core import compile_cache

    cache_dir = tmp_path / "xla-cache"
    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    prev_size = jax.config.jax_persistent_cache_min_entry_size_bytes
    monkeypatch.setenv(compile_cache.ENV_VAR, str(cache_dir))
    try:
        assert compile_cache.enable_from_env() == str(cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x).sum()

        f(jnp.ones((16, 16))).block_until_ready()
        assert cache_dir.is_dir() and any(cache_dir.iterdir())
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", prev_size)

    monkeypatch.delenv(compile_cache.ENV_VAR)
    assert compile_cache.enable_from_env() is None
