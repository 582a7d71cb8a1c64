"""safetensors interop: flat save/load, reference-layout checkpoints,
hub-pretrained tower initialization, and the `convert` CLI command.

The reference consumes hub weights at model construction
(0425/train.py:761-776); HF ships those as model.safetensors today, so the
framework must read them torch-free and round-trip its own checkpoints.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clip_for_dl_tpu.core.config import ModelConfig
from clip_for_dl_tpu.models import CXRClip
from clip_for_dl_tpu.models.pretrained import (
    init_tower_weights,
    load_image_tower_weights,
    load_text_tower_weights,
)
from clip_for_dl_tpu.models.safetensors_io import (
    load_reference_checkpoint_safetensors,
    load_state_dict,
    save_reference_checkpoint_safetensors,
    save_safetensors,
)
from clip_for_dl_tpu.models.torch_export import export_bert, export_resnet

CFG = ModelConfig(
    image_size=32, max_text_length=8, vocab_size=64, text_embedding_dim=16,
    text_layers=1, text_heads=2, text_intermediate_dim=32,
    shared_embedding_dim=64, text_max_position=16,
    resnet_stages=(1, 1, 1, 1), resnet_width=8,
)


def _variables():
    model = CXRClip(CFG)
    return model, model.init(
        jax.random.key(3), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 8), jnp.int32),
    )


def _tree_allclose(a, b, atol=0.0):
    la = jax.tree_util.tree_leaves_with_path(a)
    lb = dict(jax.tree_util.tree_leaves_with_path(b))
    assert len(la) == len(lb)
    for path, va in la:
        np.testing.assert_allclose(
            np.asarray(va, np.float32), np.asarray(lb[path], np.float32),
            atol=atol, err_msg=jax.tree_util.keystr(path),
        )


def test_flat_roundtrip_preserves_dtypes(tmp_path, rng):
    tensors = {
        "a.weight": rng.standard_normal((3, 4)).astype(np.float32),
        "a.count": np.array([7], np.int64),
        "b": rng.standard_normal((2,)).astype(np.float16),
    }
    path = str(tmp_path / "flat.safetensors")
    save_safetensors(tensors, path)
    got = load_state_dict(path)
    assert set(got) == set(tensors)
    for k, v in tensors.items():
        assert got[k].dtype == v.dtype, k
        np.testing.assert_array_equal(got[k], v)


def test_reference_checkpoint_safetensors_roundtrip(tmp_path):
    """variables → flat reference-layout safetensors → re-import equals."""
    from clip_for_dl_tpu.train.checkpoint import (
        import_reference_checkpoint,
        merge_imported_params,
    )

    model, variables = _variables()
    path = str(tmp_path / "ref.safetensors")
    save_reference_checkpoint_safetensors(
        variables, path, epoch=5, text_layers=CFG.text_layers
    )
    models, epoch = load_reference_checkpoint_safetensors(path)
    assert epoch == 5
    assert {"resnet", "text_model", "image_projector",
            "text_projector"} <= set(models)

    imported = import_reference_checkpoint(path)
    assert imported["epoch"] == 5
    merged = merge_imported_params(
        jax.tree.map(np.asarray, variables["params"]), imported["params"]
    )
    _tree_allclose(merged, variables["params"], atol=1e-6)
    stats = merge_imported_params(
        jax.tree.map(np.asarray, variables["batch_stats"]),
        imported["batch_stats"],
    )
    _tree_allclose(stats, variables["batch_stats"], atol=1e-6)


def test_load_trained_model_accepts_safetensors(tmp_path, rng):
    """The .safetensors checkpoint drives the same forward as the live
    variables it was exported from."""
    from clip_for_dl_tpu.core.config import get_preset
    from clip_for_dl_tpu.inference import load_trained_model

    cfg = get_preset("zero_shot")
    cfg = cfg.replace(model=CFG)
    model, variables = _variables()
    path = str(tmp_path / "ref.safetensors")
    save_reference_checkpoint_safetensors(
        variables, path, text_layers=CFG.text_layers
    )
    model2, restored = load_trained_model(path, cfg, jnp.float32)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    want = model.apply(variables, x, method="encode_image")
    got = model2.apply(restored, x, method="encode_image")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), atol=2e-5
    )


def test_hf_bert_safetensors_inits_text_tower(tmp_path):
    """An HF-hub-style file ('bert.'-prefixed keys, cls head present,
    model.safetensors in a snapshot dir) initializes the text tower to the
    exact source weights."""
    model, variables = _variables()
    src = variables["params"]["text_tower"]
    sd = export_bert(src, layers=CFG.text_layers)
    hub_sd = {f"bert.{k}": np.asarray(v) for k, v in sd.items()}
    hub_sd["cls.predictions.bias"] = np.zeros((CFG.vocab_size,), np.float32)
    snap = tmp_path / "bio_clinical_bert"
    snap.mkdir()
    save_safetensors(hub_sd, str(snap / "model.safetensors"))

    got = load_text_tower_weights(str(snap))  # dir → model.safetensors
    _tree_allclose(got, src, atol=1e-6)

    out = init_tower_weights(
        jax.tree.map(np.asarray, variables), CFG,
        text_path=str(snap / "model.safetensors"),
    )
    _tree_allclose(out["params"]["text_tower"], src, atol=1e-6)
    # untouched modules keep their init
    _tree_allclose(
        out["params"]["image_projector"],
        variables["params"]["image_projector"],
    )


def test_torchvision_resnet_safetensors_inits_image_tower(tmp_path):
    """A torchvision-style resnet50 state_dict (fc head included, which we
    drop like the reference does) initializes the image tower exactly."""
    model, variables = _variables()
    src_p = variables["params"]["image_tower"]
    src_s = variables["batch_stats"]["image_tower"]
    sd = export_resnet(src_p, src_s)
    sd["fc.weight"] = np.zeros((10, 64), np.float32)
    sd["fc.bias"] = np.zeros((10,), np.float32)
    path = str(tmp_path / "resnet50.safetensors")
    save_safetensors(sd, path)

    params, stats = load_image_tower_weights(path, CFG)
    _tree_allclose(params, src_p, atol=1e-6)
    _tree_allclose(stats, src_s, atol=1e-6)

    out = init_tower_weights(
        jax.tree.map(np.asarray, variables), CFG, image_path=path
    )
    _tree_allclose(out["params"]["image_tower"], src_p, atol=1e-6)
    _tree_allclose(out["batch_stats"]["image_tower"], src_s, atol=1e-6)


def test_init_tower_geometry_mismatch_is_a_clear_error(tmp_path):
    """Wrong-geometry weights must fail loudly, not train on garbage."""
    model, variables = _variables()
    wrong_cfg = ModelConfig(
        image_size=32, max_text_length=8, vocab_size=64,
        text_embedding_dim=16, text_layers=1, text_heads=2,
        text_intermediate_dim=32, shared_embedding_dim=64,
        text_max_position=16,
        resnet_stages=(2, 1, 1, 1), resnet_width=8,  # extra block
    )
    wrong = CXRClip(wrong_cfg).init(
        jax.random.key(0), jnp.zeros((1, 32, 32, 3)),
        jnp.zeros((1, 8), jnp.int32),
    )
    sd = export_resnet(
        wrong["params"]["image_tower"], wrong["batch_stats"]["image_tower"]
    )
    path = str(tmp_path / "wrong.safetensors")
    save_safetensors(sd, path)
    with pytest.raises(ValueError, match="missing keys|unexpected keys|shape"):
        init_tower_weights(
            jax.tree.map(np.asarray, variables), CFG, image_path=path
        )


def test_cli_convert_roundtrips_through_zeroshot(tmp_path):
    """pretrain → convert to .safetensors → zeroshot runs off the artifact;
    convert also writes the reference's .pth layout."""
    from clip_for_dl_tpu.cli import main

    ck = str(tmp_path / "ck")
    assert main([
        "pretrain", "--synthetic", "--tiny", "--fp32",
        "--synthetic-samples", "8", "--epochs", "1",
        "--log-dir", str(tmp_path), "--checkpoint-dir", ck,
    ]) == 0
    st = str(tmp_path / "model.safetensors")
    assert main([
        "convert", "--tiny", "--fp32", "--checkpoint", ck, "--out", st,
        "--epoch", "3",
    ]) == 0
    _, epoch = load_reference_checkpoint_safetensors(st)
    assert epoch == 3
    assert main([
        "zeroshot", "--synthetic", "--tiny", "--fp32",
        "--synthetic-samples", "8", "--log-dir", str(tmp_path / "zs"),
        "--checkpoint", st,
    ]) == 0
    pth = str(tmp_path / "model.pth")
    assert main([
        "convert", "--tiny", "--fp32", "--checkpoint", ck, "--out", pth,
    ]) == 0
    import torch

    ckpt = torch.load(pth, map_location="cpu", weights_only=False)
    assert "models" in ckpt and "resnet" in ckpt["models"]


def test_non_checkpoint_safetensors_rejected(tmp_path, rng):
    """A hub weight file (no format metadata) passed as --checkpoint must
    error, not silently score with fresh-init weights."""
    path = str(tmp_path / "model.safetensors")
    save_safetensors(
        {"bert.embeddings.word_embeddings.weight":
         rng.standard_normal((8, 4)).astype(np.float32)}, path,
    )
    with pytest.raises(ValueError, match="init-image-tower|init-text-tower"):
        load_reference_checkpoint_safetensors(path)


def test_pt_extension_routes_to_reference_importer(tmp_path):
    """convert --out model.pt writes a torch pickle that load_trained_model
    must route to import_reference_checkpoint (not the orbax branch)."""
    from clip_for_dl_tpu.core.config import get_preset
    from clip_for_dl_tpu.inference import load_trained_model
    from clip_for_dl_tpu.models.torch_export import save_reference_checkpoint

    model, variables = _variables()
    path = str(tmp_path / "model.pt")
    save_reference_checkpoint(
        variables, path, epoch=1, text_layers=CFG.text_layers
    )
    cfg = get_preset("zero_shot")
    cfg = cfg.replace(model=CFG)
    model2, restored = load_trained_model(path, cfg, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(restored["params"]["image_projector"]["projection"]["kernel"]),
        np.asarray(variables["params"]["image_projector"]["projection"]["kernel"]),
        atol=1e-6,
    )


def test_cli_pretrain_init_towers_smoke(tmp_path):
    """--init-image-tower/--init-text-tower wire through pretrain; a
    geometry mismatch aborts before training."""
    from clip_for_dl_tpu.cli import build_parser, main

    # build weight files that match the --tiny geometry: steal it from the
    # CLI's own fresh init via the parser defaults
    args = build_parser().parse_args([
        "pretrain", "--synthetic", "--tiny", "--fp32",
    ])
    from clip_for_dl_tpu.cli.main import _apply_tiny, _tokenizer
    from clip_for_dl_tpu.core.config import get_preset

    tok = _tokenizer(args)
    cfg = _apply_tiny(get_preset("pretrain_clip"), args, len(tok.vocab))
    model = CXRClip(cfg.model, dtype=jnp.float32)
    s, l = cfg.model.image_size, cfg.model.max_text_length
    variables = model.init(
        jax.random.key(9), jnp.zeros((1, s, s, 3)),
        jnp.zeros((1, l), jnp.int32),
    )
    bert_sd = export_bert(
        variables["params"]["text_tower"], layers=cfg.model.text_layers
    )
    bert_path = str(tmp_path / "bert.safetensors")
    save_safetensors(bert_sd, bert_path)

    assert main([
        "pretrain", "--synthetic", "--tiny", "--fp32",
        "--synthetic-samples", "8", "--epochs", "1",
        "--log-dir", str(tmp_path), "--init-text-tower", bert_path,
    ]) == 0

    # mismatched geometry → loud failure
    bad = {k: np.zeros((3, 3), np.float32) for k in ("embeddings.word_embeddings.weight",)}
    bad_path = str(tmp_path / "bad.safetensors")
    save_safetensors(bad, bad_path)
    with pytest.raises((ValueError, KeyError)):
        main([
            "pretrain", "--synthetic", "--tiny", "--fp32",
            "--synthetic-samples", "8", "--epochs", "1",
            "--log-dir", str(tmp_path), "--init-text-tower", bad_path,
        ])


def test_fp16_hub_weights_are_cast_to_init_dtype(tmp_path):
    """ADVICE r2: a float16 hub re-upload must land as the initialized
    tree's dtype (fp32), not silently overlay fp16 leaves."""
    model, variables = _variables()
    src = variables["params"]["text_tower"]
    sd = export_bert(src, layers=CFG.text_layers)
    half_sd = {k: np.asarray(v).astype(np.float16) for k, v in sd.items()}
    path = str(tmp_path / "bert_fp16.safetensors")
    save_safetensors(half_sd, path)

    out = init_tower_weights(
        jax.tree.map(np.asarray, variables), CFG, text_path=path
    )
    leaves = jax.tree.leaves(out["params"]["text_tower"])
    assert all(np.asarray(l).dtype == np.float32 for l in leaves), sorted(
        {str(np.asarray(l).dtype) for l in leaves}
    )
    # values round-trip through fp16 (lossy) but stay close
    _tree_allclose(out["params"]["text_tower"], src, atol=2e-3)


def test_cli_convert_defaults_epoch_from_source(tmp_path):
    """ADVICE r2: convert without --epoch must carry the source
    checkpoint's epoch instead of stamping 0."""
    from clip_for_dl_tpu.cli import main

    ck = str(tmp_path / "ck")
    assert main([
        "pretrain", "--synthetic", "--tiny", "--fp32",
        "--synthetic-samples", "8", "--epochs", "2",
        "--log-dir", str(tmp_path), "--checkpoint-dir", ck,
    ]) == 0
    from clip_for_dl_tpu.train.checkpoint import CheckpointManager

    mgr = CheckpointManager(ck)
    want_epoch = mgr.best_epoch()
    mgr.close()
    st = str(tmp_path / "auto_epoch.safetensors")
    assert main([
        "convert", "--tiny", "--fp32", "--checkpoint", ck, "--out", st,
    ]) == 0
    _, epoch = load_reference_checkpoint_safetensors(st)
    assert epoch == want_epoch
    # the epoch survives a chained conversion even when the source stamp
    # is nonzero (.safetensors → .safetensors)
    st3 = str(tmp_path / "stamped.safetensors")
    assert main([
        "convert", "--tiny", "--fp32", "--checkpoint", ck, "--out", st3,
        "--epoch", "7",
    ]) == 0
    st2 = str(tmp_path / "chained.safetensors")
    assert main([
        "convert", "--tiny", "--fp32", "--checkpoint", st3, "--out", st2,
    ]) == 0
    _, epoch2 = load_reference_checkpoint_safetensors(st2)
    assert epoch2 == 7
