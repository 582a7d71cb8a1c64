"""LoRA — parameter-efficient fine-tuning of the frozen towers.

The reference's only fine-tuning recipe beyond full training is "freeze
everything, train one Linear" (C-Adapter, 02 nb cell 28). LoRA extends that
spectrum: the pretrained weights stay frozen and each targeted 2-D kernel W
gets a trainable low-rank delta W + (α/r)·A·B (A: [in, r], B: [r, out],
B zero-initialized so training starts exactly at the frozen model). This is
the direction of the retrieved PEFT-for-CXR work (PAPERS.md: LoRA-adapted
clinical embedding models; fixed-budget PEFT with frozen encoders).

TPU-native design: LoRA state is a flat {path: {"a", "b"}} pytree and the
merge is pure tree surgery executed INSIDE the jitted step — the deltas fuse
into the forward like any other op, gradients flow only to the A/B factors
(the frozen base rides through as a step ARGUMENT — device-resident data,
not a constant baked into the executable; it must NOT be donated, the same
buffers are re-passed every step), and `fold_lora` bakes trained deltas back
into plain params for serving — zero inference-time overhead.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import traverse_util

# every attention / MLP projection in the BERT and ViT towers and the
# projection heads; embeddings (incl. ViT patch_embed), LayerNorms and conv
# kernels stay frozen — the attention+MLP-only set the PEFT literature uses.
# NOTE with the ResNet-50 image tower this means LoRA adapts the text tower
# and the projection heads only (the conv tower has no 2-D kernels); the
# ViT tower's q/k/v/out/mlp kernels are all adapted.
DEFAULT_TARGETS = (
    r"(query|key|value|attention_output|intermediate|output"
    r"|q_proj|k_proj|v_proj|out_proj|mlp_1|mlp_2"
    r"|projection|fc1|fc2)/kernel$"
)


def lora_paths(params: Any, pattern: str = DEFAULT_TARGETS) -> List[str]:
    """'/'-joined paths of every 2-D kernel matching `pattern`."""
    flat = traverse_util.flatten_dict(params)
    out = []
    for key, leaf in flat.items():
        path = "/".join(str(k) for k in key)
        if getattr(leaf, "ndim", 0) == 2 and re.search(pattern, path):
            out.append(path)
    return sorted(out)


def init_lora(
    rng: jax.Array,
    params: Any,
    rank: int = 8,
    pattern: str = DEFAULT_TARGETS,
    dtype=jnp.float32,
) -> Dict[str, Dict[str, jax.Array]]:
    """LoRA state {path: {"a": [in, r], "b": [r, out]}}.

    A ~ N(0, 1/r) (std 1/√r), B = 0 — the standard init: the merged model
    starts bit-identical to the frozen base."""
    flat = traverse_util.flatten_dict(params)
    by_path = {"/".join(str(k) for k in key): leaf for key, leaf in flat.items()}
    lora: Dict[str, Dict[str, jax.Array]] = {}
    a_std = 1.0 / float(rank) ** 0.5
    for path in lora_paths(params, pattern):
        d_in, d_out = by_path[path].shape
        rng, sub = jax.random.split(rng)
        lora[path] = {
            "a": jax.random.normal(sub, (d_in, rank), dtype) * a_std,
            "b": jnp.zeros((rank, d_out), dtype),
        }
    if not lora:
        raise ValueError(f"no 2-D kernels matched pattern {pattern!r}")
    return lora


def merge_lora(
    params: Any,
    lora: Mapping[str, Mapping[str, jax.Array]],
    alpha: float = 16.0,
) -> Any:
    """params with W ← W + (α/r)·A·B at every LoRA path (delta in fp32,
    cast back to the kernel dtype). Pure function — safe inside jit."""
    flat = dict(traverse_util.flatten_dict(params))
    key_of = {
        "/".join(str(k) for k in key): key for key in flat
    }
    for path, ab in lora.items():
        key = key_of[path]
        rank = ab["a"].shape[1]
        delta = (
            ab["a"].astype(jnp.float32) @ ab["b"].astype(jnp.float32)
        ) * (alpha / rank)
        flat[key] = (flat[key].astype(jnp.float32) + delta).astype(
            flat[key].dtype
        )
    return traverse_util.unflatten_dict(flat)


def fold_lora(
    variables: Dict[str, Any],
    lora: Mapping[str, Mapping[str, jax.Array]],
    alpha: float = 16.0,
) -> Dict[str, Any]:
    """Bake trained deltas into plain variables for serving/export."""
    out = dict(variables)
    out["params"] = merge_lora(variables["params"], lora, alpha)
    return out


def lora_param_count(lora: Mapping[str, Mapping[str, jax.Array]]) -> int:
    return sum(int(ab["a"].size + ab["b"].size) for ab in lora.values())


def make_lora_pretrain_step(
    model,
    tx,
    loss_name: str = "clip_self_distill",
    temperature: float = 2.0,
    alpha: float = 16.0,
    image_size: int = 224,
    mean: Tuple[float, ...] = (0.0, 0.0, 0.0),
    std: Tuple[float, ...] = (1.0, 1.0, 1.0),
    compute_dtype=jnp.bfloat16,
):
    """CLIP contrastive pretrain step training ONLY the LoRA factors.

    ``step(lora_state, frozen_variables, batch, lrs, rng) → (lora_state,
    metrics)`` — frozen_variables is a runtime step argument (do NOT donate
    it: the same buffers are re-passed every step). Per-group learning
    rates apply by each LoRA path's top-level module (image_tower /
    text_tower / …, train/optim.py convention), so the preset's group lrs
    and the host schedulers work unchanged.

    The whole frozen base runs in inference mode: BatchNorm uses running
    statistics AND dropout is off (a deterministic forward — flax gates
    both behind the same `train` flag, and train=True would require
    mutating the frozen BN stats). This matches the common PEFT setup of
    adapting a frozen inference-mode backbone; `rng` is accepted for step-
    signature symmetry but unused while the forward is deterministic."""
    import optax

    from ..ops.image_prep import preprocess_images
    from ..train.optim import DEFAULT_GROUP
    from ..train.steps import PRETRAIN_LOSSES

    loss_fn_base = PRETRAIN_LOSSES[loss_name]

    def step(state: "TrainState", frozen_variables, batch, lrs, rng):
        del rng  # deterministic forward (see docstring)
        images = preprocess_images(
            batch["images"], image_size, image_size, mean, std, compute_dtype
        )

        def loss_fn(lora):
            variables = dict(frozen_variables)
            variables["params"] = merge_lora(
                frozen_variables["params"], lora, alpha
            )
            img_f, txt_f = model.apply(
                variables,
                images,
                batch["input_ids"],
                batch["attention_mask"],
            )
            return loss_fn_base(txt_f, img_f, temperature)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)

        def lr_for(path: str) -> jax.Array:
            if isinstance(lrs, Mapping):
                group = path.split("/", 1)[0]
                return jnp.asarray(lrs.get(group, lrs[DEFAULT_GROUP]))
            return jnp.asarray(lrs)

        updates = {
            path: jax.tree.map(
                lambda u, lr=lr_for(path): u * (-lr).astype(u.dtype), ab
            )
            for path, ab in updates.items()
        }
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params, opt_state=new_opt, step=state.step + 1
        )
        return new_state, {"loss": loss}

    return step
