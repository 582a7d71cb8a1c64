"""Switch-Transformer mixture-of-experts MLP (expert-parallel ready).

Beyond the reference (which has no MoE — SURVEY.md §0); this is the
capability hook for the ``expert`` mesh axis in ``parallel/ep.py``. The
design is the canonical TPU MoE formulation (Switch Transformer /
GShard): top-1 routing with a fixed per-expert **capacity**, expressed
entirely as dense einsums over static shapes —

    dispatch [T, E, C]  one-hot(token → expert slot)
    x_e      [E, C, D]  = einsum('tec,td->ecd', dispatch, x)
    h        [E, C, F]  = gelu(x_e @ wi + bi)        # per-expert FFN
    y_e      [E, C, D]  = h @ wo + bo
    y        [T, D]     = einsum('tec,ecd->td', combine, y_e)

so XLA tiles every step onto the MXU and there is no data-dependent
control flow. Tokens routed past capacity produce a zero update and pass
through the block's residual unchanged (Switch §2.2 semantics). The
load-balancing auxiliary loss (Switch eq. 4) is sown into the ``losses``
collection; the pretrain step picks it up when the collection is marked
mutable.

Expert parallelism: the stacked expert weights ``wi/bi/wo/bo`` carry a
leading ``[E, ...]`` dim that ``parallel/ep.py`` shards ``P('expert')``;
GSPMD then slices the dispatch einsum per shard and all-reduces the
combine over the ``expert`` axis — each device holds and computes only
its own experts.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# name of the params collection entry holding sown aux losses
LOSS_COLLECTION = "losses"


class SwitchMoEMLP(nn.Module):
    """Top-1-routed expert FFN replacing a transformer block's dense MLP."""

    num_experts: int
    intermediate: int
    capacity_factor: float = 1.25
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: jnp.ndarray | None = None
    ) -> jnp.ndarray:
        """[B, L, D] → [B, L, D]; routing/softmax in fp32, FFN in dtype.

        ``mask`` [B, L] (1 = real token): padding positions are excluded
        from routing — they consume no expert capacity, contribute zero
        update (the residual passes them through), and are left out of
        the load-balancing statistics. With this codebase's fixed
        max_length padding, omitting the mask would let pads dominate
        both capacity and the aux loss.
        """
        b, l, d = x.shape
        t, e = b * l, self.num_experts
        capacity = int(np.ceil(self.capacity_factor * t / e))
        xf = x.reshape(t, d)
        mask_flat = (
            jnp.ones((t,), jnp.float32)
            if mask is None
            else mask.reshape(t).astype(jnp.float32)
        )

        # router (fp32 for a stable softmax/argmax)
        logits = nn.Dense(
            e, name="router", dtype=jnp.float32,
            param_dtype=self.param_dtype,
        )(xf.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)  # [T, E]
        gate = jnp.max(probs, axis=-1)  # [T]
        onehot = (
            jax.nn.one_hot(jnp.argmax(probs, axis=-1), e, dtype=jnp.float32)
            * mask_flat[:, None]
        )  # [T, E]; pad rows are all-zero

        # Switch load-balancing loss over REAL tokens:
        # E * Σ_e (token fraction)·(prob mass)
        denom = jnp.maximum(mask_flat.sum(), 1.0)
        density = onehot.sum(axis=0) / denom
        proxy = (probs * mask_flat[:, None]).sum(axis=0) / denom
        aux = e * jnp.sum(density * proxy)
        self.sow(LOSS_COLLECTION, "moe_aux", aux)

        # slot assignment: position of each token within its expert's queue;
        # one_hot maps positions ≥ capacity (and the -1 of unchosen experts)
        # to all-zero rows → those tokens are dropped (zero update).
        position = jnp.cumsum(onehot, axis=0) * onehot - 1.0  # [T, E]
        dispatch = jax.nn.one_hot(
            position, capacity, dtype=jnp.float32
        )  # [T, E, C]
        combine = dispatch * gate[:, None, None]

        init = nn.initializers.variance_scaling(
            1.0, "fan_in", "truncated_normal", batch_axis=(0,)
        )
        zeros = nn.initializers.zeros_init()
        pd = self.param_dtype
        wi = self.param("wi", init, (e, d, self.intermediate), pd)
        bi = self.param("bi", zeros, (e, self.intermediate), pd)
        wo = self.param("wo", init, (e, self.intermediate, d), pd)
        bo = self.param("bo", zeros, (e, d), pd)

        x_e = jnp.einsum(
            "tec,td->ecd", dispatch.astype(self.dtype), xf.astype(self.dtype)
        )
        h = nn.gelu(
            jnp.einsum(
                "ecd,edf->ecf", x_e, wi.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + bi.astype(jnp.float32)[:, None, :],
            approximate=False,
        ).astype(self.dtype)
        y_e = (
            jnp.einsum(
                "ecf,efd->ecd", h, wo.astype(self.dtype),
                preferred_element_type=jnp.float32,
            )
            + bo.astype(jnp.float32)[:, None, :]
        )
        y = jnp.einsum("tec,ecd->td", combine, y_e)  # fp32 combine
        return y.reshape(b, l, d).astype(self.dtype)
