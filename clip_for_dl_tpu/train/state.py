"""Train state: one donated pytree through the jitted step."""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    """params + BN stats + Adam moments + step counter, all device-resident.

    The apply/optimizer callables live outside the pytree (static), so the
    whole state donates cleanly into `jax.jit(..., donate_argnums=0)`.
    """

    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    step: jax.Array
    # Optional EMA of params (None = feature off, an empty pytree node —
    # existing checkpoints/step factories see an unchanged structure).
    # Updated inside the jitted step (steps._apply_updates, ema_decay);
    # evaluation and export can read the smoothed weights via
    # to_variables(use_ema=True).
    ema_params: Any = None

    @classmethod
    def create(cls, variables: Dict, tx: optax.GradientTransformation,
               ema: bool = False):
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            ema_params=jax.tree.map(jnp.copy, params) if ema else None,
        )

    def to_variables(self, use_ema: bool = False) -> Dict:
        if use_ema and self.ema_params is None:
            raise ValueError("state has no EMA params (train with ema)")
        out = {"params": self.ema_params if use_ema else self.params}
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out
