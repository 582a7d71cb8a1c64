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

    @classmethod
    def create(cls, variables: Dict, tx: optax.GradientTransformation):
        params = variables["params"]
        return cls(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    def to_variables(self) -> Dict:
        out = {"params": self.params}
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out
