"""Mixed-precision policy: fp32 parameters, bf16 compute.

The reference runs everything in fp32 (no AMP anywhere). On TPU the MXU's
native input format is bfloat16, so the framework-wide default is bf16
activations/matmuls with fp32 parameters, accumulation and loss math.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def parse_dtype(name) -> jnp.dtype:
    if isinstance(name, str):
        return _DTYPES[name]
    return name


@dataclass(frozen=True)
class Policy:
    param_dtype: str = "float32"
    compute_dtype: str = "bfloat16"
    output_dtype: str = "float32"

    @property
    def param(self):
        return parse_dtype(self.param_dtype)

    @property
    def compute(self):
        return parse_dtype(self.compute_dtype)

    @property
    def output(self):
        return parse_dtype(self.output_dtype)

    def cast_to_compute(self, tree):
        import jax

        return jax.tree.map(
            lambda x: x.astype(self.compute)
            if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )


DEFAULT_POLICY = Policy()
FP32_POLICY = Policy(compute_dtype="float32")
