"""Dtype policy: fp32 parameters, optional bf16 compute.

TPU MXUs natively consume bfloat16; keeping parameters and optimizer state in
float32 while casting activations/matmul inputs to bf16 is the standard
mixed-precision recipe. The reference has no dtype policy (implicit fp32).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


def resolve_dtype(name: str | jnp.dtype):
    if isinstance(name, str):
        return {
            "float32": jnp.float32,
            "fp32": jnp.float32,
            "bfloat16": jnp.bfloat16,
            "bf16": jnp.bfloat16,
            "float16": jnp.float16,
        }[name]
    return name


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: object = jnp.float32
    compute_dtype: object = jnp.float32

    @classmethod
    def create(cls, compute: str = "float32") -> "DTypePolicy":
        return cls(param_dtype=jnp.float32, compute_dtype=resolve_dtype(compute))

    @property
    def flax_kwargs(self) -> dict:
        """kwargs splat for flax.linen layers: dtype= compute, param_dtype= fp32."""
        return {"dtype": self.compute_dtype, "param_dtype": self.param_dtype}
