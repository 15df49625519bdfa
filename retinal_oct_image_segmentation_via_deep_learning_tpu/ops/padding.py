"""Padding ops (NHWC), torch-parity."""

from __future__ import annotations

import jax.numpy as jnp


def reflect_pad_2d(x, pad):
    """torch ``ReflectionPad2d`` / F.pad(mode='reflect') on NHWC.

    ``pad`` is an int or (left, right, top, bottom) following torch's
    (W-first) convention.
    """
    if isinstance(pad, int):
        l = r = t = b = pad
    else:
        l, r, t, b = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="reflect")


def zero_pad_2d(x, pad):
    if isinstance(pad, int):
        l = r = t = b = pad
    else:
        l, r, t, b = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


def replicate_pad_2d(x, pad):
    if isinstance(pad, int):
        l = r = t = b = pad
    else:
        l, r, t, b = pad
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")
