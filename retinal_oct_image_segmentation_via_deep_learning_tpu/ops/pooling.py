"""Index-tracking max pool / unpool (NHWC), torch-parity.

ReLayNet pools with ``return_indices=True`` and decodes with ``MaxUnpool2d``
(reference ``Lesions_Segment/ReLayNet_2017.py:171,182-186``). JAX has no
unpool primitive; for the (stride == kernel, no overlap) case the pool/unpool
pair is a pure reshape + argmax / one-hot scatter — fully vectorized, static
shapes, MXU-free VPU work that XLA fuses tightly.

Tie-breaking: ``jnp.argmax`` returns the first maximum in row-major window
order, identical to torch's CPU/CUDA maxpool iteration order, so indices (and
therefore unpooled pixels) match per-pixel.
"""

from __future__ import annotations

import jax.numpy as jnp


def _window_view(x, k: int):
    """(N,H,W,C) -> (N, H/k, W/k, k*k, C) window-flattened view."""
    N, H, W, C = x.shape
    x = x.reshape(N, H // k, k, W // k, k, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # N, Ho, Wo, k, k, C
    return x.reshape(N, H // k, W // k, k * k, C)


def max_pool_argmax(x, k: int = 2):
    """Non-overlapping k×k max pool returning (pooled, window_argmax).

    ``indices`` are per-window flat positions in [0, k*k) — enough to invert
    the pool exactly (equivalent information to torch's global flat indices).
    """
    win = _window_view(x, k)
    idx = jnp.argmax(win, axis=3)
    pooled = jnp.max(win, axis=3)
    return pooled, idx


def max_unpool(x, indices, k: int = 2):
    """Inverse of ``max_pool_argmax``: scatter values back to argmax slots."""
    N, Ho, Wo, C = x.shape
    onehot = jnp.arange(k * k)[None, None, None, :, None] == indices[:, :, :, None, :]
    win = jnp.where(onehot, x[:, :, :, None, :], 0).astype(x.dtype)
    win = win.reshape(N, Ho, Wo, k, k, C)
    win = win.transpose(0, 1, 3, 2, 4, 5)
    return win.reshape(N, Ho * k, Wo * k, C)


def max_pool(x, k: int = 2, stride: int | None = None, padding: int = 0):
    """Plain max pool (NHWC). stride defaults to k.

    Non-overlapping case uses a reshape-max: identical forward values, with
    an eq-mask gradient instead of ``reduce_window``'s SelectAndScatter
    backward. (Measured neutral on the 512^2 U-Net train step on v5e —
    XLA already handles that backward fine there — but the reshape form is
    also what the int8 path needs, so it stays.)
    """
    import jax

    stride = stride or k
    if padding:
        x = jnp.pad(
            x,
            ((0, 0), (padding, padding), (padding, padding), (0, 0)),
            constant_values=-jnp.inf,
        )
    N, H, W, C = x.shape
    if stride == k and H % k == 0 and W % k == 0:
        xr = x.reshape(N, H // k, k, W // k, k, C)
        return jnp.max(xr, axis=(2, 4))
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        (1, k, k, 1),
        (1, stride, stride, 1),
        "VALID",
    )


def avg_pool(x, k: int = 2, stride: int | None = None):
    import jax

    stride = stride or k
    s = jax.lax.reduce_window(
        x.astype(jnp.float32),
        0.0,
        jax.lax.add,
        (1, k, k, 1),
        (1, stride, stride, 1),
        "VALID",
    )
    return (s / (k * k)).astype(x.dtype)


def adaptive_avg_pool(x, out_hw=(1, 1)):
    """torch AdaptiveAvgPool2d parity for the common divisible/global cases."""
    N, H, W, C = x.shape
    oh, ow = out_hw
    if oh == 1 and ow == 1:
        return jnp.mean(x, axis=(1, 2), keepdims=True)
    if H % oh == 0 and W % ow == 0:
        return jnp.mean(
            x.reshape(N, oh, H // oh, ow, W // ow, C), axis=(2, 4)
        )
    # General torch adaptive pooling: per-output-cell start/end floors/ceils.
    def _starts_ends(in_size, out_size):
        i = jnp.arange(out_size)
        starts = jnp.floor(i * in_size / out_size).astype(jnp.int32)
        ends = jnp.ceil((i + 1) * in_size / out_size).astype(jnp.int32)
        return starts, ends

    hs, he = _starts_ends(H, oh)
    ws, we = _starts_ends(W, ow)
    csum = jnp.cumsum(jnp.cumsum(x.astype(jnp.float32), axis=1), axis=2)
    csum = jnp.pad(csum, ((0, 0), (1, 0), (1, 0), (0, 0)))
    area = (
        (he - hs).astype(jnp.float32)[:, None]
        * (we - ws).astype(jnp.float32)[None, :]
    )
    out = (
        csum[:, he][:, :, we]
        - csum[:, hs][:, :, we]
        - csum[:, he][:, :, ws]
        + csum[:, hs][:, :, ws]
    ) / area[None, :, :, None]
    return out.astype(x.dtype)
