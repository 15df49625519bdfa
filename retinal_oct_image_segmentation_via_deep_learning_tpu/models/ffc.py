"""Fast Fourier Convolution stack (NHWC, Flax) — implemented once.

The reference carries three verbatim copies of this block zoo
(``Lesions_Segment/EdgeAL_2021.py:143-408``,
``Lesions_Segment/YNet_2022.py:158-421``, ``Layers_Segment/YNet_2022:425-772``).
Semantics per the FFC paper (Chi et al., NeurIPS 2020) as realized there:

- ``FourierUnit`` (``YNet_2022.py:158-232``): rfft2(norm='ortho') ->
  per-channel [real, imag] interleave into 2C channels -> 1x1 conv (no bias)
  -> BN -> ReLU -> back to complex -> irfft2 to the input spatial shape.
- ``SpectralTransform`` (``:234-279``): optional stride-2 avg-pool, 1x1
  conv-BN-ReLU to C/2, global FourierUnit, plus an LFU acting on the first
  C/8 channels over 2x2 spatial quarters stacked channel-wise, tiled back;
  final 1x1 conv of (x + fu(x) + lfu tile).
- ``FFC`` (``:282-345``): splits channels into local/global streams with four
  conv paths l2l / l2g / g2l / g2g (g2g = SpectralTransform), reflect padding.
- ``FFC_BN_ACT`` (``:347-374``): per-stream BN + activation.
- ``FFCResnetBlock`` (``:377-399``): two FFC_BN_ACT with residual adds per
  stream.

Streams are carried as a ``(local, global)`` tuple where either entry may be
``None`` (the reference uses the scalar ``0``). Channel layout of the spectral
interleave matches torch's ``view`` exactly (c0_re, c0_im, c1_re, ...) so
converted weights are per-pixel compatible.

TPU notes: FFT runs in fp32 (XLA TPU FFT requirement); 1x1 convs are
MXU-shaped matmuls over the (H*W_half) token dim; everything is static-shape.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .blocks import BatchNorm, Conv, activation
from ..ops.pooling import avg_pool

Stream = tuple[Any, Any]  # (local, global), entries are arrays or None


class FourierUnit(nn.Module):
    features: int
    groups: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        N, H, W, C = x.shape
        ff = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2), norm="ortho")
        # (N, H, Wh, C, 2) -> (N, H, Wh, 2C) with [re, im] interleaved per
        # channel — matches the torch channel-dim view (YNet_2022.py:211-213).
        ff = jnp.stack([ff.real, ff.imag], axis=-1)
        ff = ff.reshape(N, H, ff.shape[2], C * 2)
        ff = Conv(
            self.features * 2, 1, 1, 0,
            feature_group_count=self.groups, use_bias=False, dtype=self.dtype,
        )(ff)
        ff = BatchNorm(dtype=self.dtype)(ff, use_running_average=not train)
        ff = nn.relu(ff)
        ff = ff.astype(jnp.float32).reshape(N, H, ff.shape[2], self.features, 2)
        out = jnp.fft.irfft2(
            ff[..., 0] + 1j * ff[..., 1], s=(H, W), axes=(1, 2), norm="ortho"
        )
        return out.astype(x.dtype)


class SpectralTransform(nn.Module):
    features: int
    strides: int = 1
    groups: int = 1
    enable_lfu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.strides == 2:
            x = avg_pool(x, 2)
        half = self.features // 2
        x = Conv(half, 1, 1, 0, feature_group_count=self.groups,
                 use_bias=False, dtype=self.dtype)(x)
        x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
        x = nn.relu(x)
        out = FourierUnit(half, self.groups, dtype=self.dtype)(x, train)

        if self.enable_lfu:
            N, H, W, C = x.shape
            s = H // 2
            # first C/4 channels, 2x2 spatial quarters stacked on channels
            # (reference YNet_2022.py:266-273): split rows then cols.
            xs = x[..., : C // 4]
            xs = jnp.concatenate([xs[:, :s], xs[:, s : 2 * s]], axis=-1)
            xs = jnp.concatenate([xs[:, :, :s], xs[:, :, s : 2 * s]], axis=-1)
            xs = FourierUnit(half, self.groups, dtype=self.dtype)(xs, train)
            xs = jnp.tile(xs, (1, 2, 2, 1))
        else:
            xs = 0

        return Conv(self.features, 1, 1, 0, feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype)(x + out + xs)


def _reflect_conv(x, features, kernel_size, strides, padding, dilation,
                  use_bias, dtype):
    """Conv with reflect padding (the FFC default padding_type)."""
    if padding:
        x = jnp.pad(
            x,
            ((0, 0), (padding, padding), (padding, padding), (0, 0)),
            mode="reflect",
        )
    return Conv(features, kernel_size, strides, 0, use_bias=use_bias,
                kernel_dilation=dilation, dtype=dtype)(x)


class FFC(nn.Module):
    """Four-path local/global convolution (reference ``YNet_2022.py:282-345``)."""

    features: int
    kernel_size: int = 3
    ratio_gin: float = 0.5
    ratio_gout: float = 0.5
    strides: int = 1
    padding: int = 0
    dilation: int = 1
    use_bias: bool = False
    enable_lfu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Stream, train: bool = False) -> Stream:
        x_l, x_g = x if isinstance(x, tuple) else (x, None)
        in_cg_known = x_g is not None
        out_cg = int(self.features * self.ratio_gout)
        out_cl = self.features - out_cg

        # Path evaluation order matches the reference module registration
        # order (l2l, l2g, g2l, g2g — YNet_2022.py:304-318) so that the
        # order-based torch weight importer zips units 1:1.
        conv = lambda inp, out_ch: _reflect_conv(
            inp, out_ch, self.kernel_size, self.strides, self.padding,
            self.dilation, self.use_bias, self.dtype,
        )
        l2l = conv(x_l, out_cl) if (out_cl > 0 and x_l is not None) else None
        l2g = conv(x_l, out_cg) if (out_cg > 0 and x_l is not None) else None
        g2l = conv(x_g, out_cl) if (out_cl > 0 and in_cg_known) else None
        g2g = (
            SpectralTransform(
                out_cg, self.strides, 1, self.enable_lfu, dtype=self.dtype
            )(x_g, train)
            if (out_cg > 0 and in_cg_known)
            else None
        )

        def add(a, b):
            if a is None:
                return b
            if b is None:
                return a
            return a + b

        return add(l2l, g2l), add(l2g, g2g)


class FFC_BN_ACT(nn.Module):
    """FFC -> per-stream BN -> per-stream activation
    (reference ``YNet_2022.py:347-374``; default activation Identity)."""

    features: int
    kernel_size: int = 1
    ratio_gin: float = 0.5
    ratio_gout: float = 0.5
    strides: int = 1
    padding: int = 0
    dilation: int = 1
    act: str = "none"
    enable_lfu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Stream, train: bool = False) -> Stream:
        x_l, x_g = FFC(
            self.features, self.kernel_size, self.ratio_gin, self.ratio_gout,
            self.strides, self.padding, self.dilation,
            enable_lfu=self.enable_lfu, dtype=self.dtype,
        )(x, train)
        act = activation(self.act)
        if x_l is not None:
            x_l = act(BatchNorm(dtype=self.dtype)(
                x_l, use_running_average=not train))
        if x_g is not None:
            x_g = act(BatchNorm(dtype=self.dtype)(
                x_g, use_running_average=not train))
        return x_l, x_g


class FFCResnetBlock(nn.Module):
    """Two FFC_BN_ACT layers + per-stream residual
    (reference ``YNet_2022.py:377-399``)."""

    features: int
    ratio_gin: float = 0.5
    ratio_gout: float = 0.5
    dilation: int = 1
    act: str = "relu"
    enable_lfu: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Stream, train: bool = False) -> Stream:
        id_l, id_g = x
        kw = dict(
            kernel_size=3,
            ratio_gin=self.ratio_gin,
            ratio_gout=self.ratio_gout,
            padding=self.dilation,
            dilation=self.dilation,
            act=self.act,
            enable_lfu=self.enable_lfu,
            dtype=self.dtype,
        )
        x_l, x_g = FFC_BN_ACT(self.features, **kw)(x, train)
        x_l, x_g = FFC_BN_ACT(self.features, **kw)((x_l, x_g), train)
        if id_l is not None:
            x_l = x_l + id_l
        if id_g is not None:
            x_g = x_g + id_g
        return x_l, x_g


def concat_stream(x: Stream):
    """ConcatTupleLayer (reference ``YNet_2022.py:401-408``)."""
    x_l, x_g = x
    if x_g is None:
        return x_l
    if x_l is None:
        return x_g
    return jnp.concatenate([x_l, x_g], axis=-1)


class FFCSEBlock(nn.Module):
    """Squeeze-excitation over a (local, global) stream
    (reference ``FFCSE_block``, YNet_2022.py:110-140 / EdgeAL_2021.py:110):
    GAP over the concatenated stream -> 1x1 conv /16 -> ReLU -> separate
    1x1 gates per stream -> sigmoid -> scale."""

    channels: int
    ratio_g: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x: Stream) -> Stream:
        in_cg = int(self.channels * self.ratio_g)
        in_cl = self.channels - in_cg
        x_l, x_g = x if isinstance(x, tuple) else (x, None)

        full = x_l if x_g is None else jnp.concatenate([x_l, x_g], axis=-1)
        s = jnp.mean(full, axis=(1, 2), keepdims=True)
        s = Conv(self.channels // 16, 1, 1, 0, dtype=self.dtype)(s)
        s = nn.relu(s)
        out_l = (
            x_l * nn.sigmoid(Conv(in_cl, 1, 1, 0, dtype=self.dtype)(s))
            if in_cl != 0
            else None
        )
        out_g = (
            x_g * nn.sigmoid(Conv(in_cg, 1, 1, 0, dtype=self.dtype)(s))
            if in_cg != 0
            else None
        )
        return out_l, out_g


class LearnableSpatialTransformWrapper(nn.Module):
    """Reflect-pad -> rotate by a learnable angle -> wrapped module ->
    inverse rotate -> crop (reference ``YNet_2022.py:36-75`` /
    ``EdgeAL_2021.py:73-106``). The rotation reproduces the reference's
    ``rotate`` exactly (``ops.sampling.reference_rotate``)."""

    impl: nn.Module
    pad_coef: float = 0.5
    angle_init_range: float = 80.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *args, **kwargs):
        from ..ops.sampling import reference_rotate

        angle = self.param(
            "angle",
            lambda k, s: jax.random.uniform(k, s) * self.angle_init_range,
            (1,),
        )

        def transform(t):
            ph = int(t.shape[1] * self.pad_coef)
            pw = int(t.shape[2] * self.pad_coef)
            tp = jnp.pad(
                t, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect"
            )
            return reference_rotate(tp, angle[0]), (ph, pw)

        def inverse(t, pads):
            ph, pw = pads
            t = reference_rotate(t, -angle[0])
            return t[:, ph : t.shape[1] - ph, pw : t.shape[2] - pw]

        if isinstance(x, tuple):
            trans = [transform(e) for e in x]
            ys = self.impl(tuple(t for t, _ in trans), *args, **kwargs)
            return tuple(
                inverse(y, pads) for y, (_, pads) in zip(ys, trans)
            )
        t, pads = transform(x)
        y = self.impl(t, *args, **kwargs)
        return inverse(y, pads)
