"""Shared Flax block library for the model zoo.

The reference repeats its block definitions per file (the FFC stack alone
appears 3x verbatim — ``EdgeAL_2021.py:143-408``,
``Lesions_Segment/YNet_2022.py:158-421``, ``Layers_Segment/YNet_2022:425-772``).
Here every architecture composes from this single library.

Torch-parity conventions baked in:
- BatchNorm: eps=1e-5, flax momentum 0.9 (== torch momentum 0.1).
- Conv weight init: torch default kaiming_uniform(a=sqrt(5)) ==
  U(±sqrt(1/fan_in)) == variance_scaling(1/3, fan_in, uniform).
- PReLU: torch default single shared parameter, init 0.25.
- Explicit integer padding (torch-style), NHWC layout.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn

torch_conv_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)

# ConvTranspose lowering for the non-overlapping (k==s, p==0) case:
# "einsum" = 1x1 matmul + depth-to-space, "dilated" = lhs-dilated conv.
# Both produce identical numbers; which is faster is hardware/compiler
# dependent (A/B'd in perf/abench.py). Overridable via env for benchmarking.
import os as _os

def conv_transpose_impl() -> str:
    return _os.environ.get("OCTSEG_CONV_TRANSPOSE_IMPL", "dilated")
kaiming_normal_init = nn.initializers.variance_scaling(
    2.0, "fan_in", "normal"
)


def _pad2(padding) -> Any:
    """torch int/pair padding -> flax [(ph, ph), (pw, pw)]; pass strings through."""
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding), (padding, padding)]
    ph, pw = padding
    return [(ph, ph), (pw, pw)]


class Conv(nn.Module):
    """nn.Conv with torch default init and torch-style padding spec."""

    features: int
    kernel_size: Sequence[int] | int = 3
    strides: int | Sequence[int] = 1
    padding: Any = 0
    feature_group_count: int = 1
    kernel_dilation: int | Sequence[int] = 1
    use_bias: bool = True
    kernel_init: Callable = torch_conv_init
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        if isinstance(k, int):
            k = (k, k)
        s = self.strides
        if isinstance(s, int):
            s = (s, s)
        d = self.kernel_dilation
        if isinstance(d, int):
            d = (d, d)
        padding = _pad2(self.padding)

        # Spatial (H-sharded) partitioning: exchange this conv's own padding
        # rows with mesh neighbors (zeros at the global border == unsharded
        # 'same' zero-padding), then convolve VALID in H — exact per-layer
        # context parallelism (see parallel.halo).
        from ..parallel.halo import current_spatial_axis, halo_exchange

        axis = current_spatial_axis()
        if axis is not None and not isinstance(padding, str):
            (ph, _), pw = padding
            if ph > 0:
                assert x.shape[1] % s[0] == 0, (
                    f"shard height {x.shape[1]} not divisible by H-stride "
                    f"{s[0]} under spatial partitioning"
                )
                x = halo_exchange(x, ph, axis_name=axis, edge="zero")
                padding = [(0, 0), pw]
        return nn.Conv(
            self.features,
            k,
            strides=s,
            padding=padding,
            feature_group_count=self.feature_group_count,
            kernel_dilation=d,
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            dtype=self.dtype,
        )(x)


class ConvTranspose(nn.Module):
    """torch ``ConvTranspose2d`` parity via input-dilated convolution.

    output[n] = sum_k x_dilated * flip(w); spatial padding = k - 1 - p on each
    side (+ output_padding on the far side), matching torch's gradient-of-conv
    definition exactly — ``flax.linen.ConvTranspose`` uses a different padding
    convention, hence this explicit form.
    """

    features: int
    kernel_size: int = 2
    strides: int = 2
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        import jax

        k, s, p = self.kernel_size, self.strides, self.padding
        from ..parallel.halo import current_spatial_axis

        if current_spatial_axis() is not None and not (
            k == s and p == 0 and self.output_padding == 0
        ):
            # Overlapping transpose-convs would need halo exchange on the
            # *output*; the zoo only uses the non-overlapping (local) form.
            raise NotImplementedError(
                "spatial partitioning supports only k==s, p==0 transpose convs"
            )
        in_ch = x.shape[-1]
        # Stored like torch (flipped at use): shape (k, k, in, out) so fan_in
        # for init matches torch's (in_ch * k * k) on the transposed op.
        w = self.param(
            "kernel", torch_conv_init, (k, k, in_ch, self.features), jnp.float32
        )
        dt = self.dtype or x.dtype
        xc = x.astype(dt)
        wc = w.astype(dt)
        if (
            k == s and p == 0 and self.output_padding == 0
            and conv_transpose_impl() == "einsum"
        ):
            # Non-overlapping case: out[si+di, sj+dj, o] = sum_c x[i,j,c] *
            # w[di,dj,c,o] — a pure 1x1 matmul + depth-to-space. Identical
            # numbers to the dilated-conv form, but maps straight onto the
            # MXU instead of a lhs-dilated convolution (which XLA:TPU
            # executes far less efficiently).
            N, H, W, _ = xc.shape
            O = self.features
            y = jnp.einsum("nhwc,ijco->nhwijo", xc, wc)
            y = y.reshape(N, H, W, k, k, O).transpose(0, 1, 3, 2, 4, 5)
            y = y.reshape(N, H * k, W * k, O)
        else:
            pad = (k - 1 - p, k - 1 - p + self.output_padding)
            y = jax.lax.conv_general_dilated(
                xc,
                jnp.flip(wc, axis=(0, 1)),
                window_strides=(1, 1),
                padding=[pad, pad],
                lhs_dilation=(s, s),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            b = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + b.astype(y.dtype)
        return y


class _FusedTrainBN(nn.Module):
    """Train-mode BatchNorm over ``ops.fused_bn.bn_train`` (one-pass Pallas
    stats + hand-written VJP — see that module). Variable tree is identical
    to ``nn.BatchNorm`` (params scale/bias, batch_stats mean/var) so
    checkpoints and importers are unaffected."""

    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        import jax

        from ..ops.fused_bn import bn_train

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(c, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(c, jnp.float32)
        )
        y, mean, var = bn_train(x, scale, bias)
        if not self.is_initializing():
            mean = jax.lax.stop_gradient(mean)
            var = jax.lax.stop_gradient(var)
            ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
            ra_var.value = 0.9 * ra_var.value + 0.1 * var
        return y


class BatchNorm(nn.Module):
    """Torch-default BatchNorm2d (eps 1e-5, momentum 0.1) on NHWC.

    Train mode routes through the fused one-pass Pallas BN
    (``ops/fused_bn.py``; round-2 traces put XLA's BN statistics +
    normalize traffic at ~170 of 291 ms/step) unless ``OCTSEG_FUSED_BN=0``.
    Eval mode keeps ``nn.BatchNorm`` exactly.
    """

    use_running_average: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        ura = (
            self.use_running_average
            if use_running_average is None
            else use_running_average
        )
        if not ura and _os.environ.get("OCTSEG_FUSED_BN", "1") != "0":
            return _FusedTrainBN(dtype=self.dtype, name="BatchNorm_0")(x)
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=0.9,
            epsilon=1e-5,
            dtype=self.dtype,
            name="BatchNorm_0",
        )(x)


class PReLU(nn.Module):
    """torch-default PReLU: one shared slope, init 0.25."""

    @nn.compact
    def __call__(self, x):
        a = self.param(
            "alpha", nn.initializers.constant(0.25), (1,), jnp.float32
        )
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


def activation(name: str) -> Callable:
    return {
        "relu": nn.relu,
        "leaky_relu": lambda x: nn.leaky_relu(x, 0.01),
        "leaky_relu_0.2": lambda x: nn.leaky_relu(x, 0.2),
        "sigmoid": nn.sigmoid,
        "tanh": jnp.tanh,
        "gelu": nn.gelu,
        "none": lambda x: x,
    }[name]


class ConvBNAct(nn.Module):
    """conv -> BN -> activation, the zoo's bread-and-butter block."""

    features: int
    kernel_size: int | Sequence[int] = 3
    strides: int = 1
    padding: Any = 1
    act: str = "relu"
    use_bn: bool = True
    use_bias: bool = True
    kernel_dilation: int = 1
    feature_group_count: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = Conv(
            self.features,
            self.kernel_size,
            self.strides,
            self.padding,
            feature_group_count=self.feature_group_count,
            kernel_dilation=self.kernel_dilation,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        if self.use_bn:
            x = BatchNorm(dtype=self.dtype)(x, use_running_average=not train)
        return activation(self.act)(x)


class DoubleConv(nn.Module):
    """(conv-BN-act) x 2 — the standard U-Net stage."""

    features: int
    act: str = "relu"
    kernel_size: int = 3
    padding: int = 1
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBNAct(
            self.features, self.kernel_size, 1, self.padding, self.act,
            dtype=self.dtype,
        )(x, train)
        x = ConvBNAct(
            self.features, self.kernel_size, 1, self.padding, self.act,
            dtype=self.dtype,
        )(x, train)
        return x


class SqueezeExcitation(nn.Module):
    """SE channel gate: GAP -> FC/ratio -> ReLU -> FC -> sigmoid -> scale."""

    ratio: int = 8
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        s = jnp.mean(x, axis=(1, 2))
        s = nn.Dense(max(c // self.ratio, 1), use_bias=self.use_bias,
                     dtype=self.dtype)(s)
        s = nn.relu(s)
        s = nn.Dense(c, use_bias=self.use_bias, dtype=self.dtype)(s)
        s = nn.sigmoid(s)
        return x * s[:, None, None, :]


class AttentionGate(nn.Module):
    """Attention-U-Net gate (Oktay et al.), as intended by the reference's
    ``SD_Layer_Net/common.py:64-89`` (whose constructor keywords are buggy —
    see SURVEY.md §7 hard-part 8; semantics implemented here, bug not)."""

    f_int: int
    dtype: Any = None

    @nn.compact
    def __call__(self, g, x, train: bool = False):
        wg = ConvBNAct(self.f_int, 1, 1, 0, "none", dtype=self.dtype)(g, train)
        wx = ConvBNAct(self.f_int, 1, 1, 0, "none", dtype=self.dtype)(x, train)
        psi = ConvBNAct(1, 1, 1, 0, "none", dtype=self.dtype)(
            nn.relu(wg + wx), train
        )
        return x * nn.sigmoid(psi)


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling, summed branches + 1x1 projection
    (ISLAM-style, reference ``Layers_Segment/ISLAM_2024.py:82-133``)."""

    features: int
    dilations: Sequence[int] = (1, 6, 12, 18)
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        acc = None
        for d in self.dilations:
            y = ConvBNAct(
                self.features, 3, 1, d, "none", kernel_dilation=d,
                dtype=self.dtype,
            )(x, train)
            acc = y if acc is None else acc + y
        return Conv(self.features, 1, 1, 0, dtype=self.dtype)(acc)


class SeparableConv(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (LightReSeg,
    reference ``Layers_Segment/LightReSeg_2024.py:154-188``)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    padding: int = 1
    use_bias: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = Conv(
            c,
            self.kernel_size,
            self.strides,
            self.padding,
            feature_group_count=c,
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)
        return Conv(self.features, 1, 1, 0, use_bias=self.use_bias,
                    dtype=self.dtype)(x)
