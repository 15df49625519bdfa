"""Chip-compile smoke: every exported Pallas kernel family on the REAL
backend (no interpret mode anywhere).

The round-4 postmortem: the psrp7 family shipped interpret-green but
failed Mosaic lowering on the actual TPU (SMEM scalar load + i1-mask
relayout) because nothing ever `pallas_call`-compiled it on hardware.
This script closes that hole — it compiles AND runs one production-shaped
instance of each kernel family, plus the three e2e serving graphs that
compose them, and fails loud with a per-family verdict. Run it in every
chip session before benching:

    python perf/chip_smoke.py            # all families
    python perf/chip_smoke.py psrp7      # substring filter

Exit code = number of failing families.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

RNG = np.random.default_rng(0)


def _i8(shape, lo=-100, hi=100):
    return jnp.asarray(RNG.integers(lo, hi, shape), jnp.int8)


def _f32(shape, scale=1.0):
    return jnp.asarray(RNG.standard_normal(shape) * scale, jnp.float32)


# ---------------------------------------------------------------- families


def smoke_int8_conv():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_int8 import (
        conv3x3_int8, ct2x2_int8, pack_ct2x2_weights, pack_weights,
        pool2x2_int8,
    )

    x = _i8((1, 32, 128, 32))
    w = np.asarray(RNG.integers(-20, 20, (3, 3, 32, 64)), np.int8)
    y = conv3x3_int8(x, jnp.asarray(pack_weights(w)), _f32((64,), 1e-3),
                     _f32((64,)), th=8)
    wc = np.asarray(RNG.integers(-20, 20, (2, 2, 64, 32)), np.int8)
    y = ct2x2_int8(y, tuple(jnp.asarray(m) for m in pack_ct2x2_weights(wc)),
                   _f32((32,), 1e-3), _f32((32,)), tr=8)
    return pool2x2_int8(y, th=8).block_until_ready()


def smoke_int4_conv():
    """w4a4 mode: int8 storage with +-7 values, in-kernel int4 casts."""
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_int8 import (
        conv3x3_int8, ct2x2_int8, pack_ct2x2_weights, pack_weights,
    )

    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_int8 import (
        conv3x3_int8_reference,
    )

    x = _i8((1, 32, 128, 128), -7, 8)
    w = np.asarray(RNG.integers(-7, 8, (3, 3, 128, 128)), np.int8)
    wp = jnp.asarray(pack_weights(w))
    sc, b = _f32((128,), 1e-3), _f32((128,))
    got = conv3x3_int8(x, wp, sc, b, th=8, dot_int4=True, out_clip=7.0)
    wc = np.asarray(RNG.integers(-7, 8, (2, 2, 128, 64)), np.int8)
    y = ct2x2_int8(got, tuple(jnp.asarray(m) for m in pack_ct2x2_weights(wc)),
                   _f32((64,), 1e-3), _f32((64,)), tr=8, dot_int4=True,
                   out_clip=7.0).block_until_ready()
    # exactness vs the int8-math oracle (operands +-7 => identical values)
    ref = conv3x3_int8_reference(x, wp, sc, b, out_clip=7.0)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    # zp7 storage: -7 border padding, relu folded into the clip
    got = conv3x3_int8(x, wp, sc, b, th=8, dot_int4=True, out_clip=7.0,
                       pad_vals=(-7,), relu=False)
    ref = conv3x3_int8_reference(x, wp, sc, b, out_clip=7.0,
                                 pad_vals=(-7,), relu=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # mixed-pad folded cat (sym7 up, zp7 skip)
    a2 = _i8((1, 16, 128, 64), -7, 8)
    b2 = _i8((1, 16, 128, 64), -7, 8)
    wcat = np.asarray(RNG.integers(-7, 8, (3, 3, 128, 128)), np.int8)
    wpc = jnp.asarray(pack_weights(wcat))
    got = conv3x3_int8((a2, b2), wpc, sc, b, th=8, dot_int4=True,
                       out_clip=7.0, pad_vals=(0, -7), relu=False)
    ref = conv3x3_int8_reference((a2, b2), wpc, sc, b, out_clip=7.0,
                                 pad_vals=(0, -7), relu=False)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    return y


def smoke_int4_psrp():
    """w4a4 mid-res PSRP stage: int4 dots + zp pad + split-scale pool."""
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_psrp import (
        conv3x3_psrp, pack_psrp, pack_psrp_weights, unpack_psrp,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_int8 import (
        conv3x3_int8_reference, pack_weights,
    )

    by, nph, cin, cout = 2, 2, 64, 64
    x = _i8((1, 32, 128, cin), -7, 8)
    w = np.asarray(RNG.integers(-7, 8, (3, 3, cin, cout)), np.int8)
    sc, b = _f32((cout,), 1e-3), _f32((cout,))
    mats, _ = pack_psrp_weights(w, by, nph, cins=(cin,))
    xp = pack_psrp(x, by, nph)
    # int4 dots + zp7 border pad, relu folded into clip (blk1_conv0 shape)
    yp = conv3x3_psrp(
        (xp,), tuple(jnp.asarray(m) for m in mats), sc, b,
        by=by, nph=nph, cins=(cin,), tg=4, relu=False,
        dot_int4=True, out_clip=7.0, pad_val=-7,
    )
    y = unpack_psrp(yp, by, nph)
    ref = conv3x3_int8_reference(
        x, jnp.asarray(pack_weights(w, 1)), sc, b, relu=False,
        out_clip=7.0, pad_vals=(-7,),
    )
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))
    # split-scale pool epilogue (blk1_conv1 shape): rescale + shift
    yp2 = conv3x3_psrp(
        (xp,), tuple(jnp.asarray(m) for m in mats), sc, b,
        by=by, nph=nph, cins=(cin,), tg=4, relu=True, pool=True,
        dot_int4=True, pad_val=-7,
        pool_rescale=14.0 / 127.0, pool_shift=-7.0, pool_clip=7.0,
    )
    return jax.block_until_ready(yp2[1])


def smoke_packed():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_int8 import (
        pack_weights,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_packed import (
        conv3x3_int8_packed, head_argmax_packed, pack_head_weights,
        pack_rows, pack_stem_weights, stem_conv3x3_int8_packed,
    )

    by, cin, cout = 4, 32, 32
    x = _i8((1, 64, 512, cin))
    w = np.asarray(RNG.integers(-20, 20, (3, 3, cin, cout)), np.int8)
    y = conv3x3_int8_packed((pack_rows(x, by),),
                            jnp.asarray(pack_weights(w, by)),
                            _f32((cout,), 1e-3), _f32((cout,)),
                            by=by, cins=(cin,), tg=4)
    wh = np.asarray(RNG.integers(-20, 20, (1, 1, cout, 10)), np.int8)
    lab = head_argmax_packed(y, jnp.asarray(pack_head_weights(wh, by)),
                             _f32((10,), 1e-3), _f32((10,)), by=by, nc=10,
                             tg=4)
    ws = np.asarray(RNG.integers(-20, 20, (3, 3, 1, cout)), np.int8)
    xi = _i8((1, 64, 512, 1))
    xp = pack_rows(xi, 32).reshape(1, 2, 512, 32)
    stem = stem_conv3x3_int8_packed(
        xp, jnp.asarray(pack_stem_weights(ws, 32)),
        _f32((cout,), 1e-3), _f32((cout,)), BY=32, by_out=by,
    )
    return lab.block_until_ready(), stem.block_until_ready()


def smoke_psrp():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_psrp import (
        conv3x3_psrp, ct_psrp, head_argmax_psrp, pack_ct_psrp_weights,
        pack_head_psrp_weights, pack_psrp, pack_psrp_weights,
    )

    by = nph = 4
    cin = cout = 32
    x = _i8((1, 64, 512, cin))
    w = np.asarray(RNG.integers(-20, 20, (3, 3, cin, cout)), np.int8)
    mats, _ = pack_psrp_weights(w, by, nph)
    y = conv3x3_psrp((pack_psrp(x, by, nph),),
                     tuple(jnp.asarray(m) for m in mats),
                     _f32((cout,), 1e-3), _f32((cout,)),
                     by=by, nph=nph, cins=(cin,), tg=4)
    wc = np.asarray(RNG.integers(-20, 20, (2, 2, 16, cout)), np.int8)
    ct = ct_psrp(pack_psrp(_i8((1, 32, 256, 16)), 2, 2),
                 tuple(jnp.asarray(m) for m in pack_ct_psrp_weights(wc)),
                 _f32((cout,), 1e-3), _f32((cout,)), by_in=2, nph_in=2,
                 tg=4)
    wh = np.asarray(RNG.integers(-20, 20, (1, 1, cout, 10)), np.int8)
    lab = head_argmax_psrp(y, jnp.asarray(pack_head_psrp_weights(wh, by)),
                           _f32((10,), 1e-3), _f32((10,)), by=by, nph=nph,
                           nc=10, tg=4)
    return ct.block_until_ready(), lab.block_until_ready()


def smoke_psrp7():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_psrp import (
        pack_psrp, prep_stem_input,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_psrp7 import (
        conv7x3_psrp, pack_psrp7_weights, stem7_psrp,
    )

    by = nph = 2
    cin = cout = 64
    x = _i8((1, 64, 512, cin))
    w = np.asarray(RNG.integers(-20, 20, (7, 3, cin, cout)), np.int8)
    mats, _ = pack_psrp7_weights(w, by, nph)
    full, pooled, idx = conv7x3_psrp(
        (pack_psrp(x, by, nph),), tuple(jnp.asarray(m) for m in mats),
        _f32((cout,), 1e-3), _f32((cout,)), jnp.float32(0.25),
        by=by, nph=nph, cins=(cin,), kh=7, tg=8, pool=True,
    )
    ws = np.asarray(RNG.integers(-20, 20, (7, 3, 1, cout)), np.int8)
    smats, _ = pack_psrp7_weights(ws, 32, nph)
    xp = prep_stem_input(_f32((1, 64, 512, 1)), 0.02, BY=32, nph=nph)
    stem, sp, si = stem7_psrp(
        xp, tuple(jnp.asarray(m) for m in smats), _f32((cout,), 1e-3),
        _f32((cout,)), jnp.float32(0.25), BY=32, by_out=by, nph=nph, kh=7,
        pool=True,
    )
    return pooled.block_until_ready(), sp.block_until_ready()


def smoke_bf16_train_conv():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_bf16 import (
        conv3x3_psrp_bf16,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_conv_psrp import (
        pack_psrp,
    )

    by = nph = 4
    cin = cout = 32
    x = jnp.asarray(RNG.standard_normal((2, 64, 512, cin)), jnp.bfloat16)
    w = jnp.asarray(RNG.standard_normal((3, 3, cin, cout)) * 0.1,
                    jnp.bfloat16)
    xp = pack_psrp(x, by, nph)

    def loss(xp, w):
        return jnp.sum(
            conv3x3_psrp_bf16(xp, w, by, nph, 4, False).astype(jnp.float32)
            ** 2
        )

    l, grads = jax.value_and_grad(loss, argnums=(0, 1))(xp, w)
    return jax.block_until_ready((l, grads))


def smoke_loss():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_loss import (
        dice_ce_loss_pallas,
    )

    logits = _f32((2, 32, 128, 10))
    labels = jnp.asarray(RNG.integers(0, 10, (2, 32, 128)), jnp.int32)
    l, g = jax.value_and_grad(
        lambda t: dice_ce_loss_pallas(t, labels)
    )(logits)
    return jax.block_until_ready((l, g))


def smoke_fused_bn():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.fused_bn import (
        bn_train,
    )

    x = jnp.asarray(RNG.standard_normal((2, 32, 128, 32)), jnp.bfloat16)
    y, mean, var = bn_train(x, _f32((32,)), _f32((32,)))
    return jax.block_until_ready((y, mean, var))


def smoke_softargmax():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.ops.pallas_kernels import (
        fused_column_softargmax,
    )

    return jax.block_until_ready(
        fused_column_softargmax(_f32((2, 16, 200, 3)))
    )


def smoke_e2e_unet_psrp():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.psrp import (
        quantize_unet_psrp, unet_psrp_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.quantized import (
        calibrate_unet, fold_unet_bn,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import (
        UNet,
    )

    model = UNet(out_channels=10, init_features=32, dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 1),
                                                    jnp.bfloat16))
    layers = fold_unet_bn(v)
    calib = np.asarray(RNG.standard_normal((2, 512, 512, 1)), np.float32)
    qp = jax.tree.map(jnp.asarray, quantize_unet_psrp(
        layers, calibrate_unet(layers, [calib])))
    lab = unet_psrp_forward(qp, jnp.asarray(calib), 10)
    return lab.block_until_ready()


def smoke_e2e_unet_packed():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.packed import (
        quantize_unet_packed, unet_packed_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.quantized import (
        calibrate_unet, fold_unet_bn,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.unet import (
        UNet,
    )

    model = UNet(out_channels=10, init_features=32, dtype=jnp.bfloat16)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 1),
                                                    jnp.bfloat16))
    layers = fold_unet_bn(v)
    calib = np.asarray(RNG.standard_normal((2, 512, 512, 1)), np.float32)
    qp = jax.tree.map(jnp.asarray, quantize_unet_packed(
        layers, calibrate_unet(layers, [calib])))
    lab = unet_packed_forward(qp, jnp.asarray(calib), 10)
    return jax.block_until_ready(lab)


def smoke_e2e_relaynet_psrp():
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.relaynet_int8 import (
        calibrate_relaynet, fold_relaynet_bn,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.inference.relaynet_psrp import (
        quantize_relaynet_psrp, relaynet_psrp_forward,
    )
    from retinal_oct_image_segmentation_via_deep_learning_tpu.models.relaynet import (
        ReLayNet,
    )

    model = ReLayNet(num_classes=10)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 512, 512, 1)),
                   train=True)
    layers = fold_relaynet_bn(v)
    calib = np.asarray(RNG.standard_normal((2, 512, 512, 1)), np.float32)
    qp = jax.tree.map(jnp.asarray, quantize_relaynet_psrp(
        layers, calibrate_relaynet(layers, [calib])))
    lab = relaynet_psrp_forward(qp, jnp.asarray(calib), num_classes=10)
    return lab.block_until_ready()


FAMILIES = [
    ("int8_conv", smoke_int8_conv),
    ("int4_conv", smoke_int4_conv),
    ("int4_psrp", smoke_int4_psrp),
    ("packed", smoke_packed),
    ("psrp", smoke_psrp),
    ("psrp7", smoke_psrp7),
    ("bf16_train_conv", smoke_bf16_train_conv),
    ("pallas_loss", smoke_loss),
    ("fused_bn", smoke_fused_bn),
    ("softargmax", smoke_softargmax),
    ("e2e_unet_psrp", smoke_e2e_unet_psrp),
    ("e2e_unet_packed", smoke_e2e_unet_packed),
    ("e2e_relaynet_psrp", smoke_e2e_relaynet_psrp),
]


def main():
    pat = sys.argv[1] if len(sys.argv) > 1 else ""
    backend = jax.default_backend()
    print(f"chip_smoke on backend={backend} ({jax.devices()[0]})",
          flush=True)
    failures = []
    for name, fn in FAMILIES:
        if pat and pat not in name:
            continue
        try:
            fn()
            print(f"  PASS {name}", flush=True)
        except Exception:
            failures.append(name)
            print(f"  FAIL {name}", flush=True)
            traceback.print_exc()
    if failures:
        print(f"chip_smoke: {len(failures)} FAILING famil"
              f"{'y' if len(failures) == 1 else 'ies'}: {failures}")
    else:
        print("chip_smoke: all families compile+run on this backend")
    sys.exit(len(failures))


if __name__ == "__main__":
    main()
