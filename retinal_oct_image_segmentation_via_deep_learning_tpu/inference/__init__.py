from .quantized import (  # noqa: F401
    calibrate_unet,
    fold_unet_bn,
    quantize_unet,
    unet_int8_forward,
)
