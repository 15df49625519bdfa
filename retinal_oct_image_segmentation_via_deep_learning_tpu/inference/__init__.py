from .packed import (  # noqa: F401
    quantize_unet_packed,
    unet_packed_forward,
)
from .psrp import (  # noqa: F401
    quantize_unet_psrp,
    unet_psrp_forward,
)
from .relaynet_int8 import (  # noqa: F401
    calibrate_relaynet,
    fold_relaynet_bn,
    quantize_relaynet,
    relaynet_int8_forward,
)
from .quantized import (  # noqa: F401
    calibrate_unet,
    fold_unet_bn,
    quantize_unet,
    quantize_unet_mixed,
    unet_int8_forward,
    unet_mixed_forward,
)
