from .resize import resize_bilinear, resize_nearest, upsample  # noqa: F401
from .pooling import max_pool_argmax, max_unpool  # noqa: F401
from .padding import reflect_pad_2d  # noqa: F401
