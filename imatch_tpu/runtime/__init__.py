"""Native host runtime: the C++ decode pool and its Python bindings."""

from imatch_tpu.runtime.loader import (
    NativeImageLoader,
    decode_image_bytes,
    default_loader,
)

__all__ = ["NativeImageLoader", "decode_image_bytes", "default_loader"]
