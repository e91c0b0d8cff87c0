from rife_tpu.data.vimeo import (
    SyntheticSeptuplets,
    SyntheticTriplets,
    VimeoSeptuplets,
    VimeoTriplets,
    batch_iterator,
)

__all__ = [
    "VimeoTriplets",
    "VimeoSeptuplets",
    "SyntheticTriplets",
    "SyntheticSeptuplets",
    "batch_iterator",
]
