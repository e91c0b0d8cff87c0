from rife_tpu.data.vimeo import VimeoTriplets, SyntheticTriplets, batch_iterator

__all__ = ["VimeoTriplets", "SyntheticTriplets", "batch_iterator"]
