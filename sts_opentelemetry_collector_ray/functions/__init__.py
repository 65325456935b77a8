from .hashing import fnv1a32, fnv1a32_array, fnv1a64, fnv1a64_array, shard_id_array
from .maps import pick, omit
from .png import decode_png, encode_png, png_decoder_factory, png_feature_decoder
from .urn import UrnTemplate

__all__ = [
    "decode_png",
    "encode_png",
    "png_decoder_factory",
    "png_feature_decoder",
    "fnv1a32",
    "fnv1a32_array",
    "fnv1a64",
    "fnv1a64_array",
    "shard_id_array",
    "pick",
    "omit",
    "UrnTemplate",
]
