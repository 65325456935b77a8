from .hashing import fnv1a32, fnv1a32_array, fnv1a64, fnv1a64_array, shard_id_array
from .maps import pick, omit
from .urn import UrnTemplate

__all__ = [
    "fnv1a32",
    "fnv1a32_array",
    "fnv1a64",
    "fnv1a64_array",
    "shard_id_array",
    "pick",
    "omit",
    "UrnTemplate",
]
