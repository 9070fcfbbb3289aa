from .kmers import extract_canonical, split_u64, join_u64
from .count import count_kmers, unique_kmers
from .setops import membership, intersection_size

__all__ = [
    "extract_canonical",
    "split_u64",
    "join_u64",
    "count_kmers",
    "unique_kmers",
    "membership",
    "intersection_size",
]
