"""Spark layer: salted partitioning, vectorized encode/decode jobs,
checkpoint manifest + resume, and null-aware block-level predicates."""

from .encode import encode_table
from .decode import decode_table
from .filters import (BooleanPredicate, BytesContainsPredicate,
                      BytesEqPredicate, BytesPrefixPredicate,
                      BytesSuffixPredicate, ConstPredicate, InPredicate,
                      RangePredicate)

__all__ = [
    "encode_table",
    "decode_table",
    "RangePredicate",
    "BooleanPredicate",
    "ConstPredicate",
    "BytesEqPredicate",
    "BytesPrefixPredicate",
    "BytesContainsPredicate",
    "BytesSuffixPredicate",
    "InPredicate",
]
