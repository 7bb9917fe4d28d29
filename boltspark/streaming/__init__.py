"""Structured Streaming front end for incremental encoding."""

from .stream_encode import encode_stream
from .dedup_stream import dedup_stream

__all__ = ["encode_stream", "dedup_stream"]
