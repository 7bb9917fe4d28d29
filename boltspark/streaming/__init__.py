"""Structured Streaming front end for incremental encoding."""

from .stream_encode import encode_stream

__all__ = ["encode_stream"]
