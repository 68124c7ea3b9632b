"""Structured Streaming front-end for the CDC apply pipeline."""

from .stream_runner import CdcStreamJob

__all__ = ["CdcStreamJob"]
