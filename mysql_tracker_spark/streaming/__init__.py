"""Structured Streaming front-end for the CDC apply pipeline."""

from .stream_runner import CdcStreamJob, Heartbeat

__all__ = ["CdcStreamJob", "Heartbeat"]
