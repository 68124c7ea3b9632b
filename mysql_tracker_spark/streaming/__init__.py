"""Structured Streaming front-end for the CDC apply pipeline."""

from .stateful import run_sessionize_files, sessionize_stream
from .stream_runner import CdcStreamJob, Heartbeat

__all__ = ["CdcStreamJob", "Heartbeat", "sessionize_stream", "run_sessionize_files"]
