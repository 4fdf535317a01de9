"""Utilities: metrics, checkpointing, structured logging, profiling."""

from . import checkpoint, logging, metrics

__all__ = ["checkpoint", "logging", "metrics"]
