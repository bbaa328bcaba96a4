"""Structured Streaming surface (SURVEY §2.9 T1-T4) — the reference's
cron-driven incremental batch patterns as real streaming queries."""

from loris_mri_spark.streaming.incremental import (
    run_to_memory,
    stream_events,
)

__all__ = ["run_to_memory", "stream_events"]
