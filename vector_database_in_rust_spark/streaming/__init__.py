"""Structured Streaming lane: file-source ingest, watermarked rollups,
sessionization, stream dedup/curation, stream-stream joins.

Every ``run_*_to_memory`` helper drains an ``availableNow`` query and
must fail LOUDLY on timeout: ``awaitTermination(timeout)`` returns False
without raising, and a partially populated memory table would surface
downstream as a confusing hash mismatch instead of a clear error.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


def await_or_raise(q: StreamingQuery, timeout_sec: float) -> None:
    """Block until ``q`` terminates; on timeout stop the query and raise
    instead of silently returning a partial result."""
    if not q.awaitTermination(timeout_sec):
        q.stop()
        raise TimeoutError(
            f"streaming query {q.name or q.id} did not drain within "
            f"{timeout_sec}s (availableNow batch still running)"
        )
