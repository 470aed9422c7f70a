"""Streaming-query control helpers shared by every availableNow run.

``StreamingQuery.awaitTermination(timeout)`` returns ``False`` when the
timeout elapses with the query still running; ignoring that and reading
the sink directory yields silently-partial results. Every bounded
(`trigger(availableNow=True)`) run in this package goes through
:func:`await_bounded` so a hung query raises instead of truncating.
"""

from __future__ import annotations

from pyspark.sql.streaming import StreamingQuery


class StreamingTimeout(RuntimeError):
    """An availableNow streaming query failed to drain within its budget."""


def await_bounded(q: StreamingQuery, timeout_sec: float = 300.0) -> None:
    """Block until ``q`` terminates; raise if it is still running after
    ``timeout_sec`` (stopping it first so no orphan keeps writing to a
    sink directory the caller is about to read/delete)."""
    finished = q.awaitTermination(timeout_sec)
    if not finished:
        try:
            q.stop()
        finally:
            raise StreamingTimeout(
                f"streaming query {q.name or q.id} still running after "
                f"{timeout_sec}s; sink contents would be partial"
            )
