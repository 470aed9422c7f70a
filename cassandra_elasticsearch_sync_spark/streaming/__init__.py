"""Structured Streaming: the reference's incremental sync mode
(SURVEY.md section 2.I and row L7).

The reference's incremental loop - "read records changed since the
last sync point, resolve, apply, advance the sync point" - maps to
Structured Streaming directly: the changed-since read is the file/
offset source + watermark, the sync point is the checkpoint, and the
apply step is a foreachBatch LWW merge (SURVEY.md 3.2). State that the
reference kept "partially outside" (BASELINE.json:6) lives in the
checkpoint + state store here.
"""
