"""Structured Streaming jobs: the reference's streaming layer re-expressed.

The reference's only streaming semantics are pass-through ingest with schema
enforcement and a <=10 s commit cadence (SURVEY.md section 2.9); ingest.py covers
that. windowed.py goes beyond parity with watermarked event-time windows and
session windows — the streaming twins of the batch events_hourly and
sessionization operators, so results are cross-checkable between modes.
"""
