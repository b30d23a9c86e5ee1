"""Structured Streaming surface (SURVEY §2B T1-T8, S5-S7).

Window/session/dedup logic is defined ONCE as logical-plan builders
that accept either a batch or a streaming DataFrame — Spark's
incrementalization makes the same plan run in both modes, which is
what the stream-vs-batch equivalence tests (SURVEY §5.2-3) exercise.
"""
