"""Structured Streaming surface.

The reference is strictly batch (SURVEY.md §2.10) and the production
resumability contract is partition-manifest based, NOT a streaming sink.
This module exists for the continuous-ingest extension path: a pages
stream → the SAME fused extraction kernel → windowed metric aggregation
with late-data handling. Kept deliberately thin — the kernel and metric
logic are the batch ones, reused verbatim.
"""

from . import ingest  # noqa: F401
