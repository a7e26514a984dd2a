"""Relational operator library — the SURVEY.md §2 inventory re-expressed as
idiomatic DataFrame/Catalyst plans over the driver's test tables, plus the
training-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing)."""

from . import (  # noqa: F401
    alignment,
    dedup,
    evaluation,
    lines,
    multimodal,
    relational,
    similarity,
    textstats,
)
