"""Scalar/encoding function surface (SURVEY.md §2.8-2.9 F/M mappings)."""

from . import wordpiece  # noqa: F401
