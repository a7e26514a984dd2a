"""Shared column expressions — single definitions for the idioms that the
reference copy-pasted (the CER band ladder appears 5× in cli_preproc.py
:761-783,:946-968,:1317-1338,:1521-1542,:1576-1597; here it exists once).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: the reference's 7 CER bands, in order
CER_BANDS = ("0.00", "<0.02", "<0.04", "<0.06", "<0.08", "<0.10", ">=0.10")


def tokens_expr(col) -> Column:
    """Whitespace tokens, lowercased, empties dropped (F2 semantics;
    identical to the oracle-side list_filter(string_split(lower(...))))."""
    return F.filter(F.split(F.lower(col), " "), lambda x: x != "")


def cer_band_expr(col) -> Column:
    """The 7-band CER bucketing when-ladder (P8)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.when(c == 0.0, CER_BANDS[0])
        .when(c < 0.02, CER_BANDS[1])
        .when(c < 0.04, CER_BANDS[2])
        .when(c < 0.06, CER_BANDS[3])
        .when(c < 0.08, CER_BANDS[4])
        .when(c < 0.10, CER_BANDS[5])
        .otherwise(CER_BANDS[6])
    )


def cents_expr(col) -> Column:
    """Money column → exact integer cents (cross-engine-safe arithmetic;
    see operators/relational.cents for the rationale)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).cast("long")


def host_expr(url_col) -> Column:
    """Host component of a url column (JVM-side)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.element_at(F.split(F.element_at(F.split(c, "://"), -1), "/"), 1)
