"""Two-table OCR↔GT alignment via cogroup — SURVEY.md §2.3 J3's exact
contract: ``ocr.groupBy(key).cogroup(gt.groupBy(key)).applyInPandas(...)``.

operators/alignment.py aligns within one row (html and text travel
together); this module covers the reference's real shape — two independent
relations of lines keyed by (doc, page), arriving in any order
(preprocessing/cli_preproc.py:203-217 iterated them in lockstep and
asserted key equality; a cogroup makes that join-by-construction).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame

from ..align import align_page
from .alignment import ALIGNMENTS_SCHEMA


def _align_cogroup(ocr_pdf: pd.DataFrame, gt_pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-key kernel: both sides sorted by line position, aligned, scored.
    Empty sides are legitimate (doc present in only one corpus)."""
    if len(ocr_pdf):
        doc_id = ocr_pdf["doc_id"].iloc[0]
        lang = ocr_pdf["lang"].iloc[0]
    elif len(gt_pdf):
        doc_id = gt_pdf["doc_id"].iloc[0]
        lang = gt_pdf["lang"].iloc[0] if "lang" in gt_pdf else ""
    else:
        return pd.DataFrame()
    ocr_lines = list(ocr_pdf.sort_values("pos")["line"]) if len(ocr_pdf) else []
    gt_lines = list(gt_pdf.sort_values("pos")["line"]) if len(gt_pdf) else []
    rows = []
    for r in align_page(ocr_lines, gt_lines):
        rows.append(
            {
                "doc_id": doc_id,
                "page_id": "p0",
                "line_id": str(r["line_id"]),
                "ocr": r["ocr"],
                "gt": r["gt"],
                "cer": r["cer"],
                "levenshtein": r["levenshtein"],
                "min_dist": r["min_dist"],
                "allowed_dist": r["allowed_dist"],
                "similarity": r["similarity"],
                "lang": lang,
            }
        )
    return pd.DataFrame(rows)


def cogroup_alignments(ocr_lines: DataFrame, gt_lines: DataFrame) -> DataFrame:
    """Both inputs: (doc_id string, pos int, line string, lang string).
    One shuffle per side on doc_id; the kernel sees each key's two groups
    together — the distributed form of the reference's lockstep zip."""
    return (
        ocr_lines.groupBy("doc_id")
        .cogroup(gt_lines.groupBy("doc_id"))
        .applyInPandas(_align_cogroup, schema=ALIGNMENTS_SCHEMA)
    )
