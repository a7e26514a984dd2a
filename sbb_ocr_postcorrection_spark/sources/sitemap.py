"""sitemap.xml parsing + crawl-frontier discovery, from scratch.

The third leg of the crawl-policy trio (blocklist, robots, sitemap): a
host's sitemap advertises the URLs it WANTS crawled with last-modified
hints; a crawl pipeline diffs that against what it already holds to
build the discovery frontier (new pages to fetch, changed pages to
re-fetch). The reference walks METS structMaps to enumerate a
document's files (operators/mets.py, SURVEY §2.1 S3); this is the same
link-table pattern over the sitemaps.org schema.

Parsing is namespace-aware ElementTree (the real sitemaps.org namespace
plus namespace-less feeds), tolerant of missing <lastmod>; malformed XML
raises (the manifest-corrupt convention — a truncated sitemap silently
yielding zero URLs would quietly freeze a host's frontier).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

_SM_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def parse_sitemap(xml_text: str) -> list[dict]:
    """sitemap urlset XML → [{loc, lastmod}] (lastmod None when absent).

    Accepts both namespaced (sitemaps.org) and bare <urlset> documents;
    entries without a <loc> are skipped (nothing to fetch)."""
    root = ET.fromstring(xml_text)
    out: list[dict] = []
    for url_el in list(root):
        tag = url_el.tag.rsplit("}", 1)[-1]
        if tag != "url":
            continue
        loc = None
        lastmod = None
        for child in url_el:
            ctag = child.tag.rsplit("}", 1)[-1]
            if ctag == "loc":
                loc = (child.text or "").strip()
            elif ctag == "lastmod":
                lastmod = (child.text or "").strip() or None
        if loc:
            out.append({"loc": loc, "lastmod": lastmod})
    return out


def synth_sitemap_xml(k: int) -> str:
    """Deterministic fixture sitemap for synth host k: the 13 synth paths
    with arithmetic lastmod dates (mirrored by the DuckDB oracle)."""
    import datetime

    base = datetime.date(2024, 1, 1)
    urls = []
    for p in range(13):
        d = (base + datetime.timedelta(days=k * 13 + p)).isoformat()
        urls.append(
            f"<url><loc>https://site{k}.example.com/p/{p}</loc>"
            f"<lastmod>{d}</lastmod></url>"
        )
    return f'<urlset xmlns="{_SM_NS}">' + "".join(urls) + "</urlset>"


def sitemap_scan(spark, sf_dir, sitemaps=None, known=None):
    """Discovery frontier: parse each host's sitemap and flag every
    advertised URL as already-known (in the crawl history) or new.
    Output: (host, loc, lastmod, known).

    ``sitemaps`` is a (host, sitemap_xml) relation; ``known`` a (loc)
    relation of already-crawled canonical URLs. The fixture synthesizes
    both deterministically: one sitemap per synth host, and a history
    snapshot of the even doc_ids below 100 — which covers only part of
    the advertised URL space, so both verdicts are non-vacuous at every
    SF. Shape: the XML parse is an Arrow kernel over the hosts-sized
    sitemap dimension (one parse per host); the known-URL flag is an
    equality LEFT join on loc — at web scale that is frontier ⋈ crawl
    index, the standard discovery join, shuffling on the URL key."""
    from collections.abc import Iterator

    import pandas as pd

    from pyspark.sql import functions as F

    from ..operators.relational import load

    if sitemaps is None:
        sitemaps = spark.createDataFrame(
            [(f"site{k}.example.com", synth_sitemap_xml(k)) for k in range(7)],
            "host string, sitemap_xml string",
        )
    if known is None:
        d = load(spark, sf_dir, "documents")
        known = (
            d.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 100))
            .select(
                F.concat(
                    F.lit("https://site"),
                    (F.col("doc_id") % 7).cast("string"),
                    F.lit(".example.com/p/"),
                    (F.col("doc_id") % 13).cast("string"),
                ).alias("loc")
            )
            .distinct()
        )

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, xml in zip(pdf["host"], pdf["sitemap_xml"]):
                for r in parse_sitemap(xml):
                    rows.append(
                        {"host": host, "loc": r["loc"], "lastmod": r["lastmod"]}
                    )
            yield pd.DataFrame(rows, columns=["host", "loc", "lastmod"])

    entries = sitemaps.select("host", "sitemap_xml").mapInPandas(
        kern, schema="host string, loc string, lastmod string"
    )
    return (
        entries.join(known.withColumn("known", F.lit(1)), "loc", "left")
        .select(
            "host", "loc", "lastmod",
            F.coalesce(F.col("known"), F.lit(0)).cast("int").alias("known"),
        )
    )


ORPHAN_MOD = 9  # every 9th crawled doc contributes a link-discovered orphan


def sitemap_coverage(spark, sf_dir) -> "DataFrame":
    """Per-host discovery-completeness audit: reconcile the
    sitemap-ADVERTISED url space with the actually-CRAWLED url set —
    n_sitemap_only is tomorrow's frontier (advertised, never fetched),
    n_crawled_only are orphans reached by links the site never advertised
    (the signal a sitemap is stale), coverage_pct drives per-host
    discovery-budget decisions.

    Fixture: the advertised side is the sitemap_scan relation; the
    crawled side is its known-history fixture (even doc_ids < 100)
    plus deterministic orphan urls (/p/1xx paths outside the advertised
    space, every ORPHAN_MOD-th doc) so all three statuses are non-vacuous
    (the augmentation convention).

    Scale shape: one FULL OUTER equality join on the url key (frontier ⋈
    crawl index, both sides url-sharded — co-located when both are
    bucketed by url) followed by ONE host aggregation; host comes from
    the url via one regexp so crawled-only rows need no second source."""
    from pyspark.sql import functions as F

    from ..operators.relational import load

    adv = sitemap_scan(spark, sf_dir).select("loc").withColumn(
        "advertised", F.lit(1)
    )
    d = load(spark, sf_dir, "documents")
    known = d.filter((F.col("doc_id") % 2 == 0) & (F.col("doc_id") < 100)).select(
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/p/"),
            (F.col("doc_id") % 13).cast("string"),
        ).alias("loc")
    )
    orphans = d.filter(F.col("doc_id") % ORPHAN_MOD == 0).select(
        F.concat(
            F.lit("https://site"),
            (F.col("doc_id") % 7).cast("string"),
            F.lit(".example.com/p/"),
            (F.lit(100) + F.col("doc_id") % 13).cast("string"),
        ).alias("loc")
    )
    crawled = known.unionByName(orphans).distinct().withColumn(
        "crawled", F.lit(1)
    )
    j = adv.join(crawled, "loc", "full_outer")
    host = F.regexp_extract(F.col("loc"), r"https://([^/]+)/", 1)
    both = (F.col("advertised").isNotNull() & F.col("crawled").isNotNull()).cast("long")
    s_only = (F.col("advertised").isNotNull() & F.col("crawled").isNull()).cast("long")
    c_only = (F.col("advertised").isNull() & F.col("crawled").isNotNull()).cast("long")
    agg = j.groupBy(host.alias("host")).agg(
        F.sum(F.col("advertised").isNotNull().cast("long")).alias("n_advertised"),
        F.sum(F.col("crawled").isNotNull().cast("long")).alias("n_crawled"),
        F.sum(both).alias("n_both"),
        F.sum(s_only).alias("n_sitemap_only"),
        F.sum(c_only).alias("n_crawled_only"),
    )
    return agg.select(
        "*",
        F.round(
            F.col("n_both") * 100.0 / F.greatest(F.col("n_advertised"), F.lit(1)),
            6,
        ).alias("coverage_pct"),
    )
