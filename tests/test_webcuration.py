"""r5 web-curation additions: anchor-text index, template fingerprints,
mirror detection, PMI collocations, canonical keepers, host language mix —
each checked against an independent pure-Python reference implementation
(the BPE lesson: oracle parity certifies engine agreement, not
algorithmic correctness), plus plan-shape assertions."""

import hashlib
from collections import Counter, defaultdict

import duckdb

from sbb_ocr_postcorrection_spark.operators.index import (
    COLL_K,
    COLL_MIN,
    COLL_SCALE,
    collocations,
)
from sbb_ocr_postcorrection_spark.operators.linkgraph import (
    ANCHOR_LEN,
    LINK_FANOUT,
    N_HOSTS,
    anchor_text_index,
)
from sbb_ocr_postcorrection_spark.operators.urls import host_language_profile
from sbb_ocr_postcorrection_spark.operators.webstruct import (
    LI_MOD,
    MIRROR_HOST_SHIFT,
    MIRROR_ID_BASE,
    MIRROR_MOD,
    mirror_detection,
    template_fingerprint,
)

SF = "/root/testdata/sf0.001"


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text, lang FROM '{SF}/documents.parquet'"
    ).fetchall()


def test_anchor_text_index_matches_reference(spark):
    per_anchor = Counter()
    srcs = defaultdict(set)
    totals = Counter()
    for doc_id, text, _ in _docs():
        anchor = (text or "").lower()[:ANCHOR_LEN].strip()
        for j in range(1, LINK_FANOUT + 1):
            src, dst = doc_id % N_HOSTS, (doc_id * 31 + j) % N_HOSTS
            if src == dst:
                continue
            per_anchor[(dst, anchor)] += 1
            srcs[dst].add(src)
            totals[dst] += 1
    want = {}
    for dst in totals:
        top = min(
            ((a, n) for (d, a), n in per_anchor.items() if d == dst),
            key=lambda an: (-an[1], an[0]),
        )
        want[f"host{dst}.example.net"] = (
            totals[dst],
            len(srcs[dst]),
            top[0],
            top[1],
        )
    got = {
        r["dst_host"]: (
            r["n_anchors"],
            r["n_src_hosts"],
            r["top_anchor"],
            r["top_anchor_n"],
        )
        for r in anchor_text_index(spark, SF).collect()
    }
    assert got == want


def test_template_fingerprint_classes(spark):
    rows = template_fingerprint(spark, SF).collect()
    n_docs = len(_docs())
    # the injected doc_id % LI_MOD structure yields exactly LI_MOD
    # templates on the synthetic corpus (text contributes no tags), with
    # strictly increasing tag counts (one extra <li> per class)
    assert len(rows) == LI_MOD
    assert sum(r["n_pages"] for r in rows) == n_docs
    assert len({r["template_sig"] for r in rows}) == LI_MOD
    assert sorted(r["n_tags"] for r in rows) == [
        min(r["n_tags"] for r in rows) + k for k in range(LI_MOD)
    ]
    assert all(r["example_url"].startswith("https://docs.example.org/") for r in rows)


def test_mirror_detection_matches_reference(spark):
    hosts = defaultdict(set)
    docs_per = Counter()
    firsts = {}
    for doc_id, text, _ in _docs():
        dig = hashlib.md5((text or "").encode()).hexdigest()
        hosts[dig].add(doc_id % N_HOSTS)
        docs_per[dig] += 1
        firsts[dig] = min(firsts.get(dig, doc_id), doc_id)
        if doc_id % MIRROR_MOD == 0:
            hosts[dig].add((doc_id + MIRROR_HOST_SHIFT) % N_HOSTS)
            docs_per[dig] += 1
            firsts[dig] = min(firsts[dig], doc_id + MIRROR_ID_BASE)
    want = {
        dig: (
            docs_per[dig],
            len(hs),
            f"host{min(hs)}.example.net",
            firsts[dig],
        )
        for dig, hs in hosts.items()
        if len(hs) >= 2
    }
    got = {
        r["digest"]: (
            r["n_docs"],
            r["n_hosts"],
            r["canonical_host"],
            r["first_doc"],
        )
        for r in mirror_detection(spark, SF).collect()
    }
    assert got == want
    assert want, "mirror groups exist (every MIRROR_MOD-th doc)"


def test_collocations_match_reference(spark):
    uni = Counter()
    big = Counter()
    for _, text, _ in _docs():
        t = [w for w in (text or "").lower().split(" ") if w]
        uni.update(t)
        big.update(zip(t, t[1:]))
    scored = [
        (n * COLL_SCALE // (uni[w1] * uni[w2]), w1, w2, n)
        for (w1, w2), n in big.items()
        if n >= COLL_MIN
    ]
    scored.sort(key=lambda s: (-s[0], s[1], s[2]))
    want = [(w1, w2, n, lift) for lift, w1, w2, n in scored[:COLL_K]]
    got = [
        (r["w1"], r["w2"], r["n_xy"], r["lift_fp"])
        for r in collocations(spark, SF).collect()
    ]
    assert got == want
    assert want, "collocations exist above the count gate"


def test_component_canonical_consistent_with_labels(spark):
    from sbb_ocr_postcorrection_spark.operators.components import (
        component_canonical,
        duplicate_components,
    )

    labels = {
        r["doc_id"]: (r["component_id"], r["component_size"])
        for r in duplicate_components(spark, SF).collect()
    }
    n_chars = {
        d: n
        for d, n in duckdb.sql(
            f"SELECT doc_id, n_chars FROM '{SF}/documents.parquet'"
        ).fetchall()
    }
    comps = defaultdict(list)
    for doc, (cid, size) in labels.items():
        if size >= 2:
            comps[cid].append(doc)
    want = {}
    for cid, members in comps.items():
        keeper = min(members, key=lambda d: (-n_chars[d], d))
        want[cid] = (len(members), keeper, n_chars[keeper], len(members) - 1)
    got = {
        r["component_id"]: (
            r["component_size"],
            r["keeper_doc_id"],
            r["keeper_n_chars"],
            r["n_dropped"],
        )
        for r in component_canonical(spark, SF).collect()
    }
    assert got == want


def test_host_language_profile_matches_reference(spark):
    per = Counter()
    for doc_id, _, lang in _docs():
        per[(f"site{doc_id % 7}.example.com", lang)] += 1
    totals = Counter()
    for (h, _), n in per.items():
        totals[h] += n
    want = {}
    for h in totals:
        lang, n = min(
            ((l, n) for (hh, l), n in per.items() if hh == h),
            key=lambda ln: (-ln[1], ln[0]),
        )
        want[h] = (totals[h], lang, n, round(n * 100.0 / totals[h], 6))
    got = {
        r["host"]: (
            r["n_docs"],
            r["top_lang"],
            r["top_lang_docs"],
            r["top_lang_pct"],
        )
        for r in host_language_profile(spark, SF).collect()
    }
    assert got == want


def test_new_windows_are_partitioned_and_topk_is_take_ordered(spark):
    """None of the r5 additions may fall back to a single-partition
    global window; the collocations top-k must be TakeOrderedAndProject,
    not a global sort."""
    from tests.test_plans import plan_of

    for df in (
        anchor_text_index(spark, SF),
        host_language_profile(spark, SF),
    ):
        assert "SinglePartition" not in plan_of(df)
    cplan = plan_of(collocations(spark, SF))
    assert "TakeOrderedAndProject" in cplan
    assert "SinglePartition" not in cplan


def test_crawl_change_rate_matches_reference(spark):
    from sbb_ocr_postcorrection_spark.operators.dedup import (
        CHANGE_HOT_PCT,
        CHANGE_WARM_PCT,
        crawl_change_rate,
    )

    old, new = {}, {}
    for doc_id, text, _ in _docs():
        sec_doc = duckdb.sql(
            f"SELECT source FROM '{SF}/documents.parquet' WHERE doc_id = {doc_id}"
        ).fetchone()[0]
        url = (sec_doc, doc_id)
        if doc_id < 400:
            old[url] = text
        if doc_id >= 100:
            new[url] = text + " v2" if doc_id % 5 == 0 else text
    per = defaultdict(lambda: Counter())
    for url in set(old) | set(new):
        sec = url[0]
        if url not in old:
            per[sec]["added"] += 1
        elif url not in new:
            per[sec]["removed"] += 1
        elif old[url] == new[url]:
            per[sec]["unchanged"] += 1
        else:
            per[sec]["changed"] += 1
    want = {}
    for sec, c in per.items():
        rate = round(
            c["changed"] * 100.0 / max(c["changed"] + c["unchanged"], 1), 6
        )
        tier = (
            "hot"
            if rate >= CHANGE_HOT_PCT
            else "warm" if rate >= CHANGE_WARM_PCT else "cold"
        )
        want[sec] = (
            sum(c.values()),
            c["added"],
            c["removed"],
            c["changed"],
            c["unchanged"],
            rate,
            tier,
        )
    got = {
        r["section"]: (
            r["n_urls"],
            r["n_added"],
            r["n_removed"],
            r["n_changed"],
            r["n_unchanged"],
            r["change_rate_pct"],
            r["revisit_tier"],
        )
        for r in crawl_change_rate(spark, SF).collect()
    }
    assert got == want
    assert len({t for *_, t in got.values()}) >= 2, "tiers non-vacuous"


def test_host_cap_sample_matches_reference(spark):
    """Cap verdicts == a pure-Python replay: md5-coin rank within host,
    kept iff rank ≤ cap; both kept and dropped docs exist; the sample is
    rerun-stable (the coin depends only on doc_id)."""
    from sbb_ocr_postcorrection_spark.operators.urls import (
        HOST_CAP,
        host_cap_sample,
    )

    by_host = defaultdict(list)
    for doc_id, _, _ in _docs():
        coin = hashlib.md5(f"cap|{doc_id}".encode()).hexdigest()
        by_host[f"site{doc_id % 7}.example.com"].append((coin, doc_id))
    want = {}
    for host, pairs in by_host.items():
        for rank, (_, doc_id) in enumerate(sorted(pairs), start=1):
            want[doc_id] = (host, rank, int(rank <= HOST_CAP))
    got = {
        r["doc_id"]: (r["host"], r["rank_in_host"], r["kept"])
        for r in host_cap_sample(spark, SF).collect()
    }
    assert got == want
    kept = sum(k for _, _, k in got.values())
    assert 0 < kept < len(got), "cap bites but keeps something"
    got2 = {
        r["doc_id"]: (r["host"], r["rank_in_host"], r["kept"])
        for r in host_cap_sample(spark, SF).collect()
    }
    assert got2 == got


def test_ingest_trend_matches_reference(spark):
    from datetime import date, timedelta

    from sbb_ocr_postcorrection_spark.operators.temporal import (
        SPIKE_FACTOR,
        TREND_DAYS,
        TREND_WINDOW,
        ingest_trend,
    )

    per = defaultdict(lambda: [0, 0])
    chars = {
        d: n
        for d, n in duckdb.sql(
            f"SELECT doc_id, n_chars FROM '{SF}/documents.parquet'"
        ).fetchall()
    }
    base = date(2024, 1, 1)
    for doc_id in chars:
        dt = base + timedelta(days=doc_id % TREND_DAYS)
        per[dt][0] += 1
        per[dt][1] += chars[doc_id]
    want = {}
    for dt, (nd, nc) in per.items():
        prior = [
            per[p][1]
            for k in range(1, TREND_WINDOW + 1)
            if (p := dt - timedelta(days=k)) in per
        ]
        trail = sum(prior)
        spike = int(
            len(prior) > 0 and nc * TREND_WINDOW > SPIKE_FACTOR * trail
        )
        want[dt] = (nd, nc, trail, len(prior), spike)
    got = {
        r["dt"]: (
            r["n_docs"],
            r["n_chars_day"],
            r["trail_chars"],
            r["n_prior_days"],
            r["spike"],
        )
        for r in ingest_trend(spark, SF).collect()
    }
    assert got == want
    # day 0 of the calendar has no prior history -> never flags
    assert got[base][4] == 0


def test_text_diversity_matches_reference(spark):
    from sbb_ocr_postcorrection_spark.operators.textstats import (
        text_diversity,
    )

    rows = duckdb.sql(
        f"SELECT source, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    uni = defaultdict(Counter)
    tri = defaultdict(Counter)
    for source, text in rows:
        t = [w for w in (text or "").lower().split(" ") if w]
        uni[source].update(t)
        tri[source].update(
            " ".join(t[i : i + 3]) for i in range(len(t) - 2)
        )
    want = {}
    for s in uni:
        nt, nv = sum(uni[s].values()), len(uni[s])
        ng, nd = sum(tri[s].values()), len(tri[s])
        want[s] = (
            nt,
            nv,
            ng,
            nd,
            round(nv / max(nt, 1), 6),
            round(nd / max(ng, 1), 6),
        )
    got = {
        r["source"]: (
            r["n_tokens"],
            r["n_vocab"],
            r["n_trigrams"],
            r["n_tri_distinct"],
            r["distinct1"],
            r["distinct3"],
        )
        for r in text_diversity(spark, SF).collect()
    }
    assert got == want
    assert all(0 < v[5] <= 1 for v in got.values())


def test_sitemap_coverage_statuses_non_vacuous(spark):
    """All three reconciliation statuses fire, counts are internally
    consistent, and coverage never exceeds 100."""
    from sbb_ocr_postcorrection_spark.sources.sitemap import sitemap_coverage

    rows = sitemap_coverage(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_advertised"] == r["n_both"] + r["n_sitemap_only"]
        assert r["n_crawled"] == r["n_both"] + r["n_crawled_only"]
        assert 0 <= r["coverage_pct"] <= 100
    assert sum(r["n_both"] for r in rows) > 0
    assert sum(r["n_sitemap_only"] for r in rows) > 0
    assert sum(r["n_crawled_only"] for r in rows) > 0


def test_passage_windows_cover_and_overlap(spark):
    """Every token appears in at least one window, consecutive windows of
    a doc overlap by CHUNK−STRIDE tokens, the last window is short but
    never empty, and reassembling non-overlapping prefixes reproduces
    the tokenized document."""
    from sbb_ocr_postcorrection_spark.operators.lines import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        passage_windows,
    )

    toks = {}
    for doc_id, text, _ in _docs():
        t = [w for w in (text or "").lower().split(" ") if w]
        if t:
            toks[doc_id] = t
    rows = defaultdict(dict)
    for r in passage_windows(spark, SF).collect():
        rows[r["doc_id"]][r["chunk_id"]] = r
    assert set(rows) == set(toks)
    for doc_id, t in toks.items():
        ch = rows[doc_id]
        n = len(t)
        want_nw = (max(n - CHUNK_TOKENS, 0) + CHUNK_STRIDE - 1) // CHUNK_STRIDE + 1
        assert sorted(ch) == list(range(want_nw))
        rebuilt = []
        for k in range(want_nw):
            r = ch[k]
            s = 1 + k * CHUNK_STRIDE
            assert r["start_tok"] == s
            want_toks = t[s - 1 : s - 1 + CHUNK_TOKENS]
            assert r["n_tok"] == min(CHUNK_TOKENS, n - s + 1) >= 1
            assert r["passage"] == " ".join(want_toks)
            rebuilt.extend(
                want_toks if k == want_nw - 1 else want_toks[:CHUNK_STRIDE]
            )
        assert rebuilt[:n] == t  # stride prefixes + full tail cover the doc


def test_source_overlap_matrix_matches_reference(spark):
    from sbb_ocr_postcorrection_spark.operators.webstruct import (
        SYND_MOD,
        source_overlap_matrix,
    )

    sd = set()
    for doc_id, text, _ in _docs():
        dig = hashlib.md5((text or "").encode()).hexdigest()
        src = duckdb.sql(
            f"SELECT source FROM '{SF}/documents.parquet' WHERE doc_id = {doc_id}"
        ).fetchone()[0]
        sd.add((src, dig))
        if doc_id % SYND_MOD == 0:
            sd.add(("syndicated", dig))
    sizes = Counter(src for src, _ in sd)
    by_dig = defaultdict(set)
    for src, dig in sd:
        by_dig[dig].add(src)
    pairs = Counter()
    for srcs in by_dig.values():
        for a in srcs:
            for b in srcs:
                if a != b:
                    pairs[(a, b)] += 1
    want = {
        (a, b): (n, sizes[a], sizes[b], round(n * 100.0 / sizes[a], 6))
        for (a, b), n in pairs.items()
    }
    got = {
        (r["source_a"], r["source_b"]): (
            r["n_shared_digests"],
            r["n_a"],
            r["n_b"],
            r["pct_of_a"],
        )
        for r in source_overlap_matrix(spark, SF).collect()
    }
    assert got == want
    assert any(a == "syndicated" or b == "syndicated" for a, b in got), (
        "syndication overlap present"
    )


def test_robots_compliance_consistent_with_gate(spark):
    """Compliance rollup == the gate verdicts aggregated; the fixture's
    odd hosts carry disallow rules so all three actions are reachable and
    at least purge + compliant both fire."""
    from sbb_ocr_postcorrection_spark.sources.robots import (
        COMPLY_PURGE_PCT,
        robots_compliance,
        robots_gate,
    )

    verdicts = robots_gate(spark, SF).collect()
    per = defaultdict(lambda: [0, 0])
    for r in verdicts:
        per[r["host"]][0] += 1
        per[r["host"]][1] += 1 - r["robots_allowed"]
    want = {}
    for h, (n, nd) in per.items():
        pct = round(nd * 100.0 / n, 6)
        action = (
            "purge_and_recrawl"
            if pct > COMPLY_PURGE_PCT
            else "purge" if pct > 0.0 else "compliant"
        )
        want[h] = (n, nd, pct, action)
    got = {
        r["host"]: (
            r["n_urls"],
            r["n_disallowed"],
            r["disallowed_pct"],
            r["action"],
        )
        for r in robots_compliance(spark, SF).collect()
    }
    assert got == want
    actions = {a for *_, a in got.values()}
    assert "compliant" in actions and len(actions) >= 2


def test_template_sample_stable_and_capped(spark):
    """Every template yields ≤ K sampled pages with correct sizes; the
    sample is rerun-stable and each sampled url belongs to the template
    it represents (cross-checked against the fingerprint rollup)."""
    from sbb_ocr_postcorrection_spark.operators.webstruct import (
        TEMPLATE_SAMPLE_K,
        template_fingerprint,
        template_sample,
    )

    sizes = {
        r["template_sig"]: r["n_pages"]
        for r in template_fingerprint(spark, SF).collect()
    }
    rows = template_sample(spark, SF).collect()
    per = defaultdict(list)
    for r in rows:
        per[r["template_sig"]].append(r)
        assert r["n_pages"] == sizes[r["template_sig"]]
    assert set(per) == set(sizes)
    for sig, rs in per.items():
        assert len(rs) == min(TEMPLATE_SAMPLE_K, sizes[sig])
        assert sorted(r["rank"] for r in rs) == list(range(1, len(rs) + 1))
    again = {(r["template_sig"], r["rank"]): r["url"] for r in rows}
    rerun = {
        (r["template_sig"], r["rank"]): r["url"]
        for r in template_sample(spark, SF).collect()
    }
    assert again == rerun


def test_template_extract_metrics_consistent(spark):
    """Per-template kernel metrics reconcile with the fingerprint rollup
    (same groups, page counts) and with the corpus-total extraction
    metrics; ratios sit in (0, 1] — extraction always strips boilerplate
    but never everything on this corpus."""
    from sbb_ocr_postcorrection_spark.operators.webstruct import (
        template_extract_metrics,
        template_fingerprint,
    )

    sizes = {
        r["template_sig"]: r["n_pages"]
        for r in template_fingerprint(spark, SF).collect()
    }
    rows = template_extract_metrics(spark, SF).collect()
    assert {r["template_sig"]: r["n_pages"] for r in rows} == sizes
    for r in rows:
        assert 0 < r["extraction_ratio"] <= 1
        assert r["spans_per_page"] > 0
        assert r["sum_chars_out"] <= r["sum_chars_in"]


def test_gopher_quality_matches_reference(spark):
    """Gopher-rule signals == a pure-Python replay of the word/line
    statistics and the cross-multiplied integer keep rule."""
    import re
    from collections import Counter

    import duckdb

    from sbb_ocr_postcorrection_spark.operators.textstats import (
        GOPHER_BULLET_MOD,
        GOPHER_ELLIPSIS_MOD,
        gopher_quality,
    )

    SF = "/root/testdata/sf0.001"
    want = {}
    for doc_id, text in duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall():
        t = (text or "").lower()
        toks = [w for w in t.split(" ") if w]
        n = len(toks)
        sum_len = sum(len(w) for w in toks)
        alpha = sum(1 for w in toks if re.fullmatch("[a-z]+", w))
        ft = (
            ("- promo item\n- promo item\n" if doc_id % GOPHER_BULLET_MOD == 0 else "")
            + t.replace(". ", ".\n")
            + ("\nread more...\nread more..." if doc_id % GOPHER_ELLIPSIS_MOD == 0 else "")
        )
        lines = [x for x in ft.split("\n") if x]
        nl = len(lines)
        ndis = len(set(lines))
        bullets = sum(1 for x in lines if x.startswith("- "))
        ellip = sum(1 for x in lines if x.endswith("..."))
        top = 0
        if n >= 2:
            top = Counter(
                " ".join(toks[i : i + 2]) for i in range(n - 1)
            ).most_common(1)[0][1]
        keep = int(
            n >= 10
            and 3 * n <= sum_len <= 10 * n
            and alpha * 10 >= n * 8
            and (nl - ndis) * 10 <= nl * 3
            and bullets * 10 <= nl * 9
            and ellip * 10 <= nl * 3
            and 4 * top <= n
        )
        want[doc_id] = (
            n,
            round(sum_len / max(n, 1), 6),
            round(alpha / max(n, 1), 6),
            round((nl - ndis) / max(nl, 1), 6),
            round(bullets / max(nl, 1), 6),
            round(ellip / max(nl, 1), 6),
            round(2 * top / max(n, 1), 6),
            keep,
        )
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["mean_word_len"],
            r["frac_alpha_words"],
            r["dup_line_frac"],
            r["bullet_frac"],
            r["ellipsis_frac"],
            r["top_bigram_frac"],
            r["gopher_keep"],
        )
        for r in gopher_quality(spark, SF).collect()
    }
    assert got == want
    # non-vacuous in BOTH directions
    keeps = {v[-1] for v in want.values()}
    assert keeps == {0, 1}
    # the injected bullet/ellipsis lines actually register
    assert any(v[4] > 0 for v in want.values())
    assert any(v[5] > 0 for v in want.values())
