"""Link-graph family: independent-reference tests.

The DuckDB oracle replays the same integer recurrence, so (per the BPE
lesson) oracle parity alone certifies engine agreement, not algorithmic
correctness. Here PageRank is additionally checked against (a) a pure-
Python integer replay of the spec (validates the Spark plumbing end to
end) and (b) a float power-iteration (independent formulation — catches
a wrong recurrence that both engines could agree on).
"""

from __future__ import annotations

import pytest

from sbb_ocr_postcorrection_spark.operators import linkgraph as LG

SF_DIR = "/root/testdata/sf0.001"


def _doc_ids(spark):
    return [
        r[0]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .select("doc_id")
        .collect()
    ]


def _edges(doc_ids):
    out = set()
    for i in doc_ids:
        for j in range(1, LG.LINK_FANOUT + 1):
            s, d = i % LG.N_HOSTS, (i * 31 + j) % LG.N_HOSTS
            if s != d:
                out.add((s, d))
    return out


def _python_pagerank(edges, iters):
    """Pure-Python integer replay of the documented recurrence."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: LG.PR_SCALE // n for v in nodes}
    base = (3 * LG.PR_SCALE) // (20 * n)
    for _ in range(iters):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += (17 * rank[s]) // (20 * deg[s])
        dmass = sum(rank[v] for v in nodes if v not in deg)
        rank = {
            v: base + (17 * dmass) // (20 * n) + inflow[v] for v in nodes
        }
    return rank


def test_link_graph_matches_formula(spark):
    rows = LG.link_graph(spark, SF_DIR).collect()
    ids = _doc_ids(spark)
    want = {}
    for i in ids:
        for j in range(1, LG.LINK_FANOUT + 1):
            s, d = i % LG.N_HOSTS, (i * 31 + j) % LG.N_HOSTS
            if s != d:
                want[(s, d)] = want.get((s, d), 0) + 1
    got = {
        (r["src_host"], r["dst_host"]): r["n_links"] for r in rows
    }
    assert got == {
        (f"host{s}.example.net", f"host{d}.example.net"): c
        for (s, d), c in want.items()
    }
    # no self-loops survive
    assert all(s != d for s, d in got)


def test_host_pagerank_matches_python_replay(spark):
    got = {
        r["host"]: r["rank_fp"]
        for r in LG.host_pagerank(spark, SF_DIR).collect()
    }
    ref = _python_pagerank(_edges(_doc_ids(spark)), LG.PR_ITERS)
    assert got == {f"host{v}.example.net": r for v, r in ref.items()}


def test_host_pagerank_mass_and_ranking_vs_float_power_iteration(spark):
    rows = LG.host_pagerank(spark, SF_DIR).collect()
    total = sum(r["rank_fp"] for r in rows)
    # floor divisions leak mass downward only, bounded by ~(|E|+2N+2)
    # units per iteration — total stays within a sliver of SCALE
    assert 0 < LG.PR_SCALE - total < LG.PR_ITERS * 10**6
    # independent float formulation (d=0.85, uniform dangling spread)
    edges = _edges(_doc_ids(spark))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    deg = {}
    adj = {}
    for s, d in edges:
        deg[s] = deg.get(s, 0) + 1
        adj.setdefault(s, []).append(d)
    pr = {v: 1.0 / n for v in nodes}
    for _ in range(50):
        dmass = sum(pr[v] for v in nodes if v not in deg)
        nxt = {v: 0.15 / n + 0.85 * dmass / n for v in nodes}
        for s, ds in adj.items():
            c = 0.85 * pr[s] / deg[s]
            for d in ds:
                nxt[d] += c
        pr = nxt
    got = {r["host"]: r["rank_share"] for r in rows}
    for v in nodes:
        # 6 fixed-point iterations sit within ~2e-3 of the converged
        # float fixpoint on this graph; catches any wrong recurrence
        assert got[f"host{v}.example.net"] == pytest.approx(
            pr[v], abs=2e-3
        )


def _python_trustrank(edges, iters, seed_mod):
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    seeds = [v for v in nodes if v % seed_mod == 0]
    ns = len(seeds)
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    rank = {v: (LG.PR_SCALE // ns if v % seed_mod == 0 else 0) for v in nodes}
    base = (3 * LG.PR_SCALE) // (20 * ns)
    for _ in range(iters):
        inflow = {v: 0 for v in nodes}
        for s, d in edges:
            inflow[d] += (17 * rank[s]) // (20 * deg[s])
        dmass = sum(rank[v] for v in nodes if v not in deg)
        rank = {
            v: (base + (17 * dmass) // (20 * ns) if v % seed_mod == 0 else 0)
            + inflow[v]
            for v in nodes
        }
    return rank


def test_host_trustrank_matches_python_replay_and_demotes_nonseeds(spark):
    got = {
        r["host"]: r["rank_fp"]
        for r in LG.host_trustrank(spark, SF_DIR).collect()
    }
    edges = _edges(_doc_ids(spark))
    ref = _python_trustrank(edges, LG.PR_ITERS, LG.TRUST_SEED_MOD)
    assert got == {f"host{v}.example.net": r for v, r in ref.items()}
    # trust concentrates: seed hosts hold more mass per-host than non-seeds
    seeds = [r for v, r in ref.items() if v % LG.TRUST_SEED_MOD == 0]
    others = [r for v, r in ref.items() if v % LG.TRUST_SEED_MOD != 0]
    assert min(seeds) > sum(others) / len(others)
    # and TrustRank really differs from uniform-teleport PageRank
    pr = _python_pagerank(edges, LG.PR_ITERS)
    assert ref != pr


def test_page_outlinks_counts(spark):
    rows = {r["path"]: r["n_links"] for r in LG.page_outlinks(spark, SF_DIR).collect()}
    n_docs = len(_doc_ids(spark))
    for p in ("/h", "/a", "/c", "/i", "/p", "/x"):
        assert rows[p] == n_docs
    per_doc = [p for p in rows if p.startswith("/doc/")]
    assert len(per_doc) == n_docs
    assert all(rows[p] == 1 for p in per_doc)


def test_host_spam_mass_matches_python_replay(spark):
    """Spam mass == the composed integer replays; the share is bounded in
    [0, SPAM_SCALE]; trusted seeds are never demotion candidates (their
    teleport mass keeps TR close to PR)."""
    edges = _edges(_doc_ids(spark))
    pr = _python_pagerank(edges, LG.PR_ITERS)
    tr = _python_trustrank(edges, LG.PR_ITERS, LG.TRUST_SEED_MOD)
    want = {}
    for v in pr:
        sm = max(pr[v] - tr[v], 0) * LG.SPAM_SCALE // pr[v]
        want[f"host{v}.example.net"] = (
            pr[v],
            tr[v],
            sm,
            int(sm >= LG.SPAM_THRESHOLD_FP),
        )
    got = {
        r["host"]: (
            r["pagerank_fp"],
            r["trustrank_fp"],
            r["spam_mass_fp"],
            r["spam_candidate"],
        )
        for r in LG.host_spam_mass(spark, SF_DIR).collect()
    }
    assert got == want
    assert all(0 <= v[2] <= LG.SPAM_SCALE for v in got.values())
    for host, (_, _, _, cand) in got.items():
        hid = int(host.removeprefix("host").split(".")[0])
        if hid % LG.TRUST_SEED_MOD == 0:
            assert cand == 0, f"seed {host} flagged as spam"


def test_link_degree_stats_matches_reference(spark):
    edges = _edges(_doc_ids(spark))
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    eset = set(edges)
    want = {}
    for v in nodes:
        out_deg = sum(1 for s, _ in edges if s == v)
        in_deg = sum(1 for _, d in edges if d == v)
        recip = sum(1 for s, d in edges if s == v and (d, s) in eset)
        want[f"host{v}.example.net"] = (out_deg, in_deg, recip)
    got = {
        r["host"]: (r["out_deg"], r["in_deg"], r["n_reciprocal"])
        for r in LG.link_degree_stats(spark, SF_DIR).collect()
    }
    assert got == want
    assert sum(r[2] for r in got.values()) > 0, "reciprocal edges exist"


def test_host_communities_matches_python_replay(spark):
    """Deterministic synchronous LPA == a pure-Python replay of the
    documented rule (majority vote, min-label ties); every node labeled,
    labels are member node ids, and community sizes reconcile."""
    from collections import Counter, defaultdict

    edges = _edges(_doc_ids(spark))
    adj = defaultdict(set)
    for s, d in edges:
        adj[s].add(d)
        adj[d].add(s)
    lab = {v: v for v in adj}
    for _ in range(LG.LPA_ITERS):
        new = {}
        for v, nbrs in adj.items():
            votes = Counter(lab[u] for u in nbrs)
            new[v] = min(votes, key=lambda l: (-votes[l], l))
        lab = new
    sizes = Counter(lab.values())
    want = {
        f"host{v}.example.net": (l, sizes[l]) for v, l in lab.items()
    }
    got = {
        r["host"]: (r["community_id"], r["community_size"])
        for r in LG.host_communities(spark, SF_DIR).collect()
    }
    assert got == want
    assert sum(s for _, s in set(got.values())) <= len(got) * len(got)
    labels = {l for l, _ in got.values()}
    assert labels <= {int(h.removeprefix("host").split(".")[0]) for h in got}


def test_community_profiles_reconcile(spark):
    """Community rollup reconciles with its two inputs: host counts sum
    to the graph, fixed-point rank sums match the per-host relations,
    and spam-host counts match the per-host flags."""
    comm = {
        r["host"]: r["community_id"]
        for r in LG.host_communities(spark, SF_DIR).collect()
    }
    sm = {
        r["host"]: (r["pagerank_fp"], r["trustrank_fp"], r["spam_candidate"])
        for r in LG.host_spam_mass(spark, SF_DIR).collect()
    }
    from collections import defaultdict

    want = defaultdict(lambda: [0, 0, 0, 0])
    for h, cid in comm.items():
        pr, tr, cand = sm[h]
        a = want[cid]
        a[0] += 1
        a[1] += pr
        a[2] += tr
        a[3] += cand
    got = {
        r["community_id"]: (
            r["n_hosts"],
            r["pagerank_fp"],
            r["trustrank_fp"],
            r["spam_mass_fp"],
            r["n_spam_hosts"],
        )
        for r in LG.community_profiles(spark, SF_DIR).collect()
    }
    assert set(got) == set(want)
    for cid, (n, pr, tr, cand) in want.items():
        gn, gpr, gtr, gsm, gcand = got[cid]
        assert (gn, gpr, gtr, gcand) == (n, pr, tr, cand)
        assert gsm == max(pr - tr, 0) * LG.SPAM_SCALE // pr
    assert sum(n for n, *_ in got.values()) == len(comm)


def test_host_hits_matches_reference(spark):
    """Unnormalized integer HITS == a pure-Python power iteration with
    the published update order (authorities from hubs, hubs from NEW
    authorities); hubs and authorities separate roles PageRank cannot."""
    from collections import defaultdict

    import duckdb

    from sbb_ocr_postcorrection_spark.operators.linkgraph import (
        HITS_ITERS,
        LINK_FANOUT,
        N_HOSTS,
        host_hits,
    )

    SF = "/root/testdata/sf0.001"
    doc_ids = [
        r[0]
        for r in duckdb.sql(
            f"SELECT doc_id FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    edges = set()
    for d in doc_ids:
        for j in range(1, LINK_FANOUT + 1):
            s, t = d % N_HOSTS, (d * 31 + j) % N_HOSTS
            if s != t:
                edges.add((s, t))
    nodes = {s for s, _ in edges} | {t for _, t in edges}
    out_, in_ = defaultdict(list), defaultdict(list)
    for s, t in edges:
        out_[s].append(t)
        in_[t].append(s)
    a = {n: 1 for n in nodes}
    h = {n: 1 for n in nodes}
    for _ in range(HITS_ITERS):
        a = {n: sum(h[j] for j in in_[n]) for n in nodes}
        h = {n: sum(a[j] for j in out_[n]) for n in nodes}
    want = {
        f"host{n}.example.net": (a[n], h[n]) for n in nodes
    }
    got = {
        r["host"]: (r["authority"], r["hub"])
        for r in host_hits(spark, SF).collect()
    }
    assert got == want
    # roles actually separate: the authority ranking and hub ranking
    # disagree somewhere (else HITS adds nothing over one score)
    top_a = max(got, key=lambda k: (got[k][0], k))
    top_h = max(got, key=lambda k: (got[k][1], k))
    assert got[top_a][0] > 0 and got[top_h][1] > 0
