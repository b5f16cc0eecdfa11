"""PageRank correctness: numpy power-iteration differential on the same
edge list (the hard signal for this rows-only query), mass conservation,
and loop-hygiene telemetry."""

from __future__ import annotations

import numpy as np
import pytest

from aram_matchdata_etl_spark.operators.graph import (
    DAMPING,
    PR_TELEMETRY,
    link_graph,
    pagerank,
)
from aram_matchdata_etl_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _numpy_pagerank(node_ids, edge_list, rounds, damping):
    idx = {n: i for i, n in enumerate(node_ids)}
    n = len(node_ids)
    out_deg = np.zeros(n)
    for s, _ in edge_list:
        out_deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(rounds):
        dangling = r[out_deg == 0].sum()
        contrib = np.zeros(n)
        for s, d in edge_list:
            contrib[idx[d]] += r[idx[s]] / out_deg[idx[s]]
        new = (1 - damping) / n + damping * (contrib + dangling / n)
        if np.abs(new - r).sum() < 1e-9:
            r = new
            break
        r = new
    return {node: r[idx[node]] for node in node_ids}


@pytest.mark.slow
def test_pagerank_matches_numpy(spark):
    docs = load_table(spark, SF, "documents")
    edges_df = link_graph(docs)
    edges = [(r["src"], r["dst"]) for r in edges_df.collect()]
    nodes = [r["doc_id"] for r in docs.select("doc_id").collect()]
    assert len(edges) > len(nodes), "hash graph should be link-dense"

    got = {
        r["doc_id"]: r["rank"]
        for r in pagerank(docs, edges_df, tag="test").collect()
    }
    want = _numpy_pagerank(nodes, edges, rounds=15, damping=DAMPING)
    assert set(got) == set(want)
    diffs = [abs(got[n] - want[n]) for n in nodes]
    assert max(diffs) < 1e-9


def test_pagerank_mass_conserved_and_positive(spark):
    docs = load_table(spark, SF, "documents")
    ranks = pagerank(docs, link_graph(docs), tag="mass").toPandas()
    assert abs(ranks["rank"].sum() - 1.0) < 1e-9
    assert (ranks["rank"] > 0).all()
    tel = PR_TELEMETRY["mass"]
    assert tel["rounds"] >= 1
    # L1 delta must shrink monotonically-ish (power iteration contracts)
    l1 = tel["l1_per_round"]
    assert l1[-1] < l1[0]


@pytest.mark.slow
def test_pagerank_dangling_nodes_keep_base_rank(spark):
    """A 2-node graph a->b: b is a sink; its mass recycles uniformly.
    Closed form fixed point (with dangling redistribution):
      ra = (1-d)/2 + d*rb/2,  rb = (1-d)/2 + d*(ra + rb/2)."""
    nodes = spark.createDataFrame([(0,), (1,)], "doc_id long")
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {r["doc_id"]: r["rank"] for r in pagerank(nodes, edges, rounds=60).collect()}
    d = DAMPING
    # solve the 2x2 system
    a = np.array([[1, -d / 2], [-d, 1 - d / 2]])
    b = np.array([(1 - d) / 2, (1 - d) / 2])
    ra, rb = np.linalg.solve(a, b)
    assert abs(got[0] - ra) < 1e-6 and abs(got[1] - rb) < 1e-6
    assert abs(got[0] + got[1] - 1.0) < 1e-9


def test_link_graph_deterministic_and_valid(spark):
    docs = load_table(spark, SF, "documents")
    e1 = sorted(map(tuple, link_graph(docs).collect()))
    e2 = sorted(map(tuple, link_graph(docs).collect()))
    assert e1 == e2
    ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    assert all(s in ids and d in ids and s != d for s, d in e1)


def test_triangle_count_matches_python(spark):
    """Set-based pure-Python differential for the wedge-join triangle
    count, plus the a<b<c generation uniqueness property."""
    from itertools import combinations

    from aram_matchdata_etl_spark.operators.graph import q_triangle_count

    docs = load_table(spark, SF, "documents")
    edges = {
        tuple(sorted((r["src"], r["dst"])))
        for r in link_graph(docs).collect()
    }
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = sum(
        1
        for a in adj
        for b, c in combinations(sorted(n for n in adj[a] if n > a), 2)
        if c in adj.get(b, ())
    )
    row = q_triangle_count(spark, SF).collect()[0]
    assert row["n_triangles"] == want
    assert row["n_edges"] == len(edges)
    assert want > 0, "hash graph at this density should close triangles"


def test_kcore_matches_python_peeling(spark):
    from aram_matchdata_etl_spark.operators.graph import KCORE_K, kcore

    docs = load_table(spark, SF, "documents")
    edges_df = link_graph(docs)
    und = {tuple(sorted((r["src"], r["dst"]))) for r in edges_df.collect()}
    adj: dict = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # python reference: peel until stable
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < KCORE_K:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    want = {n: len(ns) for n, ns in adj.items() if ns}
    got = {r["doc_id"]: r["core_degree"] for r in kcore(edges_df).collect()}
    assert got == want
    assert all(d >= KCORE_K for d in got.values())
    assert got, "fixture graph should retain a 4-core"


@pytest.mark.slow
def test_hits_matches_numpy(spark):
    """HITS differential: same edge set, numpy power iteration with the
    same update order (a <- A^T h; h <- A a; L2 normalize), same round
    count — per-node agreement to 1e-6 and unit norms."""
    import numpy as np

    from aram_matchdata_etl_spark.operators.graph import HITS_ROUNDS, hits, link_graph
    from aram_matchdata_etl_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    edges = [(r.src, r.dst) for r in link_graph(docs).collect()]
    ids = sorted({r.doc_id for r in docs.select("doc_id").collect()})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for s, d in edges:
        A[idx[s], idx[d]] = 1.0
    h = np.ones(n)
    a = np.ones(n)
    for _ in range(HITS_ROUNDS):
        a = A.T @ h
        h = A @ a
        a = a / (np.linalg.norm(a) or 1.0)
        h = h / (np.linalg.norm(h) or 1.0)
    got = {r.doc_id: (r.hub, r.authority) for r in
           hits(docs, link_graph(docs), tag="test").collect()}
    assert len(got) == n
    gh = np.array([got[v][0] for v in ids])
    ga = np.array([got[v][1] for v in ids])
    assert abs(np.linalg.norm(gh) - 1.0) < 1e-6
    assert abs(np.linalg.norm(ga) - 1.0) < 1e-6
    assert np.max(np.abs(gh - h)) < 1e-6
    assert np.max(np.abs(ga - a)) < 1e-6


def _py_graph(spark):
    from aram_matchdata_etl_spark.operators.graph import link_graph
    from aram_matchdata_etl_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    nodes = sorted(r.doc_id for r in docs.select("doc_id").collect())
    und = set()
    for r in link_graph(docs).collect():
        a, b = min(r.src, r.dst), max(r.src, r.dst)
        if a != b:
            und.add((a, b))
    adj = {v: set() for v in nodes}
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    return docs, nodes, und, adj


def test_label_propagation_matches_python(spark):
    """Synchronous LPA differential: plurality-with-min-tie-break updates
    in pure Python, same rounds, exact community agreement."""
    from aram_matchdata_etl_spark.operators.graph import (
        LPA_ROUNDS,
        q_label_propagation,
    )

    from .conftest import SF_SMOKE

    docs, nodes, und, adj = _py_graph(spark)
    labels = {v: v for v in nodes}
    for _ in range(LPA_ROUNDS):
        nxt = {}
        for v in nodes:
            if not adj[v]:
                nxt[v] = labels[v]
                continue
            counts: dict = {}
            for u in adj[v]:
                counts[labels[u]] = counts.get(labels[u], 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[v] = best[0]
        labels = nxt
    got = {
        r.doc_id: r.community
        for r in q_label_propagation(spark, SF_SMOKE).collect()
    }
    assert got == labels


def test_shortest_paths_matches_python_bfs(spark):
    """Frontier BFS differential: textbook queue BFS from the min-id
    node, exact distance agreement (including unreachable nodes absent
    from both)."""
    from collections import deque

    from aram_matchdata_etl_spark.operators.graph import q_shortest_paths

    from .conftest import SF_SMOKE

    docs, nodes, und, adj = _py_graph(spark)
    src = min(nodes)
    dist = {src: 0}
    dq = deque([src])
    while dq:
        v = dq.popleft()
        for u in adj[v]:
            if u not in dist:
                dist[u] = dist[v] + 1
                dq.append(u)
    got = {r.doc_id: r.dist for r in q_shortest_paths(spark, SF_SMOKE).collect()}
    assert got == dist


def test_clustering_coeff_matches_python(spark):
    """Local clustering coefficient differential: per-node triangle
    count via neighbor-set intersection in pure Python."""
    from aram_matchdata_etl_spark.operators.graph import q_clustering_coeff

    from .conftest import SF_SMOKE

    docs, nodes, und, adj = _py_graph(spark)
    got = {
        r.doc_id: (r.degree, r.n_triangles, r.clustering_coeff)
        for r in q_clustering_coeff(spark, SF_SMOKE).collect()
    }
    # operator emits one row per node with degree >= 1
    assert set(got) == {v for v in nodes if adj[v]}
    for v, (deg, tri, coeff) in got.items():
        assert deg == len(adj[v])
        t = 0
        nb = sorted(adj[v])
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                if (min(nb[i], nb[j]), max(nb[i], nb[j])) in und:
                    t += 1
        assert tri == t, v
        want = 2.0 * t / (deg * (deg - 1.0)) if deg >= 2 else 0.0
        assert abs(coeff - round(want, 6)) < 1e-9, v


def test_kcore_oracle_round_cap_has_headroom(spark):
    """The recursive-CTE k-core oracle reads its fixpoint at a FIXED
    round cap (KCORE_ORACLE_ROUNDS); the Spark operator iterates to
    convergence. If a fixture change ever pushed the peeling depth near
    the cap, the oracle would report a pre-fixpoint edge set and the
    driver gate would desync SILENTLY — so assert, at the driver gate's
    own SF, that convergence uses well under half the cap (ADVICE r6)."""
    from aram_matchdata_etl_spark.operators.graph import (
        KCORE_ORACLE_ROUNDS,
        PR_TELEMETRY,
        kcore,
        link_graph,
    )

    from .conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    kcore(link_graph(docs), tag="roundcap_probe").count()
    rounds = PR_TELEMETRY["kcore_roundcap_probe"]["rounds"]
    assert rounds <= KCORE_ORACLE_ROUNDS // 2, (
        f"peeling used {rounds} rounds at the oracle SF — too close to the "
        f"oracle cap {KCORE_ORACLE_ROUNDS}; raise KCORE_ORACLE_ROUNDS"
    )


def test_hits_empty_nodes_returns_empty(spark):
    """hits() on an empty graph must return an empty frame, not crash on
    NULL aggregates (ADVICE r6: None ** 0.5 TypeError)."""
    from aram_matchdata_etl_spark.operators.graph import hits

    nodes = spark.createDataFrame([], "doc_id long")
    edges = spark.createDataFrame([], "src long, dst long")
    assert hits(nodes, edges, rounds=2, tag="empty_probe").count() == 0


def test_degree_dist_matches_python(spark):
    from collections import Counter

    from aram_matchdata_etl_spark.operators.graph import (
        HILL_DMIN,
        canonical_und,
    )
    from aram_matchdata_etl_spark.registry import all_queries

    docs = load_table(spark, SF, "documents")
    und = [
        (r["a"], r["b"])
        for r in canonical_und(link_graph(docs)).collect()
    ]
    deg = Counter()
    for a, b in und:
        deg[a] += 1
        deg[b] += 1
    dist = Counter(deg.values())
    tail = [d for d in deg.values() if d >= HILL_DMIN]
    alpha = 1.0 + len(tail) / sum(
        np.log(d / (HILL_DMIN - 0.5)) for d in tail
    )
    rows = all_queries()["q_degree_dist"](spark, SF).collect()
    assert {r.degree: r.n_nodes for r in rows} == dict(dist)
    total = sum(dist.values())
    for r in rows:
        ge = sum(n for d, n in dist.items() if d >= r.degree)
        assert abs(r.ccdf - ge / total) < 1e-6
        assert abs(r.hill_alpha - alpha) < 1e-5
    # CCDF is monotone non-increasing in degree
    by_deg = sorted(rows, key=lambda r: r.degree)
    for lo, hi in zip(by_deg, by_deg[1:]):
        assert lo.ccdf >= hi.ccdf


def test_assortativity_matches_numpy(spark):
    """Newman r re-derived in numpy over the same edge set: corr of
    endpoint degrees across both orientations of every undirected edge."""
    import numpy as np

    from aram_matchdata_etl_spark.registry import all_queries

    docs = load_table(spark, SF, "documents")
    edges = {
        tuple(sorted((r["src"], r["dst"])))
        for r in link_graph(docs).collect()
    }
    deg: dict = {}
    for a, b in edges:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs = [deg[a] for a, b in edges] + [deg[b] for a, b in edges]
    ys = [deg[b] for a, b in edges] + [deg[a] for a, b in edges]
    want = np.corrcoef(np.array(xs, float), np.array(ys, float))[0, 1]
    row = all_queries()["q_assortativity"](spark, SF).collect()[0]
    assert row["n_edges"] == len(edges)
    assert abs(row["assortativity"] - want) < 1e-4, (
        row["assortativity"],
        want,
    )


@pytest.mark.slow
def test_textrank_word_graph_matches_python(spark):
    """The co-occurrence edge set and rank ordering re-derived in pure
    Python + numpy power iteration on the same fixture corpus."""
    import numpy as np

    from aram_matchdata_etl_spark.operators.graph import (
        DAMPING,
        TEXTRANK_ROUNDS,
    )
    from aram_matchdata_etl_spark.registry import all_queries
    from .oracle_utils import duckdb_df

    docs = duckdb_df("SELECT text FROM documents", SF)
    und = set()
    words = set()
    for text in docs["text"]:
        t = text.split(" ")
        words.update(t)
        for a, b in zip(t, t[1:]):
            if a != b:
                und.add((min(a, b), max(a, b)))
    ids = {w: i for i, w in enumerate(sorted(words))}
    n = len(ids)
    out: dict = {}
    for a, b in und:
        out.setdefault(ids[a], []).append(ids[b])
        out.setdefault(ids[b], []).append(ids[a])
    r = np.full(n, 1.0 / n)
    for _ in range(TEXTRANK_ROUNDS):
        nxt = np.zeros(n)
        dangling = 0.0
        for u in range(n):
            targets = out.get(u)
            if not targets:
                dangling += r[u]
                continue
            share = r[u] / len(targets)
            for v in targets:
                nxt[v] += share
        r = (1 - DAMPING) / n + DAMPING * (nxt + dangling / n)
    got = {
        row.word: row.rank
        for row in all_queries()["q_textrank_keywords"](spark, SF).collect()
    }
    assert set(got) == words
    for w, i in ids.items():
        assert abs(got[w] - r[i]) < 1e-8, (w, got[w], r[i])


@pytest.mark.slow
def test_modularity_matches_python(spark):
    """Q re-derived in pure Python over the same LPA labels: sum of
    per-community contributions equals the textbook double-sum form, and
    each row matches the e/m - (d/2m)^2 definition."""
    from aram_matchdata_etl_spark.operators.graph import label_propagation
    from aram_matchdata_etl_spark.registry import all_queries

    docs = load_table(spark, SF, "documents")
    und = {
        tuple(sorted((r["src"], r["dst"])))
        for r in link_graph(docs).collect()
    }
    labels = {
        r["doc_id"]: r["community"]
        for r in label_propagation(docs, link_graph(docs)).collect()
    }
    m = len(und)
    intra: dict = {}
    deg: dict = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
        if labels[a] == labels[b]:
            intra[labels[a]] = intra.get(labels[a], 0) + 1
    dsum: dict = {}
    nn: dict = {}
    for node, c in labels.items():
        dsum[c] = dsum.get(c, 0) + deg.get(node, 0)
        nn[c] = nn.get(c, 0) + 1
    rows = all_queries()["q_graph_modularity"](spark, SF).collect()
    assert {r["community"] for r in rows} == set(nn)
    q_total = 0.0
    for r in rows:
        c = r["community"]
        want = intra.get(c, 0) / m - (dsum.get(c, 0) / (2 * m)) ** 2
        assert r["n_nodes"] == nn[c]
        assert r["intra_edges"] == intra.get(c, 0)
        assert r["degree_sum"] == dsum.get(c, 0)
        assert abs(r["contribution"] - want) < 1e-8
        q_total += r["contribution"]
    assert -1.0 <= q_total <= 1.0


@pytest.mark.slow
def test_betweenness_matches_textbook_brandes(spark):
    """Third implementation of q_betweenness_sampled: the literal
    Brandes (2001) single-source algorithm — queue/stack BFS with
    predecessor lists and a reverse-pop accumulation, no level tables,
    no SQL — run per sampled source in pure Python on the same edge
    list."""
    from collections import defaultdict, deque

    from aram_matchdata_etl_spark.operators.graph import (
        BTW_SOURCES,
        canonical_und,
        q_betweenness_sampled,
    )

    from .conftest import SF_ORACLE

    got = {
        r.doc_id: (r.n_sources_reached, r.dependency)
        for r in q_betweenness_sampled(spark, SF_ORACLE).collect()
    }

    docs = load_table(spark, SF_ORACLE, "documents")
    und = [
        (r.a, r.b) for r in canonical_und(link_graph(docs)).collect()
    ]
    adj = defaultdict(set)
    for a, b in und:
        adj[a].add(b)
        adj[b].add(a)
    srcs = sorted(adj)[:BTW_SOURCES]
    dep = defaultdict(float)
    reached = defaultdict(int)
    for s in srcs:
        stack, preds = [], defaultdict(list)
        sigma = defaultdict(float)
        dist = {s: 0}
        sigma[s] = 1.0
        queue = deque([s])
        while queue:
            v = queue.popleft()
            stack.append(v)
            for w in sorted(adj[v]):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    queue.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = defaultdict(float)
        while stack:
            w = stack.pop()
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                dep[w] += delta[w]
                reached[w] += 1
    assert set(got) == set(dep)
    for v in dep:
        n_r, d_got = got[v]
        assert n_r == reached[v], (v, n_r, reached[v])
        assert abs(d_got - dep[v]) < 1e-4, (v, d_got, dep[v])


def test_betweenness_oracle_depth_cap_has_headroom(spark):
    """q_betweenness_sampled's oracle unrolls BFS levels to a FIXED
    depth cap (BTW_DCAP); assert the measured eccentricity at the
    driver gate's SF keeps >= 2 levels of headroom so a fixture change
    fails loudly instead of desyncing the hash (the kcore round-cap
    discipline)."""
    from aram_matchdata_etl_spark.operators.graph import (
        BTW_DCAP,
        PR_TELEMETRY,
        q_betweenness_sampled,
    )

    from .conftest import SF_ORACLE

    q_betweenness_sampled(spark, SF_ORACLE).count()
    t = PR_TELEMETRY["btw_q_betweenness_sampled"]
    # rounds includes the final empty frontier; max depth = rounds - 1
    assert t["rounds"] - 1 <= BTW_DCAP - 2, (
        f"BFS depth {t['rounds'] - 1} at the oracle SF is too close to "
        f"the oracle cap {BTW_DCAP}; raise BTW_DCAP"
    )


def test_pagerank_personalized_matches_numpy(spark):
    """Pure-numpy random-walk-with-restart with identical seeding /
    rounds / dangling-to-seeds redistribution must reproduce
    q_pagerank_personalized's ranks — the third implementation beside
    the operator and its unrolled-CTE oracle (which share the
    formulation), exactly as test_pagerank_matches_numpy pins the
    global kernel."""
    from aram_matchdata_etl_spark.operators.graph import PPR_SEED_SOURCE
    from aram_matchdata_etl_spark.registry import all_queries

    docs = load_table(spark, SF, "documents")
    edges = [(r["src"], r["dst"]) for r in link_graph(docs).collect()]
    rows = docs.select("doc_id", "source").collect()
    nodes = [r["doc_id"] for r in rows]
    seeds = {r["doc_id"] for r in rows if r["source"] == PPR_SEED_SOURCE}
    assert seeds, "fixture must contain the seed source"

    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    seed_mask = np.zeros(n, dtype=bool)
    for s in seeds:
        seed_mask[idx[s]] = True
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[idx[s]] += 1
    r = np.where(seed_mask, 1.0 / len(seeds), 0.0)
    d = DAMPING
    for _ in range(15):
        dangling = r[out_deg == 0].sum()
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += r[idx[s]] / out_deg[idx[s]]
        r = (
            np.where(seed_mask, ((1 - d) + d * dangling) / len(seeds), 0.0)
            + d * contrib
        )

    got = {
        row["doc_id"]: row["rank"]
        for row in all_queries()["q_pagerank_personalized"](
            spark, SF
        ).collect()
    }
    assert set(got) == set(nodes)
    # operator rounds to 9dp; mass concentrates on/near seeds
    diffs = [abs(got[node] - r[idx[node]]) for node in nodes]
    assert max(diffs) < 1e-8
    assert abs(sum(got.values()) - 1.0) < 1e-6  # mass conserved
    # non-seed ranks come only from link flow: zero for unlinked docs
    unlinked = [
        node for node in nodes
        if node not in seeds and not any(t == node for _, t in edges)
    ]
    for node in unlinked[:20]:
        assert got[node] == 0.0
