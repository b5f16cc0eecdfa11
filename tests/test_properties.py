"""Property-based differential tests (hypothesis): engine semantics vs
pure-Python reference implementations on generated inputs — the test
strategy upgrade over the reference's eyeball-golden-file (SURVEY §5)."""

from __future__ import annotations

from collections import defaultdict
from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Window
from pyspark.sql import functions as F

TTL = 6 * 3600

events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # user_id
        st.integers(min_value=0, max_value=3 * 86400),  # ts offset seconds
    ),
    min_size=1,
    max_size=60,
)

scores_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # group
        st.integers(min_value=0, max_value=5),  # score (small => ties)
    ),
    min_size=1,
    max_size=50,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy)
@pytest.mark.slow
def test_ttl_dedup_matches_python_reference(spark, events):
    """First-event-per-(user, TTL-bucket) — the q_dedup_ttl semantics —
    equals a dict-based Python simulation of the Redis SETEX dedup."""
    base = datetime(2024, 1, 1)
    rows = [
        (i, u, base + timedelta(seconds=off)) for i, (u, off) in enumerate(events)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")

    bucket = F.floor(F.unix_timestamp("ts") / TTL).cast("bigint")
    w = Window.partitionBy("user_id", bucket).orderBy("ts", "event_id")
    got = {
        r.event_id
        for r in df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }

    # python reference: first arrival per (user, epoch-bucket), arrival
    # order = (ts, event_id)
    seen: set[tuple[int, int]] = set()
    want = set()
    for i, u, ts in sorted(rows, key=lambda r: (r[2], r[0])):
        b = int(ts.timestamp()) // TTL
        if (u, b) not in seen:
            seen.add((u, b))
            want.add(i)
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(scores=scores_strategy)
@pytest.mark.slow
def test_rank_semantics_match_pandas(spark, scores):
    """W1/W2 duality on tied data: Spark RANK == pandas rank(method='min',
    ascending=False); ROW_NUMBER is a strict 1..n permutation refining it."""
    import pandas as pd

    rows = [(i, g, float(s)) for i, (g, s) in enumerate(scores)]
    df = spark.createDataFrame(rows, "rid long, grp long, score double")

    rank_w = Window.partitionBy("grp").orderBy(F.desc("score"))
    rn_w = Window.partitionBy("grp").orderBy(F.desc("score"), "rid")
    got = {
        r.rid: (r.rnk, r.rn)
        for r in df.select(
            "rid",
            F.rank().over(rank_w).alias("rnk"),
            F.row_number().over(rn_w).alias("rn"),
        ).collect()
    }

    pdf = pd.DataFrame(rows, columns=["rid", "grp", "score"])
    pdf["rnk"] = (
        pdf.groupby("grp")["score"].rank(method="min", ascending=False).astype(int)
    )
    for rid, grp, _ in rows:
        assert got[rid][0] == int(pdf.loc[pdf.rid == rid, "rnk"].iloc[0])
    # ROW_NUMBER: strict permutation per group, consistent with RANK
    per_group = defaultdict(list)
    for rid, (rnk, rn) in got.items():
        per_group[pdf.loc[pdf.rid == rid, "grp"].iloc[0]].append((rn, rnk))
    for grp, pairs in per_group.items():
        rns = sorted(p[0] for p in pairs)
        assert rns == list(range(1, len(pairs) + 1))
        # row_number never precedes its rank
        for rn, rnk in pairs:
            assert rn >= rnk


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=25
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 999)),
        min_size=0,
        max_size=25,
    ),
)
@pytest.mark.slow
def test_asof_join_matches_python_reference(spark, left, right):
    """The union+window as-of composition == a bisect-based Python as-of:
    for each left (key, t), the value of the greatest right t' <= t."""
    import bisect

    # dedupe right on (key, t): deterministic pick = max value (like the
    # pre-aggregation q_asof_join does)
    rmap: dict[tuple[int, int], int] = {}
    for k, t, v in right:
        rmap[(k, t)] = max(rmap.get((k, t), -1), v)
    rrows = [(k, t, v) for (k, t), v in sorted(rmap.items())]

    from aram_matchdata_etl_spark.operators.asof import asof_join

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, key long, t long"
    )
    rdf = spark.createDataFrame(rrows, "key long, t long, val long") if rrows else (
        spark.createDataFrame([], "key long, t long, val long")
    )
    got = {
        r.lid: r.val
        for r in asof_join(
            ldf, rdf, key="key", left_t="t", right_t="t", value_cols=["val"]
        ).collect()
    }

    per_key: dict[int, list[tuple[int, int]]] = {}
    for k, t, v in rrows:
        per_key.setdefault(k, []).append((t, v))
    for lst in per_key.values():
        lst.sort()
    for i, (k, t) in enumerate(left):
        lst = per_key.get(k, [])
        pos = bisect.bisect_right([x[0] for x in lst], t)
        want = lst[pos - 1][1] if pos else None
        assert got[i] == want, (i, k, t, got[i], want)


def test_asof_join_null_in_latest_right_row_surfaces(spark):
    """DuckDB ASOF parity for nullable right values: when the LATEST
    matching right row carries NULL, the result is NULL — it must NOT
    fall back to an older non-null row (the last(ignorenulls) trap the
    struct-packed payload exists to avoid)."""
    from aram_matchdata_etl_spark.operators.asof import asof_join

    ldf = spark.createDataFrame([(1, 1, 100)], "lid long, key long, t long")
    rdf = spark.createDataFrame(
        [(1, 10, 7), (1, 50, None)], "key long, t long, val long"
    )
    rows = asof_join(
        ldf, rdf, key="key", left_t="t", right_t="t", value_cols=["val"]
    ).collect()
    assert len(rows) == 1
    # latest match is t=50 whose val is NULL; older t=10 (val=7) must not leak
    assert rows[0].val is None


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=30).map(str.strip).filter(bool),
        min_size=2,
        max_size=12,
    )
)
@pytest.mark.slow
def test_exact_jaccard_matches_python(spark, texts):
    """q_dedup_ngram_jaccard's join-based set algebra == a direct Python
    set computation on arbitrary (tiny-alphabet, tie-heavy) corpora."""
    from aram_matchdata_etl_spark.operators.dedup import bigram_col, exact_jaccard_pairs

    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.split(F.col("text"), " ")
    sh = docs.select("doc_id", F.explode(bigram_col(toks)).alias("shingle")).distinct()
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in exact_jaccard_pairs(sh, threshold=0.0).collect()
    }

    def pyshingles(t):
        ws = t.split(" ")
        return {f"{a} {b}" for a, b in zip(ws, ws[1:])}

    for i, ti in rows:
        for j, tj in rows:
            if i >= j:
                continue
            si, sj = pyshingles(ti), pyshingles(tj)
            inter = len(si & sj)
            if not si or not sj or inter == 0:
                assert (i, j) not in got
                continue
            want = inter / len(si | sj)
            assert (i, j) in got
            assert got[(i, j)] == pytest.approx(want, abs=1e-6)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)), min_size=1, max_size=20
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100), st.integers(0, 999)),
        min_size=0,
        max_size=20,
    ),
    width=st.sampled_from([1, 7, 13, 1000]),
)
@pytest.mark.slow
def test_asof_bucketed_matches_plain(spark, left, right, width):
    """The skew-robust time-bucketed as-of must equal the per-key-window
    composition for every bucket width — width 1 forces a carry-in for
    nearly every bucket, width 1000 degenerates to one bucket per key."""
    from aram_matchdata_etl_spark.operators.asof import asof_join, asof_join_bucketed

    rmap: dict[tuple[int, int], int] = {}
    for k, t, v in right:
        rmap[(k, t)] = max(rmap.get((k, t), -1), v)
    rrows = [(k, t, v) for (k, t), v in sorted(rmap.items())]

    ldf = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(left)], "lid long, key long, t long"
    )
    rdf = spark.createDataFrame(rrows, "key long, t long, val long") if rrows else (
        spark.createDataFrame([], "key long, t long, val long")
    )
    kwargs = dict(key="key", left_t="t", right_t="t", value_cols=["val"])
    want = {r.lid: r.val for r in asof_join(ldf, rdf, **kwargs).collect()}
    got = {
        r.lid: r.val
        for r in asof_join_bucketed(ldf, rdf, bucket_width=width, **kwargs).collect()
    }
    assert got == want


def test_asof_bucketed_null_in_latest_right_row_surfaces(spark):
    """Same nullable-payload guarantee as the plain composition, including
    when the NULL-carrying row arrives via the carry-in path."""
    from aram_matchdata_etl_spark.operators.asof import asof_join_bucketed

    ldf = spark.createDataFrame([(1, 1, 100)], "lid long, key long, t long")
    rdf = spark.createDataFrame(
        [(1, 10, 7), (1, 50, None)], "key long, t long, val long"
    )
    rows = asof_join_bucketed(
        ldf, rdf, key="key", left_t="t", right_t="t", value_cols=["val"],
        bucket_width=20,  # 10 and 50 land in different buckets than 100
    ).collect()
    assert len(rows) == 1
    assert rows[0].val is None


# small vocab + short docs force genuine cross-doc window repeats
corpus_strategy = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]),
        min_size=0,
        max_size=12,
    ),
    min_size=1,
    max_size=10,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(token_lists=corpus_strategy)
@pytest.mark.slow
def test_substring_spans_match_python(spark, token_lists):
    """q_substring_spans core vs a pure-Python reference: rolling W-gram
    corpus frequency, flag starts of repeated grams, merge flagged starts
    into maximal spans (break when the gap between consecutive starts
    exceeds W). W=3 here so tiny generated docs can collide."""
    W = 3
    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]

    # --- reference
    from collections import Counter

    grams = Counter()
    starts_by_doc = {}
    for doc_id, toks in enumerate(token_lists):
        starts_by_doc[doc_id] = []
        for s in range(len(toks) - W + 1):
            grams[tuple(toks[s : s + W])] += 1
    for doc_id, toks in enumerate(token_lists):
        for s in range(len(toks) - W + 1):
            if grams[tuple(toks[s : s + W])] >= 2:
                starts_by_doc[doc_id].append(s)
    expected = []
    for doc_id, starts in starts_by_doc.items():
        run: list[int] = []
        for s in starts:
            if run and s - run[-1] > W:
                expected.append((doc_id, run[0], run[-1] + W, len(run)))
                run = []
            run.append(s)
        if run:
            expected.append((doc_id, run[0], run[-1] + W, len(run)))

    # --- engine
    from aram_matchdata_etl_spark.operators.training import substring_spans

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.span_start, r.span_end, r.n_windows)
        for r in substring_spans(df, w=W).collect()
    )
    assert got == sorted(expected)


graph_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=14),
        st.integers(min_value=0, max_value=14),
    ),
    min_size=0,
    max_size=25,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=graph_strategy)
@pytest.mark.slow
def test_connected_components_both_algorithms_match_union_find(spark, edges):
    """min-label AND large-star/small-star vs a Python union-find on random
    graphs (self-loops, duplicates, singletons included): all three must
    produce identical min-labeled components."""
    n = 15
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp_min = {}
    for v in range(n):
        r = find(v)
        comp_min.setdefault(r, min(u for u in range(n) if find(u) == r))
    expected = sorted((v, comp_min[find(v)], v == comp_min[find(v)]) for v in range(n))

    from aram_matchdata_etl_spark.operators.dedup import connected_components

    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(a, b) for a, b in edges], "doc_a long, doc_b long"
    ) if edges else spark.createDataFrame([], "doc_a long, doc_b long")

    for algo in ("min_label", "star"):
        got = sorted(
            map(tuple, connected_components(docs, pairs, algorithm=algo).collect())
        )
        assert got == expected, (algo, got, expected)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(token_lists=corpus_strategy)
@pytest.mark.slow
def test_boilerplate_removal_matches_python(spark, token_lists):
    """Boilerplate chunk removal vs a pure-Python reference: chunk each doc
    into fixed 2-token pseudo-lines, drop chunks whose exact text appears
    in >= 2 distinct docs, reassemble in order."""
    CW, MIN_DOCS = 2, 2
    texts = [" ".join(toks) for toks in token_lists if toks]
    if not texts:
        return

    # --- reference
    def chunks_of(text):
        toks = text.split(" ")
        return [
            " ".join(toks[i : i + CW]) for i in range(0, len(toks), CW)
        ]

    docs_per_chunk: dict[str, set] = {}
    for i, t in enumerate(texts):
        for c in chunks_of(t):
            docs_per_chunk.setdefault(c, set()).add(i)
    expected = []
    for i, t in enumerate(texts):
        kept = [c for c in chunks_of(t) if len(docs_per_chunk[c]) < MIN_DOCS]
        expected.append(
            (i, " ".join(kept), len(kept), len(chunks_of(t)))
        )

    # --- engine: the SHIPPED core, not a replica
    from aram_matchdata_etl_spark.operators.text import boilerplate_removal

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = sorted(
        (r.doc_id, r.clean_text, r.n_chunks_kept, r.n_chunks_total)
        for r in boilerplate_removal(df, chunk_w=CW, min_docs=MIN_DOCS).collect()
    )
    assert got == sorted(expected)


vectors_strategy = st.lists(
    st.lists(
        st.floats(
            min_value=-100.0, max_value=100.0, allow_nan=False, width=32
        ),
        min_size=1,
        max_size=8,
    ),
    min_size=1,
    max_size=8,
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vectors=vectors_strategy)
def test_embedding_quantize_matches_numpy(spark, vectors):
    """int8 quantization vs a numpy reference on generated float32 vectors
    (zeros, negatives, denormal-ish magnitudes): identical qvals and the
    same scale to 9 decimals — pins the floor(x+0.5) rounding and the
    zero-vector guard across engines."""
    import math

    import numpy as np

    expected = []
    for vid, vec in enumerate(vectors):
        v = np.array(vec, dtype=np.float32).astype(np.float64)
        amax = float(np.max(np.abs(v)))
        scale = 1.0 if amax == 0 else amax / 127.0
        for dim, x in enumerate(v):
            qval = int(math.floor(x / scale + 0.5))
            expected.append((vid, dim, qval, round(scale, 9)))

    # registry operator reads from the fixture table, so exercise the same
    # expression graph over a constructed frame
    from pyspark.sql import functions as F2

    df = spark.createDataFrame(
        [(i, [float(x) for x in vec]) for i, vec in enumerate(vectors)],
        "vec_id long, embedding array<float>",
    )
    vec = F2.transform(F2.col("embedding"), lambda x: x.cast("double"))
    got = sorted(
        map(
            tuple,
            df.select("vec_id", vec.alias("v"))
            .withColumn(
                "amax", F2.array_max(F2.transform(F2.col("v"), lambda x: F2.abs(x)))
            )
            .withColumn(
                "scale",
                F2.when(F2.col("amax") == 0, F2.lit(1.0)).otherwise(
                    F2.col("amax") / F2.lit(127.0)
                ),
            )
            .select(
                "vec_id",
                F2.posexplode(
                    F2.transform(
                        F2.col("v"),
                        lambda x: F2.floor(x / F2.col("scale") + 0.5).cast("int"),
                    )
                ).alias("dim", "qval"),
                F2.round(F2.col("scale"), 9).alias("scale"),
            )
            .collect(),
        )
    )
    assert got == sorted(expected)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.tuples(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@pytest.mark.slow
def test_bpe_merges_match_python_reference(spark, words):
    """bpe_train vs a pure-Python reference BPE (Sennrich et al. 2016):
    same greedy argmax (count desc, then lexicographic pair), same
    left-to-right overlapplication semantics ('aaa' + merge(a,a) ->
    ['aa','a']). Drives the SHIPPED fold expression, not a replica."""
    from aram_matchdata_etl_spark.operators.training import bpe_train

    N_MERGES = 4

    # --- reference
    vocab = {tuple(w): n for w, n in words}
    expected = []
    for rank in range(N_MERGES):
        counts: dict[tuple, int] = defaultdict(int)
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += n
        if not counts:
            break
        (l, r), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((rank, l, r, l + r, cnt))
        new_vocab: dict[tuple, int] = defaultdict(int)
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += n
        vocab = new_vocab

    # --- engine
    df = spark.createDataFrame(words, "word string, n long")
    got = bpe_train(df, N_MERGES)
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    words=st.lists(
        st.tuples(
            st.text(alphabet="abcd", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    )
)
@pytest.mark.slow
def test_bpe_encode_matches_python_reference(spark, words):
    """bpe_encode_words vs the same pure-Python reference, applying the
    learned merges in rank order with left-to-right greedy semantics:
    every word's token sequence must match exactly, and re-joining the
    tokens must reproduce the word (losslessness)."""
    from aram_matchdata_etl_spark.operators.training import (
        bpe_encode_words,
        bpe_train,
    )

    N_MERGES = 4
    df = spark.createDataFrame(words, "word string, n long")
    merges = bpe_train(df, N_MERGES)

    def py_encode(word: str) -> list[str]:
        syms = list(word)
        for _, l, r, m, _ in merges:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    out.append(m)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    got = {
        r["word"]: r["tokens"]
        for r in bpe_encode_words(df.select("word"), merges).collect()
    }
    for w, _ in words:
        assert got[w] == py_encode(w), (w, got[w], py_encode(w))
        assert "".join(got[w]) == w


# --- round-5 late operators: PII scrub, URL canon, funnel ------------------

_pii_text = st.text(
    alphabet="ab5 .-@c1%_#?&", min_size=0, max_size=60
)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_pii_text, min_size=1, max_size=12))
@pytest.mark.slow
def test_pii_redact_matches_python_re(spark, texts):
    """The Spark regexp chain equals Python's re with the same patterns
    (Java regex, RE2, and Python re agree on this pattern subset by
    construction — this pins it on adversarial short strings full of
    '@' / digit / dot fragments)."""
    import re

    from aram_matchdata_etl_spark.operators.privacy import (
        EMAIL_RE,
        IP_RE,
        PHONE_RE,
        pii_redact,
    )

    pats = [(EMAIL_RE, "<EMAIL>"), (PHONE_RE, "<PHONE>"), (IP_RE, "<IP>")]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = {r["doc_id"]: r for r in pii_redact(df).collect()}
    for i, t in enumerate(texts):
        want = t
        counts = {}
        for pat, token in pats:
            counts[token] = len(re.findall(pat, t))
            want = re.sub(pat, token, want)
        assert got[i]["text_redacted"] == want, (t, want, got[i]["text_redacted"])
        assert got[i]["n_emails"] == counts["<EMAIL>"]
        assert got[i]["n_phones"] == counts["<PHONE>"]
        assert got[i]["n_ips"] == counts["<IP>"]


def _canon_py(url: str) -> str:
    import re as _re

    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*)", url)
    if not m:
        return "://"
    scheme, host, path = m.group(1).lower(), m.group(2).lower(), m.group(3)
    qm = _re.search(r"\?([^#]*)", url)
    kept = [
        p
        for p in (qm.group(1).split("&") if qm else [])
        if p != "" and not p.startswith("utm_")
    ]
    return scheme + "://" + host + path + ("?" + "&".join(kept) if kept else "")


_url_part = st.text(alphabet="AbC9.-_", min_size=1, max_size=8)


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    hosts=st.lists(_url_part, min_size=1, max_size=6),
    path=st.text(alphabet="Ab9/._", min_size=0, max_size=12),
    params=st.lists(
        st.sampled_from(["utm_a=1", "utm_b", "a=1", "b=2", "", "x=utm_y"]),
        min_size=0,
        max_size=4,
    ),
    frag=st.sampled_from(["", "#f", "#utm_z"]),
)
@pytest.mark.slow
def test_canonicalize_url_matches_python(spark, hosts, path, params, frag):
    from pyspark.sql import functions as F

    from aram_matchdata_etl_spark.operators.web import canonicalize_url

    url = "HTTPS://" + ".".join(hosts) + "/" + path
    if params:
        url += "?" + "&".join(params)
    url += frag
    df = spark.createDataFrame([(url,)], "url string")
    got = df.select(canonicalize_url(F.col("url")).alias("c")).collect()[0]["c"]
    assert got == _canon_py(url), (url, got)


_funnel_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # user
        st.integers(min_value=0, max_value=30),  # ts offset seconds
        st.sampled_from(["view", "click", "purchase", "error"]),
    ),
    min_size=1,
    max_size=40,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=_funnel_events)
@pytest.mark.slow
def test_funnel_matches_python_brute_force(spark, events):
    """First-touch cascade counts equal a per-user brute-force walk.
    Tie-heavy timestamps included deliberately: the cascade is defined on
    ts >= prev, so equal timestamps must convert."""
    from datetime import datetime, timedelta

    from aram_matchdata_etl_spark.operators.events_analytics import funnel

    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(seconds=off), u, et, 0.0, "{}")
        for i, (u, off, et) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r["stage"]: r["n_users"] for r in funnel(df).collect()}

    stages = ("view", "click", "purchase")
    want = dict.fromkeys(stages, 0)
    by_user: dict = {}
    for i, (u, off, et) in enumerate(events):
        by_user.setdefault(u, []).append((off, et))
    for evs in by_user.values():
        prev = None
        for k, stage in enumerate(stages):
            cands = [
                off
                for off, et in evs
                if et == stage and (prev is None or off >= prev)
            ]
            if not cands:
                break
            prev = min(cands)
            want[stage] += 1
    assert got == want, (got, want)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=30).map(str.strip).filter(bool),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
@pytest.mark.slow
def test_setsim_prefix_join_is_lossless(spark, texts, threshold):
    """Prefix filtering (q_setsim_prefix_join) returns EXACTLY the
    all-shingle-join answer on arbitrary tie-heavy corpora — the
    lossless-filter proof exercised empirically at several thresholds
    (the driver gate only checks one threshold on one fixture)."""
    from aram_matchdata_etl_spark.operators.dedup import (
        bigram_col,
        exact_jaccard_pairs,
        setsim_prefix_pairs,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.split(F.col("text"), " ")
    sh = docs.select("doc_id", F.explode(bigram_col(toks)).alias("shingle")).distinct()
    want = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in exact_jaccard_pairs(sh, threshold).collect()
    }
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in setsim_prefix_pairs(sh, threshold).collect()
    }
    assert got == want


days_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),  # user (few => overlap)
        st.integers(min_value=0, max_value=25),  # dayno (small => streaks)
    ),
    min_size=1,
    max_size=60,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(days=days_strategy)
@pytest.mark.slow
def test_streaks_match_python_reference(spark, days):
    """The gaps-and-islands kernel (dayno - row_number grouping) against
    a brute-force consecutive-run scan over the sorted distinct day
    set — duplicate (user, day) activity must collapse, singleton days
    count as streaks of 1."""
    from pyspark.sql import Window

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(u, d) for u, d in days], "user_id long, dayno long"
    ).distinct()
    grp = F.col("dayno") - F.row_number().over(
        Window.partitionBy("user_id").orderBy("dayno")
    )
    got = {
        r.user_id: (r.active_days, r.n_streaks, r.longest)
        for r in df.select("user_id", "dayno", grp.alias("grp"))
        .groupBy("user_id", "grp")
        .agg(F.count("*").alias("len"))
        .groupBy("user_id")
        .agg(
            F.sum("len").alias("active_days"),
            F.count("*").alias("n_streaks"),
            F.max("len").alias("longest"),
        )
        .collect()
    }
    by_user: dict[int, set[int]] = {}
    for u, d in days:
        by_user.setdefault(u, set()).add(d)
    for u, ds in by_user.items():
        sd = sorted(ds)
        runs = []
        cur = 1
        for a, b in zip(sd, sd[1:]):
            if b == a + 1:
                cur += 1
            else:
                runs.append(cur)
                cur = 1
        runs.append(cur)
        assert got[u] == (len(sd), len(runs), max(runs)), (u, got[u], runs)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=1, max_size=30).map(str.strip).filter(bool),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8]),
)
@pytest.mark.slow
def test_containment_prefix_join_is_lossless(spark, texts, threshold):
    """The directed containment prefix filter
    (q_dedup_containment_prefix) returns EXACTLY the all-shingle-join
    answer on arbitrary tie-heavy corpora — the asymmetric-prefix proof
    (only the contained side is pruned) exercised at several
    thresholds."""
    from aram_matchdata_etl_spark.operators.dedup import (
        bigram_col,
        containment_prefix_pairs,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    toks = F.split(F.col("text"), " ")
    sh = docs.select(
        "doc_id", F.explode(bigram_col(toks)).alias("shingle")
    ).distinct()
    got = {
        (r.contained_doc, r.container_doc): r.containment
        for r in containment_prefix_pairs(sh, threshold).collect()
    }
    # brute force in pure Python
    by_doc: dict[int, set[str]] = {}
    for r in sh.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.shingle)
    want = {}
    for a, sa in by_doc.items():
        for b, sb in by_doc.items():
            if a == b or len(sa) > len(sb):
                continue
            c = len(sa & sb) / len(sa)
            if c >= threshold and len(sa & sb) > 0:
                want[(a, b)] = round(c, 6)
    assert got == want, (got, want)
