"""Property-based tests (hypothesis): the custom operators hold their
contracts on arbitrary inputs, not just the fixtures.

- asof_join == pandas.merge_asof (backward, inclusive) on random data
- conform_schema's numeric coercion == Python float parsing semantics
- MinHash estimates bounded in [0,1]; signatures permutation-invariant
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from bigdata_kafka_2_spark.operators.dedup import minhash_signatures
from bigdata_kafka_2_spark.operators.relational import asof_join
from bigdata_kafka_2_spark.schema import conform_schema

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    left_ts=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=1, max_size=25
    ),
    right_ts=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=25,
        unique=True,
    ),
)
@settings(**_SETTINGS)
def test_asof_join_matches_pandas_merge_asof(spark, left_ts, right_ts):
    from datetime import datetime, timedelta

    epoch = datetime(1970, 1, 1)
    left = spark.createDataFrame(
        [(i, epoch + timedelta(seconds=t)) for i, t in enumerate(left_ts)],
        schema=T.StructType(
            [
                T.StructField("lid", T.LongType()),
                T.StructField("lts", T.TimestampType()),
            ]
        ),
    )
    right = spark.createDataFrame(
        [(1000 + i, epoch + timedelta(seconds=t)) for i, t in enumerate(right_ts)],
        schema=T.StructType(
            [
                T.StructField("rid", T.LongType()),
                T.StructField("rts", T.TimestampType()),
            ]
        ),
    )
    got = {
        r.lid: r.rid
        for r in asof_join(
            left, right, left_ts="lts", right_ts="rts", right_cols=["rid"]
        ).collect()
    }

    lp = pd.DataFrame(
        {"lid": range(len(left_ts)), "lts": pd.to_datetime(left_ts, unit="s")}
    ).sort_values("lts", kind="stable")
    rp = pd.DataFrame(
        {"rid": [1000 + i for i in range(len(right_ts))],
         "rts": pd.to_datetime(right_ts, unit="s")}
    ).sort_values("rts", kind="stable")
    expect_df = pd.merge_asof(lp, rp, left_on="lts", right_on="rts", direction="backward")
    expect = {
        int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in expect_df.itertuples()
    }
    assert got == expect


@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),   # key
            st.integers(min_value=0, max_value=5_000),  # left ts
        ),
        min_size=1,
        max_size=20,
    ),
    rdata=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),
            st.integers(min_value=0, max_value=5_000),
        ),
        min_size=1,
        max_size=20,
        unique=True,
    ),
)
@settings(**_SETTINGS)
def test_keyed_asof_join_matches_pandas_by_group(spark, data, rdata):
    from datetime import datetime, timedelta

    epoch = datetime(1970, 1, 1)
    left = spark.createDataFrame(
        [(i, k, epoch + timedelta(seconds=t)) for i, (k, t) in enumerate(data)],
        schema=T.StructType(
            [
                T.StructField("lid", T.LongType()),
                T.StructField("k", T.LongType()),
                T.StructField("lts", T.TimestampType()),
            ]
        ),
    )
    right = spark.createDataFrame(
        [(1000 + i, k, epoch + timedelta(seconds=t)) for i, (k, t) in enumerate(rdata)],
        schema=T.StructType(
            [
                T.StructField("rid", T.LongType()),
                T.StructField("k", T.LongType()),
                T.StructField("rts", T.TimestampType()),
            ]
        ),
    )
    # the keyed variant: as-of within each key partition (the partition
    # column exists under the same name in both frames)
    got = {
        r.lid: r.rid
        for r in asof_join(
            left,
            right,
            left_ts="lts",
            right_ts="rts",
            right_cols=["rid"],
            partition_cols=["k"],
        ).collect()
    }
    expect = {}
    rp = {}
    for i, (k, t) in enumerate(rdata):
        rp.setdefault(k, []).append((t, 1000 + i))
    for i, (k, t) in enumerate(data):
        cands = [(rt, rid) for rt, rid in rp.get(k, []) if rt <= t]
        expect[i] = max(cands)[1] if cands else None
    assert got == expect


@given(
    raw=st.lists(
        st.one_of(
            st.none(),
            # alphabet restricted to numeric-literal shapes: avoids the
            # few places Python and JVM literal grammars diverge
            # (underscore separators, nan/inf words) — policy-irrelevant
            st.text(alphabet="0123456789.eE+- ", max_size=8),
            st.floats(allow_nan=False, allow_infinity=False, width=32).map(str),
            st.integers(min_value=-10**9, max_value=10**9).map(str),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_conform_numeric_matches_python_float(spark, raw):
    schema = T.StructType([T.StructField("a", T.DoubleType())])
    in_schema = T.StructType([T.StructField("a", T.StringType())])
    df = spark.createDataFrame([(v,) for v in raw], in_schema)
    got = [r.a for r in conform_schema(df, schema).collect()]

    def py(v):
        if v is None:
            return 0.0
        try:
            f = float(v)
            return f if f == f and abs(f) != float("inf") else f
        except ValueError:
            return 0.0

    expect = [py(v) for v in raw]
    for g, e in zip(got, expect):
        assert g == pytest.approx(e, rel=1e-12), (raw, got, expect)


@given(
    texts=st.lists(st.text(max_size=40), min_size=1, max_size=10)
)
@settings(**_SETTINGS)
def test_normalize_and_conform_idempotent(spark, texts):
    from pyspark.sql import functions as F

    from bigdata_kafka_2_spark.operators.text import normalize_text

    in_schema = T.StructType([T.StructField("t", T.StringType())])
    df = spark.createDataFrame([(t,) for t in texts], in_schema)
    once = [r.n for r in df.select(normalize_text("t").alias("n")).collect()]
    twice = [
        r.n
        for r in df.select(normalize_text("t").alias("n"))
        .select(normalize_text("n").alias("n"))
        .collect()
    ]
    assert once == twice  # normalization is idempotent

    schema = T.StructType(
        [T.StructField("t", T.StringType()), T.StructField("x", T.DoubleType())]
    )
    c1 = conform_schema(df, schema)
    c2 = conform_schema(c1, schema)
    assert [tuple(r) for r in c1.collect()] == [tuple(r) for r in c2.collect()]


@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab cd"), min_size=1, max_size=60
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_minhash_signature_shape_and_bounds(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    sigs = minhash_signatures(df, num_hashes=8).collect()
    # docs whose normalized text is empty produce no shingles → no row;
    # all produced signatures are full-width and bounded
    for r in sigs:
        assert len(r.minhash) == 8
        assert all(0 <= v < (1 << 31) - 1 for v in r.minhash)
    # identical texts ⇒ identical signatures
    by_text = {}
    for i, t in enumerate(texts):
        by_text.setdefault(" ".join(t.split()), []).append(i)
    sig_by_id = {r.doc_id: tuple(r.minhash) for r in sigs}
    for ids in by_text.values():
        present = [sig_by_id[i] for i in ids if i in sig_by_id]
        assert len(set(present)) <= 1


_WORDS = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])
_DOC = st.lists(_WORDS, min_size=1, max_size=12).map(" ".join)


@given(texts=st.lists(_DOC, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_tfidf_matches_bruteforce(spark, texts):
    """tfidf_scores == the python-computed sklearn-style smooth idf on
    arbitrary small corpora (tf per (doc, tok), df per tok, idf =
    ln((1+N)/(1+df)) + 1)."""
    import math
    from collections import Counter

    from bigdata_kafka_2_spark.operators.text import tfidf_scores

    df = spark.createDataFrame(
        list(enumerate(texts)), ["doc_id", "text"]
    )
    got = {
        (r.doc_id, r.tok): (r.tf, r.doc_freq, r.tfidf)
        for r in tfidf_scores(df).collect()
    }
    n = len(texts)
    tf = {
        (i, w): c
        for i, t in enumerate(texts)
        for w, c in Counter(t.split()).items()
    }
    docfreq = Counter(w for i, w in tf)
    exp = {
        (i, w): (
            c,
            docfreq[w],
            round(c * (math.log((1.0 + n) / (1.0 + docfreq[w])) + 1.0), 4),
        )
        for (i, w), c in tf.items()
    }
    assert got == exp


@given(texts=st.lists(_DOC, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_bm25_matches_bruteforce(spark, texts):
    """bm25_scores == the python-computed Okapi formula (k1=1.2,
    b=0.75) for a fixed two-term query on arbitrary small corpora."""
    import math
    from collections import Counter

    from bigdata_kafka_2_spark.operators.text import bm25_scores

    query = ["aa", "cc"]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    got = {r.doc_id: r.bm25 for r in bm25_scores(df, query).collect()}

    n = len(texts)
    toks = [t.split() for t in texts]
    dl = [len(t) for t in toks]
    avgdl = sum(dl) / n
    docfreq = {
        q: sum(1 for t in toks if q in t) for q in query
    }
    exp = {}
    for i, t in enumerate(toks):
        score = 0.0
        for q in query:
            tf = t.count(q)
            if tf == 0:
                continue
            idf = math.log(
                1.0 + (n - docfreq[q] + 0.5) / (docfreq[q] + 0.5)
            )
            score += idf * tf * (1.2 + 1.0) / (
                tf + 1.2 * (1.0 - 0.75 + 0.75 * dl[i] / avgdl)
            )
        if score != 0.0:
            exp[i] = round(score, 4)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i] == pytest.approx(exp[i], abs=2e-4)


@given(
    vecs=st.lists(
        st.lists(
            st.floats(min_value=-0.5, max_value=0.5, allow_nan=False, width=32),
            min_size=64,
            max_size=64,
        ),
        min_size=1,
        max_size=6,
    )
)
@settings(**_SETTINGS)
def test_pq_encode_matches_numpy_argmin(spark, vecs):
    """pq_encode's code assignment == numpy's nearest-centroid argmin
    (first-wins ties) on arbitrary vectors, and pq_err == the summed
    minimal squared distances."""
    import numpy as np
    from pyspark.sql import types as T2

    from bigdata_kafka_2_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    schema = T2.StructType(
        [
            T2.StructField("vec_id", T2.LongType()),
            T2.StructField("embedding", T2.ArrayType(T2.FloatType())),
        ]
    )
    df = spark.createDataFrame(list(enumerate(vecs)), schema=schema)
    rows = {r.vec_id: r for r in pq_encode(df).collect()}
    books = np.array(pq_codebooks())  # (8, 16, 8)
    for i, v in enumerate(vecs):
        x = np.array(v, dtype=np.float32).astype(np.float64).reshape(8, 8)
        err = 0.0
        for m in range(8):
            d2 = ((books[m] - x[m]) ** 2).sum(axis=1)
            k = int(np.argmin(d2))
            assert rows[i][f"code_{m + 1}"] == k + 1
            err += d2[k]
        assert rows[i].pq_err == pytest.approx(err, abs=2e-4)


def test_unigram_logprob_matches_brute_force(spark):
    """unigram_logprob_scores == the formula computed in plain Python
    (add-one smoothing over the corpus's own unigram counts; per-token
    contributions rounded to 4 dp, matching the engine's
    order-independence rule)."""
    import math
    from collections import Counter

    from bigdata_kafka_2_spark.operators.text import unigram_logprob_scores

    docs = {
        0: "the cat sat on the mat",
        1: "the dog sat",
        2: "rare unseen tokens here",
        3: "the the the the",
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    corpus = Counter()
    for t in docs.values():
        corpus.update(t.split())
    T, V = sum(corpus.values()), len(corpus)
    expect = {}
    for i, t in docs.items():
        toks = t.split()
        # exact integer ticks + half-away-from-zero rounding of the
        # average (the engine's q117 tie rule)
        a = sum(
            int(round(round(math.log((corpus[w] + 1.0) / (T + V)), 4) * 10000))
            for w in toks
        )
        dl = len(toks)
        q = (1 if a >= 0 else -1) * ((abs(a) * 2 + dl) // (dl * 2))
        expect[i] = (dl, q / 10000.0)
    got = {
        r.doc_id: (r.dl, r.logprob)
        for r in unigram_logprob_scores(df).collect()
    }
    assert got == expect
    # common-token doc scores higher than the rare-token doc
    assert got[3][1] > got[2][1]


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdefgh"), min_size=0, max_size=30
        ).map(lambda toks: " ".join(toks)),
        min_size=1,
        max_size=12,
    )
)
@settings(**_SETTINGS)
def test_repetition_stats_matches_bruteforce(spark, docs):
    from collections import Counter

    from bigdata_kafka_2_spark.operators.text import repetition_stats

    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = {r.doc_id: r for r in repetition_stats(df, n=2).collect()}
    for i, text in enumerate(docs):
        toks = text.split()
        grams = [
            f"{toks[j]} {toks[j+1]}" for j in range(len(toks) - 1)
        ]
        if not grams:
            assert i not in got
            continue
        c = Counter(grams)
        r = got[i]
        assert r.n_grams == len(grams)
        assert r.top_ngram_frac == round(max(c.values()) / len(grams), 4)
        assert r.dup_ngram_frac == round(
            (len(grams) - len(c)) / len(grams), 4
        )


@given(
    counts=st.lists(
        st.integers(min_value=1, max_value=40), min_size=1, max_size=8
    )
)
@settings(**_SETTINGS)
def test_pack_sequences_gapless_on_random_docs(spark, counts):
    from bigdata_kafka_2_spark.operators.text import pack_sequences

    rows = [(i, " ".join(["tok"] * n)) for i, n in enumerate(counts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(pack_sequences(df, ctx=16).collect(), key=lambda r: r.doc_id)
    acc = 0
    for r, n in zip(out, counts):
        assert r.n_tokens == n
        assert r.cum_before == acc
        assert r.start_bin == acc // 16
        assert r.end_bin == (acc + n - 1) // 16
        acc += n


@given(
    sizes=st.lists(
        st.integers(min_value=1, max_value=200), min_size=2, max_size=6
    )
)
@settings(**_SETTINGS)
def test_temperature_weights_match_bruteforce(spark, sizes):
    import math

    from bigdata_kafka_2_spark.operators.sampling import (
        temperature_mixture_weights,
    )

    rows = [
        (i * 1000 + j, f"g{i}") for i, n in enumerate(sizes) for j in range(n)
    ]
    df = spark.createDataFrame(rows, "id long, grp string")
    w = {
        r.grp: r.weight
        for r in temperature_mixture_weights(df, ["grp"], alpha=0.5).collect()
    }
    tot = sum(math.sqrt(n) for n in sizes)
    for i, n in enumerate(sizes):
        assert abs(w[f"g{i}"] - math.sqrt(n) / tot) < 1e-9


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),   # user
            st.integers(min_value=0, max_value=50),  # minute
            st.sampled_from(["a", "b"]),             # type
        ),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
@settings(**_SETTINGS)
def test_funnel_counts_match_bruteforce(spark, events):
    from datetime import datetime, timedelta

    from bigdata_kafka_2_spark.operators.timeseries import funnel_counts

    epoch = datetime(2024, 1, 1)
    rows = [
        (i, epoch + timedelta(minutes=m), u, t)
        for i, (u, m, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = {
        r.step: r.n_users
        for r in funnel_counts(
            df, ["a", "b"], within="10 minutes"
        ).collect()
    }
    # brute force: greedy earliest-anchor with a 10-minute horizon
    s1, s2 = set(), set()
    by_user = {}
    for u, m, t in events:
        by_user.setdefault(u, []).append((m, t))
    for u, evs in by_user.items():
        a_times = sorted(m for m, t in evs if t == "a")
        if not a_times:
            continue
        s1.add(u)
        t1 = a_times[0]
        b_times = sorted(
            m for m, t in evs if t == "b" and t1 < m <= t1 + 10
        )
        if b_times:
            s2.add(u)
    assert got.get("a", 0) == len(s1)
    assert got.get("b", 0) == len(s2)


def test_dsir_logweights_match_brute_force(spark):
    """dsir_logweights == the DSIR formula computed in plain Python
    (add-one smoothing over the SHARED raw vocabulary; per-token
    log-ratios rounded to 4 dp, matching the engine's
    order-independence rule), and target-like documents score
    higher than off-target ones."""
    import math
    from collections import Counter

    from pyspark.sql import functions as F

    from bigdata_kafka_2_spark.operators.sampling import dsir_logweights

    docs = {
        0: ("en", "the cat sat on the mat"),
        1: ("en", "the dog sat on the rug"),
        2: ("de", "der hund sitzt auf dem teppich"),
        3: ("de", "the cat sat on dem teppich"),
        4: ("en", ""),
    }
    df = spark.createDataFrame(
        [(i, lang, t) for i, (lang, t) in docs.items()],
        "doc_id long, lang string, text string",
    )
    raw, tgt = Counter(), Counter()
    for lang, t in docs.values():
        raw.update(t.split())
        if lang == "en":
            tgt.update(t.split())
    Tr, Tt, V = sum(raw.values()), sum(tgt.values()), len(raw)
    expect = {}
    for i, (lang, t) in docs.items():
        toks = t.split()
        if not toks:
            continue  # empty doc yields no posting rows
        # exact integer ticks of 1e-4, mirroring the engine's DECIMAL
        # sum + half-away-from-zero integer rounding of the average
        a = sum(
            int(
                round(
                    round(
                        math.log((tgt[w] + 1.0) / (Tt + V))
                        - math.log((raw[w] + 1.0) / (Tr + V)),
                        4,
                    )
                    * 10000
                )
            )
            for w in toks
        )
        dl = len(toks)
        q = (1 if a >= 0 else -1) * ((abs(a) * 2 + dl) // (dl * 2))
        expect[i] = (dl, a / 10000.0, q / 10000.0)
    got = {
        r.doc_id: (r.dl, r.dsir_logweight, r.avg_logratio)
        for r in dsir_logweights(df, F.col("lang") == "en").collect()
    }
    assert got == expect
    # pure-target docs outrank the pure-off-target doc; the mixed doc
    # lands between them
    assert got[0][2] > got[3][2] > got[2][2]


def test_markov_transitions_match_brute_force(spark):
    """markov_transitions == consecutive-pair counting in plain Python
    under the same (ts, id) order, with row-normalized probabilities."""
    from collections import Counter, defaultdict
    from datetime import datetime, timedelta

    from bigdata_kafka_2_spark.operators.timeseries import (
        markov_transitions,
    )

    epoch = datetime(2024, 1, 1)
    # user 1: a->b->a->c; user 2: b->b (tie on ts broken by event_id);
    # user 3: single event (no transition)
    rows = [
        (0, 1, epoch + timedelta(minutes=0), "a"),
        (1, 1, epoch + timedelta(minutes=1), "b"),
        (2, 1, epoch + timedelta(minutes=2), "a"),
        (3, 1, epoch + timedelta(minutes=3), "c"),
        (4, 2, epoch + timedelta(minutes=0), "b"),
        (5, 2, epoch + timedelta(minutes=0), "b"),
        (6, 3, epoch + timedelta(minutes=5), "a"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    by_user = defaultdict(list)
    for eid, uid, ts, et in rows:
        by_user[uid].append((ts, eid, et))
    counts = Counter()
    for seq in by_user.values():
        seq.sort()
        for (_, _, x), (_, _, y) in zip(seq, seq[1:]):
            counts[(x, y)] += 1
    totals = Counter()
    for (x, _), n in counts.items():
        totals[x] += n
    expect = {
        (x, y): (n, round(n / totals[x], 6))
        for (x, y), n in counts.items()
    }
    got = {
        (r.from_type, r.to_type): (r.n_transitions, r.prob)
        for r in markov_transitions(df).collect()
    }
    assert got == expect
    # probabilities row-normalize to 1 per from_type
    sums = defaultdict(float)
    for (x, _), (_, p) in got.items():
        sums[x] += p
    assert all(abs(s - 1.0) < 1e-4 for s in sums.values())


def test_kmv_distinct_properties(spark):
    """KMV estimate == the estimator formula computed in plain Python
    over the same md5 hashes; exact for groups under k; invariant to
    repartitioning; and sketches of disjoint shards merge to the
    sketch of the union."""
    import hashlib

    from pyspark.sql import functions as F

    from bigdata_kafka_2_spark.operators.sketch import (
        KMV_M,
        kmv_candidates,
        kmv_distinct,
        kmv_estimate,
        kmv_merge,
    )

    k, seed = 16, 7
    vals = [f"v{i}" for i in range(500)]
    rows = [("a", v) for v in vals for _ in (0, 1)] + [
        ("b", v) for v in vals[:5]
    ]
    df = spark.createDataFrame(rows, "g string, v string")

    def h(v):
        return int(hashlib.md5(f"{v}:{seed}".encode()).hexdigest()[:15], 16)

    hs = sorted({h(v) for v in vals})
    expect_a = int((k - 1) * (float(KMV_M) / hs[k - 1]))
    got = {
        r.g: r.est_distinct
        for r in kmv_distinct(df, "v", "g", k=k, seed=seed).collect()
    }
    assert got["b"] == 5  # under-k group counted exactly
    assert got["a"] == expect_a
    # within the theoretical ~1/sqrt(k-2) SE band (3 sigma)
    assert abs(got["a"] - 500) / 500 < 3 / (k - 2) ** 0.5

    # partition invariance
    got2 = {
        r.g: r.est_distinct
        for r in kmv_distinct(
            df.repartition(13), "v", "g", k=k, seed=seed
        ).collect()
    }
    assert got2 == got

    # mergeability: shard sketches merge to the union's sketch
    d1 = df.filter(F.col("v") < "v25")
    d2 = df.filter(F.col("v") >= "v25")
    merged = kmv_estimate(
        kmv_merge(
            kmv_candidates(d1, "v", "g", k=k, seed=seed),
            kmv_candidates(d2, "v", "g", k=k, seed=seed),
        ),
        "g",
        k=k,
    )
    got3 = {r.g: r.est_distinct for r in merged.collect()}
    assert got3 == got


def test_session_stats_match_brute_force(spark):
    """session_stats == gap-splitting computed in plain Python under
    the same (ts, event_id) order."""
    from collections import defaultdict
    from datetime import datetime, timedelta

    from bigdata_kafka_2_spark.operators.timeseries import session_stats

    epoch = datetime(2024, 1, 1)
    rows = [
        # user 1: two sessions (gap 31 > 30)
        (0, 1, epoch, "a", None, None),
        (1, 1, epoch + timedelta(minutes=10), "b", None, None),
        (2, 1, epoch + timedelta(minutes=42), "a", None, None),
        # user 2: one session, tie ts broken by event_id
        (3, 2, epoch, "a", None, None),
        (4, 2, epoch, "b", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, event_type string,"
        " value double, props string",
    )
    gap = timedelta(minutes=30)
    by_user = defaultdict(list)
    for eid, uid, ts, et, _, _ in rows:
        by_user[uid].append((ts, eid, et))
    expect = {}
    for uid, seq in by_user.items():
        seq.sort()
        sess, prev = 0, None
        cur = defaultdict(list)
        for ts, eid, et in seq:
            if prev is None or ts - prev > gap:
                sess += 1
            prev = ts
            cur[sess].append((ts, et))
        for s, evs in cur.items():
            tss = [t for t, _ in evs]
            expect[(uid, s)] = (
                len(evs),
                len({e for _, e in evs}),
                min(tss),
                max(tss),
                (max(tss) - min(tss)).total_seconds(),
            )
    got = {
        (r.user_id, r.session_seq): (
            r.n_events,
            r.n_types,
            r.started,
            r.ended,
            r.duration_sec,
        )
        for r in session_stats(df, gap="30 minutes").collect()
    }
    assert got == expect


def test_ndcg_at_k_match_brute_force(spark):
    """ndcg_at_k == the textbook nDCG computed in plain Python under
    the same tie-breaking and rounding rules; perfect ranking gives
    1.0; all-zero relevance gives 0.0."""
    from bigdata_kafka_2_spark.operators.evalmetrics import (
        log2_discounts,
        ndcg_at_k,
    )

    k = 3
    disc = log2_discounts(k)
    rows = [
        # q1: system ranks rel [2, 0, 3, 1] by score -> imperfect
        ("q1", 1, 9.0, 2),
        ("q1", 2, 8.0, 0),
        ("q1", 3, 7.0, 3),
        ("q1", 4, 6.0, 1),
        # q2: perfect ranking
        ("q2", 1, 5.0, 2),
        ("q2", 2, 4.0, 1),
        # q3: nothing relevant
        ("q3", 1, 5.0, 0),
        ("q3", 2, 4.0, 0),
    ]
    df = spark.createDataFrame(
        rows, "query_id string, doc_id long, score double, rel long"
    )

    def brute(items):
        by_score = sorted(items, key=lambda x: (-x[1], x[0]))
        by_rel = sorted(items, key=lambda x: (-x[2], x[0]))
        a = sum(
            int(round(round((2.0 ** r - 1) / disc[i], 6) * 1e6))
            for i, (_, _, r) in enumerate(by_score[:k])
        )
        b = sum(
            int(round(round((2.0 ** r - 1) / disc[i], 6) * 1e6))
            for i, (_, _, r) in enumerate(by_rel[:k])
        )
        if b == 0:
            return 0.0
        return ((a * 20000 + b) // (b * 2)) / 10000.0

    groups = {}
    for q, d, s, r in rows:
        groups.setdefault(q, []).append((d, s, r))
    expect = {q: brute(items) for q, items in groups.items()}
    got = {r.query_id: r.ndcg for r in ndcg_at_k(df, k=k).collect()}
    assert got == expect
    assert got["q2"] == 1.0
    assert got["q3"] == 0.0
    assert 0.0 < got["q1"] < 1.0


def test_bigram_logprob_matches_brute_force(spark):
    """bigram_logprob_scores == the add-one bigram formula computed in
    plain Python (integer ticks + half-away-from-zero average), and a
    scrambled-transition doc scores lower than a natural one."""
    import math
    from collections import Counter

    from bigdata_kafka_2_spark.operators.text import bigram_logprob_scores

    docs = {
        0: "the cat sat on the mat",
        1: "the cat sat on the rug",
        2: "mat the on sat cat the",  # same unigrams, scrambled order
        3: "one",                     # single token -> no row
    }
    df = spark.createDataFrame(
        list(docs.items()), "doc_id long, text string"
    )
    c2, c1 = Counter(), Counter()
    for t in docs.values():
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            c2[(a, b)] += 1
            c1[a] += 1
    H = len(c1)
    expect = {}
    for i, t in docs.items():
        ws = t.split()
        if len(ws) < 2:
            continue
        a = sum(
            int(
                round(
                    round(
                        math.log((c2[(x, y)] + 1.0) / (c1[x] + H)), 4
                    )
                    * 10000
                )
            )
            for x, y in zip(ws, ws[1:])
        )
        nb = len(ws) - 1
        q = (1 if a >= 0 else -1) * ((abs(a) * 2 + nb) // (nb * 2))
        expect[i] = (nb, q / 10000.0)
    got = {
        r.doc_id: (r.n_bigrams, r.logprob)
        for r in bigram_logprob_scores(df).collect()
    }
    assert got == expect
    assert 3 not in got
    # natural transitions outrank the scrambled doc
    assert got[0][1] > got[2][1]


def test_chi_square_matches_scipy_formula(spark):
    """chi_square_profile == the textbook chi2 computed in plain Python
    over the full (observed + unobserved) contingency table; an
    independent pair scores ~0 and a perfectly dependent one scores
    n*(k-1)."""
    from bigdata_kafka_2_spark.operators.profile import chi_square_profile

    rows = [("x", "p"), ("x", "p"), ("x", "q"), ("y", "p"), ("y", "q"),
            ("y", "q"), ("z", "p"), ("z", "q"), (None, "p")]
    df = spark.createDataFrame(rows, "a string, b string")
    got = chi_square_profile(df, "a", "b").collect()[0]

    from collections import Counter
    obs = Counter(("\x00null" if a is None else a, b) for a, b in rows)
    ra, rb = Counter(), Counter()
    for (a, b), o in obs.items():
        ra[a] += o
        rb[b] += o
    n = sum(obs.values())
    chi_obs = sum(
        round((o - ra[a] * rb[b] / n) ** 2 / (ra[a] * rb[b] / n), 6)
        for (a, b), o in obs.items()
    )
    exp_obs = sum(round(ra[a] * rb[b] / n, 6) for (a, b) in obs)
    expect = round(chi_obs + (n - exp_obs), 4)
    assert got.n == n
    assert got.dof == (len(ra) - 1) * (len(rb) - 1)
    assert got.chi2 == expect

    # perfectly dependent pair: chi2 = n * (k-1)
    dep = spark.createDataFrame(
        [("a", "1"), ("a", "1"), ("b", "2"), ("b", "2")], "a string, b string"
    )
    g2 = chi_square_profile(dep, "a", "b").collect()[0]
    assert g2.chi2 == 4.0  # n=4, k=2 -> 4*(2-1)


def test_winsorize_bounds_and_passthrough(spark):
    """winsorize clips exactly to the group percentiles, leaves
    interior values untouched, and passes NULLs through."""
    from pyspark.sql import functions as F

    from bigdata_kafka_2_spark.operators.profile import winsorize

    rows = [("g", float(v)) for v in range(1, 101)] + [("g", None)]
    df = spark.createDataFrame(rows, "g string, v double")
    w = winsorize(df, "v", group_col="g", lower=0.10, upper=0.90)
    vals = [r.v_wins for r in w.collect()]
    nn = [v for v in vals if v is not None]
    # exact interpolated p10/p90 of 1..100 are 10.9 and 90.1
    # (90.1 lands on 90.10000000000001 in interpolation fp — compare
    # with tolerance; DuckDB computes the identical double, which is
    # what the q125 hash check relies on)
    assert min(nn) == pytest.approx(10.9, abs=1e-9)
    assert max(nn) == pytest.approx(90.1, abs=1e-9)
    assert 50.0 in nn  # interior untouched
    assert any(v is None for v in vals)


@given(
    values=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=300,
    ),
)
@settings(**_SETTINGS)
def test_quantile_sketch_rank_error_bound(spark, values):
    """Each estimate's EXACT rank is within N/k + 1 of its target rank
    (the boundary-attribution displacement bound in the docstring)."""
    from bigdata_kafka_2_spark.operators.sketch import (
        quantile_sketch_build,
        quantile_sketch_estimate,
    )

    k = 8
    pdf = pd.DataFrame(
        {"id": range(len(values)), "v": values, "g": "a"}
    )
    df = spark.createDataFrame(pdf)
    sk = quantile_sketch_build(df, "v", "g", "id", k=k, n_blocks=4)
    est = quantile_sketch_estimate(sk, "v", "g").collect()[0]
    s = sorted(values)
    n = len(s)
    for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        target = -(-int(q * 100 * n) // 100)  # ceil(q*n) in int arithmetic
        # exact rank range occupied by the estimated value
        lo = 1 + sum(1 for x in s if x < est[col])
        hi = sum(1 for x in s if x <= est[col])
        slack = n / k + 1
        assert lo - slack <= target <= hi + slack, (
            f"{col}: target {target} vs [{lo},{hi}] n={n}"
        )


def test_quantile_sketch_merge_disjoint_shards(spark):
    """Sketches built over disjoint shards, merged, estimate with the
    additive bound — and N is exact across the merge."""
    from bigdata_kafka_2_spark.operators.sketch import (
        quantile_sketch_build,
        quantile_sketch_estimate,
        quantile_sketch_merge,
    )

    import random

    rng = random.Random(13)
    vals = [rng.uniform(0, 1000) for _ in range(500)]
    pdf = pd.DataFrame({"id": range(500), "v": vals, "g": "a"})
    df = spark.createDataFrame(pdf)
    k = 16
    a = df.filter("id % 2 = 0")
    b = df.filter("id % 2 = 1")
    merged = quantile_sketch_merge(
        quantile_sketch_build(a, "v", "g", "id", k=k, n_blocks=4),
        quantile_sketch_build(b, "v", "g", "id", k=k, n_blocks=4),
    )
    est = quantile_sketch_estimate(merged, "v", "g").collect()[0]
    assert est["n"] == 500
    s = sorted(vals)
    for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        target = -(-int(q * 100 * 500) // 100)
        lo = 1 + sum(1 for x in s if x < est[col])
        hi = sum(1 for x in s if x <= est[col])
        slack = 250 / k + 250 / k + 1  # additive over the two shards
        assert lo - slack <= target <= hi + slack


def test_compression_ratio_orders_repetitive_below_prose(spark):
    """Planted fixtures: pathological repetition compresses far below
    varied prose; empty/NULL rows drop; the UDF is deterministic."""
    from bigdata_kafka_2_spark.operators.text import compressibility_profile

    rows = [
        (1, "aa " * 300),
        (2, "the quick brown fox jumps over the lazy dog and then "
            "wanders through seventeen unrelated topics with varied "
            "vocabulary including zebras quartz fjords and sphinxes"),
        (3, ""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.ratio for r in compressibility_profile(df).collect()}
    assert set(got) == {1, 2}
    assert got[1] < 0.1 < got[2] < 1.0
    again = {
        r.doc_id: r.ratio for r in compressibility_profile(df).collect()
    }
    assert again == got


def test_jenks_breaks_deterministic_and_beats_equal_width(spark):
    """Grouped-map Jenks: (a) identical output under different input
    partitionings; (b) on a planted bimodal group, within-bucket SSE
    beats the equal-width histogram's bucketing."""
    import numpy as np

    from bigdata_kafka_2_spark.operators.profile import jenks_breaks

    rng = np.random.RandomState(7)
    vals = np.concatenate(
        [rng.normal(0, 0.5, 200), rng.normal(100, 0.5, 100)]
    )
    pdf = pd.DataFrame({"g": "a", "v": vals})
    df = spark.createDataFrame(pdf)
    r1 = jenks_breaks(df, "v", "g", k=2).collect()[0]
    r2 = jenks_breaks(df.repartition(7), "v", "g", k=2).collect()[0]
    assert r1.breaks == r2.breaks and r1.sse == r2.sse
    assert r1.n == 300 and len(r1.breaks) == 1
    # the single break separates the two modes
    assert 10 < r1.breaks[0] < 90
    # equal-width baseline: 2 buckets over [min, max] splits at ~50;
    # both modes' masses land in the right buckets either way here, so
    # compare against the WORST reasonable fixed grid: 2 buckets over
    # [min, max] with the split at min + range/2 — same assignment —
    # so assert the absolute SSE is near the two-cluster optimum
    opt = (
        ((vals[vals < 50] - vals[vals < 50].mean()) ** 2).sum()
        + ((vals[vals >= 50] - vals[vals >= 50].mean()) ** 2).sum()
    )
    assert r1.sse <= opt * 1.001


def test_kmv_overlap_properties(spark):
    """Inclusion-exclusion overlap from KMV sketches: (a) the union
    estimate equals the estimate of the relabeled concatenation (the
    merge IS a union sketch); (b) on a planted overlap the
    intersection estimate lands within the sketch's error band."""
    from bigdata_kafka_2_spark.operators.sketch import (
        kmv_candidates,
        kmv_estimate,
        kmv_overlap,
    )
    from pyspark.sql import functions as F

    # planted: A = 0..599, B = 400..999  -> |A|=600 |B|=600 |A∩B|=200
    rows = [("a", i) for i in range(600)] + [
        ("b", i) for i in range(400, 1000)
    ]
    df = spark.createDataFrame(rows, ["g", "v"])
    out = kmv_overlap(df, "v", "g", "a", "b", k=64, seed=7).collect()[0]
    # (a) union sketch identity
    union_direct = kmv_estimate(
        kmv_candidates(
            df.select(F.lit("u").alias("g"), "v"), "v", "g", k=64, seed=7
        ),
        "g",
        k=64,
    ).collect()[0]["est_distinct"]
    assert out["est_union"] == union_direct
    # (b) error bands: ~13% stderr at k=64; allow 4 sigma
    assert abs(out["est_a"] - 600) < 600 * 0.52
    assert abs(out["est_union"] - 1000) < 1000 * 0.52
    assert 0 <= out["est_intersection"] < 600
    # intersection is exactly the inclusion-exclusion of the estimates
    assert out["est_intersection"] == max(
        0, out["est_a"] + out["est_b"] - out["est_union"]
    )


def test_auc_exact_vs_sklearn_formula(spark):
    """Exact AUC vs a brute-force pair count (ties = 1/2) on a planted
    score/label set with heavy ties, plus the perfect/random edges."""
    from bigdata_kafka_2_spark.operators.evalmetrics import auc_exact

    rows = [
        (0.1, 0), (0.2, 0), (0.2, 1), (0.3, 0), (0.3, 1), (0.3, 1),
        (0.5, 1), (0.5, 0), (0.9, 1),
    ]
    d = spark.createDataFrame(rows, ["s", "y"])
    got = auc_exact(d, "s", "y").collect()[0]
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    brute = sum(
        1.0 if p > n else (0.5 if p == n else 0.0)
        for p in pos for n in neg
    ) / (len(pos) * len(neg))
    assert got["auc"] == round(brute, 6)
    assert (got["n_pos"], got["n_neg"]) == (len(pos), len(neg))
    # perfect separation -> 1.0; inverted -> 0.0
    perf = spark.createDataFrame(
        [(1.0, 0), (2.0, 0), (3.0, 1), (4.0, 1)], ["s", "y"]
    )
    assert auc_exact(perf, "s", "y").collect()[0]["auc"] == 1.0
    inv = spark.createDataFrame(
        [(1.0, 1), (2.0, 1), (3.0, 0)], ["s", "y"]
    )
    assert auc_exact(inv, "s", "y").collect()[0]["auc"] == 0.0
    # single-class -> NULL auc, not a division error
    one = spark.createDataFrame([(1.0, 1), (2.0, 1)], ["s", "y"])
    assert auc_exact(one, "s", "y").collect()[0]["auc"] is None
