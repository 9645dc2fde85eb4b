"""Text-analysis queries over ``documents`` (charter extension;
generalizes P7/P8). Oracles mirror the Spark expressions exactly —
same normalization, same regexes (RE2 ∩ Java regex subset only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_kafka_2_spark.io import read_table
from bigdata_kafka_2_spark.operators import text as TX
from bigdata_kafka_2_spark.plans import register


@register(
    "q30_token_stats",
    oracle="""
    SELECT doc_id,
           length(text) AS stat_chars,
           len(string_split_regex(trim(text), '\\s+')) AS stat_tokens,
           round(length(text) * 1.0 /
                 greatest(len(string_split_regex(trim(text), '\\s+')), 1), 4)
             AS stat_chars_per_token
    FROM documents
    """,
    description="Per-document token statistics (token counting for "
    "quality scoring; whitespace tokenizer).",
    tags=("text",),
)
def q30_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    c = F.col("text")
    n_tokens = TX.token_count(c)
    return d.select(
        "doc_id",
        F.length(c).cast("long").alias("stat_chars"),
        n_tokens.cast("long").alias("stat_tokens"),
        F.round(
            F.length(c).cast("double") / F.greatest(n_tokens, F.lit(1)), 4
        ).alias("stat_chars_per_token"),
    )


@register(
    "q31_lang_quality_profile",
    oracle="""
    SELECT lang, source,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           round(avg(len(string_split_regex(trim(text), '\\s+'))), 4) AS avg_tokens
    FROM documents
    GROUP BY lang, source
    """,
    description="Corpus profile: doc count + length stats per "
    "(lang, source) — the inventory aggregation of a "
    "training-data pipeline.",
    tags=("text", "aggregate"),
)
def q31_lang_quality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.round(F.avg(TX.token_count("text")), 4).alias("avg_tokens"),
    )


@register(
    "q32_stopword_quality",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '\\bthe\\b')) AS n_the,
           round(len(regexp_extract_all(text, '\\bthe\\b')) * 1.0 /
                 greatest(len(string_split_regex(trim(text), '\\s+')), 1), 4)
             AS stopword_ratio
    FROM documents
    WHERE lang = 'en'
    """,
    description="Stopword-ratio quality signal (whole-word regexp "
    "count / token count) for English docs.",
    tags=("text",),
)
def q32_stopword_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents").filter(F.col("lang") == "en")
    n_the = TX.word_occurrences("text", "the")
    n_tokens = TX.token_count("text")
    return d.select(
        "doc_id",
        n_the.cast("long").alias("n_the"),
        F.round(
            n_the.cast("double") / F.greatest(n_tokens, F.lit(1)), 4
        ).alias("stopword_ratio"),
    )


@register(
    "q33_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
    description="Document fingerprint: md5 over normalized text "
    "(lowercase, trim, collapsed whitespace) — the exact-dedup "
    "key; md5 matches between Spark and DuckDB.",
    tags=("text", "dedup"),
)
def q33_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select("doc_id", TX.fingerprint("text").alias("fp"))


#: BPE-ish pretokenizer (GPT-2 style, restricted to the RE2 ∩ Java
#: regex subset — no lookahead): letter runs, digit runs, punctuation
#: runs, each with an optional leading space.
_BPE_PATTERN = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


@register(
    "q35_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS n_bpe_tokens,
           len(string_split_regex(trim(text), '\\s+')) AS n_ws_tokens
    FROM documents
    """,
    description="Token counting two ways (charter): whitespace tokens + "
    "a BPE-ish GPT-2-style pretokenizer regex (letter/digit/"
    "punctuation runs) — the pre-merge token count used for "
    "data budgeting.",
    tags=("text",),
)
def q35_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit(_BPE_PATTERN)).cast("long").alias("n_bpe_tokens"),
        TX.token_count("text").cast("long").alias("n_ws_tokens"),
    )


@register(
    "q38_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(regexp_extract_all(text, '.')) AS c
      FROM documents
    ),
    freqs AS (
      SELECT doc_id, c, count(*) AS k FROM chars GROUP BY doc_id, c
    ),
    totals AS (
      SELECT doc_id, sum(k) AS n FROM freqs GROUP BY doc_id
    )
    SELECT f.doc_id,
           round(-sum((k * 1.0 / n) * log2(k * 1.0 / n)), 4) AS entropy_bits
    FROM freqs f JOIN totals t ON f.doc_id = t.doc_id
    GROUP BY f.doc_id
    """,
    description="Per-document character Shannon entropy — computed in "
    "Spark by an Arrow-batched scalar Pandas UDF (the §2.10 "
    "escape hatch) and verified against a pure-SQL oracle: "
    "even the Python path is hash-checked.",
    tags=("text", "udf"),
)
def q38_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    entropy = TX.char_entropy_udf()
    return d.select(
        "doc_id", F.round(entropy(F.col("text")), 4).alias("entropy_bits")
    )


#: Tokenization CTE shared by q36's oracle and the sketch (q39) oracle —
#: DuckDB transcription of explode(split(normalize_text(text), ' ')).
#: Both oracles are built from THIS constant so the q36-vs-q39
#: exact-vs-sketch anchor cannot drift tokenization-wise.
_TOKS_CTE = """
    toks AS (
      SELECT tok FROM (
        SELECT unnest(string_split_regex(
          trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    )"""

#: doc_id-carrying variant — posting-list transcription of
#: operators/text.term_frequencies' explode (shared by the TF-IDF and
#: BM25 oracles).
_TOKS_DOC_CTE = """
    toks_doc AS (
      SELECT doc_id, tok FROM (
        SELECT doc_id, unnest(string_split_regex(
          trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    )"""


@register(
    "q36_top_terms",
    oracle=f"""
    WITH {_TOKS_CTE}
    SELECT tok, n FROM (
      SELECT tok, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS rn
      FROM toks
      GROUP BY tok
    ) WHERE rn <= 10
    """,
    description="Corpus heavy-hitters: top-10 tokens by frequency "
    "(explode → map-side-combined count → TakeOrdered). The "
    "exact form; at 100 TB swap in count-min sketch or sample "
    "counts, same operator signature.",
    tags=("text", "aggregate", "limit"),
)
def q36_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(TX.normalize_text("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    return (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(10)
    )


@register(
    "q37_column_profile",
    oracle="""
    SELECT 'l_quantity' AS col, count(*) AS n_rows,
           round(min(l_quantity), 4) AS min_v,
           round(max(l_quantity), 4) AS max_v,
           round(avg(l_quantity), 4) AS avg_v,
           round(stddev_samp(l_quantity), 4) AS std_v
    FROM lineitem
    UNION ALL
    SELECT 'l_extendedprice', count(*),
           round(min(l_extendedprice), 4), round(max(l_extendedprice), 4),
           round(avg(l_extendedprice), 4), round(stddev_samp(l_extendedprice), 4)
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', count(*),
           round(min(l_discount), 4), round(max(l_discount), 4),
           round(avg(l_discount), 4), round(stddev_samp(l_discount), 4)
    FROM lineitem
    """,
    description="Column profiling (describe-style long format): "
    "count/min/max/avg/stddev per numeric column in ONE scan "
    "(single aggregate, then unpivot) — the data-quality "
    "summary a pipeline runs before training.",
    tags=("aggregate", "profile"),
)
def q37_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = read_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n"),
            F.round(F.min(c), 4).alias(f"{c}__min"),
            F.round(F.max(c), 4).alias(f"{c}__max"),
            F.round(F.avg(c), 4).alias(f"{c}__avg"),
            F.round(F.stddev_samp(c), 4).alias(f"{c}__std"),
        ]
    wide = l.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', `{c}__n`, `{c}__min`, `{c}__max`, `{c}__avg`, `{c}__std`"
        for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) "
            "AS (col, n_rows, min_v, max_v, avg_v, std_v)"
        )
    )


def _language_id_oracle() -> str:
    """DuckDB transcription of the marker-word language-ID heuristic:
    per-language whole-word regexp hit counts, argmax with lexicographic
    tie-break, 'und' on zero hits. Generated from the same
    ``_LANG_MARKERS`` table the Spark operator uses, so the heuristic
    itself (not just row counts) is hash-checked; the per-language
    score columns keep the graded result non-degenerate even where the
    fixture text predicts a single language."""
    langs = sorted(TX._LANG_MARKERS)
    score_exprs = []
    for lang in langs:
        terms = " + ".join(
            f"len(regexp_extract_all(text, '(?:^|\\s){w}(?:\\s|$)'))"
            for w in TX._LANG_MARKERS[lang]
        )
        # coalesce: NULL text scores 0 (matching the Spark operator's
        # coalesced scores), so lang_pred lands on 'und', never NULL
        score_exprs.append(f"coalesce({terms}, 0) AS score_{lang}")
    best = "greatest(" + ", ".join(f"score_{l}" for l in langs) + ")"
    # CASE checks ascending-sorted languages so ties resolve to the
    # lexicographically first — same as the Spark fold order.
    pred_branches = "\n             ".join(
        f"WHEN score_{l} = {best} THEN '{l}'" for l in langs
    )
    return f"""
    SELECT doc_id, lang,
           CASE WHEN {best} = 0 THEN 'und'
             {pred_branches}
             ELSE 'und'
           END AS lang_pred,
           {', '.join(f'score_{l}' for l in langs)}
    FROM (
      SELECT doc_id, lang, {', '.join(score_exprs)}
      FROM documents
    )
    """


@register(
    "q34_language_id",
    oracle=_language_id_oracle(),
    description="Heuristic n-gram language ID (marker-word scoring, "
    "argmax per doc) plus the per-language marker-hit scores. "
    "Hash-checked against a DuckDB transcription of the same "
    "heuristic (generated from the shared marker table, see "
    "_language_id_oracle) — upgraded from rows-only in r2, "
    "where the fixture's missing language signal made the "
    "graded row vacuous. Accuracy against a marker-bearing "
    "fixture is asserted separately in tests.",
    tags=("text",),
)
def q34_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.language_id(d, emit_scores=True).select(
        "doc_id",
        "lang",
        "lang_pred",
        *[f"score_{l}" for l in sorted(TX._LANG_MARKERS)],
    )


@register(
    "q45_tfidf_top_terms",
    oracle=f"""
    WITH {_TOKS_DOC_CTE},
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks_doc GROUP BY doc_id, tok
    ),
    docfreq AS (SELECT tok, count(*) AS doc_freq FROM tf GROUP BY tok),
    n AS (SELECT count(*) AS nd FROM documents),
    scored AS (
      SELECT doc_id, tok, tf, doc_freq,
             round(tf * (ln((1.0 + nd) / (1.0 + doc_freq)) + 1.0), 4) AS tfidf
      FROM tf JOIN docfreq USING (tok) CROSS JOIN n
    )
    SELECT doc_id, tok, tf, doc_freq, tfidf FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, tok ASC
      ) AS rn
      FROM scored WHERE doc_id < 20
    ) WHERE rn <= 3
    """,
    description="TF-IDF document-term scoring (operators/text.tfidf_"
    "scores, smooth sklearn-style idf): top-3 characteristic terms per "
    "document for the first 20 docs, deterministic (score desc, token "
    "asc) tie-break. The posting-list build is one explode + one "
    "(doc, tok) hash aggregate; the vocabulary aggregate and scoring "
    "join land on the same tok key (AQE broadcasts the small side); "
    "corpus size N rides a 1-row broadcast cross join, never a driver "
    "round-trip.",
    tags=("text", "aggregate", "window"),
)
def q45_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    scored = TX.tfidf_scores(d).filter(F.col("doc_id") < 20)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "tok", "tf", "doc_freq", "tfidf")
    )


@register(
    "q49_quality_filter",
    oracle="""
    SELECT doc_id, n_tokens, cpt, ttr,
           pass_tokens, pass_cpt, pass_ttr,
           (pass_tokens AND pass_cpt AND pass_ttr) AS keep
    FROM (
      SELECT doc_id, n_tokens, cpt, ttr,
             (n_tokens >= 20 AND n_tokens <= 90) AS pass_tokens,
             (cpt >= 4.5 AND cpt <= 6.0) AS pass_cpt,
             (ttr >= 0.45) AS pass_ttr
      FROM (
        SELECT doc_id,
               len(toks) AS n_tokens,
               round(length(norm) * 1.0 / greatest(len(toks), 1), 4) AS cpt,
               round(len(list_distinct(toks)) * 1.0
                     / greatest(len(toks), 1), 4) AS ttr
        FROM (
          SELECT doc_id,
                 coalesce(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          '') AS norm,
                 string_split_regex(
                   coalesce(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                            ''), ' '
                 ) AS toks
          FROM documents
        )
      )
    )
    """,
    description="Gopher-style document quality filter (operators/text."
    "quality_filter_flags): token-count bounds, chars-per-token "
    "bounds, type-token-ratio floor (the doc-level repetition "
    "signal), per-rule flags + composed keep decision. Thresholds "
    "chosen to split the driver corpus non-trivially (each rule "
    "passes 50-95%%). All row-local expressions over one "
    "normalize+split — runs at scan speed, no shuffle; flags are "
    "computed from 4-dp-rounded statistics so keep/drop never "
    "depends on double last-bits. The cheapest large-fraction corpus "
    "cut in an LLM data pipeline, and the composition target for "
    "with_text_stats/q31.",
    tags=("text", "filter"),
)
def q49_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.quality_filter_flags(d)


#: q46's fixed curation query: high-frequency corpus terms so the
#: scored set is non-vacuous at every sf (df ≈ 0.8·N on the driver
#: data).
_BM25_QUERY = ("hash", "join", "scan")


@register(
    "q46_bm25_scores",
    oracle=f"""
    WITH {_TOKS_DOC_CTE},
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks_doc GROUP BY doc_id, tok
    ),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (
      SELECT (SELECT count(*) FROM documents) AS nd,
             (SELECT avg(dl) FROM dl) AS avgdl
    ),
    qtf AS (
      SELECT * FROM tf WHERE tok IN {_BM25_QUERY!r}
    ),
    dfq AS (SELECT tok, count(*) AS doc_freq FROM qtf GROUP BY tok)
    SELECT q.doc_id,
           CAST(sum(CAST(round(
             ln(1.0 + (nd - doc_freq + 0.5) / (doc_freq + 0.5))
             * q.tf * (1.2 + 1.0)
             / (q.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl))
           , 4) AS DECIMAL(18,4))) AS DOUBLE) AS bm25
    FROM qtf q
    JOIN dfq USING (tok)
    JOIN dl ON dl.doc_id = q.doc_id
    CROSS JOIN stats
    GROUP BY q.doc_id
    """,
    description="Okapi BM25 relevance scores (operators/text.bm25_"
    "scores, k1=1.2 b=0.75) of every document against a fixed "
    "curation query — the retrieval-scoring primitive for slicing a "
    "100 TB corpus by topical relevance. The query-term filter is "
    "applied to the posting list BEFORE any join (per-query work "
    "proportional to the terms' postings, not the vocabulary); doc "
    "frequency, corpus size and average doc length are all 1-row/"
    "small broadcasts. Hash-checked against a full SQL transcription "
    "of the scoring formula.",
    tags=("text", "aggregate", "join"),
)
def q46_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.bm25_scores(d, list(_BM25_QUERY))


def _cms_topk_oracle(
    depth: int = 4, width: int = 2048, seed: int = 42, k: int = 10
) -> str:
    """Full DuckDB transcription of the count-min pipeline under the
    portable ``md5_15`` bucket hash (sketch.bucket_sql, bit-identical
    to Spark's — parity incl. non-ASCII asserted in
    tests/test_sketch.py::test_md5_15_bucket_parity_with_duckdb):
    build the depth×width counter grid, probe every candidate's
    ``depth`` cells, min-estimate, top-k. Same shape as q53/q57's
    generated LSH/IVF oracles — the algorithm itself is transcribed,
    not a recall shortcut."""
    from bigdata_kafka_2_spark.operators.sketch import bucket_sql

    cell_rows = "\n        UNION ALL ".join(
        f"SELECT {i} AS row_idx, {bucket_sql('tok', i, width, seed)} AS bucket"
        " FROM toks"
        for i in range(depth)
    )
    probe_rows = "\n        UNION ALL ".join(
        f"SELECT tok, {i} AS row_idx,"
        f" {bucket_sql('tok', i, width, seed)} AS bucket FROM cand"
        for i in range(depth)
    )
    return f"""
    WITH {_TOKS_CTE},
    cells AS (
      SELECT row_idx, bucket, count(*) AS cnt FROM (
        {cell_rows}
      ) GROUP BY row_idx, bucket
    ),
    cand AS (SELECT DISTINCT tok FROM toks),
    probes AS (
        {probe_rows}
    ),
    est AS (
      SELECT p.tok, CAST(min(coalesce(c.cnt, 0)) AS BIGINT) AS est_cnt
      FROM probes p
      LEFT JOIN cells c ON p.row_idx = c.row_idx AND p.bucket = c.bucket
      GROUP BY p.tok
    )
    SELECT tok, est_cnt FROM est
    ORDER BY est_cnt DESC, tok ASC LIMIT {k}
    """


@register(
    "q39_cms_top_terms",
    oracle=_cms_topk_oracle(),
    description="Approximate corpus heavy-hitters via count-min sketch "
    "(operators/sketch.py): the 100 TB swap-in for q36's exact "
    "top-terms. The term-count state is a fixed depth*width counter "
    "grid (one bounded-key shuffle with map-side partials) instead of "
    "a full-vocabulary shuffle; estimates never undercount and "
    "shard-built sketches merge cell-wise (both property-tested). "
    "Hash-checked against a full DuckDB transcription of the sketch "
    "under the portable md5_15 bucket hash (production default stays "
    "xxhash64; both top-k sets asserted equal in tests).",
    tags=("text", "aggregate", "sketch"),
)
def q39_cms_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators import sketch as SK

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(TX.normalize_text("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    return SK.count_min_topk(toks, "tok", k=10, hash_fn="md5_15")


def _winnow_pairs_oracle(k: int = 5, window: int = 4, min_shared: int = 2) -> str:
    """Full DuckDB transcription of the winnowing pipeline under the
    portable ``md5_15`` shingle hash (text.shingle_hash_sql, parity
    with Spark asserted in tests/test_extensions.py): per-position
    shingle hashes, window-of-``window`` minimum (a SQL window min
    over full windows — ROWS BETWEEN CURRENT AND w-1 FOLLOWING on
    rows kept to i <= n_sh - w, degenerating to the single
    all-elements window when a document has fewer shingles than the
    window, exactly like Spark's null-skipping least-of-suffixes
    fold), distinct fingerprints, then the same self-equi-join +
    HAVING count. The algorithm itself is transcribed, as with
    q39/q53/q57 — not a recall shortcut."""
    from bigdata_kafka_2_spark.operators.text import (
        shingle_hash_sql,
        token_hash_sql,
    )

    h = shingle_hash_sql("ths", "i", k)
    return f"""
    WITH docs AS (
      SELECT doc_id,
             string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')),
                          ' ') AS toks
      FROM documents
    ),
    th AS (
      SELECT doc_id,
             list_transform(toks, t -> {token_hash_sql('t')}) AS ths
      FROM docs
    ),
    pos AS (
      SELECT doc_id, ths,
             unnest(range(0, greatest(len(ths) - {k}, 0) + 1)) AS i
      FROM th
    ),
    hashes AS (
      SELECT doc_id, i, {h} AS h,
             greatest(len(ths) - {k}, 0) + 1 AS n_sh
      FROM pos
    ),
    fps AS (
      SELECT DISTINCT doc_id,
             min(h) OVER (PARTITION BY doc_id ORDER BY i
                          ROWS BETWEEN CURRENT ROW
                          AND {window - 1} FOLLOWING) AS fp
      FROM hashes
      QUALIFY i <= greatest(n_sh - {window}, 0)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           count(*) AS n_shared
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING count(*) >= {min_shared}
    """


@register(
    "q67_winnow_overlap_pairs",
    oracle=_winnow_pairs_oracle(),
    description="Substring-level duplicate candidates via winnowing "
    "fingerprints (operators/text.winnow_fingerprints — the MOSS "
    "rolling-hash scheme): row-local zero-shuffle signatures keeping "
    "~2/(window+1) of shingle hashes with a shared-run match "
    "guarantee, then the co-occurrence-bounded equi-join on exploded "
    "fingerprints. Catches copied passages that whole-document "
    "Jaccard dilutes away. Hash-checked against a full DuckDB "
    "transcription of the winnowing algorithm under the portable "
    "md5_15 shingle hash (production default stays xxhash64; the "
    "match guarantee is hash-family-independent and property-tested "
    "for both).",
    tags=("text", "dedup", "join"),
)
def q67_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.text import winnow_overlap_pairs

    d = read_table(spark, sf_dir, "documents")
    return winnow_overlap_pairs(d, min_shared=2, hash_fn="md5_15")


def _pii_profile_oracle() -> str:
    """Generated from the SAME `PII_PATTERNS` the operator compiles,
    q34's portability pattern: len(regexp_extract_all) mirrors
    regexp_count (both RE2/Java-compatible subset); the Luhn
    validation transcribes via TX.luhn_count_sql (DuckDB list HOFs
    mirroring the Spark array HOFs, kept in one module so they can't
    drift)."""
    counts = ",\n           ".join(
        f"len(regexp_extract_all(text, '{pat}')) AS n_{name}"
        for name, pat, _ in TX.PII_PATTERNS
    )
    names = ", ".join(f"n_{name}" for name, _, _ in TX.PII_PATTERNS)
    has = " OR ".join(
        "n_cc_luhn > 0" if name == "cc_like" else f"n_{name} > 0"
        for name, _, _ in TX.PII_PATTERNS
    )
    return f"""
    SELECT doc_id, {names}, n_cc_luhn,
           ({has}) AS has_pii
    FROM (
      SELECT doc_id,
           {counts},
           {TX.luhn_count_sql("text")} AS n_cc_luhn
      FROM documents
    )
    """


@register(
    "q72_pii_profile",
    oracle=_pii_profile_oracle(),
    description="PII detection profile (operators/text.pii_flags): "
    "per-document hit counts for email / IPv4 / phone-shaped / "
    "SSN-shaped patterns plus a composed has_pii flag — the detection "
    "half of the scrub step a training-data pipeline runs before "
    "release (redact_pii is the rewrite half, tested with planted "
    "fixtures). Row-local regexp_count over the scan: no shuffle, no "
    "UDF, scan-speed at 100 TB; the counts route only flagged rows "
    "(typically a few %) into the expensive redaction rewrite. "
    "Patterns restricted to the Java/RE2-portable regex subset and "
    "shared with the generated oracle, so the operator is "
    "hash-checkable end-to-end (q34's portability pattern).",
    tags=("text", "filter"),
)
def q72_pii_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.pii_flags(d)


_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


@register(
    "q73_repetition_profile",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS gram
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
      WHERE t[i] || ' ' || t[i+1] <> ''
    ),
    counts AS (
      SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(sum(c) AS BIGINT) AS n_grams,
           round(max(c) * 1.0 / sum(c), 4) AS top_ngram_frac,
           round((sum(c) - count(*)) * 1.0 / sum(c), 4) AS dup_ngram_frac,
           (round(max(c) * 1.0 / sum(c), 4) <= 0.2
            AND round((sum(c) - count(*)) * 1.0 / sum(c), 4) <= 0.3)
             AS keep
    FROM counts
    GROUP BY doc_id
    """,
    description="Within-document repetition profile "
    "(operators/text.repetition_stats — the Gopher repetition-filter "
    "family): per document, the share of token 2-grams taken by the "
    "most frequent 2-gram and the share of 2-gram occurrences that "
    "are repeats, plus a keep flag on 4-dp-rounded boundaries. The "
    "one quality axis quality_filter_flags (shape) and the dedup "
    "family (cross-document repeats) don't measure. One codegen'd "
    "explode + two map-side-combinable aggregates keyed by doc — at "
    "100 TB the shuffle carries one row per distinct (doc, gram). "
    "Documents shorter than n tokens form no partial/NULL-padded "
    "grams on either engine.",
    tags=("text", "filter"),
)
def q73_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.repetition_stats(d, n=2)


@register(
    "q77_chunk_documents",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents
    ),
    chunks AS (
      SELECT doc_id, j AS chunk_idx,
             list_aggregate(t[j*8+1 : j*8+16], 'string_agg', ' ')
               AS chunk_text
      FROM toks,
           UNNEST(generate_series(
             0, CAST(floor((len(t) + 7) / 8.0) AS BIGINT) - 1)) AS g(j)
    )
    SELECT doc_id, chunk_idx, chunk_text,
           len(string_split(chunk_text, ' ')) AS n_tokens
    FROM chunks WHERE chunk_text <> ''
    """,
    description="Document chunking into overlapping token windows "
    "(operators/text.chunk_documents, chunk=16 stride=8): the RAG / "
    "long-doc context-window extraction step. Entirely row-local — "
    "the window array is built inside codegen from ONE "
    "normalize+split and posexploded, no shuffle, scan-speed at "
    "100 TB with output a fixed multiple of input. Hash-checked "
    "against a DuckDB list-slicing transcription.",
    tags=("text",),
)
def q77_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.chunk_documents(d, chunk_tokens=16, stride=8)


@register(
    "q78_pack_sequences",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\\s+')) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
      FROM t
    )
    SELECT doc_id, n_tokens, cum_before,
           CAST(floor(cum_before / 256.0) AS BIGINT) AS start_bin,
           CAST(floor((cum_before + n_tokens - 1) / 256.0) AS BIGINT)
             AS end_bin,
           CAST(cum_before % 256 AS BIGINT) AS bin_offset
    FROM c
    """,
    description="Concat-and-split sequence-packing manifest "
    "(operators/text.pack_sequences, ctx=256): documents laid out in "
    "a deterministic id-ordered stream, chopped every 256 tokens — "
    "the zero-padding pre-training packing. The running total is "
    "relational.global_prefix_sum: range-bucketed EXCLUSIVE prefix "
    "sum (per-bucket window + ≤64-row driver cumsum), no "
    "single-partition window anywhere, so a 100 TB layout is one "
    "bounded-width ranking shuffle. The oracle states the same "
    "manifest with a plain SQL window.",
    tags=("text", "window"),
)
def q78_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    out = TX.pack_sequences(d, ctx=256)
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("cum_before").cast("long").alias("cum_before"),
        "start_bin",
        "end_bin",
        "bin_offset",
    )


@register(
    "q80_unigram_logprob",
    oracle=f"""
    WITH {_TOKS_DOC_CTE},
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks_doc GROUP BY 1, 2
    ),
    vocab AS (SELECT tok, sum(tf) AS ctf FROM tf GROUP BY tok),
    tot AS (SELECT sum(ctf) AS T, count(*) AS V FROM vocab),
    agg AS (
      SELECT doc_id,
             CAST(sum(tf) AS BIGINT) AS dl,
             sum(CAST(tf * round(ln((ctf + 1.0) / (T + V)), 4)
                      AS DECIMAL(28,4))) AS s
      FROM tf JOIN vocab USING (tok), tot
      GROUP BY doc_id
    )
    SELECT doc_id, dl,
           -- exact half-away-from-zero rounding of s/dl at 4 dp (the
           -- q117 tie rule; engine round() diverges at exact .5)
           (CASE WHEN s < 0 THEN -1 ELSE 1 END)
             * ((abs(CAST(s * 10000 AS BIGINT)) * 2 + dl) // (dl * 2))
             / 10000.0 AS logprob
    FROM agg
    """,
    description="Unigram language-model quality scoring "
    "(operators/text.unigram_logprob_scores): per-document mean token "
    "log-probability under the corpus's own add-one-smoothed unigram "
    "LM — the SQL-expressible stand-in for KenLM perplexity scoring "
    "(the CCNet/Llama quality signal; rank and threshold like any "
    "perplexity). The posting list feeds both the vocabulary "
    "aggregate and the scoring join on the same tok key (AQE "
    "broadcasts the vocab side when it fits); T/V are a 1-row "
    "broadcast; per-token contributions are rounded and summed as "
    "exact DECIMALs (the bm25 order-independence rule). Hash-checked "
    "against a full DuckDB transcription.",
    tags=("text", "aggregate"),
)
def q80_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.unigram_logprob_scores(d)


@register(
    "q105_pmi_top_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents
    ),
    uni AS (
      SELECT u.w FROM toks, UNNEST(t) AS u(w) WHERE u.w <> ''
    ),
    bi AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM toks, UNNEST(generate_series(1, len(t) - 1)) AS g(i)
      WHERE len(t) >= 2
    ),
    uc AS (SELECT w, count(*) AS n_w FROM uni GROUP BY 1),
    bc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair FROM bi
      GROUP BY 1, 2 HAVING count(*) >= 5
    ),
    tot AS (
      SELECT (SELECT count(*) FROM uni) AS n,
             (SELECT count(*) FROM bi) AS m
    )
    SELECT w1, w2, n_pair,
           round(ln((n_pair * 1.0 / m)
                    / ((a.n_w * 1.0 / n) * (b.n_w * 1.0 / n))), 4) AS pmi
    FROM bc JOIN uc a ON bc.w1 = a.w JOIN uc b ON bc.w2 = b.w, tot
    ORDER BY pmi DESC, w1 ASC, w2 ASC
    LIMIT 50
    """,
    description="Top adjacent-bigram collocations by pointwise mutual "
    "information (operators/text.pmi_top_pairs): the corpus statistic "
    "behind collocation mining, BPE-style tokenizer merge candidates "
    "(a merge step picks the highest-association adjacent pair), and "
    "phrase induction. Two row-local explodes, two map-side-"
    "combinable word/pair aggregates, the two corpus totals broadcast "
    "as a 1-row table, global top-50 as TakeOrdered. Word-keyed "
    "shuffles are vocabulary-sized, not corpus-sized; min_count=5 "
    "guards rare-pair noise. Deterministic order (pmi desc, w1, w2).",
    tags=("text", "aggregate", "limit"),
)
def q105_pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.pmi_top_pairs(d, min_count=5, top_n=50)


@register(
    "q108_perplexity_buckets",
    oracle=f"""
    WITH {_TOKS_DOC_CTE},
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks_doc GROUP BY 1, 2
    ),
    vocab AS (SELECT tok, sum(tf) AS ctf FROM tf GROUP BY tok),
    tot AS (SELECT sum(ctf) AS T, count(*) AS V FROM vocab),
    sagg AS (
      SELECT doc_id,
             CAST(sum(tf) AS BIGINT) AS dl,
             sum(CAST(tf * round(ln((ctf + 1.0) / (T + V)), 4)
                      AS DECIMAL(28,4))) AS s
      FROM tf JOIN vocab USING (tok), tot
      GROUP BY doc_id
    ),
    scores AS (
      SELECT doc_id,
             (CASE WHEN s < 0 THEN -1 ELSE 1 END)
               * ((abs(CAST(s * 10000 AS BIGINT)) * 2 + dl) // (dl * 2))
               / 10000.0 AS logprob
      FROM sagg
    ),
    sl AS (
      SELECT s.doc_id, s.logprob, d.lang
      FROM scores s JOIN documents d USING (doc_id)
    ),
    thr AS (
      SELECT lang,
             quantile_cont(logprob, 0.3333333333333333) AS t0,
             quantile_cont(logprob, 0.6666666666666666) AS t1
      FROM sl GROUP BY lang
    )
    SELECT lang,
           CASE WHEN logprob < t0 THEN 'tail'
                WHEN logprob < t1 THEN 'middle'
                ELSE 'head' END AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(logprob), 4) AS avg_logprob
    FROM sl JOIN thr USING (lang)
    GROUP BY 1, 2
    """,
    description="CCNet-style per-language perplexity buckets "
    "(operators/sampling.score_buckets over "
    "operators/text.unigram_logprob_scores): each language's docs "
    "split at the terciles of that language's OWN quality-score "
    "distribution into head/middle/tail — the bucketing CCNet uses "
    "to keep head+middle and drop the tail, per language so "
    "high-resource languages don't set the bar for low-resource "
    "ones. Thresholds are exact interpolated percentiles (Spark "
    "percentile == DuckDB quantile_cont, the q23 parity), one tiny "
    "row per language broadcast into the labeling join — no "
    "percent_rank window over the full table. Hash-checked "
    "end-to-end through the composed unigram-LM + bucketing plan.",
    tags=("text", "sampling", "aggregate"),
)
def q108_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators import sampling as SP

    d = read_table(spark, sf_dir, "documents")
    scores = TX.unigram_logprob_scores(d).join(
        d.select("doc_id", "lang"), on="doc_id"
    )
    b = SP.score_buckets(scores, "logprob", group_col="lang")
    return b.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("logprob"), 4).alias("avg_logprob"),
    )


def _q114_oracle(sf_dir: str) -> str:
    """Golden-reference oracle for the ITERATIVE BPE learner: an
    INDEPENDENT pure-Python Sennrich implementation (word-frequency
    dict + regex-style non-overlapping merge, no Spark, no shared
    code with operators/bpe.py) runs over the parquet at
    oracle-resolution time and emits its merge sequence as a VALUES
    literal. An iterative driver-coordinated algorithm is not
    expressible as one SQL query; this is strictly stronger than the
    rows-only fallback — every merge, count, and tie-break is checked
    against a second implementation of the algorithm (the q47/q68
    pinned-literal precedent, applied to a computed golden result)."""
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["text"]
    )
    wf: Counter = Counter()
    for t in tbl.column("text").to_pylist():
        if t is None:
            continue
        norm = re.sub(r"\s+", " ", t.lower()).strip()
        for w in norm.split(" "):
            if w:
                wf[w] += 1
    sym = {w: list(w) + ["</w>"] for w in wf}
    merges = []
    for _ in range(20):
        pc: Counter = Counter()
        for w, n in wf.items():
            s = sym[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        top = max(pc.values())
        if top < 2:
            break
        a, b = sorted(p for p, c in pc.items() if c == top)[0]
        merges.append((a, b, top))
        for w in sym:
            s = sym[w]
            out, jm = [], False
            for tok in s:
                if out and not jm and out[-1] == a and tok == b:
                    out[-1] = a + b
                    jm = True
                else:
                    out.append(tok)
                    jm = False
            sym[w] = out

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    rows = ",\n      ".join(
        f"({i + 1}, {q(a)}, {q(b)}, {c})"
        for i, (a, b, c) in enumerate(merges)
    )
    return f"""
    SELECT CAST(rank AS BIGINT) AS rank, left_sym, right_sym,
           CAST(pair_count AS BIGINT) AS pair_count
    FROM (VALUES
      {rows}
    ) AS t(rank, left_sym, right_sym, pair_count)
    """


@register(
    "q114_bpe_merges",
    oracle=_q114_oracle,
    description="Distributed BPE vocabulary induction "
    "(operators/bpe.learn_bpe_merges): the Sennrich tokenizer-training "
    "loop with every round running on the WORD FREQUENCY table "
    "(vocabulary-sized — the corpus is touched exactly once, by the "
    "initial word count), one argmax row to the driver per round (the "
    "connected-components bounded-decision pattern), merge application "
    "as a row-local HOF fold with reference regex semantics. 20 "
    "merges, ties broken (count desc, pair asc). The oracle is a "
    "golden reference: an independent pure-Python Sennrich learner "
    "runs at oracle-resolution time and its merge sequence is "
    "hash-compared — stronger than rows-only for an iterative "
    "algorithm no single SQL query can express; exact merge-sequence "
    "AND tokenization parity are additionally property-tested.",
    tags=("text", "aggregate"),
)
def q114_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators import bpe as BP

    d = read_table(spark, sf_dir, "documents")
    merges = BP.learn_bpe_merges(d, n_merges=20, min_pair_count=2)
    return spark.createDataFrame(
        [
            (i + 1, a, b, c)
            for i, (a, b, c) in enumerate(merges)
        ],
        "rank long, left_sym string, right_sym string, pair_count long",
    )


@register(
    "q117_dsir_logweights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, tgt, tok FROM (
        SELECT doc_id, (lang = 'en') AS tgt,
               unnest(string_split_regex({_NORM_SQL}, ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    tf AS (
      SELECT doc_id, tgt, tok, count(*) AS tf FROM toks GROUP BY 1, 2, 3
    ),
    vocab AS (
      SELECT tok, sum(tf) AS cr,
             sum(CASE WHEN tgt THEN tf ELSE 0 END) AS ct
      FROM tf GROUP BY tok
    ),
    tot AS (
      SELECT sum(cr) AS Tr, sum(ct) AS Tt, count(*) AS V FROM vocab
    ),
    agg AS (
      SELECT doc_id,
             CAST(sum(tf) AS BIGINT) AS dl,
             sum(CAST(tf * round(
                 ln((ct + 1.0) / (Tt + V)) - ln((cr + 1.0) / (Tr + V)),
               4) AS DECIMAL(28,4))) AS s
      FROM tf JOIN vocab USING (tok), tot
      GROUP BY doc_id
    )
    SELECT doc_id, dl,
           CAST(s AS DOUBLE) AS dsir_logweight,
           -- exact half-away-from-zero rounding of s/dl to 4 dp in
           -- integer arithmetic (round() on doubles diverges between
           -- engines at exact .5 ties like -0.1488/32)
           (CASE WHEN s < 0 THEN -1 ELSE 1 END)
             * ((abs(CAST(s * 10000 AS BIGINT)) * 2 + dl) // (dl * 2))
             / 10000.0 AS avg_logratio
    FROM agg
    """,
    description="DSIR-style importance log-weights "
    "(operators/sampling.dsir_logweights; Xie et al. 2023): every "
    "document in the raw pool scored by sum_tok tf * [ln p_target - "
    "ln p_raw] with both unigram models add-one smoothed over the "
    "shared raw vocabulary — the data-selection recipe that picks "
    "raw-corpus documents distributionally closest to a target "
    "domain (here lang='en' as the in-domain exemplar set). One "
    "token explode + (id, tgt, tok) aggregate feeds both vocabulary "
    "counts (target counts ride the same shuffle) and the scoring "
    "join on the tok key; totals are a 1-row broadcast; per-token "
    "log-ratios rounded and summed as exact DECIMALs (the bm25 "
    "order-independence rule).",
    tags=("text", "sampling", "aggregate"),
)
def q117_dsir_logweights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from bigdata_kafka_2_spark.operators.sampling import dsir_logweights

    d = read_table(spark, sf_dir, "documents")
    return dsir_logweights(d, F.col("lang") == "en")


@register(
    "q120_kmv_distinct_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT lang, tok FROM (
        SELECT lang,
               unnest(string_split_regex({_NORM_SQL}, ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    hashed AS (
      SELECT DISTINCT lang,
             CAST('0x' || substr(md5(tok || ':7'), 1, 15) AS BIGINT)
               AS h
      FROM toks
    ),
    ranked AS (
      SELECT lang, h,
             row_number() OVER (PARTITION BY lang ORDER BY h) AS r
      FROM hashed
    ),
    agg AS (
      SELECT lang, max(CASE WHEN r = 64 THEN h END) AS hk,
             count(*) AS nd
      FROM ranked GROUP BY lang
    )
    SELECT lang,
           CAST(CASE WHEN nd < 64 THEN nd
                ELSE floor(63.0 * (1152921504606846976.0 / hk))
                END AS BIGINT) AS est_distinct
    FROM agg
    """,
    description="KMV (k-minimum-values) distinct-token estimate per "
    "language (operators/sketch.kmv_distinct, k=64, Bar-Yossef et "
    "al. 2002): the mergeable approximate-distinct sketch that "
    "replaces q18's exact count-distinct when the value set is "
    "vocabulary-sized. Build is an Arrow-batched per-partition fold "
    "to <= k smallest distinct hashes per group (bounded state, a "
    "guaranteed superset of the global bottom-k), so the shuffle "
    "carries partitions*k rows instead of the full distinct set; "
    "estimate = (k-1)*M/h_k with M = 2^60 exactly double-"
    "representable, giving bit-identical IEEE arithmetic in Spark "
    "and the SQL oracle (portable md5_15 hash family, q39's "
    "pattern). Deterministic and partition-invariant: the k-th "
    "smallest distinct hash does not depend on data layout.",
    tags=("text", "aggregate", "sketch"),
)
def q120_kmv_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from bigdata_kafka_2_spark.operators.sketch import kmv_distinct
    from bigdata_kafka_2_spark.operators.text import normalize_text

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        "lang",
        F.explode(F.split(normalize_text("text"), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    return kmv_distinct(
        toks, "tok", "lang", k=64, seed=7, hash_fn="md5_15"
    )


#: Multi-term curation queries for the retrieval-eval family (q121).
#: Terms chosen to be present at every driver SF; three terms per
#: query give a graded 1-3 relevance (distinct query terms matched).
_NDCG_QUERIES = {
    "q_exec": ("hash", "join", "scan"),
    "q_ops": ("filter", "sort", "query"),
    "q_corpus": ("data", "table", "spark"),
}


def _judged_prefix_sql() -> str:
    """The shared CTE chain both retrieval-eval oracles (q121 nDCG,
    q178 precision/recall/MRR) start from: tokenized docs -> tf/dl ->
    BM25 per-term contributions -> (query, doc, score) -> judged
    lists with graded relevance from the BM25 rank."""
    all_terms = tuple(t for ts in _NDCG_QUERIES.values() for t in ts)
    qvals = ", ".join(
        f"('{qid}', '{t}')" for qid, ts in _NDCG_QUERIES.items() for t in ts
    )
    return f"""
    WITH {_TOKS_DOC_CTE},
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks_doc GROUP BY doc_id, tok
    ),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (
      SELECT (SELECT count(*) FROM documents) AS nd,
             (SELECT avg(dl) FROM dl) AS avgdl
    ),
    queries(query_id, tok) AS (VALUES {qvals}),
    qtf AS (
      SELECT * FROM tf WHERE tok IN {all_terms!r}
    ),
    dfq AS (SELECT tok, count(*) AS doc_freq FROM qtf GROUP BY tok),
    contrib AS (
      SELECT qq.query_id, q.doc_id,
             CAST(round(
               ln(1.0 + (nd - doc_freq + 0.5) / (doc_freq + 0.5))
               * q.tf * (1.2 + 1.0)
               / (q.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl))
             , 4) AS DECIMAL(18,4)) AS bm25_term,
             q.tf, q.tok
      FROM qtf q
      JOIN queries qq USING (tok)
      JOIN dfq USING (tok)
      JOIN dl ON dl.doc_id = q.doc_id
      CROSS JOIN stats
    ),
    scored AS (
      SELECT query_id, doc_id,
             CAST(sum(tf) AS BIGINT) AS score,
             CAST(sum(bm25_term) AS DOUBLE) AS bm25
      FROM contrib GROUP BY query_id, doc_id
    ),
    judged AS (
      SELECT query_id, doc_id, score,
             CASE WHEN bm25_rank <= 3 THEN 3
                  WHEN bm25_rank <= 10 THEN 2
                  WHEN bm25_rank <= 30 THEN 1
                  ELSE 0 END AS rel
      FROM (
        SELECT *, row_number() OVER (
          PARTITION BY query_id ORDER BY bm25 DESC, doc_id ASC
        ) AS bm25_rank
        FROM scored
      )
    )
    """


def _ndcg_oracle(sf_dir: str | None = None) -> str:
    """DuckDB transcription of q121: multi-term BM25 judged lists →
    nDCG@10 windows, with the SAME Python-computed log2 discount
    literals the Spark operator embeds (no engine libm anywhere) and
    the q117 integer half-away-from-zero rounding for the final
    ratio."""
    from bigdata_kafka_2_spark.operators.evalmetrics import log2_discounts

    disc = "[" + ", ".join(repr(d) for d in log2_discounts(10)) + "]"
    return _judged_prefix_sql() + f""",
    ranked AS (
      SELECT query_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id ASC
             ) AS r1,
             row_number() OVER (
               PARTITION BY query_id ORDER BY rel DESC, doc_id ASC
             ) AS r2,
             (pow(2.0, rel) - 1.0) AS gain
      FROM judged
    ),
    terms AS (
      SELECT query_id,
             CASE WHEN r1 <= 10
               THEN CAST(round(gain / list_extract({disc}, r1), 6)
                         AS DECIMAL(28,6))
               ELSE CAST(0 AS DECIMAL(28,6)) END AS dt,
             CASE WHEN r2 <= 10
               THEN CAST(round(gain / list_extract({disc}, r2), 6)
                         AS DECIMAL(28,6))
               ELSE CAST(0 AS DECIMAL(28,6)) END AS it
      FROM ranked
    ),
    agg AS (
      SELECT query_id,
             CAST(sum(dt) * 1000000 AS BIGINT) AS a,
             CAST(sum(it) * 1000000 AS BIGINT) AS b
      FROM terms GROUP BY query_id
    )
    SELECT query_id,
           CASE WHEN b = 0 THEN 0.0
                ELSE ((a * 20000 + b) // (b * 2)) / 10000.0
           END AS ndcg
    FROM agg
    """


@register(
    "q121_ndcg_bm25",
    oracle=_ndcg_oracle,
    description="Retrieval-quality evaluation: nDCG@10 per multi-term "
    "curation query (operators/evalmetrics.ndcg_at_k over "
    "text.bm25_term_scores), answering the at-scale question a "
    "curation team actually asks: how faithfully does the CHEAP "
    "tf-only ranking reproduce the full BM25 ordering? The judged "
    "system ranks candidates by summed raw tf; graded relevance "
    "derives from the BM25 rank (top-3 -> 3, top-10 -> 2, top-30 -> "
    "1) — a pseudo-relevance transfer eval, so the metric measures "
    "real ranking disagreement (dl-normalization + idf weighting), "
    "not an identity. Determinism: DCG/IDCG rank discounts are "
    "Python-precomputed double literals shared verbatim with the "
    "oracle (no engine libm), per-rank terms are 6-dp exact "
    "DECIMALs, the final ratio rounds half-away-from-zero in "
    "integer arithmetic (the q117 tie rule), and all rank ties "
    "break on doc_id. Plan: the posting list filters to the query "
    "terms before any join; the query map is a broadcast; the "
    "bm25-rank window and the two DCG windows share one query-keyed "
    "exchange.",
    tags=("text", "window", "aggregate"),
)
def q121_ndcg_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.evalmetrics import ndcg_at_k

    return ndcg_at_k(
        _bm25_judged_lists(spark, sf_dir),
        query_col="query_id",
        id_col="doc_id",
        score_col="score",
        rel_col="rel",
        k=10,
    )


def _bm25_judged_lists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shared judged-list construction for the retrieval-eval
    queries (q121 nDCG, q178 precision/recall/MRR): tf-only system
    scores with graded relevance transferred from the full BM25
    rank (top-3 -> 3, top-10 -> 2, top-30 -> 1)."""
    d = read_table(spark, sf_dir, "documents")
    all_terms = [t for ts in _NDCG_QUERIES.values() for t in ts]
    ts = TX.bm25_term_scores(d, all_terms)
    qmap = F.broadcast(
        spark.createDataFrame(
            [(qid, t) for qid, terms in _NDCG_QUERIES.items() for t in terms],
            "query_id string, tok string",
        )
    )
    from pyspark.sql import Window

    scored = (
        ts.join(qmap, on="tok")
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum("tf").cast("long").alias("score"),
            F.sum("bm25_term").cast("double").alias("bm25"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("bm25").desc(), F.col("doc_id").asc()
    )
    return scored.withColumn(
        "__br", F.row_number().over(w)
    ).select(
        "query_id",
        "doc_id",
        "score",
        F.when(F.col("__br") <= 3, 3)
        .when(F.col("__br") <= 10, 2)
        .when(F.col("__br") <= 30, 1)
        .otherwise(0)
        .alias("rel"),
    )


def _rank_eval_oracle(sf_dir: str | None = None) -> str:
    """DuckDB transcription of q178: the shared judged lists, one
    rank window, per-query precision/recall@10 + reciprocal rank —
    every ratio a small-integer division rounded to 6 dp."""
    return _judged_prefix_sql() + """,
    ranked AS (
      SELECT query_id, rel,
             row_number() OVER (
               PARTITION BY query_id ORDER BY score DESC, doc_id ASC
             ) AS r
      FROM judged
    ),
    agg AS (
      SELECT query_id,
             CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel,
             CAST(sum(CASE WHEN rel > 0 AND r <= 10 THEN 1 ELSE 0 END)
                  AS BIGINT) AS hits_at_k,
             min(CASE WHEN rel > 0 THEN r END) AS frr
      FROM ranked GROUP BY query_id
    )
    SELECT query_id, n_rel, hits_at_k,
           round(hits_at_k / 10.0, 6) AS precision_k,
           CASE WHEN n_rel > 0
                THEN round(hits_at_k * 1.0 / n_rel, 6) END AS recall_k,
           CAST(frr AS BIGINT) AS first_rel_rank,
           CASE WHEN frr <= 10 THEN round(1.0 / frr, 6)
                ELSE 0.0 END AS rr_at_k
    FROM agg
    """


@register(
    "q178_rank_eval",
    oracle=_rank_eval_oracle,
    description="Set-based retrieval evaluation "
    "(operators/evalmetrics.rank_eval_at_k): per curation query, "
    "precision@10, recall@10, hit count, and the reciprocal rank of "
    "the first relevant result (mean across queries = MRR) over the "
    "SAME tf-vs-BM25 judged lists as q121's nDCG — the binary-"
    "relevance half of a retrieval eval (nDCG answers 'how good is "
    "the whole ordering', RR/precision answer 'how fast do users "
    "hit something relevant'). Every ratio is a small-integer "
    "division rounded to 6 dp — identical IEEE in both engines, no "
    "summation order anywhere; ONE rank window per query key.",
    tags=("text", "window", "aggregate"),
)
def q178_rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.evalmetrics import rank_eval_at_k

    return rank_eval_at_k(
        _bm25_judged_lists(spark, sf_dir),
        query_col="query_id",
        id_col="doc_id",
        score_col="score",
        rel_col="rel",
        k=10,
    )


def _q123_oracle(sf_dir: str) -> str:
    """Golden-reference oracle for BPE tokenization: the SAME
    independent pure-Python Sennrich learner q114's oracle uses
    (re-implemented here, no shared code with operators/bpe.py)
    learns 20 merges, tokenizes every document, and emits per-doc
    token count + an md5 fingerprint of the token stream as a VALUES
    literal."""
    import hashlib
    import re
    from collections import Counter

    import pyarrow.parquet as pq

    tbl = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    norm_words = {}
    wf: Counter = Counter()
    for i, t in zip(ids, texts):
        words = []
        if t is not None:
            norm = re.sub(r"\s+", " ", t.lower()).strip()
            words = [w for w in norm.split(" ") if w]
        norm_words[i] = words
        wf.update(words)
    sym = {w: list(w) + ["</w>"] for w in wf}
    for _ in range(20):
        pc: Counter = Counter()
        for w, n in wf.items():
            s = sym[w]
            for j in range(len(s) - 1):
                pc[(s[j], s[j + 1])] += n
        if not pc:
            break
        top = max(pc.values())
        if top < 2:
            break
        a, b = sorted(p for p, c in pc.items() if c == top)[0]
        for w in sym:
            s = sym[w]
            out, jm = [], False
            for tok in s:
                if out and not jm and out[-1] == a and tok == b:
                    out[-1] = a + b
                    jm = True
                else:
                    out.append(tok)
                    jm = False
            sym[w] = out
    rows = []
    for i in ids:
        toks = [t for w in norm_words[i] for t in sym.get(w, [])]
        fp = hashlib.md5("\x01".join(toks).encode()).hexdigest()
        rows.append((i, len(toks), fp))
    vals = ",\n      ".join(
        f"({i}, {n}, '{fp}')" for i, n, fp in rows
    )
    return f"""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_bpe_tokens AS BIGINT) AS n_bpe_tokens,
           bpe_fp
    FROM (VALUES
      {vals}
    ) AS t(doc_id, n_bpe_tokens, bpe_fp)
    """


@register(
    "q123_bpe_tokenize",
    oracle=_q123_oracle,
    description="BPE tokenization of the full corpus with the learned "
    "merge list (operators/bpe.apply_bpe over learn_bpe_merges' 20 "
    "merges): the deployment half of the tokenizer family — q114 "
    "trains the vocabulary, this runs it over every document. The "
    "merge folds apply to the DISTINCT-WORD table only (vocabulary-"
    "sized) and each document picks its tokenization up through a "
    "broadcast word lookup; word order is restored by a per-doc "
    "sort aggregate — the corpus is scanned once, tokenized "
    "row-locally, never re-folded per occurrence. Output is the "
    "per-doc token count plus an md5 fingerprint of the exact token "
    "stream, hash-compared against an INDEPENDENT pure-Python "
    "Sennrich learner+tokenizer resolved at oracle time (q114's "
    "golden-reference pattern) — every merge, boundary and token "
    "order is checked, strictly stronger than rows-only for an "
    "iterative algorithm no single SQL query can express.",
    tags=("text", "join", "aggregate"),
)
def q123_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators import bpe as BP

    import hashlib

    d = read_table(spark, sf_dir, "documents")
    merges = BP.learn_bpe_merges(d, n_merges=20, min_pair_count=2)
    toked = BP.apply_bpe(d, merges)
    # left join back to the full id set: a document with no words
    # produces no posting rows (and so no groupBy row) but still owns
    # an output row — zero tokens, fingerprint of the empty stream.
    empty_fp = hashlib.md5(b"").hexdigest()
    return (
        d.select("doc_id")
        .join(toked, on="doc_id", how="left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_bpe_tokens"), F.lit(0).cast("long")).alias(
                "n_bpe_tokens"
            ),
            F.coalesce(
                F.md5(F.concat_ws("\x01", F.col("bpe_tokens"))),
                F.lit(empty_fp),
            ).alias("bpe_fp"),
        )
    )


@register(
    "q124_bigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex({_NORM_SQL}, ' '),
                         x -> x <> '') AS l
      FROM documents
    ),
    bi AS (
      SELECT doc_id, l[i] AS w1, l[i + 1] AS w2
      FROM toks, unnest(generate_series(1, len(l) - 1)) AS t(i)
    ),
    tf AS (
      SELECT doc_id, w1, w2, count(*) AS tf FROM bi GROUP BY 1, 2, 3
    ),
    c2 AS (SELECT w1, w2, sum(tf) AS c2 FROM tf GROUP BY 1, 2),
    c1 AS (SELECT w1, sum(c2) AS c1 FROM c2 GROUP BY 1),
    h AS (SELECT count(*) AS H FROM c1),
    agg AS (
      SELECT doc_id,
             CAST(sum(tf) AS BIGINT) AS n_bigrams,
             sum(CAST(tf * round(ln((c2 + 1.0) / (c1 + H)), 4)
                      AS DECIMAL(28,4))) AS s
      FROM tf JOIN c2 USING (w1, w2) JOIN c1 USING (w1), h
      GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams,
           (CASE WHEN s < 0 THEN -1 ELSE 1 END)
             * ((abs(CAST(s * 10000 AS BIGINT)) * 2 + n_bigrams)
                // (n_bigrams * 2))
             / 10000.0 AS logprob
    FROM agg
    """,
    description="Bigram language-model quality scoring "
    "(operators/text.bigram_logprob_scores): per-document mean "
    "bigram log-probability under the corpus's own add-one-smoothed "
    "bigram LM — the sequence-aware upgrade of q80's unigram KenLM "
    "stand-in (word salad with plausible unigrams but implausible "
    "transitions scores low). Bigrams are built ROW-LOCALLY via an "
    "indexed transform over the token array (no window, no "
    "self-join); one (doc, w1, w2) aggregate feeds both the corpus "
    "pair counts and the scoring join on the same key; history "
    "counts reduce from pair counts; H is a 1-row broadcast. "
    "Contributions 4-dp exact DECIMALs; the average rounds "
    "half-away-from-zero in integer arithmetic (the q117 tie rule).",
    tags=("text", "aggregate"),
)
def q124_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.bigram_logprob_scores(d)


@register(
    "q129_token_spectrum",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
    ),
    vocab AS (
      SELECT tok, count(*) AS occurrences
      FROM toks WHERE tok <> '' GROUP BY tok
    )
    SELECT occurrences, CAST(count(*) AS BIGINT) AS n_types
    FROM vocab GROUP BY occurrences
    """,
    description="Zipf frequency-of-frequencies spectrum "
    "(operators/text.token_frequency_spectrum): how many distinct "
    "token TYPES occur exactly c times — the corpus profile behind "
    "vocabulary cutoffs and hapax pruning (the occurrences=1 row is "
    "the hapax count). Two chained map-side-combined hash "
    "aggregates: corpus tokens -> vocabulary -> spectrum; no row "
    "carries text past the first aggregate and output is bounded by "
    "the number of distinct frequency values (tiny under the Zipf "
    "tail).",
    tags=("text", "profile"),
)
def q129_token_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.token_frequency_spectrum(d)


def _vocab_growth_ctes() -> str:
    """The shared CTE chain of the vocabulary-growth curve (q130's
    oracle and q189's Heaps fit): per-doc token counts + first-doc
    type attribution -> cumulative sums -> decile thresholds."""
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
      FROM documents
    ),
    tt AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
    pd AS (SELECT doc_id, count(*) AS nt FROM tt GROUP BY 1),
    nw AS (
      SELECT fd AS doc_id, count(*) AS nv
      FROM (SELECT tok, min(doc_id) AS fd FROM tt GROUP BY tok)
      GROUP BY 1
    ),
    base AS (
      SELECT d.doc_id, coalesce(nt, 0) AS nt, coalesce(nv, 0) AS nv
      FROM documents d LEFT JOIN pd USING (doc_id)
        LEFT JOIN nw USING (doc_id)
    ),
    cum AS (
      SELECT doc_id,
             sum(nt) OVER (ORDER BY doc_id) AS ct,
             sum(nv) OVER (ORDER BY doc_id) AS cv
      FROM base
    ),
    thr AS (
      SELECT i AS checkpoint, q[i] AS t
      FROM (
        SELECT quantile_cont(doc_id,
          [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9, 1.0]) AS q
        FROM documents
      ), generate_series(1, 10) g(i)
    )
    """


_VOCAB_GROWTH_SELECT = """
    SELECT checkpoint,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(ct) AS BIGINT) AS cum_tokens,
           CAST(max(cv) AS BIGINT) AS vocab_size
    FROM cum JOIN thr ON doc_id <= t
    GROUP BY checkpoint"""


@register(
    "q130_vocab_growth",
    oracle=_vocab_growth_ctes() + _VOCAB_GROWTH_SELECT,
    description="Heaps-law vocabulary-growth curve "
    "(operators/text.vocab_growth): cumulative tokens and cumulative "
    "DISTINCT types at each doc_id-order decile. 'Distinct so far' "
    "is attributed to each type's FIRST document (min-id hash "
    "aggregate) so per-doc new-type counts sum to the running "
    "vocabulary — no running-distinct state; both cumulative sums "
    "run through the range-bucketed global_prefix_sum (no "
    "single-partition window), and the decile thresholds are one "
    "broadcast exact-percentile row (the q23 Spark/DuckDB "
    "interpolation parity).",
    tags=("text", "profile", "window"),
)
def q130_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.vocab_growth(d)


@register(
    "q135_budget_fill",
    oracle=f"""
    WITH {_TOKS_DOC_CTE},
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks_doc GROUP BY 1, 2
    ),
    vocab AS (SELECT tok, sum(tf) AS ctf FROM tf GROUP BY tok),
    tot AS (SELECT sum(ctf) AS T, count(*) AS V FROM vocab),
    agg AS (
      SELECT doc_id,
             CAST(sum(tf) AS BIGINT) AS dl,
             sum(CAST(tf * round(ln((ctf + 1.0) / (T + V)), 4)
                      AS DECIMAL(28,4))) AS s
      FROM tf JOIN vocab USING (tok), tot
      GROUP BY doc_id
    ),
    scored AS (
      SELECT doc_id, dl,
             (CASE WHEN s < 0 THEN -1 ELSE 1 END)
               * ((abs(CAST(s * 10000 AS BIGINT)) * 2 + dl) // (dl * 2))
               / 10000.0 AS logprob
      FROM agg
    ),
    cum AS (
      SELECT doc_id, dl,
             CAST(coalesce(sum(dl) OVER (
               ORDER BY logprob DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS BIGINT) AS cum_before
      FROM scored
    ),
    kept AS (SELECT * FROM cum WHERE cum_before < 10000)
    SELECT lang, count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS tokens
    FROM kept JOIN documents USING (doc_id)
    GROUP BY lang
    """,
    description="Token-budget-constrained selection "
    "(operators/sampling.budget_fill over q80's unigram-LM scores): "
    "keep the highest-scoring documents until their cumulative token "
    "count reaches a 10k-token budget — the greedy knapsack rule a "
    "curation run uses to fill a fixed training budget with the best "
    "data (a fraction-based sample cannot express a TOKEN budget). "
    "Deterministic total order (score DESC, doc_id); a row is kept "
    "iff strictly-better rows are under budget, so the output "
    "overshoots by at most one document. The cumulative weight runs "
    "through the range-bucketed global_prefix_sum — no "
    "single-partition window; the oracle transcribes the window "
    "cumsum exactly.",
    tags=("sampling", "text"),
)
def q135_budget_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.sampling import budget_fill

    d = read_table(spark, sf_dir, "documents")
    kept = budget_fill(
        TX.unigram_logprob_scores(d), "logprob", "dl", 10_000
    )
    return (
        kept.join(d.select("doc_id", "lang"), on="doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("dl").cast("long").alias("tokens"),
        )
    )


@register(
    "q137_compressibility",
    oracle=None,  # zlib is not expressible in SQL — rows-only +
    # planted-fixture/determinism tests (the q39/q67 precedent before
    # their hash families landed)
    description="Per-document zlib compressibility "
    "(operators/text.compressibility_profile): compressed/raw byte "
    "ratio — the quality signal curation stacks band alongside "
    "entropy and perplexity (boilerplate/templated text compresses "
    "far below natural prose; spam sits at the extremes in both "
    "directions). One Arrow-batched pandas_udf projection, row-local "
    "— no shuffle; deterministic for the fixed zlib level.",
    tags=("text", "profile", "udf"),
)
def q137_compressibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.compressibility_profile(d)


@register(
    "q140_chunk_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t FROM documents
    ),
    chunks AS (
      SELECT doc_id, j AS chunk_idx,
             list_aggregate(t[j*16+1 : j*16+16], 'string_agg', ' ')
               AS chunk_text
      FROM toks,
           UNNEST(generate_series(
             0, CAST(floor((len(t) + 15) / 16.0) AS BIGINT) - 1)) AS g(j)
    ),
    fp AS (
      SELECT doc_id, md5(chunk_text) AS h
      FROM chunks WHERE chunk_text <> ''
    ),
    grp AS (SELECT h, count(*) AS c FROM fp GROUP BY h),
    per_doc AS (SELECT doc_id, lang FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(DISTINCT h) AS BIGINT) AS n_unique,
           CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_in_dup_groups
    FROM fp JOIN grp USING (h) JOIN per_doc USING (doc_id)
    GROUP BY lang
    """,
    description="Chunk-level exact dedup profile "
    "(operators/text.chunk_documents + fingerprint): 16-token "
    "disjoint chunks fingerprinted with md5 and grouped — per "
    "language, how many chunks exist, how many are unique, and how "
    "many sit in a corpus-repeated group. The RAG-ingestion "
    "counterpart of document dedup: repeated passages (boilerplate, "
    "headers, licenses) dominate retrieval indexes long before whole "
    "documents collide. Chunking is row-local codegen (q77), the "
    "fingerprint groupBy is the q40 hash-aggregate shape on 8-byte "
    "keys — no text crosses the dedup shuffle beyond the chunk "
    "fingerprint.",
    tags=("text", "dedup"),
)
def q140_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    chunks = TX.chunk_documents(d, chunk_tokens=16, stride=16)
    fp = chunks.select(
        "doc_id", F.md5(F.col("chunk_text")).alias("h")
    )
    grp = fp.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    return (
        fp.join(grp, on="h")
        .join(d.select("doc_id", "lang"), on="doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_chunks"),
            F.countDistinct("h").cast("long").alias("n_unique"),
            F.sum((F.col("c") > 1).cast("int")).cast("long").alias(
                "n_in_dup_groups"
            ),
        )
    )


@register(
    "q145_domain_similarity",
    oracle=f"""
    WITH toks AS (
      SELECT source, string_split({_NORM_SQL}, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT DISTINCT source,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS g(i)
      WHERE t[i] || ' ' || t[i+1] || ' ' || t[i+2] <> ''
    ),
    seeds AS (SELECT unnest(generate_series(0, 31)) AS seed),
    mins AS (
      SELECT source, seed,
             min(CAST('0x' || substr(
                   md5(shingle || ':' || CAST(seed AS VARCHAR)), 1, 15)
                 AS BIGINT)) AS h
      FROM sh, seeds
      GROUP BY 1, 2
    )
    SELECT a.source AS domain_a, b.source AS domain_b,
           CAST(sum(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS BIGINT)
             AS n_match,
           CAST(sum(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS DOUBLE)
             / 32.0 AS jaccard_est
    FROM mins a JOIN mins b ON a.seed = b.seed AND a.source < b.source
    GROUP BY 1, 2
    """,
    description="Pairwise domain similarity matrix via mergeable "
    "MinHash sketches (operators/sketch.domain_minhash_similarity): "
    "per-domain signatures are 32 per-seed minima of the portable "
    "md5_15 shingle hash — min is associative, so the groupBy "
    "shuffles |domains| partial rows per partition, never the "
    "shingles — and the pair stage is a broadcast nested-loop over "
    "the tiny signature table. The corpus-level overlap measure "
    "mixture design and contamination triage start from; "
    "jaccard_est = n_match/32 is exact in binary, so the whole "
    "matrix hash-checks with no rounding discipline.",
    tags=("sketch", "dedup", "aggregate"),
)
def q145_domain_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.sketch import (
        domain_minhash_similarity,
    )

    d = read_table(spark, sf_dir, "documents")
    return domain_minhash_similarity(d)


@register(
    "q157_boolean_search",
    oracle=f"""
    WITH {_TOKS_DOC_CTE},
    q AS (
      SELECT doc_id,
             count(DISTINCT CASE WHEN tok IN ('data', 'table')
                                 THEN tok END) AS n_must,
             count(DISTINCT CASE WHEN tok IN ('spark', 'hash')
                                 THEN tok END) AS n_should,
             count(DISTINCT CASE WHEN tok = 'scan'
                                 THEN tok END) AS n_not
      FROM toks_doc
      WHERE tok IN ('data', 'table', 'spark', 'hash', 'scan')
      GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_must AS BIGINT) AS n_must,
           CAST(n_should AS BIGINT) AS n_should
    FROM q
    WHERE n_must = 2 AND n_should >= 1 AND n_not = 0
    """,
    description="Boolean retrieval over the inverted index "
    "(operators/text.boolean_search): docs matching data AND table "
    "AND (spark OR hash) AND NOT scan — the AND/OR/NOT layer a "
    "retrieval stack puts under its BM25 scorer. The posting list "
    "filters to the five query terms BEFORE any aggregation (work ∝ "
    "query-term postings, not corpus), then ONE per-doc aggregate "
    "turns the classic k-way posting intersection into a "
    "distinct-count == k check and the NOT into a zero-count check "
    "in the same pass — no per-term self-joins, no second scan.",
    tags=("text", "retrieval"),
)
def q157_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.text import boolean_search

    d = read_table(spark, sf_dir, "documents")
    return boolean_search(
        d,
        must=["data", "table"],
        should=["spark", "hash"],
        must_not=["scan"],
    )


@register(
    "q164_auc_feature_screen",
    oracle=r"""
    WITH stats AS (
      SELECT doc_id,
             len(toks) AS n_tokens,
             round(length(norm) * 1.0 / greatest(len(toks), 1), 4) AS cpt,
             round(len(list_distinct(toks)) * 1.0
                   / greatest(len(toks), 1), 4) AS ttr
      FROM (
        SELECT doc_id,
               coalesce(trim(regexp_replace(lower(text), '\s+', ' ',
                                            'g')), '') AS norm,
               string_split_regex(
                 coalesce(trim(regexp_replace(lower(text), '\s+', ' ',
                                              'g')), ''), ' ') AS toks
        FROM documents
      )
    ),
    lab AS (
      SELECT cpt AS s,
             CASE WHEN n_tokens >= 20 AND n_tokens <= 90
                       AND cpt >= 4.5 AND cpt <= 6.0
                       AND ttr >= 0.45
                  THEN 1 ELSE 0 END AS y
      FROM stats
    ),
    g AS (SELECT s, count(*) AS n, sum(y) AS p FROM lab GROUP BY s),
    r AS (
      SELECT s, n, p,
             coalesce(sum(n) OVER (
               ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM g
    ),
    a AS (
      SELECT sum(p * (2 * before + n + 1)) AS s2,
             sum(p) AS bigp, sum(n) AS t
      FROM r
    )
    SELECT CASE WHEN bigp > 0 AND t - bigp > 0
                THEN round(CAST(s2 - bigp * (bigp + 1) AS DOUBLE)
                           / CAST(2 * bigp * (t - bigp) AS DOUBLE), 6)
           END AS auc,
           CAST(bigp AS BIGINT) AS n_pos,
           CAST(t - bigp AS BIGINT) AS n_neg
    FROM a
    """,
    description="Univariate feature screening via EXACT Mann-Whitney "
    "AUC (operators/evalmetrics.auc_exact): how well chars-per-token "
    "alone predicts the composed Gopher keep decision — the "
    "probability a random kept doc out-scores a random dropped one, "
    "with proper average-rank tie handling. All-integer "
    "construction: distinct-score groups, EXCLUSIVE global prefix "
    "count via the range-bucketed machinery (no single-partition "
    "window), rank-sums as exact DECIMAL(38,0) (BIGINT would "
    "overflow near T² at corpus scale), ONE double division at the "
    "end — bit-identical in any engine.",
    tags=("text", "aggregate", "ml-eval"),
)
def q164_auc_feature_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.evalmetrics import auc_exact
    from bigdata_kafka_2_spark.operators.text import quality_filter_flags

    d = read_table(spark, sf_dir, "documents")
    qf = quality_filter_flags(d)
    return auc_exact(qf, "cpt", "keep")


@register(
    "q169_more_like_this",
    oracle=f"""
    WITH {_TOKS_DOC_CTE},
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks_doc GROUP BY doc_id, tok
    ),
    docfreq AS (SELECT tok, count(*) AS doc_freq FROM tf GROUP BY tok),
    n AS (SELECT count(*) AS nd FROM documents),
    w AS (
      SELECT doc_id, tok,
             CAST(round(tf * (ln((1.0 + nd) / (1.0 + doc_freq)) + 1.0),
                        4) AS DECIMAL(18,4)) AS wv
      FROM tf JOIN docfreq USING (tok) CROSS JOIN n
    ),
    norms AS (
      SELECT doc_id, sqrt(CAST(sum(wv * wv) AS DOUBLE)) AS nrm
      FROM w GROUP BY doc_id
    ),
    probe AS (SELECT tok, wv AS wp FROM w WHERE doc_id = 7),
    pn AS (SELECT nrm AS pnorm FROM norms WHERE doc_id = 7),
    dots AS (
      SELECT w.doc_id, sum(w.wv * p.wp) AS dot
      FROM w JOIN probe p USING (tok)
      WHERE w.doc_id <> 7 GROUP BY 1
    )
    SELECT d.doc_id,
           round(CAST(d.dot AS DOUBLE) / (n2.nrm * pn.pnorm), 4)
             AS cosine
    FROM dots d JOIN norms n2 USING (doc_id) CROSS JOIN pn
    ORDER BY CAST(d.dot AS DOUBLE) / (n2.nrm * pn.pnorm) DESC,
             d.doc_id ASC
    LIMIT 10
    """,
    description="Sparse 'more like this' (operators/text."
    "more_like_this): the 10 documents most TF-IDF-cosine-similar to "
    "doc 7 — Lucene's MLT, the lexical complement to the dense "
    "embedding ANN stack. The probe's weight vector broadcasts onto "
    "the posting list so dot products are one tok-keyed join bounded "
    "by the probe terms' postings (work ∝ probe postings, never "
    "corpus²); per-doc norms from one map-side aggregate over the "
    "same TF-IDF table; weight sums as exact 4-dp DECIMAL products, "
    "one double sqrt/division at the end, (cosine DESC, id) "
    "deterministic ties.",
    tags=("text", "retrieval"),
)
def q169_more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.text import more_like_this

    d = read_table(spark, sf_dir, "documents")
    return more_like_this(d, probe_id=7, k=10)


@register(
    "q175_hybrid_rrf",
    oracle=f"""
    WITH {_TOKS_DOC_CTE},
    tf AS (
      SELECT doc_id, tok, count(*) AS tf FROM toks_doc GROUP BY doc_id, tok
    ),
    dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id),
    stats AS (
      SELECT (SELECT count(*) FROM documents) AS nd,
             (SELECT avg(dl) FROM dl) AS avgdl
    ),
    qtf AS (
      SELECT * FROM tf WHERE tok IN {_BM25_QUERY!r}
    ),
    dfq AS (SELECT tok, count(*) AS doc_freq FROM qtf GROUP BY tok),
    bm AS (
      SELECT q.doc_id,
             CAST(sum(CAST(round(
               ln(1.0 + (nd - doc_freq + 0.5) / (doc_freq + 0.5))
               * q.tf * (1.2 + 1.0)
               / (q.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / avgdl))
             , 4) AS DECIMAL(18,4))) AS DOUBLE) AS bm25
      FROM qtf q
      JOIN dfq USING (tok)
      JOIN dl ON dl.doc_id = q.doc_id
      CROSS JOIN stats
      GROUP BY q.doc_id
    ),
    lex AS (
      SELECT doc_id, CAST(r AS INT) AS rank_lex FROM (
        SELECT doc_id,
               row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r
        FROM bm
      ) WHERE r <= 50
    ),
    den AS (
      SELECT doc_id, CAST(r AS INT) AS rank_dense FROM (
        SELECT e.vec_id AS doc_id,
               row_number() OVER (
                 ORDER BY round(CAST((CASE WHEN (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) = 0.0 THEN 0.0 ELSE list_reduce(list_prepend(0.0, list_transform(list_zip(e.embedding, p.embedding), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (acc, t) -> acc + t) / (sqrt(list_reduce(list_prepend(0.0, list_transform(e.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t)) * sqrt(list_reduce(list_prepend(0.0, list_transform(p.embedding, t -> CAST(t AS DOUBLE) * CAST(t AS DOUBLE))), (acc, t) -> acc + t))) END) AS DOUBLE), 4) DESC,
                 e.vec_id ASC) AS r
        FROM embeddings e,
             (SELECT embedding FROM embeddings WHERE vec_id = 0) p
        WHERE e.vec_id <> 0
      ) WHERE r <= 50
    ),
    fused AS (
      SELECT coalesce(l.doc_id, d.doc_id) AS doc_id,
             l.rank_lex, d.rank_dense,
             round(coalesce(1.0 / (60 + l.rank_lex), 0.0)
                   + coalesce(1.0 / (60 + d.rank_dense), 0.0), 6)
               AS rrf
      FROM lex l FULL OUTER JOIN den d ON l.doc_id = d.doc_id
    )
    SELECT doc_id, rank_lex, rank_dense, rrf
    FROM fused ORDER BY rrf DESC, doc_id ASC LIMIT 10
    """,
    description="HYBRID retrieval via reciprocal-rank fusion "
    "(operators/evalmetrics.rrf_fuse, Cormack et al. 2009): the "
    "BM25 lexical top-50 (q46's scorer) fused with the dense "
    "embedding cosine top-50 (q50's probe), rrf = Σ 1/(60+rank) "
    "over the union — the modern retrieval-stack combiner, needing "
    "no score calibration because it consumes only ranks. The two "
    "retrieval tiers do the corpus-scale work with their own "
    "scale-correct plans; the fusion is a full-outer join of two "
    "constant-size top-m tables. Rank assignment happens on the "
    "already-cut top-50 rows (a window over ≤50 rows — bounded by "
    "the retrieval cut, not the corpus).",
    tags=("text", "retrieval", "similarity", "flagship"),
)
def q175_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from bigdata_kafka_2_spark.operators import similarity as SIM
    from bigdata_kafka_2_spark.operators.evalmetrics import rrf_fuse

    d = read_table(spark, sf_dir, "documents")
    e = read_table(spark, sf_dir, "embeddings")

    bm = TX.bm25_scores(d, list(_BM25_QUERY))
    lex50 = bm.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(50)
    w_lex = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    lex = lex50.select(
        "doc_id", F.row_number().over(w_lex).cast("int").alias("rank")
    )

    probe = e.filter(F.col("vec_id") == 0)
    den50 = SIM.cosine_topk(e, probe, k=50)
    w_den = Window.orderBy(
        F.col("similarity").desc(), F.col("vec_id").asc()
    )
    den = den50.select(
        F.col("vec_id").alias("doc_id"),
        F.row_number().over(w_den).cast("int").alias("rank"),
    )
    return rrf_fuse(
        [("lex", lex), ("dense", den)], "doc_id", k0=60, topk=10
    )


def _nb_scored_prefix_sql(source: str = "documents", lead: str = "WITH") -> str:
    """The shared CTE chain the Naive-Bayes oracles (q177 argmax,
    q182 calibration, curation v6's router stage) start from: token
    counts -> class-token counts -> class constants -> per-(doc,
    class) exact-DECIMAL scores. ``source`` is the relation the fit
    reads (a table or an upstream CTE name); ``lead`` lets a caller
    splice the chain into an existing WITH list."""
    return f"""
    {lead} toks AS (
      SELECT doc_id, y, tok, count(*) AS tf FROM (
        SELECT doc_id, lang AS y,
               unnest(string_split_regex({_NORM_SQL}, ' ')) AS tok
        FROM {source}
      ) WHERE tok <> '' GROUP BY 1, 2, 3
    ),
    ctc AS (SELECT y AS c, tok, sum(tf) AS ctc FROM toks GROUP BY 1, 2),
    cstats AS (SELECT c, sum(ctc) AS tc FROM ctc GROUP BY c),
    nc AS (SELECT lang AS c, count(*) AS ncnt FROM {source} GROUP BY 1),
    consts AS (
      SELECT (SELECT count(DISTINCT tok) FROM toks) AS v,
             (SELECT count(*) FROM {source}) AS n
    ),
    cls AS (
      SELECT nc.c,
             CAST(round(ln(CAST(nc.ncnt AS DOUBLE) / n), 4)
                  AS DECIMAL(28,4)) AS lprior,
             CAST(round(ln(CAST(COALESCE(cs.tc, 0) + v AS DOUBLE)), 4)
                  AS DECIMAL(28,4)) AS ldenom
      FROM nc LEFT JOIN cstats cs ON nc.c = cs.c, consts
    ),
    contrib AS (
      SELECT t.doc_id, ctc.c,
             sum(t.tf * CAST(round(ln(ctc.ctc + 1.0), 4)
                             AS DECIMAL(28,4))) AS s
      FROM toks t JOIN ctc ON t.tok = ctc.tok
      GROUP BY 1, 2
    ),
    docs AS (
      SELECT doc_id, y, CAST(sum(tf) AS BIGINT) AS dl
      FROM toks GROUP BY 1, 2
    ),
    scored AS (
      SELECT d.doc_id, d.y AS label, cls.c AS cand,
             cls.lprior - d.dl * cls.ldenom
               + COALESCE(ct.s, CAST(0 AS DECIMAL(28,4))) AS score
      FROM docs d CROSS JOIN cls
        LEFT JOIN contrib ct ON ct.doc_id = d.doc_id AND ct.c = cls.c
    )
    """


_NB_ARGMAX_SQL = _nb_scored_prefix_sql() + """
    SELECT doc_id, label, cand AS pred, CAST(score AS DOUBLE) AS score
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rk
      FROM scored
    ) WHERE rk = 1
    """


@register(
    "q177_naive_bayes_lang",
    oracle=_NB_ARGMAX_SQL,
    description="Multinomial Naive Bayes language classification "
    "(operators/classify.naive_bayes_predictions), fit and applied on "
    "the documents corpus with lang as the label (resubstitution — "
    "the label-noise audit shape). Add-one smoothing over the corpus "
    "vocabulary decomposes so ln(0+1)=0 terms vanish: the scoring "
    "join touches only OBSERVED (class, token) counts, never a dense "
    "vocab-x-class expansion. Fit AND inference are pure relational "
    "aggregates — one token explode feeding class-token counts on "
    "the same shuffle key, broadcast class constants, one window "
    "argmax per doc; per-token log factors rounded to 4 dp and "
    "summed as exact DECIMALs (the q117 order-independence rule).",
    tags=("text", "classify", "window"),
)
def q177_naive_bayes_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.classify import (
        naive_bayes_predictions,
    )

    d = read_table(spark, sf_dir, "documents")
    return naive_bayes_predictions(d, "lang")


@register(
    "q179_zipf_fit",
    oracle=f"""
    WITH freq AS (
      SELECT tok, count(*) AS freq FROM (
        SELECT unnest(string_split_regex({_NORM_SQL}, ' ')) AS tok
        FROM documents
      ) WHERE tok <> '' GROUP BY tok
    ),
    ranked AS (
      SELECT freq,
             row_number() OVER (ORDER BY freq DESC, tok ASC) AS r
      FROM freq
    ),
    terms AS (
      SELECT CAST(round(ln(CAST(r AS DOUBLE)), 6)
                  AS DECIMAL(28,6)) AS x,
             CAST(round(ln(CAST(freq AS DOUBLE)), 6)
                  AS DECIMAL(28,6)) AS y,
             CAST(round(round(ln(CAST(r AS DOUBLE)), 6)
                        * round(ln(CAST(freq AS DOUBLE)), 6), 6)
                  AS DECIMAL(28,6)) AS xy,
             CAST(round(round(ln(CAST(r AS DOUBLE)), 6)
                        * round(ln(CAST(r AS DOUBLE)), 6), 6)
                  AS DECIMAL(28,6)) AS xx
      FROM ranked
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(xy) AS DOUBLE) AS sxy,
             CAST(sum(xx) AS DOUBLE) AS sxx
      FROM terms
    )
    SELECT n_tokens,
           round((n_tokens * sxy - sx * sy)
                 / (n_tokens * sxx - sx * sx), 6) AS slope,
           round((sy * sxx - sx * sxy)
                 / (n_tokens * sxx - sx * sx), 6) AS intercept
    FROM s
    """,
    description="Zipf's-law fit (operators/text.zipf_fit): the "
    "least-squares line through (ln rank, ln freq) of the corpus "
    "token spectrum — natural language fits slope near -1; a flat "
    "slope flags synthetic/template text, a cliff flags boilerplate. "
    "Per-token terms computed in doubles on identical inputs, "
    "rounded to 6 dp, summed as exact DECIMALs (order-independent); "
    "rank assignment via the range-bucketed global_row_number (no "
    "single-partition window); the closed-form slope/intercept are "
    "single double expressions written identically in the oracle.",
    tags=("text", "aggregate"),
)
def q179_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.zipf_fit(d)


@register(
    "q181_token_kl_drift",
    oracle=f"""
    WITH cells AS (
      SELECT g, tok, count(*) AS c FROM (
        SELECT source AS g,
               unnest(string_split_regex({_NORM_SQL}, ' ')) AS tok
        FROM documents
      ) WHERE tok <> '' GROUP BY 1, 2
    ),
    gtot AS (SELECT g, sum(c) AS t FROM cells GROUP BY g),
    vtot AS (SELECT tok, sum(c) AS cv FROM cells GROUP BY tok),
    ntot AS (SELECT sum(c) AS n FROM cells),
    s AS (
      SELECT cells.g,
             max(gtot.t) AS t,
             sum(cells.c * CAST(round(ln(
               (CAST(cells.c AS DOUBLE) * CAST(ntot.n AS DOUBLE))
               / (CAST(vtot.cv AS DOUBLE) * CAST(gtot.t AS DOUBLE))
             ), 4) AS DECIMAL(28,4))) AS s
      FROM cells
        JOIN vtot USING (tok)
        JOIN gtot USING (g)
        CROSS JOIN ntot
      GROUP BY cells.g
    )
    SELECT g AS source,
           CAST(t AS BIGINT) AS t_tokens,
           (CASE WHEN s < 0 THEN -1 ELSE 1 END)
             * ((abs(CAST(s * 10000 AS BIGINT)) * 2 + t) // (t * 2))
             / 10000.0 AS kl
    FROM s
    """,
    description="Per-source distributional drift "
    "(operators/text.token_kl_drift): KL(P_source || P_corpus) over "
    "unigram token distributions — the mixture-design companion to "
    "q145's MinHash overlap (Jaccard measures shared vocabulary, KL "
    "measures how differently a slice weights it). No smoothing "
    "needed on this direction: every source token is a corpus "
    "token. T*KL = sum c*ln((c*N)/(C*T)) with all-double log "
    "operands written identically in the oracle, 4-dp rounded, "
    "DECIMAL-summed, and the final /T rounded half-away-from-zero "
    "in integer arithmetic (the q117 rule). One (source, tok) hash "
    "aggregate; every total reduces from the same cells.",
    tags=("text", "profile", "aggregate"),
)
def q181_token_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.token_kl_drift(d, "source")


_NB_CALIBRATION_SQL = _nb_scored_prefix_sql() + """,
    wm AS (
      SELECT doc_id, label, cand, score,
             max(score) OVER (PARTITION BY doc_id) AS m,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rk
      FROM scored
    ),
    terms AS (
      SELECT doc_id, label, cand, rk,
             CAST(round(exp(CAST(score - m AS DOUBLE)), 6)
                  AS DECIMAL(28,6)) AS e
      FROM wm
    ),
    posts AS (
      SELECT doc_id,
             max(CASE WHEN rk = 1 THEN label END) AS label,
             max(CASE WHEN rk = 1 THEN cand END) AS pred,
             CAST(max(CASE WHEN rk = 1 THEN e END) AS DOUBLE)
               / CAST(sum(e) AS DOUBLE) AS rawconf
      FROM terms GROUP BY doc_id
    ),
    conf AS (
      SELECT doc_id, label, pred, round(rawconf, 6) AS confidence
      FROM posts
    )
    SELECT least(CAST(floor(confidence * 10) AS INT), 9) AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(confidence * 1000000, 0) AS BIGINT))
                AS BIGINT) AS conf_sum_ppm,
           CAST(sum(CASE WHEN pred = label THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct
    FROM conf GROUP BY 1
    """


@register(
    "q182_nb_calibration",
    oracle=_NB_CALIBRATION_SQL,
    description="Calibration audit of the q177 Naive Bayes language "
    "router (operators/classify.nb_posteriors + "
    "expected_calibration_error): per confidence bucket, the count, "
    "exact ppm confidence mass, and correct count — the reliability "
    "table whose weighted |acc - conf| gaps sum to ECE; a router "
    "whose confidence tracks its accuracy can gate borderline "
    "documents by threshold. Softmax in log space with "
    "max-subtraction (window per doc), each exp term 6-dp rounded "
    "and DECIMAL-summed; the bucket aggregate keeps everything in "
    "integer parts-per-million so no float sum ever crosses rows.",
    tags=("text", "classify", "window", "aggregate"),
)
def q182_nb_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.classify import (
        expected_calibration_error,
        nb_posteriors,
    )

    d = read_table(spark, sf_dir, "documents")
    return expected_calibration_error(nb_posteriors(d, "lang"))


@register(
    "q186_trigram_search",
    oracle=f"""
    SELECT doc_id FROM (
      SELECT doc_id, {_NORM_SQL} AS norm FROM documents
    ) WHERE contains(norm, 'data stream')
    """,
    description="Index-accelerated substring search "
    "(operators/text.trigram_search): documents containing the "
    "phrase 'data stream', answered by intersecting the pattern's "
    "character-trigram posting lists (a doc qualifies only when it "
    "holds ALL pattern trigrams — lossless by construction) and "
    "verifying contains() on the candidate subset only; the oracle "
    "is the full-scan LIKE it replaces. At scale the postings table "
    "is a stored index partitioned by gram, so a search reads only "
    "its pattern's lists plus the candidates — never the corpus.",
    tags=("text", "search"),
)
def q186_trigram_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.trigram_search(d, "data stream")


@register(
    "q188_groupwise_auc",
    oracle=r"""
    WITH scored AS (
      SELECT source AS g,
             round(len(list_distinct(toks)) * 1.0
                   / greatest(len(toks), 1), 4) AS s,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
      FROM (
        SELECT source, lang,
               string_split_regex(
                 coalesce(trim(regexp_replace(lower(text), '\s+', ' ',
                                              'g')), ''), ' ') AS toks
        FROM documents
      )
    ),
    cells AS (
      SELECT g, s, count(*) AS n, sum(y) AS p FROM scored GROUP BY 1, 2
    ),
    ranked AS (
      SELECT g, n, p,
             COALESCE(sum(n) OVER (
               PARTITION BY g ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM cells
    ),
    agg AS (
      SELECT g,
             sum(CAST(p AS DECIMAL(38,0))
                 * CAST(2 * before + n + 1 AS DECIMAL(38,0))) AS s2,
             CAST(sum(p) AS BIGINT) AS np,
             CAST(sum(n) AS BIGINT) AS t
      FROM ranked GROUP BY g
    )
    SELECT g AS source,
           CASE WHEN np > 0 AND t - np > 0 THEN
             round(CAST(s2 - CAST(np AS DECIMAL(38,0))
                             * CAST(np + 1 AS DECIMAL(38,0)) AS DOUBLE)
                   / CAST(2 * CAST(np AS DECIMAL(38,0))
                          * CAST(t - np AS DECIMAL(38,0)) AS DOUBLE), 6)
           END AS auc,
           np AS n_pos,
           t - np AS n_neg
    FROM agg
    """,
    description="Per-slice exact AUC (operators/evalmetrics."
    "auc_by_group): within every source, the Mann-Whitney AUC of "
    "the type-token-ratio quality score against the English label — "
    "the segmentation audit that catches a score screening well "
    "overall while being noise inside one domain. q164's all-"
    "integer average-rank construction (DECIMAL(38,0) rank sums, "
    "one double division per group), with the exclusive prefix "
    "count as a group-partitioned window over distinct scores; AUC "
    "is NULL for a slice missing either class.",
    tags=("text", "evalmetrics", "window", "aggregate"),
)
def q188_groupwise_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.evalmetrics import auc_by_group
    from bigdata_kafka_2_spark.operators.text import quality_filter_flags

    d = read_table(spark, sf_dir, "documents")
    flags = quality_filter_flags(d).select("doc_id", "ttr")
    scored = d.join(flags, on="doc_id").select(
        "source", "ttr", (F.col("lang") == "en").alias("y")
    )
    return auc_by_group(scored, "source", "ttr", "y")


@register(
    "q189_heaps_fit",
    oracle=_vocab_growth_ctes() + """,
    pts AS (
      SELECT max(ct) AS cum_tokens, max(cv) AS vocab_size
      FROM cum JOIN thr ON doc_id <= t
      GROUP BY checkpoint
    ),
    terms AS (
      SELECT CAST(round(ln(CAST(cum_tokens AS DOUBLE)), 6)
                  AS DECIMAL(28,6)) AS x,
             CAST(round(ln(CAST(vocab_size AS DOUBLE)), 6)
                  AS DECIMAL(28,6)) AS y,
             CAST(round(round(ln(CAST(cum_tokens AS DOUBLE)), 6)
                        * round(ln(CAST(vocab_size AS DOUBLE)), 6), 6)
                  AS DECIMAL(28,6)) AS xy,
             CAST(round(round(ln(CAST(cum_tokens AS DOUBLE)), 6)
                        * round(ln(CAST(cum_tokens AS DOUBLE)), 6), 6)
                  AS DECIMAL(28,6)) AS xx
      FROM pts WHERE cum_tokens > 0 AND vocab_size > 0
    ),
    s AS (
      SELECT CAST(count(*) AS BIGINT) AS n_points,
             CAST(sum(x) AS DOUBLE) AS sx,
             CAST(sum(y) AS DOUBLE) AS sy,
             CAST(sum(xy) AS DOUBLE) AS sxy,
             CAST(sum(xx) AS DOUBLE) AS sxx
      FROM terms
    )
    SELECT n_points,
           round((n_points * sxy - sx * sy)
                 / (n_points * sxx - sx * sx), 6) AS beta,
           round((sy * sxx - sx * sxy)
                 / (n_points * sxx - sx * sx), 6) AS intercept
    FROM s
    """,
    description="Heaps'-law fit (operators/text.heaps_fit): the "
    "least-squares line through (ln cum_tokens, ln vocab_size) of "
    "q130's growth checkpoints — vocab ~ K*tokens^beta; natural "
    "corpora fit beta 0.4-0.6, near-0 flags a closed template "
    "vocabulary, near-1 unbounded noise. The growth-side companion "
    "to q179's Zipf slope, same determinism discipline (6-dp log "
    "terms, DECIMAL sums, identical closed-form expressions); the "
    "curve construction shares q130's first-doc type attribution "
    "and range-bucketed prefix sums.",
    tags=("text", "profile", "aggregate"),
)
def q189_heaps_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.heaps_fit(d)


@register(
    "q195_lexicon_block_rates",
    oracle=f"""
    WITH cnt AS (
      SELECT lang,
             len(list_filter(string_split({_NORM_SQL}, ' '),
                 t -> list_contains(['fast', 'slow'], t))) AS n_perf,
             len(list_filter(string_split({_NORM_SQL}, ' '),
                 t -> list_contains(['spark', 'table'], t))) AS n_infra
      FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n_perf > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_perf,
           CAST(sum(CASE WHEN n_infra > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_infra,
           CAST(sum(n_perf) AS BIGINT) AS hits_perf,
           CAST(sum(n_infra) AS BIGINT) AS hits_infra
    FROM cnt GROUP BY 1
    """,
    description="Lexicon/blocklist tagging (operators/text."
    "lexicon_tag): per language, how many documents hit each lexicon "
    "category and the total hit mass — the content-policy tag pass "
    "of a curation pipeline (here two demo categories over corpus "
    "vocabulary; a real blocklist is the same shape). The lexicon is "
    "compile-time data, so matching is ROW-LOCAL — size(filter("
    "tokens, t -> array_contains(lit, t))) inside whole-stage "
    "codegen, no explode, no join, no shuffle; one language "
    "aggregate on top. Scan speed at any corpus size (the explode + "
    "broadcast-join variant covers lexicons too large to inline).",
    tags=("text", "filter", "aggregate"),
)
def q195_lexicon_block_rates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    tags = TX.lexicon_tag(
        d,
        {"perf": ("fast", "slow"), "infra": ("spark", "table")},
        id_col="lang",
    )
    return tags.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("n_perf") > 0).cast("long")).alias("docs_perf"),
        F.sum((F.col("n_infra") > 0).cast("long")).alias("docs_infra"),
        F.sum("n_perf").alias("hits_perf"),
        F.sum("n_infra").alias("hits_infra"),
    )


@register(
    "q198_router_kappa",
    oracle=_nb_scored_prefix_sql() + """
    , pred AS (
      SELECT doc_id, label, cand AS pred FROM (
        SELECT *, row_number() OVER (
          PARTITION BY doc_id ORDER BY score DESC, cand ASC) AS rk
        FROM scored
      ) WHERE rk = 1
    ),
    na AS (SELECT label AS c, count(*) AS cnt FROM pred GROUP BY 1),
    nb AS (SELECT pred AS c, count(*) AS cnt FROM pred GROUP BY 1),
    dm AS (
      SELECT COALESCE(sum(na.cnt * nb.cnt), 0) AS d
      FROM na JOIN nb USING (c)
    ),
    tot AS (
      SELECT count(*) AS n,
             COALESCE(sum(CASE WHEN label = pred THEN 1 ELSE 0 END),
                      0) AS agree
      FROM pred
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(agree AS BIGINT) AS n_agree,
           CASE WHEN n * n - d <> 0 THEN
             round(CAST(n * agree - d AS DOUBLE)
                   / CAST(n * n - d AS DOUBLE), 6)
           END AS kappa
    FROM tot, dm
    """,
    description="Cohen's kappa of the NB language router against the "
    "shipped labels (operators/evalmetrics.cohens_kappa over "
    "q177's predictions): chance-corrected agreement — the "
    "annotation-quality number a label-noise audit reads instead of "
    "raw accuracy (a constant-majority router scores high accuracy "
    "on a skewed label set; its kappa is 0). EXACT integer "
    "arithmetic: kappa = (n·A − D)/(n² − D) with A the agreement "
    "count and D the marginal-product chance mass — one integer "
    "division rounded at the very end, bit-identical across engines "
    "and partitionings. One pair-count aggregate over the "
    "predictions, two marginal reductions FROM it, a broadcast "
    "scalar combine.",
    tags=("text", "classify", "aggregate"),
)
def q198_router_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.classify import (
        naive_bayes_predictions,
    )
    from bigdata_kafka_2_spark.operators.evalmetrics import cohens_kappa

    d = read_table(spark, sf_dir, "documents")
    preds = naive_bayes_predictions(d, "lang")
    return cohens_kappa(preds, "label", "pred")


@register(
    "q201_keyword_contexts",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split({_NORM_SQL}, ' ') AS t
      FROM documents
    ),
    hits AS (
      SELECT doc_id, i, t
      FROM toks, UNNEST(generate_series(1, len(t))) AS g(i)
      WHERE t[i] = 'spark'
    )
    SELECT doc_id, CAST(i AS BIGINT) AS pos,
           array_to_string(
             t[greatest(1, i - 3):least(len(t), i + 3)], ' '
           ) AS context
    FROM hits
    """,
    description="Keyword-in-context extraction (operators/text."
    "keyword_contexts): every occurrence of 'spark' with its "
    "1-based token position and the surrounding ±3 tokens re-joined "
    "— what a policy reviewer reads when a lexicon tag (q195) or "
    "trigram search (q186) fires: the hits IN CONTEXT, not bare doc "
    "ids. One split + posexplode bounded to matching positions, "
    "context via row-local slice on the already-materialized token "
    "array — output volume = occurrence count, no shuffle at all.",
    tags=("text", "filter"),
)
def q201_keyword_contexts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.keyword_contexts(d, "spark", window=3)


@register(
    "q205_readability",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split({_NORM_SQL}, ' '),
                                t -> t <> '')) AS BIGINT) AS n_words,
           CAST(greatest(1, len(regexp_extract_all(text, '[.!?]+')))
                AS BIGINT) AS n_sentences,
           CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                AS BIGINT) AS n_syllables,
           CASE WHEN len(list_filter(string_split({_NORM_SQL}, ' '),
                                     t -> t <> '')) > 0 THEN
             round(206.835
               - 1.015 * (CAST(len(list_filter(string_split({_NORM_SQL},
                   ' '), t -> t <> '')) AS DOUBLE)
                 / greatest(1, len(regexp_extract_all(text, '[.!?]+'))))
               - 84.6 * (CAST(len(regexp_extract_all(lower(text),
                   '[aeiouy]+')) AS DOUBLE)
                 / len(list_filter(string_split({_NORM_SQL}, ' '),
                                   t -> t <> ''))), 4)
           END AS flesch
    FROM documents
    """,
    description="Flesch reading-ease per document (operators/text."
    "readability_scores, vowel-group syllable proxy, terminal-"
    "punctuation sentences floored at 1): the classic readability "
    "screen a quality pass adds next to the Gopher rules — "
    "exam-grade text and keyword soup sit at opposite ends even "
    "when length/TTR rules pass. Row-local regexp counting inside "
    "whole-stage codegen; no shuffle at all.",
    tags=("text", "quality"),
)
def q205_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = read_table(spark, sf_dir, "documents")
    return TX.readability_scores(d)


@register(
    "q229_rake_keyphrases",
    oracle="""
    WITH lsts AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '') AS lst
      FROM documents
    ),
    toks AS (
      SELECT doc_id, lst[p] AS w, p
      FROM lsts, UNNEST(generate_series(1, len(lst))) AS g(p)
    ),
    content AS (
      SELECT doc_id, w, p,
             p - row_number() OVER (PARTITION BY doc_id ORDER BY p)
               AS isl
      FROM toks
      WHERE w NOT IN ('a', 'the', 'and', 'of', 'to', 'in')
    ),
    phr AS (
      SELECT string_agg(w, ' ' ORDER BY p) AS phrase,
             count(*) AS plen
      FROM content GROUP BY doc_id, isl
    ),
    words AS (
      SELECT unnest(string_split(phrase, ' ')) AS word, plen FROM phr
    ),
    stats AS (
      SELECT word, count(*) AS freq, sum(plen) AS degree
      FROM words GROUP BY 1
    ),
    ws AS (
      SELECT word,
             CAST(round(CAST(degree AS DOUBLE) / CAST(freq AS DOUBLE),
                        9) AS DECIMAL(18,9)) AS s
      FROM stats
    ),
    occ AS (
      SELECT phrase, CAST(count(*) AS BIGINT) AS n_occurrences,
             CAST(max(plen) AS INTEGER) AS n_words
      FROM phr GROUP BY 1
    ),
    pw AS (
      SELECT phrase, unnest(string_split(phrase, ' ')) AS word
      FROM occ
    ),
    psc AS (
      SELECT phrase, sum(s) AS score
      FROM pw JOIN ws USING (word) GROUP BY 1
    )
    SELECT p.phrase, o.n_words, o.n_occurrences,
           round(CAST(score AS DOUBLE), 6) AS score
    FROM psc p JOIN occ o USING (phrase)
    ORDER BY score DESC, p.phrase LIMIT 25
    """,
    description="RAKE keyphrase extraction (operators/text."
    "rake_keyphrases; Rose et al. 2010): candidate phrases are "
    "maximal stopword-free token runs (gaps-and-islands on a "
    "document-keyed window); each word scores degree/frequency over "
    "the phrase corpus and a phrase scores the sum of its words — "
    "the unsupervised keyword-surfacing step of a corpus audit, "
    "query-free where q45's TF-IDF needs a query and q105's PMI "
    "stops at pairs. Word scores round to 9 dp and sum as exact "
    "DECIMAL, so the (score DESC, phrase) top-25 ranks identically "
    "on both engines; shuffles are keyed by word and phrase (posting-"
    "bounded), and the top-k is a TakeOrderedAndProject.",
    tags=("text", "aggregate"),
)
def q229_rake_keyphrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.text import rake_keyphrases

    d = read_table(spark, sf_dir, "documents")
    return rake_keyphrases(d, top_k=25)


@register(
    "q246_chao1_vocab",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t
      FROM documents
    ),
    per AS (
      SELECT t, count(*) AS c FROM toks WHERE t <> '' GROUP BY t
    ),
    agg AS (
      SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS vocab_observed,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS f1,
             CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS f2
      FROM per
    )
    SELECT n_tokens, vocab_observed, f1, f2,
           round(CAST(vocab_observed AS DOUBLE)
                 + CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE)
                   / (2.0 * CAST(f2 + 1 AS DOUBLE)), 2) AS chao1
    FROM agg
    """,
    description="Chao1 vocabulary-richness estimate (operators/text."
    "chao1_vocab; Chao 1984): bias-corrected asymptotic vocabulary "
    "size from the singleton/doubleton type counts - the capture-"
    "recapture answer to how much vocabulary the corpus has BEYOND "
    "the sample, complementing q189's Heaps-law growth fit (Heaps "
    "extrapolates the curve; Chao1 bounds the asymptote). One token "
    "explode + per-token counts (the shared vocab shuffle), then one "
    "scan of the |vocab|-row table; all-integer until the final "
    "estimate.",
    tags=("text", "aggregate", "profile"),
)
def q246_chao1_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.text import chao1_vocab

    d = read_table(spark, sf_dir, "documents")
    return chao1_vocab(d, "text")


@register(
    "q260_hill_tail_index",
    oracle="""
    WITH toks AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS t
      FROM documents
    ),
    per AS (
      SELECT t, count(*) AS c FROM toks WHERE t <> '' GROUP BY t
    ),
    topk AS (
      SELECT CAST(c AS DOUBLE) AS x FROM per
      WHERE c > 0 ORDER BY c DESC LIMIT 51
    ),
    pv AS (
      SELECT min(x) AS xk1,
             least(50, count(*) - 1) AS keff
      FROM topk
    ),
    agg AS (
      SELECT sum(CAST(round(ln(x) - ln((SELECT xk1 FROM pv)), 9)
                      AS DECIMAL(38,9))) AS s
      FROM topk
    )
    SELECT CAST((SELECT keff FROM pv) AS BIGINT) AS k,
           round((SELECT xk1 FROM pv), 6) AS x_kplus1,
           CASE WHEN s > 0 THEN
             round(1.0 / (CAST(s AS DOUBLE)
                          / CAST((SELECT keff FROM pv) AS DOUBLE)), 6)
             END AS alpha_hill
    FROM agg
    """,
    description="Hill tail-index estimate of the token-frequency "
    "distribution (operators/profile.hill_tail_index; Hill 1975) "
    "from the top-51 order statistics - the tail-only heavy-tail "
    "diagnostic next to q179's whole-line Zipf fit (body curvature "
    "contaminates the regression; burstiness/hub risk depends on "
    "the tail exponent alone). Top k+1 via TakeOrderedAndProject "
    "(per-partition heaps, never a global sort; the boundary-tie "
    "VALUE multiset is deterministic even when token identities tie),"
    " pivot as one bounded driver scalar, per-order-statistic "
    "ln-ratio terms in exact DECIMAL(38,9) with both logs evaluated "
    "engine-side (the KM ln-parity rule).",
    tags=("text", "profile", "aggregate"),
)
def q260_hill_tail_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.profile import hill_tail_index

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("__t")
    ).filter(F.col("__t") != "")
    per = toks.groupBy("__t").agg(F.count(F.lit(1)).alias("c"))
    return hill_tail_index(per, "c", k=50)


@register(
    "q281_js_divergence",
    oracle="""
    WITH da AS (
      SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents WHERE lang = 'en'
    ),
    db AS (
      SELECT trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS nt
      FROM documents WHERE lang <> 'en'
    ),
    ta AS (
      SELECT u.tok FROM da, UNNEST(string_split(nt, ' ')) AS u(tok)
      WHERE u.tok <> ''
    ),
    tb AS (
      SELECT u.tok FROM db, UNNEST(string_split(nt, ' ')) AS u(tok)
      WHERE u.tok <> ''
    ),
    ca AS (SELECT tok, count(*) AS c FROM ta GROUP BY 1),
    cb AS (SELECT tok, count(*) AS c FROM tb GROUP BY 1),
    j AS (
      SELECT coalesce(ca.c, 0) AS cna, coalesce(cb.c, 0) AS cnb
      FROM ca FULL OUTER JOIN cb ON ca.tok = cb.tok
    ),
    tot AS (SELECT sum(cna) AS na, sum(cnb) AS nb FROM j),
    terms AS (
      SELECT j.cna, j.cnb, tot.na, tot.nb,
        CAST(cna AS DOUBLE) / CAST(na AS DOUBLE) AS p,
        CAST(cnb AS DOUBLE) / CAST(nb AS DOUBLE) AS q
      FROM j, tot
    ),
    agg AS (
      SELECT max(na) AS nav, max(nb) AS nbv, count(*) AS vocab,
        sum(CAST(round(CASE WHEN cna > 0 THEN
              p * ln(p / ((p + q) / 2.0)) / 0.6931471805599453
            ELSE 0.0 END, 9) AS DECIMAL(38,9))) AS sp,
        sum(CAST(round(CASE WHEN cnb > 0 THEN
              q * ln(q / ((p + q) / 2.0)) / 0.6931471805599453
            ELSE 0.0 END, 9) AS DECIMAL(38,9))) AS sq
      FROM terms
    )
    SELECT CAST(nav AS BIGINT) AS n_a, CAST(nbv AS BIGINT) AS n_b,
      CAST(vocab AS BIGINT) AS vocab,
      round((CAST(sp AS DOUBLE) + CAST(sq AS DOUBLE)) / 2.0, 6)
        AS js_bits
    FROM agg
    """,
    description="Jensen-Shannon divergence (operators/text."
    "js_divergence_tokens; Lin 1991) between the English and "
    "non-English corpora's unigram distributions - the DISTRIBUTION-"
    "level contrast number a corpus-mixing decision reads next to "
    "the per-document novelty (q269) and per-segment drift gates "
    "(q274): symmetric and finite even on disjoint vocabularies, "
    "which plain KL is not. Each corpus reduces to ONE map-side-"
    "combined token-count table (data-sized work ends there); one "
    "full-outer join on the token key (never doc x doc); exact "
    "integer-ratio probabilities, per-token summands rounded 9 dp "
    "into DECIMAL(38,9) with the single libm log2 on identical "
    "IEEE ratios both engines.",
    tags=("text", "aggregate", "join"),
)
def q281_js_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.text import (
        js_divergence_tokens,
    )

    d = read_table(spark, sf_dir, "documents")
    return js_divergence_tokens(
        d.filter(F.col("lang") == "en"),
        d.filter(F.col("lang") != "en"),
        "text",
    )


def _q284_oracle(sf_dir: str | None = None) -> str:
    from bigdata_kafka_2_spark.operators.mathfn import erfc_sql

    p_expr = erfc_sql("sqrt(chi2v / 2.0)")
    return f"""
    WITH r AS (
      SELECT ((length(text) > 250) = (lang = 'en')) AS a,
             ((len(string_split_regex(trim(text), '\\s+')) > 45)
              = (lang = 'en')) AS b
      FROM documents
    ),
    agg AS (
      SELECT count(*) AS n,
        sum(CASE WHEN (NOT a) AND b THEN 1 ELSE 0 END) AS n01,
        sum(CASE WHEN a AND (NOT b) THEN 1 ELSE 0 END) AS n10
      FROM r
    ),
    c AS (
      SELECT CAST(n AS BIGINT) AS n, CAST(n01 AS BIGINT) AS n01,
             CAST(n10 AS BIGINT) AS n10,
        greatest(0.0, CAST(abs(n01 - n10) AS DOUBLE) - 1.0)
          * greatest(0.0, CAST(abs(n01 - n10) AS DOUBLE) - 1.0)
          / CAST(n01 + n10 AS DOUBLE) AS chi2v,
        (n01 + n10) > 0 AS ok
      FROM agg
    )
    SELECT n, n01, n10,
      round(CASE WHEN ok THEN chi2v END, 6) AS chi2,
      round(CASE WHEN ok THEN {p_expr} END, 9) AS p_value
    FROM c
    """


@register(
    "q284_mcnemar_test",
    oracle=_q284_oracle,
    description="McNemar's paired test with Edwards' continuity "
    "correction (operators/evalmetrics.mcnemar_test; McNemar 1947) "
    "comparing two deterministic language-ID rules (char-length "
    "threshold vs token-count threshold, truth = lang='en') on the "
    "SAME documents - the model-comparison readout the marginal-"
    "accuracy z-test gets wrong because both classifiers saw "
    "identical inputs; only the discordant pairs n01/n10 carry "
    "information. chi2 = (|n01-n10|-1)^2/(n01+n10), df=1 survival "
    "exactly erfc(sqrt(chi2/2)) through the shared literal-"
    "coefficient series (the q264 discipline). ONE map-side-combined "
    "aggregate; row-local arithmetic on the 1-row result.",
    tags=("evalmetrics", "text", "aggregate"),
)
def q284_mcnemar_test(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.evalmetrics import (
        mcnemar_test,
    )

    d = read_table(spark, sf_dir, "documents")
    truth = F.col("lang") == "en"
    rule_a = F.length("text") > 250
    rule_b = F.size(F.split(F.trim(F.col("text")), r"\s+")) > 45
    rated = d.select(
        (rule_a == truth).alias("ca"), (rule_b == truth).alias("cb")
    )
    return mcnemar_test(rated, "ca", "cb")


_BIGRAM_COUNTS_SQL = f"""
    norm AS (
      SELECT string_split({_NORM_SQL}, ' ') AS t FROM documents
    ),
    bg AS (
      SELECT t[i] || ' ' || t[i+1] AS tok
      FROM norm,
           UNNEST(generate_series(1, greatest(len(t) - 1, 1))) AS g(i)
      WHERE t[i] || ' ' || t[i+1] IS NOT NULL
        AND t[i] || ' ' || t[i+1] <> ''
    ),
    cnt AS (SELECT tok, count(*) AS c FROM bg GROUP BY 1)
"""


def _bigram_counts(d: DataFrame) -> DataFrame:
    """Adjacent-bigram multiset counts ``(tok, c)`` over normalized
    text — the q105 PMI construction with the pair rendered as one
    string key (staged token array; the guarded sequence avoids
    Spark's descending sequence(0,-1) on short docs)."""
    src = d.select(
        F.split(TX.normalize_text("text"), " ").alias("__toks")
    )
    toks = F.col("__toks")
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(0), F.size(toks) - 2)
    ).otherwise(F.array().cast("array<int>"))
    pair_arr = F.transform(
        idx,
        lambda i: F.concat(
            F.element_at(toks, i + 1),
            F.lit(" "),
            F.element_at(toks, i + 2),
        ),
    )
    return (
        src.select(F.explode(pair_arr).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


@register(
    "q288_token_entropy",
    oracle=f"""
    WITH norm AS (
      SELECT {_NORM_SQL} AS nt FROM documents
    ),
    t AS (
      SELECT u.tok FROM norm, UNNEST(string_split(nt, ' ')) AS u(tok)
      WHERE u.tok <> ''
    ),
    cnt AS (SELECT tok, count(*) AS c FROM t GROUP BY 1),
    tot AS (
      SELECT sum(c) AS nt, count(*) AS v FROM cnt
    ),
    terms AS (
      SELECT cnt.c, tot.nt, tot.v,
        CAST(cnt.c AS DOUBLE) / CAST(tot.nt AS DOUBLE) AS p
      FROM cnt, tot
    ),
    agg AS (
      SELECT max(nt) AS ntv, max(v) AS vv,
        sum(CAST(round(-p * ln(p) / 0.6931471805599453, 9)
                 AS DECIMAL(38,9))) AS h,
        sum(CAST(c AS HUGEINT) * CAST(c - 1 AS HUGEINT)) AS coinc
      FROM terms
    )
    SELECT CAST(ntv AS BIGINT) AS n_tokens, CAST(vv AS BIGINT) AS vocab,
      round(CAST(h AS DOUBLE), 6) AS entropy_bits,
      round(CASE WHEN ntv >= 2 THEN
        CAST(coinc AS DOUBLE)
        / (CAST(ntv AS DOUBLE) * (CAST(ntv AS DOUBLE) - 1.0)) END, 6)
        AS simpson
    FROM agg
    """,
    description="Shannon entropy (bits) + unbiased Simpson "
    "concentration (operators/text.token_entropy; Shannon 1948, "
    "Simpson 1949) of the corpus unigram distribution - the "
    "diversity pair a corpus profile reports: 2^H is the unigram-LM "
    "perplexity (effective vocabulary breadth), Simpson "
    "sum c(c-1)/(N(N-1)) is the probability two random tokens "
    "coincide (the concentration number, a PURE integer ratio - "
    "exact end to end). Entropy terms -p*log2(p) round 9 dp into "
    "DECIMAL(38,9) with the single libm log on integer-ratio "
    "doubles; data-sized work ends at the map-side-combined token "
    "count.",
    tags=("text", "aggregate"),
)
def q288_token_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.text import token_entropy

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.split(TX.normalize_text("text"), " ")
        ).alias("tok")
    ).filter(F.col("tok") != "")
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    return token_entropy(counts, "c")


@register(
    "q290_source_jaccard",
    oracle=f"""
    WITH norm AS (
      SELECT source, {_NORM_SQL} AS nt FROM documents
    ),
    ts AS (
      SELECT DISTINCT source AS g, u.tok
      FROM norm, UNNEST(string_split(nt, ' ')) AS u(tok)
      WHERE u.tok <> ''
    ),
    inter AS (
      SELECT a.g AS source_a, b.g AS source_b, count(*) AS inter
      FROM ts a JOIN ts b ON a.tok = b.tok AND a.g < b.g
      GROUP BY 1, 2
    ),
    sizes AS (SELECT g, count(*) AS sz FROM ts GROUP BY 1)
    SELECT source_a, source_b,
      CAST(inter AS BIGINT) AS inter,
      CAST(sa.sz AS BIGINT) AS size_a,
      CAST(sb.sz AS BIGINT) AS size_b,
      round(CAST(inter AS DOUBLE)
            / CAST(sa.sz + sb.sz - inter AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON inter.source_a = sa.g
    JOIN sizes sb ON inter.source_b = sb.g
    """,
    description="Pairwise vocabulary Jaccard between sources "
    "(operators/text.source_jaccard_matrix) - the multi-corpus "
    "contrast MATRIX that q281's single JS number collapses: which "
    "sources are near-duplicates of each other vs genuinely "
    "additive, the mixing-planning view. One distinct "
    "(source, token) projection ends the data-sized work; the pair "
    "join is TOKEN-keyed (each token joins only the <=|sources| "
    "sources containing it - never doc x doc); per-source set sizes "
    "broadcast onto the |sources|^2-bounded pair table; exact "
    "integer set arithmetic, one 6-dp division. Fully-disjoint "
    "pairs have no row by contract.",
    tags=("text", "join", "aggregate"),
)
def q290_source_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.text import (
        source_jaccard_matrix,
    )

    d = read_table(spark, sf_dir, "documents")
    return source_jaccard_matrix(d, "source", "text")


@register(
    "q299_vocab_capture",
    oracle=f"""
    WITH norm AS (
      SELECT doc_id % 2 = 0 AS h,
             string_split({_NORM_SQL}, ' ') AS t
      FROM documents
    ),
    bg AS (
      SELECT h, t[i] || ' ' || t[i+1] AS tok
      FROM norm,
           UNNEST(generate_series(1, greatest(len(t) - 1, 1))) AS g(i)
      WHERE t[i] || ' ' || t[i+1] IS NOT NULL
        AND t[i] || ' ' || t[i+1] <> ''
    ),
    ts AS (SELECT DISTINCT h, tok FROM bg),
    per AS (
      SELECT tok,
        max(CASE WHEN h THEN 1 ELSE 0 END) AS in1,
        max(CASE WHEN NOT h THEN 1 ELSE 0 END) AS in2
      FROM ts GROUP BY 1
    ),
    agg AS (
      SELECT sum(in1) AS v1, sum(in2) AS v2,
        sum(CASE WHEN in1 = 1 AND in2 = 1 THEN 1 ELSE 0 END) AS m
      FROM per
    ),
    c AS (
      SELECT CAST(v1 AS BIGINT) AS v1, CAST(v2 AS BIGINT) AS v2,
        CAST(m AS BIGINT) AS m,
        CAST(v1 AS DOUBLE) AS v1d, CAST(v2 AS DOUBLE) AS v2d,
        CAST(m AS DOUBLE) AS md
      FROM agg
    ),
    c2 AS (
      SELECT *,
        (v1d + 1.0) * (v2d + 1.0) / (md + 1.0) - 1.0 AS nh,
        sqrt((v1d + 1.0) * (v2d + 1.0) * (v1d - md) * (v2d - md)
             / ((md + 1.0) * (md + 1.0) * (md + 2.0))) AS sev
      FROM c
    )
    SELECT v1, v2, m,
      round(nh, 4) AS n_hat,
      round(sev, 4) AS se,
      round(nh - 1.959963984540054 * sev, 4) AS ci_lo,
      round(nh + 1.959963984540054 * sev, 4) AS ci_hi
    FROM c2
    """,
    description="Chapman capture-recapture estimate of the true "
    "bigram vocabulary (operators/text.vocab_capture_recapture; "
    "Chapman 1951) from the two doc-id-parity corpus halves - the "
    "cross-validation sibling of Chao1 (q246, which reads one "
    "sample's frequency-of-frequency tail): each half's distinct-"
    "type set is a capture, the overlap the recaptured marks, "
    "N_hat = (v1+1)(v2+1)/(m+1) - 1 with Chapman's bias-corrected "
    "variance. The two estimators agreeing is evidence the type "
    "accumulation is exchangeable; divergence flags clustered "
    "(source/time-skewed) vocabulary. EXACT integer set arithmetic; "
    "one distinct (half, token) projection ends the data-sized "
    "work.",
    tags=("text", "aggregate"),
)
def q299_vocab_capture(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from bigdata_kafka_2_spark.operators.text import (
        vocab_capture_recapture,
    )

    d = read_table(spark, sf_dir, "documents")
    return vocab_capture_recapture(d, "text", "doc_id", k=2)
