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


@register(
    "q36_top_terms",
    oracle="""
    SELECT tok, n FROM (
      SELECT tok, count(*) AS n,
             row_number() OVER (ORDER BY count(*) DESC, tok ASC) AS rn
      FROM (
        SELECT unnest(string_split_regex(
          trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
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
        score_exprs.append(f"({terms}) AS score_{lang}")
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
    "q39_cms_top_terms",
    oracle=None,  # xxhash64 bucket grid is not expressible in DuckDB;
    # the sketch's overestimate/mergeability/recovery properties are
    # property-tested in tests/test_sketch.py, and the top-k set is
    # asserted equal to exact q36 on the driver data in test_extensions
    description="Approximate corpus heavy-hitters via count-min sketch "
    "(operators/sketch.py): the 100 TB swap-in for q36's exact "
    "top-terms. The term-count state is a fixed depth*width counter "
    "grid (one bounded-key shuffle with map-side partials) instead of "
    "a full-vocabulary shuffle; estimates never undercount and "
    "shard-built sketches merge cell-wise (both property-tested).",
    tags=("text", "aggregate", "sketch"),
)
def q39_cms_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators import sketch as SK

    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(TX.normalize_text("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    return SK.count_min_topk(toks, "tok", k=10)


@register(
    "q67_winnow_overlap_pairs",
    oracle=None,  # xxhash64 rolling hashes are not expressible in DuckDB;
    # the w+k-1 match guarantee, density, and determinism are asserted in
    # tests/test_extensions.py::test_winnowing_guarantee_and_density
    description="Substring-level duplicate candidates via winnowing "
    "fingerprints (operators/text.winnow_fingerprints — the MOSS "
    "rolling-hash scheme): row-local zero-shuffle signatures keeping "
    "~2/(window+1) of shingle hashes with a shared-run match "
    "guarantee, then the co-occurrence-bounded equi-join on exploded "
    "fingerprints. Catches copied passages that whole-document "
    "Jaccard dilutes away.",
    tags=("text", "dedup", "join"),
)
def q67_winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from bigdata_kafka_2_spark.operators.text import winnow_overlap_pairs

    d = read_table(spark, sf_dir, "documents")
    return winnow_overlap_pairs(d, min_shared=2)
