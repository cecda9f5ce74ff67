"""Text-analysis operators (SURVEY.md §2B): tokenization, term statistics,
quality scoring, language-ID heuristic, TF-IDF, n-grams, fingerprinting.

Everything is native Column expressions / higher-order array functions —
no Python UDFs — so the whole surface stays inside whole-stage codegen and
scales linearly in corpus size: per-doc ops are narrow (no shuffle); corpus
statistics shuffle once on the term key.

These extend the reference's text surface (normalize/chunk/token-estimate,
restaurant_etl/utils/clean_text.py + parsers/llm_parser.py:20-21,169-181)
to the operators a large-scale training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table

#: minimal English stopword list shared by quality scoring and lang-ID;
#: duplicated literally inside the DuckDB oracles (keep in sync).
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on"]
_STOP_SQL = "('" + "', '".join(STOPWORDS) + "')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from restaurant_etl_spark.session import fan_out

    # tokenize/score work is per-row CPU: spread the narrow scan first
    return fan_out(load_table(spark, sf_dir, "documents"), "doc_id")


def _tokens(text: Column) -> Column:
    """Whitespace tokenization of already-normalized text."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


# --------------------------------------------------------------------------
# Token counting / term statistics
# --------------------------------------------------------------------------

@register(
    "text_term_counts",
    oracle=f"""
    SELECT term, count(*) AS n, count(DISTINCT doc_id) AS doc_freq
    FROM (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term FROM documents)
    WHERE term <> ''
    GROUP BY term
    ORDER BY n DESC, term
    LIMIT 50
    """,
    category="text",
)
def text_term_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequencies: tokenize → explode → count. One shuffle on
    the term key; top-k via TakeOrderedAndProject, never a full sort."""
    d = _docs(spark, sf_dir)
    return (
        d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("n"), F.countDistinct("doc_id").alias("doc_freq"))
        .orderBy(F.col("n").desc(), "term")
        .limit(50)
    )


@register(
    "text_token_stats",
    oracle="""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS INTEGER)
               AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INTEGER)
               AS n_bpe_tokens,
           greatest(1, length(text) // 4) AS est_llm_tokens,
           CAST(length(text) AS INTEGER)  AS n_chars
    FROM documents
    """,
    category="text",
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting three ways: whitespace tokens, a BPE-ish
    regex segmentation (letter runs / digit runs / single punctuation), and
    the reference's chars//4 LLM estimate (llm_parser.py:20-21).
    Pure narrow projection — zero shuffles at any scale."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"), 0)).alias("n_bpe_tokens"),
        F.greatest(F.lit(1), F.floor(F.length("text") / 4)).cast("bigint").alias("est_llm_tokens"),
        F.length("text").alias("n_chars"),
    )


# --------------------------------------------------------------------------
# Quality scoring
# --------------------------------------------------------------------------

@register(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, n_chars,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, n_chars,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_distinct,
               len(list_filter(toks, x -> x IN {_STOP_SQL})) AS n_stop
        FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS INTEGER)  AS n_tokens,
           CAST(n_distinct AS INTEGER) AS n_distinct,
           round(n_stop / n_tokens, 4)     AS stopword_ratio,
           round(n_distinct / n_tokens, 4) AS type_token_ratio,
           round((n_chars - n_tokens + 1) / n_tokens, 4) AS avg_token_len,
           CASE WHEN n_tokens >= 20 AND n_stop / n_tokens BETWEEN 0.01 AND 0.6
                     AND n_distinct / n_tokens >= 0.2
                THEN 'keep' ELSE 'flag' END AS quality_band
    FROM s
    """,
    category="text",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic document quality: length, stopword ratio, type-token ratio,
    mean token length, and a keep/flag band — the pre-training corpus filter
    pattern. Narrow per-row ops only."""
    d = _docs(spark, sf_dir)
    # materialize the token array once (multi-referenced column → Catalyst
    # won't inline the regex split into each consumer)
    base = d.select("doc_id", "n_chars", _tokens(F.col("text")).alias("toks"))
    t = base.select(
        "doc_id",
        F.col("n_chars"),
        F.size("toks").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.size(F.filter("toks", lambda x: x.isin(STOPWORDS))).alias("n_stop"),
    )
    stop_ratio = F.col("n_stop") / F.col("n_tokens")
    ttr = F.col("n_distinct") / F.col("n_tokens")
    return t.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(ttr, 4).alias("type_token_ratio"),
        # chars minus (n_tokens-1) separators, over n_tokens
        F.round((F.col("n_chars") - F.col("n_tokens") + 1) / F.col("n_tokens"), 4).alias("avg_token_len"),
        F.when(
            (F.col("n_tokens") >= 20) & stop_ratio.between(0.01, 0.6) & (ttr >= 0.2), "keep"
        ).otherwise("flag").alias("quality_band"),
    )


# --------------------------------------------------------------------------
# Language identification (heuristic)
# --------------------------------------------------------------------------

@register(
    "text_lang_id",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, lang,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks,
               regexp_matches(text, '[^\\x00-\\x7F]') AS non_ascii
        FROM documents
    ), sc AS (
        SELECT doc_id, lang, non_ascii,
               round(len(list_filter(toks, x -> x IN {_STOP_SQL})) / len(toks), 4) AS en_score
        FROM s
    )
    SELECT doc_id, lang AS labeled_lang, en_score,
           CASE WHEN non_ascii THEN 'other'
                WHEN en_score >= 0.05 THEN 'en'
                ELSE 'und' END AS guessed_lang,
           (CASE WHEN non_ascii THEN 'other'
                 WHEN en_score >= 0.05 THEN 'en'
                 ELSE 'und' END) = lang AS agrees
    FROM sc
    """,
    category="text",
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: ASCII-range check + English-stopword hit rate.
    The synthetic corpus reuses English-ish text under every label, so the
    oracle checks the deterministic computation, not label accuracy."""
    d = _docs(spark, sf_dir)
    base = d.select("doc_id", "lang", "text", _tokens(F.col("text")).alias("toks"))
    s = base.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.round(
            F.size(F.filter("toks", lambda x: x.isin(STOPWORDS))) / F.size("toks"), 4
        ).alias("en_score"),
        F.col("text").rlike(r"[^\x00-\x7F]").alias("non_ascii"),
    )
    guess = (
        F.when(F.col("non_ascii"), "other")
        .when(F.col("en_score") >= 0.05, "en")
        .otherwise("und")
    )
    return s.select(
        "doc_id",
        "labeled_lang",
        "en_score",
        guess.alias("guessed_lang"),
        (guess == F.col("labeled_lang")).alias("agrees"),
    )


# --------------------------------------------------------------------------
# TF-IDF
# --------------------------------------------------------------------------

@register(
    "text_tfidf_top_terms",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY doc_id, term
    ), df AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tok WHERE term <> '' GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term,
               round(tf * ln(n_docs / df), 4) AS tfidf
        FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, CAST(rn AS INTEGER) AS rn FROM (
        SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn
        FROM scored) t
    WHERE rn <= 3
    """,
    category="text",
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF via joins + window: term frequency ⋈ document frequency ×
    corpus size, top-3 terms per doc. At 100 TB the big shuffles are the
    two term-keyed aggregations. The tf⋈df join carries NO broadcast hint
    on purpose: a 100 TB corpus vocabulary can exceed the broadcast
    threshold, and a forced hint would silently OOM the driver — AQE
    chooses broadcast at runtime when df is actually small (it is at test
    scale) and falls back to a shuffled join on term otherwise, which is
    the correct scale path. Only the single-row n_docs is hint-broadcast."""
    d = _docs(spark, sf_dir)
    tok = d.select("doc_id", F.explode(_tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return scored.select("doc_id", "term", "tfidf", F.row_number().over(w).alias("rn")).filter(
        F.col("rn") <= 3
    )


# --------------------------------------------------------------------------
# N-grams
# --------------------------------------------------------------------------

@register(
    "text_bigrams_top",
    oracle="""
    WITH t AS (
        SELECT list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
        FROM documents
    )
    SELECT bigram, count(*) AS n
    FROM (SELECT toks[i] || ' ' || toks[i + 1] AS bigram
          FROM (SELECT toks, unnest(range(1, len(toks))) AS i FROM t))
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 30
    """,
    category="text",
)
def text_bigrams_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word bigrams via index-aware array transform → explode → count.
    The n-gram construction is per-row (narrow); only the count shuffles."""
    d = _docs(spark, sf_dir).select(_tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    bigrams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda x, i: F.concat_ws(" ", x, F.element_at(toks, i + 2)),
    )
    return (
        d.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(30)
    )


# --------------------------------------------------------------------------
# Document fingerprinting
# --------------------------------------------------------------------------

@register(
    "text_fingerprint",
    oracle="""
    WITH s AS (
        SELECT doc_id, md5(text) AS content_hash,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id,
               min(md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS min_shingle_hash
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i FROM s)
        GROUP BY doc_id
    )
    SELECT s.doc_id, s.content_hash, g.min_shingle_hash,
           md5(array_to_string(list_sort(list_distinct(s.toks)), ' ')) AS vocab_hash
    FROM s JOIN g USING (doc_id)
    """,
    category="text",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprints: exact content hash, min-hash over rolling
    3-token shingles (the MinHash primitive with one hash function), and a
    bag-of-words vocabulary hash. All per-row — zero shuffles; md5 gives
    engine-independent determinism for the oracle."""
    d = _docs(spark, sf_dir).select("doc_id", "text", _tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    shingles = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda x, i: F.md5(
            F.concat_ws(" ", x, F.element_at(toks, i + 2), F.element_at(toks, i + 3))
        ),
    )
    return d.select(
        "doc_id",
        F.md5("text").alias("content_hash"),
        F.array_min(shingles).alias("min_shingle_hash"),
        F.md5(F.array_join(F.array_sort(F.array_distinct(toks)), " ")).alias("vocab_hash"),
    )


@register(
    "corpus_clean_keep",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, n_chars, text,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id, text,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_distinct,
               len(list_filter(toks, x -> x IN {_STOP_SQL})) AS n_stop,
               regexp_matches(text, '[^\\x00-\\x7F]') AS non_ascii,
               md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS vocab_hash
        FROM t
    ), flags AS (
        SELECT doc_id,
               CAST(n_tokens AS INTEGER) AS n_tokens,
               round(n_distinct / n_tokens, 4) AS type_token_ratio,
               n_tokens >= 20 AND n_stop / n_tokens BETWEEN 0.01 AND 0.6
                   AND n_distinct / n_tokens >= 0.2 AS quality_ok,
               NOT non_ascii AND round(n_stop / n_tokens, 4) >= 0.05 AS is_en,
               doc_id = min(doc_id) OVER (PARTITION BY vocab_hash) AS is_kept
        FROM s
    )
    SELECT doc_id, n_tokens, type_token_ratio
    FROM flags
    WHERE quality_ok AND is_en AND is_kept
    """,
    category="text",
)
def corpus_clean_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-data cleaning pipeline in one plan: quality
    gate (length / stopword-ratio / type-token-ratio) ∩ language gate
    (ASCII + English stopword density) ∩ exact-dedup survivors (min doc_id
    per content digest). Composes three registered operators by doc_id
    equi-joins — at 100 TB each gate is a narrow map or one key shuffle,
    and Catalyst collapses the shared document scan. This is the corpus a
    pretraining run would actually ingest."""
    from restaurant_etl_spark.operators.dedup import dedup_exact_documents

    q = (
        text_quality_score(spark, sf_dir)
        .filter(F.col("quality_band") == "keep")
        .select("doc_id", "n_tokens", "type_token_ratio")
    )
    lang = (
        text_lang_id(spark, sf_dir)
        .filter(F.col("guessed_lang") == "en")
        .select("doc_id")
    )
    kept = (
        dedup_exact_documents(spark, sf_dir)
        .filter(F.col("is_kept"))
        .select("doc_id")
    )
    return q.join(lang, "doc_id").join(kept, "doc_id")


@register(
    "text_unigram_logprob",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                          x -> x <> '')) AS tok
        FROM documents
    ),
    freq AS (
        SELECT tok, count(*) AS c FROM toks GROUP BY tok
    ),
    tot AS (SELECT sum(c) AS n FROM freq),
    scored AS (
        SELECT t.doc_id, log10(f.c / tot.n) AS lp
        FROM toks t JOIN freq f ON t.tok = f.tok CROSS JOIN tot
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(lp), 4) AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    category="text",
)
def text_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score — the CCNet-style perplexity
    filter signal for pretraining corpora: fit a unigram LM on the corpus
    itself (token frequency / total), score each document by mean log10
    probability of its tokens. Repeated boilerplate scores HIGH (common
    tokens), lorem-ipsum noise and glyph soup score LOW — the two tails a
    quality filter trims.

    Scale shape: one shuffle on the token key builds the LM (bounded by
    vocabulary, not corpus); the model is a (token, logprob) table joined
    back token-wise — AQE picks broadcast when the vocab fits, shuffle
    join when it doesn't. Everything else is a narrow map; output is one
    row per document."""
    toks = _docs(spark, sf_dir).select(
        "doc_id", F.explode(_tokens(F.lower(F.col("text")))).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("c"))
    tot = freq.agg(F.sum("c").alias("n"))
    lm = freq.crossJoin(F.broadcast(tot)).select(
        "tok", F.log10(F.col("c") / F.col("n")).alias("lp")
    )
    return (
        toks.join(lm, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg("lp"), 4).alias("avg_logprob"),
        )
    )


@register(
    "corpus_clean_multimodal",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
        FROM documents
    ), s AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_distinct,
               len(list_filter(toks, x -> x IN {_STOP_SQL})) AS n_stop
        FROM t
    ), txt AS (
        SELECT doc_id, CAST(n_tokens AS INTEGER) AS n_tokens
        FROM s
        WHERE n_tokens >= 20 AND n_stop / n_tokens BETWEEN 0.01 AND 0.6
          AND n_distinct / n_tokens >= 0.2
    ), emb AS (
        SELECT vec_id,
               round(sqrt(list_sum(list_transform(embedding,
                     x -> x::DOUBLE * x::DOUBLE))), 4) AS emb_norm
        FROM embeddings
    )
    SELECT t.doc_id, t.n_tokens, e.emb_norm
    FROM txt t JOIN emb e ON t.doc_id = e.vec_id
    WHERE e.emb_norm BETWEEN 0.5 AND 20.0
    """,
    category="text",
)
def corpus_clean_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal corpus filter: a document survives only if BOTH its text
    passes the quality gate AND its embedding row (doc_id = vec_id in the
    synthetic schema) has a sane L2 norm (degenerate/zero and exploded
    vectors are the embedding-side failure modes a multimodal pipeline
    screens). One doc_id equi-join between the two modality tables — at
    100 TB both sides are pre-filtered before the shuffle, and the output
    is the multimodal corpus a joint-training run would ingest."""
    txt = (
        text_quality_score(spark, sf_dir)
        .filter(F.col("quality_band") == "keep")
        .select("doc_id", "n_tokens")
    )
    e = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x * x,
        )
    )
    emb = e.select(F.col("vec_id").alias("doc_id"), F.round(norm, 4).alias("emb_norm")).filter(
        F.col("emb_norm").between(0.5, 20.0)
    )
    return txt.join(emb, "doc_id")
