"""Training-corpus preparation operators: sequence packing, repetition
filtering, PII scrubbing — the standard LLM-data-pipeline steps between
raw documents and training shards (the reference stops at record
extraction; these are the mandated §2B extensions on top).

Scale shapes:
  * pack:   cumulative-sum windows PARTITIONED BY a shard key (never one
            global window — a single-partition window is the classic
            driver-shaped bottleneck at 100 TB); bins never cross shards,
            matching how packed shards are written per output file;
  * repeat: entirely per-row scalar arithmetic on the shingle arrays —
            no explode, no shuffle, whole-stage codegen end-to-end;
  * pii:    regexp_replace chains, one map pass; counts derive from
            length deltas so the scan stays single.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from restaurant_etl_spark.operators.registry import register
from restaurant_etl_spark.sources.tables import load_table

#: tokens per packed training sequence (toy scale for the fixture corpus;
#: a production run uses the model context length)
PACK_BUDGET = 512

#: Gopher-style repetition gate: fraction of duplicate 3-grams above which
#: a document is dropped
REPETITION_MAX = 0.2


def _toks(text: Column) -> Column:
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


# ------------------------------------------------------------- packing ----


@register(
    "corpus_pack_sequences",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source,
               len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
                   AS n_tokens
        FROM documents WHERE length(text) > 0
    ),
    c AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS cum_before
        FROM d
    )
    SELECT source,
           CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS bin_id,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM c
    GROUP BY source, bin_id
    """,
    category="corpus",
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end-to-end in
    deterministic (shard, doc_id) order and cut into ~PACK_BUDGET-token
    bins — bin = floor(cumulative_tokens_before / budget), the standard
    scalable approximation of bin packing (greedy first-fit needs
    sequential state; this is one window + one groupBy). The window
    partitions by shard (``source``), never globally: per-shard packing
    is both the scale shape AND how packed shards map to output files."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    d = docs.select(
        "doc_id", "source", F.size(_toks(F.col("text"))).alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = d.withColumn(
        "cum_before", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        c.groupBy(
            "source",
            F.floor(F.col("cum_before") / PACK_BUDGET).alias("bin_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# ---------------------------------------------------------- repetition ----


@register(
    "text_repetition_filter",
    oracle=f"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
        FROM documents WHERE length(text) > 0
    ),
    g AS (
        SELECT doc_id,
               greatest(len(toks) - 2, 0) AS total_grams,
               CASE WHEN len(toks) >= 3 THEN (
                   SELECT count(DISTINCT s) FROM (
                       SELECT toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS s
                       FROM unnest(range(1, len(toks) - 1)) AS u(i)
                   )
               ) ELSE 0 END AS distinct_grams
        FROM t
    )
    SELECT doc_id, total_grams, distinct_grams,
           round(1.0 - distinct_grams * 1.0 / total_grams, 4) AS rep_ratio,
           (1.0 - distinct_grams * 1.0 / total_grams) <= {REPETITION_MAX} AS keep
    FROM g WHERE total_grams > 0
    """,
    category="corpus",
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition gate (the Gopher/C4 quality rule): the
    fraction of duplicate 3-grams within each document, computed entirely
    from per-row array sizes — size(grams) vs size(array_distinct(grams))
    — so the whole operator is a narrow codegen'd map with NO explode and
    NO shuffle. Boilerplate-heavy docs (rep_ratio > 0.2) are flagged
    drop; docs shorter than one 3-gram are out of scope (no signal)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    t = docs.select("doc_id", _toks(F.col("text")).alias("toks"))
    toks = F.col("toks")
    grams = F.transform(
        F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(0))),
        lambda x, i: F.concat_ws(
            " ", x, F.element_at(toks, i + 2), F.element_at(toks, i + 3)
        ),
    )
    g = t.select(
        "doc_id",
        F.size(grams).alias("total_grams"),
        F.size(F.array_distinct(grams)).alias("distinct_grams"),
    ).filter(F.col("total_grams") > 0)
    ratio = 1.0 - F.col("distinct_grams") / F.col("total_grams")
    return g.select(
        "doc_id",
        "total_grams",
        "distinct_grams",
        F.round(ratio, 4).alias("rep_ratio"),
        (ratio <= REPETITION_MAX).alias("keep"),
    )


# ----------------------------------------------------------------- PII ----

_EMAIL_RE = "[a-z0-9.]+@[a-z0-9.]+\\.[a-z]+"
_PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


@register(
    "text_pii_scrub",
    oracle=f"""
    WITH seeded AS (
        SELECT doc_id,
               text || CASE
                 WHEN doc_id % 5 = 0 THEN ' contact user' || doc_id ||
                      '@example.com now'
                 WHEN doc_id % 7 = 0 THEN ' call ' ||
                      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-555-' ||
                      lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE ''
               END AS text
        FROM documents WHERE length(text) > 0
    ),
    scrubbed AS (
        SELECT doc_id, text,
               regexp_replace(
                   regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{_PHONE_RE}', '<PHONE>', 'g') AS clean
        FROM seeded
    )
    SELECT doc_id,
           length(text) AS n_chars_raw,
           length(clean) AS n_chars_clean,
           length(text) <> length(clean) AS redacted
    FROM scrubbed
    """,
    category="corpus",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing as one regexp_replace map pass: emails and
    NNN-NNN-NNNN phone numbers are redacted to typed placeholders. The
    synthetic corpus carries no PII, so deterministic PII is seeded into
    a subset of docs first (doc_id-derived, replayed by the oracle) and
    the scrub is verified by exact before/after char counts. One scan,
    no shuffle; patterns are deliberately in the common subset of Java
    and RE2 regex dialects so both engines replace identically."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com now"),
                ),
            )
            .when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" call "),
                    F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
                    F.lit("-555-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                ),
            )
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return seeded.select(
        "doc_id",
        F.length("text").alias("n_chars_raw"),
        F.length(clean).alias("n_chars_clean"),
        (F.length("text") != F.length(clean)).alias("redacted"),
    )


# ------------------------------------------------------ BPE vocab step ----

#: adjacent-pair vocabulary slots reported (the merge-candidate shortlist)
BPE_TOP_PAIRS = 30


@register(
    "bpe_pair_counts",
    oracle=f"""
    WITH w AS (
        SELECT unnest(list_filter(
                   string_split_regex(lower(text), '[^a-z]+'),
                   x -> length(x) >= 2)) AS w
        FROM documents WHERE length(text) > 0
    ),
    p AS (
        SELECT unnest(list_transform(range(1, length(w)),
                                     i -> substring(w, i, 2))) AS pair
        FROM w
    )
    SELECT pair, count(*) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT {BPE_TOP_PAIRS}
    """,
    category="corpus",
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The inner step of BPE vocabulary training: corpus-wide frequencies
    of adjacent symbol pairs (here: character bigrams inside lowercased
    alphabetic words) — the counts that pick the next merge rule. Plan
    shape: tokenize + per-word pair expansion are narrow codegen'd array
    ops (transform over a sequence — no Python), the only shuffle is the
    final pair count with map-side partial aggregation, and the top-30
    shortlist compiles to TakeOrderedAndProject. At 100 TB the pair
    alphabet is bounded (26² here, vocab² in general), so the final
    aggregation state is tiny regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    words = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda x: F.length(x) >= 2,
            )
        ).alias("w")
    )
    # word-frequency table first — the trick every real BPE trainer uses:
    # pair expansion runs once per DISTINCT word (vocabulary-sized), and
    # occurrence counts flow through as weights. Result is identical to
    # per-occurrence expansion (sum of per-word counts x multiplicity),
    # so the oracle states the plain per-occurrence form.
    wc = words.groupBy("w").agg(F.count("*").alias("nw"))
    pairs = wc.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "nw",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("nw").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(BPE_TOP_PAIRS)
    )


# ------------------------------------------------- length distribution ----


@register(
    "corpus_length_histogram",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source,
               len(list_filter(string_split_regex(text, '\\s+'), x -> x <> ''))
                   AS n_tokens
        FROM documents WHERE length(text) > 0
    )
    SELECT CAST(floor(log2(n_tokens + 1)) AS BIGINT) AS len_bucket,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           min(n_tokens) AS min_tokens,
           max(n_tokens) AS max_tokens,
           CAST(sum(CASE WHEN n_tokens > {PACK_BUDGET} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_over_budget
    FROM d GROUP BY len_bucket
    """,
    category="corpus",
)
def corpus_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution for packing/curriculum planning:
    documents bucketed by floor(log2(tokens+1)) — the histogram that
    sizes packing bins, flags over-budget docs that must be split, and
    orders curriculum phases by length. One narrow map (token count is
    per-row array arithmetic, no explode) into one tiny-cardinality
    aggregation (≈ log2(max_len) groups at ANY corpus size) — the
    degenerate-shuffle shape that is effectively free at 100 TB.
    log2 hits exact IEEE values at bucket boundaries (powers of two), so
    the bucketing is engine-stable."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    d = docs.select(F.size(_toks(F.col("text"))).alias("n_tokens"))
    return d.groupBy(
        F.floor(F.log2(F.col("n_tokens") + 1)).alias("len_bucket")
    ).agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum(
            F.when(F.col("n_tokens") > PACK_BUDGET, 1).otherwise(0)
        ).alias("n_over_budget"),
    )


# -------------------------------------------------------- funnel report ----


def _funnel_oracle() -> str:
    from restaurant_etl_spark.operators.dedup import _registered_oracle
    from restaurant_etl_spark.operators.text_analysis import _STOP_SQL

    # s, mh, and c are MATERIALIZED: the final six-branch UNION references
    # c seven times and c pulls the whole minhash keep-list pipeline in
    # through flags — unmaterialized, DuckDB re-evaluated the entire
    # shingle/minhash subtree per branch (the CTE re-evaluation class the
    # r7 recall-report ENOSPC fix documented) and spilled >66 GB at sf10.
    # Values unchanged; only staging.
    return f"""
    WITH t AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
        FROM documents
    ),
    s AS MATERIALIZED (
        SELECT doc_id,
               length(text) > 0 AS nonempty,
               len(toks) AS n_tokens,
               len(list_distinct(toks)) AS n_distinct,
               len(list_filter(toks, x -> x IN {_STOP_SQL})) AS n_stop,
               regexp_matches(text, '[^\\x00-\\x7F]') AS non_ascii,
               md5(array_to_string(list_sort(list_distinct(toks)), ' ')) AS vocab_hash
        FROM t
    ),
    mh AS MATERIALIZED ({_registered_oracle("dedup_minhash_keep")}),
    flags AS (
        SELECT s.doc_id,
               s.nonempty,
               s.nonempty AND s.n_tokens >= 20
                   AND s.n_stop / s.n_tokens BETWEEN 0.01 AND 0.6
                   AND s.n_distinct / s.n_tokens >= 0.2 AS quality,
               NOT s.non_ascii AND round(s.n_stop / s.n_tokens, 4) >= 0.05 AS english,
               s.doc_id = min(s.doc_id) OVER (PARTITION BY s.vocab_hash) AS exact_kept,
               coalesce(mh.is_kept, TRUE) AS near_kept
        FROM s LEFT JOIN mh ON s.doc_id = mh.doc_id
    ),
    c AS MATERIALIZED (
        SELECT count(*) AS n_raw,
               sum(CASE WHEN nonempty THEN 1 ELSE 0 END) AS n2,
               sum(CASE WHEN nonempty AND quality THEN 1 ELSE 0 END) AS n3,
               sum(CASE WHEN nonempty AND quality AND english THEN 1 ELSE 0 END) AS n4,
               sum(CASE WHEN nonempty AND quality AND english AND exact_kept
                        THEN 1 ELSE 0 END) AS n5,
               sum(CASE WHEN nonempty AND quality AND english AND exact_kept
                        AND near_kept THEN 1 ELSE 0 END) AS n6
        FROM flags
    )
    SELECT u.stage, CAST(u.n_docs AS BIGINT) AS n_docs,
           round(u.n_docs * 1.0 / c.n_raw, 4) AS retained_pct
    FROM c, (
        SELECT '1_raw' AS stage, n_raw AS n_docs FROM c UNION ALL
        SELECT '2_nonempty', n2 FROM c UNION ALL
        SELECT '3_quality', n3 FROM c UNION ALL
        SELECT '4_english', n4 FROM c UNION ALL
        SELECT '5_exact_dedup', n5 FROM c UNION ALL
        SELECT '6_near_dedup', n6 FROM c
    ) u
    """


@register("corpus_funnel_report", oracle=_funnel_oracle(), category="corpus")
def corpus_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage attrition funnel of the composed cleaning pipeline — the
    observability artifact a data-curation run publishes next to its
    output: how many documents survive raw → nonempty → quality gate →
    language gate → exact dedup → near dedup (cumulative, in pipeline
    order). Composes the REGISTERED gate operators by doc_id joins, so
    the funnel counts are by construction consistent with what
    corpus_clean_keep actually keeps; docs outside the near-dup keep-list
    (too short for a shingle) count as kept — absence of evidence is not
    a duplicate. One wide scan + key joins + a single-row aggregate
    unpivoted to 6 stage rows."""
    from restaurant_etl_spark.operators.dedup import (
        dedup_exact_documents,
        dedup_minhash_keep,
    )
    from restaurant_etl_spark.operators.text_analysis import (
        text_lang_id,
        text_quality_score,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.length("text") > 0).alias("nonempty")
    )
    q = (
        text_quality_score(spark, sf_dir)
        .filter(F.col("quality_band") == "keep")
        .select("doc_id", F.lit(True).alias("quality"))
    )
    en = (
        text_lang_id(spark, sf_dir)
        .filter(F.col("guessed_lang") == "en")
        .select("doc_id", F.lit(True).alias("english"))
    )
    ex = dedup_exact_documents(spark, sf_dir).select(
        "doc_id", F.col("is_kept").alias("exact_kept")
    )
    mh = dedup_minhash_keep(spark, sf_dir).select(
        "doc_id", F.col("is_kept").alias("near_kept")
    )
    flags = (
        docs.join(q, "doc_id", "left")
        .join(en, "doc_id", "left")
        .join(ex, "doc_id", "left")
        .join(mh, "doc_id", "left")
        .select(
            "nonempty",
            (F.col("nonempty") & F.coalesce("quality", F.lit(False))).alias("s3"),
            F.coalesce("english", F.lit(False)).alias("has_en"),
            F.coalesce("exact_kept", F.lit(False)).alias("has_ex"),
            F.coalesce("near_kept", F.lit(True)).alias("has_mh"),
        )
    )
    c = flags.agg(
        F.count("*").alias("n1"),
        F.sum(F.when(F.col("nonempty"), 1).otherwise(0)).alias("n2"),
        F.sum(F.when(F.col("s3"), 1).otherwise(0)).alias("n3"),
        F.sum(F.when(F.col("s3") & F.col("has_en"), 1).otherwise(0)).alias("n4"),
        F.sum(
            F.when(F.col("s3") & F.col("has_en") & F.col("has_ex"), 1).otherwise(0)
        ).alias("n5"),
        F.sum(
            F.when(
                F.col("s3") & F.col("has_en") & F.col("has_ex") & F.col("has_mh"), 1
            ).otherwise(0)
        ).alias("n6"),
    )
    stages = c.selectExpr(
        "n1",
        "stack(6, '1_raw', n1, '2_nonempty', n2, '3_quality', n3, "
        "'4_english', n4, '5_exact_dedup', n5, '6_near_dedup', n6) "
        "AS (stage, n_docs)"
    )
    return stages.select(
        "stage",
        "n_docs",
        F.round(F.col("n_docs") / F.col("n1"), 4).alias("retained_pct"),
    )


# ------------------------------------------------------- BPE apply ----

#: number of learned merge rules applied by bpe_apply_merges, and the
#: size of its output token shortlist
BPE_N_MERGES = 8
BPE_APPLY_TOP = 30


def _bpe_chain_sql(n_merges: int = BPE_N_MERGES) -> str:
    """Nested replace() chain applying merge rules p1..pN in rank order —
    IDENTICAL text in Spark SQL and DuckDB (replace / substring / || are
    shared), so both engines run the same left-to-right non-overlapping
    pass per rule. Expects columns seq, p1..pN in scope."""
    expr = "seq"
    for i in range(1, n_merges + 1):
        expr = (
            f"replace({expr}, ' ' || substring(p{i}, 1, 1) || ' ' || "
            f"substring(p{i}, 2, 1) || ' ', ' ' || p{i} || ' ')"
        )
    return expr


def _bpe_mp_cols(n_merges: int = BPE_N_MERGES) -> str:
    return ", ".join(
        f"max(CASE WHEN rn = {i} THEN pair END) AS p{i}"
        for i in range(1, n_merges + 1)
    )


@register(
    "bpe_apply_merges",
    oracle=f"""
    WITH w AS (
        SELECT unnest(list_filter(
                   string_split_regex(lower(text), '[^a-z]+'),
                   x -> length(x) >= 2)) AS w
        FROM documents WHERE length(text) > 0
    ),
    pc AS (
        SELECT unnest(list_transform(range(1, length(w)),
                                     i -> substring(w, i, 2))) AS pair
        FROM w
    ),
    ranked AS (
        SELECT pair, row_number() OVER (ORDER BY count(*) DESC, pair) AS rn
        FROM pc GROUP BY pair
    ),
    mp AS (SELECT {_bpe_mp_cols()} FROM ranked WHERE rn <= {BPE_N_MERGES}),
    seqs AS (
        SELECT ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS seq FROM w
    ),
    applied AS (
        SELECT {_bpe_chain_sql()} AS merged FROM seqs, mp
    ),
    toks AS (
        SELECT unnest(list_filter(string_split(merged, ' '), x -> x <> '')) AS token
        FROM applied
    )
    SELECT token, count(*) AS n
    FROM toks GROUP BY token
    ORDER BY n DESC, token
    LIMIT {BPE_APPLY_TOP}
    """,
    category="corpus",
)
def bpe_apply_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLICATION — the step after bpe_pair_counts picks
    merge rules: the top BPE_N_MERGES character pairs (by corpus
    frequency, pair as tiebreak) are applied in rank order to every
    word's space-separated symbol sequence, one left-to-right
    non-overlapping replace pass per rule (a deterministic variant of
    greedy BPE apply — both engines share the exact replace() chain
    text, so agreement holds by construction). Output: the corpus's top
    post-merge token frequencies, where the learned merges ('th', 'in',
    ...) surface as single symbols.

    Scale shape: the merge table is ONE row (pivoted p1..pN) broadcast
    to every task; the replace chain is per-row codegen'd string work;
    the only shuffles are the bounded pair-count aggregation (26² state)
    and the final bounded token count → TakeOrderedAndProject. No
    driver collect — the learned rules flow through the plan as data."""
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    words = docs.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z]+"),
                lambda x: F.length(x) >= 2,
            )
        ).alias("w")
    )
    # word-frequency table: the replace chain runs once per DISTINCT word
    # (vocabulary-sized — the real-BPE-trainer shape), with occurrence
    # counts carried as weights; identical result to per-occurrence
    # application, so the oracle states the plain form. Materialized once:
    # both the rule learner and the apply side consume it.
    wc = words.groupBy("w").agg(F.count("*").alias("nw")).localCheckpoint()
    pairs = wc.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
        "nw",
    )
    from pyspark.sql.window import Window

    ranked = (
        pairs.groupBy("pair")
        .agg(F.sum("nw").alias("n"))
        .withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("n"), "pair"))
        )
        .filter(F.col("rn") <= BPE_N_MERGES)
    )
    mp = ranked.agg(*[
        F.max(F.when(F.col("rn") == i, F.col("pair"))).alias(f"p{i}")
        for i in range(1, BPE_N_MERGES + 1)
    ])
    seqs = wc.select(
        F.concat(F.lit(" "), F.expr(r"regexp_replace(w, '(.)', '$1 ')")).alias("seq"),
        "nw",
    )
    applied = seqs.crossJoin(F.broadcast(mp)).select(
        F.expr(_bpe_chain_sql()).alias("merged"), "nw"
    )
    toks = applied.select(
        F.explode(F.filter(F.split(F.col("merged"), " "), lambda x: x != "")).alias("token"),
        "nw",
    )
    return (
        toks.groupBy("token")
        .agg(F.sum("nw").alias("n"))
        .orderBy(F.desc("n"), "token")
        .limit(BPE_APPLY_TOP)
    )
