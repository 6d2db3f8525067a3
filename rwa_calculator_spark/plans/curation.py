"""Training-data curation operators: deterministic stratified sampling,
source-mixture weighting, and concat-and-chunk sequence packing.

These are the corpus-assembly steps that sit between the cleaning ops
(plans/llm.py dedup / quality / language-ID) and the trainer: choose how
much of each stratum to keep, rebalance sources toward a target token
mixture, and pack the surviving documents into fixed-length context
windows. All three are pure DataFrame ops — sampling decisions come from a
cross-engine md5 hash (functions/text.py hash32), never rand(), so runs
are reproducible on any cluster layout and the DuckDB oracle can replay
them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from rwa_calculator_spark.functions.text import (
    hash32,
    seeded_hash32,
    sql_hash32,
    sql_seeded_hash32,
)
from rwa_calculator_spark.plans.registry import query
from rwa_calculator_spark.sources.star import load_table

# per-mille keep rates by language stratum: downsample the high-resource
# languages, keep the tail in full (the usual rebalancing shape)
_KEEP_PERMILLE = {"en": 250, "fr": 500, "es": 500, "de": 1000, "zh": 1000}
_DEFAULT_PERMILLE = 100

# target token-share per source bucket for the mixture (sums to 1.0)
_MIX_WEIGHTS = {f"src{i}": (0.08 if i < 10 else 0.02) for i in range(20)}

_SEQ_LEN = 2048  # context-window length in whitespace tokens


def _keep_case_sql() -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in _KEEP_PERMILLE.items())
    return f"(CASE lang {whens} ELSE {_DEFAULT_PERMILLE} END)"


def _keep_case_col() -> F.Column:
    c = None
    for k, v in _KEEP_PERMILLE.items():
        c = F.when(F.col("lang") == k, v) if c is None else c.when(F.col("lang") == k, v)
    return c.otherwise(_DEFAULT_PERMILLE)


@query(
    "sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE ({sql_hash32("'samp:' || CAST(doc_id AS VARCHAR)")} % 1000) < {_keep_case_sql()}
    """,
    tags=("llm", "curation"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: keep a per-language fraction of
    documents, decided by a salted content-independent hash of the key —
    not rand() — so the sample is identical across engines, re-runs, and
    cluster layouts, and membership is checkable row-by-row. At 100 TB
    this is a map-only filter (no shuffle, fully pushed into the scan
    stage); changing rates re-uses the same hash so strata are nested
    (a 25% sample is a subset of a 50% sample)."""
    d = load_table(spark, sf_dir, "documents")
    u = hash32(F.concat(F.lit("samp:"), F.col("doc_id").cast("string"))) % 1000
    return d.where(u < _keep_case_col()).select("doc_id", "lang")


def _mix_weight_sql() -> str:
    whens = " ".join(f"WHEN '{k}' THEN {v}" for k, v in _MIX_WEIGHTS.items())
    return f"(CASE source {whens} ELSE 0.0 END)"


def _mix_weight_col() -> F.Column:
    c = None
    for k, v in _MIX_WEIGHTS.items():
        c = F.when(F.col("source") == k, v) if c is None else c.when(F.col("source") == k, v)
    return c.otherwise(0.0)


@query(
    "mixture_weighting",
    oracle=f"""
    WITH per_source AS (
        SELECT source, count(*) AS n_docs,
               sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
        FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER (), 9) AS natural_share,
           {_mix_weight_sql()} AS target_weight,
           round({_mix_weight_sql()}
                 / (CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER ()), 9) AS repetition_factor
    FROM per_source
    """,
    tags=("llm", "curation"),
)
def mixture_weighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture rebalancing: per-source token counts, natural share,
    target weight, and the repetition factor (epochs of that source per
    corpus epoch = target/natural) the sampler applies. One hash
    aggregation over the corpus reduced to |sources| rows; the window
    total runs on those few rows, so the 100 TB cost is a single map-side
    combinable agg."""
    d = load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    total = F.sum("n_tokens").over(W.partitionBy())
    natural = F.col("n_tokens").cast("double") / total
    return per_source.select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(natural, 9).alias("natural_share"),
        _mix_weight_col().alias("target_weight"),
        F.round(_mix_weight_col() / natural, 9).alias("repetition_factor"),
    )


@query(
    "pack_sequences",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, len(string_split(text, ' '))::BIGINT AS tok
        FROM documents
    ), cum AS (
        SELECT lang, doc_id, tok,
               COALESCE(sum(tok) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_off
        FROM toks
    )
    SELECT lang,
           CAST(floor(start_off / {_SEQ_LEN}.0) AS BIGINT) AS seq_id,
           count(*) AS n_docs,
           sum(tok)::BIGINT AS n_tokens,
           min(doc_id) AS first_doc
    FROM cum GROUP BY 1, 2
    """,
    tags=("llm", "curation"),
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing (the GPT-style pretraining layout):
    per language stream, documents in deterministic doc_id order are laid
    end-to-end and cut into fixed {_SEQ_LEN}-token windows; each document
    belongs to the sequence where it starts (exclusive running offset /
    seq_len). Pure window cumsum + floor-divide — one shuffle on the
    stream key. The no-straddle bin-packing variant is inherently
    sequential per stream; this form is the one production pretraining
    pipelines actually use, and it parallelises."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("tok")
    )
    w = (
        W.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    cum = toks.withColumn("start_off", F.coalesce(F.sum("tok").over(w), F.lit(0)))
    return (
        cum.groupBy(
            "lang",
            F.floor(F.col("start_off") / float(_SEQ_LEN)).cast("long").alias("seq_id"),
        )
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok").cast("long").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
        )
    )


@query(
    "quality_importance_sample",
    oracle=f"""
    WITH scored AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_words,
               CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS uniq_ratio,
               least(CAST(len(string_split(text, ' ')) AS DOUBLE) / 100.0, 1.0)
                   AS len_score
        FROM documents
    ), weighted AS (
        SELECT *,
               round(len_score * uniq_ratio * len_score * uniq_ratio, 12) AS p_accept,
               CAST({sql_seeded_hash32(7, "CAST(doc_id AS VARCHAR)")} % 1000000
                    AS DOUBLE) / 1000000.0 AS u
        FROM scored
    )
    SELECT lang,
           count(*) AS n_docs,
           sum(CASE WHEN u < p_accept THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
           sum(CAST(round(p_accept * 1000000.0, 0) AS BIGINT)) / 1000000.0
               AS expected_sample_size
    FROM weighted GROUP BY lang
    """,
    tags=("llm", "curation"),
)
def quality_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted importance sampling (the DSIR/DCLM-style soft
    filter, in contrast to sample_stratified's hard quotas): each document
    gets an acceptance probability p = (length_score · uniqueness_ratio)²
    — quadratic up-weighting of high-quality docs — and a deterministic
    uniform draw from a seeded hash of its id, so the SAME documents are
    selected on every engine and every run (re-shardable at 100 TB: the
    decision is a pure row function, no global state, no RNG)."""
    d = load_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    n_words = F.size(w)
    uniq_ratio = F.size(F.array_distinct(w)).cast("double") / n_words.cast("double")
    len_score = F.least(n_words.cast("double") / 100.0, F.lit(1.0))
    p = F.round(len_score * uniq_ratio * len_score * uniq_ratio, 12)
    u = (
        seeded_hash32(7, F.col("doc_id").cast("string")) % 1000000
    ).cast("double") / 1000000.0
    scored = d.select("doc_id", "lang", p.alias("p_accept"), u.alias("u"))
    return scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("u") < F.col("p_accept"), 1).otherwise(0))
        .cast("long")
        .alias("n_sampled"),
        (
            F.sum(F.round(F.col("p_accept") * 1000000.0, 0).cast("long"))
            / 1000000.0
        ).alias("expected_sample_size"),
    )


# per-domain document cap (web-corpus curation: a handful of domains
# dominate a crawl; capping docs/domain before training is standard —
# the C4/Gopher pipelines cap or downweight dominant hosts)
_DOMAIN_CAP = 15


@query(
    "curation_domain_cap",
    oracle=f"""
    WITH feats AS (
        SELECT doc_id, source,
               CAST(length(text) - len(string_split(text, ' ')) + 1 AS DOUBLE)
                   / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mwl
        FROM documents
    ), ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY source ORDER BY mwl DESC, doc_id
               ) AS rn
        FROM feats
    )
    SELECT source,
           CAST(sum(CASE WHEN rn <= {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(sum(CASE WHEN rn > {_DOMAIN_CAP} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped,
           CAST(sum(CASE WHEN rn <= {_DOMAIN_CAP} THEN doc_id END) AS BIGINT)
               AS kept_doc_id_sum,
           sum(CASE WHEN rn <= {_DOMAIN_CAP}
               THEN CAST(round(mwl * 10000.0, 0) AS BIGINT) END)
               / CAST(10000 AS DOUBLE) AS kept_mwl_sum
    FROM ranked GROUP BY source
    """,
    tags=("llm", "curation"),
)
def curation_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep the top-{cap} docs per source ranked
    by word-density quality (mean word length desc, doc_id tiebreak), drop
    the tail. One partitioned window — at 100 TB this is a shuffle keyed
    by domain; heavy-tail hosts are the classic skew key, so the at-scale
    variant pre-filters with an approximate per-domain count and salts the
    dominant hosts (operators/skew.py) before the exact window."""
    d = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split("text", " "))
    mwl = (F.length("text").cast("long") - n_words + 1).cast("double") / n_words.cast(
        "double"
    )
    ranked = d.select("doc_id", "source", mwl.alias("mwl")).withColumn(
        "rn",
        F.row_number().over(
            W.partitionBy("source").orderBy(F.col("mwl").desc(), "doc_id")
        ),
    )
    kept = F.col("rn") <= _DOMAIN_CAP
    return ranked.groupBy("source").agg(
        F.sum(F.when(kept, 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(~kept, 1).otherwise(0)).cast("long").alias("n_dropped"),
        F.sum(F.when(kept, F.col("doc_id"))).cast("long").alias("kept_doc_id_sum"),
        (
            F.sum(F.when(kept, F.round(F.col("mwl") * 10000.0, 0).cast("long")))
            / 10000.0
        ).alias("kept_mwl_sum"),
    )


@query(
    "corpus_vocab_topk",
    oracle="""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    )
    SELECT token, count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs
    FROM toks WHERE token <> ''
    GROUP BY token
    ORDER BY n_occurrences DESC, token
    LIMIT 50
    """,
    tags=("llm", "text"),
)
def corpus_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: global token frequencies with document
    frequencies, top-50 by count (the df side feeds TF-IDF/BM25-style
    quality signals and tokenizer-vocab diagnostics). Map-side-combinable
    aggregation over exploded tokens; the top-k is a TakeOrdered over the
    vocab-sized aggregate, never a full sort of the token stream."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).where(F.col("token") != "")
    return (
        toks.groupBy("token")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), "token")
        .limit(50)
    )
