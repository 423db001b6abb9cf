"""Corpus-curation operators beyond dedup: benchmark decontamination
and stratified sampling.

Decontamination is the training-data op that keeps evaluation
benchmarks honest: any document sharing enough word n-grams with the
held-out set is flagged (the standard 8-13-gram collision methodology,
here 5-grams sized to the synthetic corpus). Scale shape: the eval
set is bounded (benchmarks are tiny next to a 100 TB corpus), so its
distinct gram set is BROADCAST — the corpus-side scan never shuffles
on gram; each doc's grams stream map-side against the broadcast hash
set and only the per-doc counters (one row per doc) hit the shuffle.

Stratified sampling keeps per-group proportions that a uniform sample
would miss on skewed strata: deterministic hash-rank within each
stratum, take ceil(frac * stratum_size). One hash partition by
stratum; no driver-side stratum enumeration, so 10^6 strata cost the
same plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dpu_olap_spark.functions.text import base_hash60, shingles, tokens
from dpu_olap_spark.registry import query
from dpu_olap_spark.sources.tables import load_table

# eval stand-in: every 41st doc (~2.5% of the corpus) plays the role of
# the held-out benchmark. Real pipelines use 8-13-gram collisions; the
# synthetic corpus draws from a ~20-word vocabulary where 5-grams
# almost never repeat across docs (the query returned 0 rows —
# vacuous), so the gram size is 3 here to make contamination
# observable. The operator is gram-size-parametric either way.
_EVAL_MOD = 41
_NGRAM = 3


def _doc_grams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (doc_id, gram) pairs over word n-grams. Deduplication
    is WITHIN one document, so array_distinct before the explode does
    it map-side — an explode().distinct() would shuffle every gram row
    for the same result (measured 24s -> map-local at probe scale)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # token array hoisted into its own projection so the shingle
    # lambda slices a materialized array instead of re-splitting the
    # text per shingle (r18 optimization round, guide §1.2; measured
    # 0.774s -> 0.413s on the paragraph twin of this shape at sf0.1)
    return (
        docs.select("doc_id", tokens(F.col("text")).alias("w"))
        .where(F.size("w") >= _NGRAM)
        .select(
            "doc_id",
            F.explode(F.array_distinct(shingles(F.col("w"), _NGRAM))).alias("g"),
        )
    )


@query(
    "decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= {_NGRAM}
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+{_NGRAM - 1}], ' ') AS g
      FROM (SELECT doc_id, t, unnest(range(1, len(t) - {_NGRAM - 2})) AS i
            FROM toks)
    ),
    eval_grams AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % {_EVAL_MOD} = 0
    ),
    corpus AS (SELECT * FROM grams WHERE doc_id % {_EVAL_MOD} <> 0)
    SELECT c.doc_id,
           COUNT(*) AS n_grams,
           COUNT(e.g) AS n_contam,
           CAST(COUNT(e.g) AS DOUBLE) / COUNT(*) AS contam_ratio
    FROM corpus c LEFT JOIN eval_grams e ON c.g = e.g
    GROUP BY c.doc_id
    HAVING COUNT(e.g) > 0
    """,
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs sharing >=1 distinct
    n-gram with the held-out set, with overlap counts and ratio. The
    eval gram set is broadcast (bounded by benchmark size, never by
    corpus size); the only shuffle is the per-doc counter aggregation."""
    grams = _doc_grams(spark, sf_dir)
    eval_grams = (
        grams.where(F.col("doc_id") % _EVAL_MOD == 0).select("g").distinct()
    )
    corpus = grams.where(F.col("doc_id") % _EVAL_MOD != 0)
    hit = F.broadcast(eval_grams.withColumn("hit", F.lit(1)))
    return (
        corpus.join(hit, "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("hit").alias("n_contam"),
        )
        .where(F.col("n_contam") > 0)
        .withColumn(
            # unrounded int ratio: identical doubles both engines (r11)
            "contam_ratio",
            (F.col("n_contam") / F.col("n_grams")).cast("double"),
        )
    )


@query(
    "observed_clean",
    oracle="""
    SELECT doc_id, lang, n_chars
    FROM documents
    WHERE n_chars >= 120 AND lang IN ('en', 'de', 'fr')
    """,
)
def q_observed_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality filter with the Observation API attached: corpus-level
    counters (rows scanned, rows kept, total chars) ride the SAME
    single pass as the filter — a CollectMetrics node in the plan, no
    second scan. At 100 TB this is how a curation pipeline accounts
    its yield (kept/dropped/byte totals) without doubling I/O; the
    driver fetches the metrics after the action with no extra job.
    The observed values are exactness-asserted against DuckDB in
    tests/test_llm_ops.py; the row result carries the oracle here."""
    from pyspark.sql import Observation

    docs = load_table(spark, sf_dir, "documents")
    obs = Observation()
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("rows_scanned"),
        F.sum(F.col("n_chars").cast("bigint")).alias("chars_scanned"),
    )
    return observed.where(
        (F.col("n_chars") >= 120) & (F.col("lang").isin("en", "de", "fr"))
    ).select("doc_id", "lang", "n_chars")


_RESERVOIR_K = 7


@query(
    "reservoir_sample",
    oracle=f"""
    SELECT event_type, event_id, user_id, value FROM (
      SELECT event_type, event_id, user_id, value,
             ROW_NUMBER() OVER (
               PARTITION BY event_type
               ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
             ) AS rk
      FROM events
    ) WHERE rk <= {_RESERVOIR_K}
    """,
)
def q_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-capacity per-group sample (reservoir semantics, K rows
    per group regardless of group size) via deterministic hash rank:
    rank rows inside each group by md5(key) — a uniform-looking but
    reproducible order — and keep the first K. Equivalent in
    distribution to reservoir sampling with the hash as the random
    tape, but stable across engines, runs, retries, and cluster
    sizes, which is what a training-data pipeline actually needs
    (true reservoir state is order-dependent and unreproducible
    under Spark's partition nondeterminism). Scale: this executes as
    PARTIAL/FINAL top-K (the TakeOrdered shape) — Catalyst's
    InferWindowGroupLimit rewrites the rank()<=K filter into a
    map-side WindowGroupLimit(Partial) BEFORE the group-key exchange,
    so each input task locally keeps <=K rows per event_type and the
    shuffle carries only <=K*groups*tasks survivors; the <=5
    event_type reducers then sort survivor rows, never the corpus.
    tests/test_plans.py pins the Partial->Exchange->Final shape (it
    holds only for rank-like functions with K under
    spark.sql.window.group.limit.threshold=1000 — keep both true),
    and tools/scale_probe.py's Zipfian section verifies shuffle rows
    stay flat as the hot group grows."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    return (
        ev.select(
            "event_type",
            "event_id",
            "user_id",
            "value",
            F.row_number().over(w).alias("rk"),
        )
        .where(F.col("rk") <= _RESERVOIR_K)
        .drop("rk")
    )


@query(
    "stratified_sample",
    oracle="""
    WITH ranked AS (
      SELECT lang, source, doc_id, n_chars,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rk,
             COUNT(*) OVER (PARTITION BY lang) AS n_stratum
      FROM documents
    )
    SELECT lang, doc_id, source, n_chars, n_stratum
    FROM ranked
    WHERE rk <= CAST(CEIL(0.2 * n_stratum) AS BIGINT)
    """,
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """20% stratified sample per language: deterministic md5-of-key
    rank inside each stratum (reproducible across runs and engines —
    no RNG), take ceil(frac * stratum_size). Small strata keep at
    least one row; proportions hold per group, unlike a uniform
    sample over skewed strata."""
    frac = 0.2
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select(
        "lang",
        "doc_id",
        "source",
        "n_chars",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n_stratum"),
    )
    return ranked.where(
        F.col("rk") <= F.ceil(frac * F.col("n_stratum")).cast("bigint")
    ).drop("rk")


# Deterministic PII injection for redaction testing: the synthetic
# corpus contains no natural emails/phones, so every 7th doc gets a
# constructed contact string appended IDENTICALLY on both engines —
# redaction is then observable (counts >= 1 on injected docs), not
# vacuous. Patterns use only syntax Java regex and RE2 agree on
# (char classes, bounded quantifiers — no backrefs/lookaround).
_PII_MOD = 7
_EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
_PHONE_RE = "[0-9]{3}-[0-9]{4}"


@query(
    "redact_pii",
    oracle=f"""
    WITH injected AS (
      SELECT doc_id, lang,
             CASE WHEN doc_id % {_PII_MOD} = 0
                  THEN concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                              '@example.com or 555-',
                              lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))
                  ELSE text END AS itext
      FROM documents
    )
    SELECT doc_id, lang,
           CAST(len(regexp_extract_all(itext, '{_EMAIL_RE}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(itext, '{_PHONE_RE}')) AS BIGINT)
             AS n_phones,
           md5(regexp_replace(regexp_replace(itext, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS redacted_fp
    FROM injected
    """,
)
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (training-corpus scrub): match and replace email
    addresses and phone-shaped digit runs, returning per-doc match
    counts and a fingerprint of the redacted text. Map-side only —
    regex runs inside whole-stage codegen, no shuffle, no Python; at
    100 TB this is a pure scan-transform whose cost is the regex
    engine, which is exactly where it should be."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    itext = F.when(
        F.col("doc_id") % _PII_MOD == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    injected = docs.select("doc_id", "lang", itext.alias("itext"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("itext"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return injected.select(
        "doc_id",
        "lang",
        F.regexp_count(F.col("itext"), F.lit(_EMAIL_RE)).cast("bigint").alias("n_emails"),
        F.regexp_count(F.col("itext"), F.lit(_PHONE_RE)).cast("bigint").alias("n_phones"),
        F.md5(redacted).alias("redacted_fp"),
    )


@query(
    "repetition_score",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= {_NGRAM}
    ),
    grams AS (
      SELECT doc_id, lang,
             [array_to_string(t[i:i+{_NGRAM - 1}], ' ')
              FOR i IN range(1, len(t) - {_NGRAM - 2})] AS gs
      FROM toks
    )
    SELECT doc_id, lang,
           len(gs) AS n_grams,
           len(list_distinct(gs)) AS n_distinct,
           1.0 - CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs)
             AS rep_ratio
    FROM grams
    """,
)
def q_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (Gopher-style quality signal): the
    fraction of word n-grams that are repeats of an earlier n-gram in
    the same doc. Entirely map-side — the gram list never explodes and
    never shuffles; a quality gate would filter on rep_ratio before
    any expensive pipeline stage."""
    docs = load_table(spark, sf_dir, "documents")
    # staged projections (r18 optimization round, guide §1.2): the old
    # single projection referenced the shingle array FOUR times (two
    # sizes, each used twice) with the token split inlined in the
    # transform lambda — the split and the whole gram build re-ran per
    # reference.  Materializing w -> gs -> the two counts makes each
    # stage compute once; the ratio then reads the counts.
    staged = (
        docs.select("doc_id", "lang", tokens(F.col("text")).alias("w"))
        .where(F.size("w") >= _NGRAM)
        .select("doc_id", "lang", shingles(F.col("w"), _NGRAM).alias("gs"))
        .select(
            "doc_id",
            "lang",
            F.size("gs").alias("ng"),
            F.size(F.array_distinct("gs")).alias("nd"),
        )
    )
    return staged.select(
        "doc_id",
        "lang",
        F.col("ng").cast("bigint").alias("n_grams"),
        F.col("nd").cast("bigint").alias("n_distinct"),
        # unrounded: 1.0 - int-ratio, identical doubles both engines
        (1.0 - F.col("nd").cast("double") / F.col("ng"))
        .cast("double")
        .alias("rep_ratio"),
    )


@query(
    "train_test_split",
    oracle="""
    WITH tagged AS (
      SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
                  ELSE 'test' END AS split,
             lang, n_chars
      FROM documents
    )
    SELECT split,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           COUNT(DISTINCT lang) AS n_langs
    FROM tagged
    GROUP BY split
    """,
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~90/5/5 train/val/test assignment: the first hex
    byte of md5(doc_id) partitions the keyspace by STRING comparison
    ('e6' = 230/256 ≈ 89.8%, 'f3' = 243/256 ≈ 94.9%), so membership is
    a pure function of the key — reproducible across engines, runs,
    and re-shards, with no RNG and no driver-side assignment table.
    New documents land in a stable split forever (the property that
    keeps eval sets uncontaminated as a 100 TB corpus grows). Output
    is the per-split accounting a dataset card needs; the split tag
    itself is a map-side column any writer can partition by."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(bucket < "e6", "train").when(bucket < "f3", "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.count_distinct("lang").alias("n_langs"),
        )
    )


@query(
    "cross_source_overlap",
    oracle="""
    WITH fps AS (
      SELECT DISTINCT
             md5(array_to_string(string_split(text, ' ')[1:5], ' ')) AS fp,
             source
      FROM documents
    )
    SELECT a.source AS source_a,
           b.source AS source_b,
           COUNT(*) AS n_shared
    FROM fps a JOIN fps b ON a.fp = b.fp AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def q_cross_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-overlap matrix on leading-content fingerprints
    (md5 of the first 5 tokens — the boilerplate/mirror detector;
    exact-text overlap is zero in this corpus, so prefix fingerprints
    make the measurement observable). Scale shape: distinct (fp,
    source) first — one shuffle on fp — then a self-join that is
    bucket-local per fingerprint; group sizes are bounded by the
    number of sources, so no fingerprint bucket can explode the join.
    The full-corpus analog answers "which crawls mirror each other"
    before any pair-level dedup spend."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.concat_ws(" ", F.slice(tokens(F.col("text")), 1, 5)))
    # one shuffle on fp collapses each fingerprint to its source SET
    # (bounded by the number of sources); pair expansion then happens
    # inside the row — no self-join, no second pass over the corpus —
    # and the pair aggregation partial-combines map-side. Two shuffles
    # total versus four for the distinct + self-join formulation.
    src_sets = (
        docs.select(fp.alias("fp"), "source")
        .groupBy("fp")
        .agg(F.sort_array(F.collect_set("source")).alias("ss"))
        .where(F.size("ss") >= 2)
    )
    pairs = (
        src_sets.select(F.explode("ss").alias("source_a"), "ss")
        .select("source_a", F.explode("ss").alias("source_b"))
        .where(F.col("source_a") < F.col("source_b"))
    )
    return pairs.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_shared")
    )


@query(
    "quality_sample",
    oracle="""
    SELECT doc_id, source, lang, n_chars
    FROM documents
    WHERE CASE
            WHEN n_chars >= 1500 THEN TRUE
            WHEN n_chars >= 500
              THEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '8'
            ELSE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
          END
    """,
)
def q_quality_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted downsampling with tiered retention — the
    standard corpus-shaping move (keep all high-quality documents,
    thin the middle, heavily thin the tail) done DETERMINISTICALLY:
    each tier's Bernoulli draw is a fixed md5-prefix threshold on the
    doc key, so membership is a pure function of (doc_id, tier),
    reproducible across engines, runs, and cluster sizes, and stable
    under corpus growth (a new doc never flips an old doc's draw —
    same property as train_test_split). Long docs (>=1500 chars) keep
    100%, mid 50%, short 12.5%. Map-side only: one scan, the CASE
    folds into the scan filter, no shuffle, no RNG state."""
    d = load_table(spark, sf_dir, "documents")
    h1 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    keep = (
        F.when(F.col("n_chars") >= 1500, F.lit(True))
        .when(F.col("n_chars") >= 500, h1 < "8")
        .otherwise(h1.isin("0", "1"))
    )
    return d.where(keep).select("doc_id", "source", "lang", "n_chars")


_MIX_BUDGET_CHARS = 50_000  # per-source char budget for the mix


@query(
    "corpus_mix",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                                ROWS UNBOUNDED PRECEDING) - n_chars AS prior_chars
      FROM documents
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars_taken
    FROM r WHERE prior_chars < {_MIX_BUDGET_CHARS}
    GROUP BY source
    """,
)
def q_corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget corpus mixing: draw a deterministic md5-ordered
    prefix of each source until that source's char budget fills —
    how training mixes hit target source ratios ("50 k chars of web,
    50 k of code, ...") without a shuffle-the-world sort. A document
    is taken while the EXCLUSIVE running sum of chars before it is
    under budget, so the result overshoots by at most one document per
    source and never depends on partitioning.

    Two-phase at scale: phase 1 keeps, PER INPUT PARTITION and per
    source, only the md5-smallest prefix of docs whose exclusive
    running chars stay under budget — a superset of the global
    selection, because a row's partition-local prior never exceeds
    its global prior; phase 2 runs the true per-source prefix sum
    over that bounded candidate set.

    Phase 1 is EXCHANGE-FREE (r6 verdict #4: the earlier
    window-on-(spark_partition_id, source) form still shuffled the
    whole corpus once): a mapInPandas fold keeps a per-source
    candidate frame, and per Arrow batch concat+sort+cumsum-prefixes
    it back down to budget — all vectorized pandas, state bounded by
    ~budget chars per source. The fold is batch-split-independent: a
    row dropped after any batch has prior >= budget within the rows
    seen so far, and priors only grow as rows arrive, so it can never
    re-enter the prefix. The md5 rank is computed JVM-side BEFORE the
    Python hop and rides through as a column, so Python does no
    hashing. Phase 2's per-source exchange then carries <= budget x P
    chars per source, the only shuffle in the plan (gate:
    tests/test_plans.py::test_corpus_mix_two_phase_budget).
    Output: per-source docs-taken and chars-taken (the realized mix).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return budget_mix(docs, _MIX_BUDGET_CHARS)


def budget_mix(docs: DataFrame, budget: int) -> DataFrame:
    """The corpus_mix pipeline over any (doc_id, source, n_chars)
    frame — shared by q_corpus_mix and tools/scale_probe.py so probe
    numbers measure the shipped plan."""
    d = docs.select(
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        "doc_id",
        "source",
        "n_chars",
    )

    def local_prefix(batches):
        import pandas as pd

        state = None
        for pdf in batches:
            # ignore_index: a carried state frame shares labels with
            # the incoming batch, and the boolean mask below must not
            # depend on pandas tolerating duplicate index labels
            both = (
                pd.concat([state, pdf], ignore_index=True)
                if state is not None
                else pdf
            )
            both = both.sort_values(["source", "h", "doc_id"], kind="mergesort")
            prior = both.groupby("source", sort=False)["n_chars"].cumsum() - both[
                "n_chars"
            ]
            state = both[prior < budget]
        if state is not None and len(state):
            yield state

    candidates = d.mapInPandas(local_prefix, schema=d.schema)
    global_w = (
        Window.partitionBy("source")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    taken = candidates.withColumn(
        "prior_chars", F.sum("n_chars").over(global_w) - F.col("n_chars")
    ).where(F.col("prior_chars") < budget)
    return taken.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("chars_taken"),
    )


# Language importance weights for weighted_sample: acceptance
# probability is weight / _WS_WMAX, so the dominant language (en) is
# thinned to 20% while the rarest (zh) keeps 100% — the data-mixing
# move that rebalances a crawl before training. Weights are EXACT
# INTEGERS; 0 is forbidden (a zero weight has no inverse and means
# "drop the stratum", which is a filter, not a sample).
_WS_WEIGHTS = {"en": 2, "de": 7, "es": 8, "fr": 9, "zh": 10}
_WS_DEFAULT_W = 5
_WS_WMAX = 10
_WS_SCALE = 1_000_000  # ppm resolution of the uniform draw


@query(
    "weighted_sample",
    oracle="""
    WITH drawn AS (
      SELECT lang,
             CASE lang WHEN 'en' THEN 2 WHEN 'de' THEN 7 WHEN 'es' THEN 8
                       WHEN 'fr' THEN 9 WHEN 'zh' THEN 10 ELSE 5 END AS w,
             CAST(concat('0x', substr(md5('ws:' || CAST(doc_id AS VARCHAR)),
                                      1, 15)) AS BIGINT) % 1000000 AS u
      FROM documents
    )
    SELECT lang,
           CAST(MIN(w) AS BIGINT) AS weight,
           COUNT(*) AS n_docs,
           CAST(COALESCE(SUM(CASE WHEN u * 10 < w * 1000000 THEN 1 END), 0)
                AS BIGINT) AS n_sampled,
           CAST(COALESCE(SUM(CASE WHEN u * 10 < w * 1000000
                                  THEN (1000000 * 10) // w END), 0)
                AS BIGINT) AS ht_n_ppm
    FROM drawn
    GROUP BY lang
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance sampling with EXACT INTEGER weights — the corpus_mix
    sibling a data-mixing run actually executes: each document is kept
    with probability weight/w_max, where the weight is a per-language
    integer (upsample rare languages, thin the dominant one), and every
    kept row carries its inverse-probability correction so downstream
    estimates stay unbiased (Horvitz-Thompson).

    Determinism: the uniform draw is u = base_hash60('ws:' || doc_id)
    mod 1e6 — a pure function of the doc key (reproducible across
    engines, runs, and cluster sizes; a new doc never flips an old
    doc's draw, same property as train_test_split).  The acceptance
    test u * w_max < w * 1e6 and the correction (1e6 * w_max) DIV w
    are all BIGINT operations over non-negative operands, so Spark and
    DuckDB agree bit-for-bit; w = w_max degenerates to keep-everything
    (u < 1e6 always) and is pinned in the differential.  The output
    audits the estimator against the truth it can see in one pass:
    SUM(inverse weights) over the sample (ht_n_ppm, in ppm of a
    document) estimates n_docs * 1e6.

    Scale: one scan, map-side draw + acceptance (no RNG state, no
    per-partition seeding hazards), ONE exchange for the per-language
    aggregation whose partials combine map-side — plan-gated ==1
    Exchange, no Python in the hot path.  At 100 TB the shuffle
    carries one row per language."""
    d = load_table(spark, sf_dir, "documents")
    expr = None
    for lang, wt in _WS_WEIGHTS.items():
        expr = (
            F.when(F.col("lang") == lang, wt)
            if expr is None
            else expr.when(F.col("lang") == lang, wt)
        )
    w = expr.otherwise(_WS_DEFAULT_W)
    u = base_hash60(
        F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))
    ) % _WS_SCALE
    drawn = d.select("lang", w.alias("w"), u.alias("u"))
    return drawn.groupBy("lang").agg(
        F.min("w").alias("weight"),
        F.count(F.lit(1)).alias("n_docs"),
        F.coalesce(
            F.sum(
                F.when(F.col("u") * _WS_WMAX < F.col("w") * _WS_SCALE, 1)
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_sampled"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("u") * _WS_WMAX < F.col("w") * _WS_SCALE,
                    F.expr(f"CAST(({_WS_SCALE} * {_WS_WMAX}) DIV w AS BIGINT)"),
                )
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("ht_n_ppm"),
    )
