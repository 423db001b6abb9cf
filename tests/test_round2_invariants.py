"""Behavioral invariants for the round-2 operators, beyond the oracle
hash equality (which pins values but not the properties that make the
operators *right*)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dpu_olap_spark.registry import all_queries
from dpu_olap_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _rows(name, spark):
    return all_queries()[name].build(spark, SF).collect()


def test_stratified_sample_proportions(spark):
    """Each stratum keeps exactly ceil(frac * stratum_size) rows, and
    every stratum (even the smallest) keeps at least one."""
    docs = load_table(spark, SF, "documents")
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {}
    for r in _rows("stratified_sample", spark):
        got[r.lang] = got.get(r.lang, 0) + 1
        assert r.n_stratum == sizes[r.lang]
    assert set(got) == set(sizes)
    for lang, n in sizes.items():
        assert got[lang] == math.ceil(0.2 * n), (lang, n, got[lang])


def test_decontaminate_excludes_eval_docs_and_bounds(spark):
    for r in _rows("decontaminate", spark):
        assert r.doc_id % 41 != 0, "eval docs must not appear as corpus hits"
        assert 0 < r.n_contam <= r.n_grams


def test_repetition_score_bounds(spark):
    for r in _rows("repetition_score", spark):
        assert 0 < r.n_distinct <= r.n_grams
        assert 0.0 <= r.rep_ratio < 1.0


def test_dedup_incremental_sides_and_band_bound(spark):
    """Incoming ids are the negative keyspace, existing non-negative;
    shared-band count is bounded by the band count (16); and every
    incoming doc collides with at least its own source (identical text
    => identical signature => all 16 bands shared)."""
    rows = _rows("dedup_incremental", spark)
    assert rows, "augmented corpus guarantees incoming/existing dups"
    by_pair = {}
    for r in rows:
        assert r.incoming_id < 0 and r.existing_id >= 0
        assert 1 <= r.n_shared_bands <= 16
        by_pair[(r.incoming_id, r.existing_id)] = r.n_shared_bands
    for (inc, ex), n in by_pair.items():
        if ex == -inc - 1:  # the re-keyed source doc
            assert n == 16, "identical text must share every band"


def test_ivf_train_partition_of_corpus(spark):
    """Per dimension, cell member counts partition the corpus: they sum
    to the vector count and every cell is non-empty (seeds attract at
    least themselves)."""
    n_vecs = load_table(spark, SF, "embeddings").count()
    rows = _rows("ivf_train", spark)
    by_dim = {}
    for r in rows:
        by_dim.setdefault(r.dim, []).append(r.n_members)
        assert r.n_members >= 1
    for dim, counts in by_dim.items():
        assert sum(counts) == n_vecs, (dim, sum(counts), n_vecs)


def test_funnel_counts_consistent(spark):
    (r,) = _rows("funnel", spark)
    assert 0 <= r.n_converted <= r.n_clicked
    assert abs(r.conversion - round(r.n_converted / r.n_clicked, 6)) < 1e-9


def test_cohort_retention_week_zero_covers_all_users(spark):
    """Every user is active in their own cohort week, so the sum of
    week_offset=0 counts equals the distinct user count."""
    n_users = load_table(spark, SF, "events").select("user_id").distinct().count()
    rows = _rows("cohort_retention", spark)
    assert all(r.week_offset >= 0 for r in rows)
    week0 = sum(r.n_users for r in rows if r.week_offset == 0)
    assert week0 == n_users
