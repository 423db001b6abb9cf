"""Salted join: correctness under pathological key skew + work spread."""

from __future__ import annotations

from pyspark.sql import functions as F

from dpu_olap_spark.plans.skew import salted_join


def _skewed_frames(spark):
    # 50k rows, 90% on a single hot key — the case that sinks one task
    probe = spark.range(50_000).select(
        F.when(F.col("id") % 10 < 9, 7).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    build = spark.range(100).select(F.col("id").alias("bk"), (F.col("id") * 10).alias("payload"))
    return probe, build


def test_salted_join_matches_plain_join(spark):
    probe, build = _skewed_frames(spark)
    plain = probe.join(build, probe.k == build.bk).agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("payload").alias("sp")
    ).first()
    salted = salted_join(probe, build, "k", "bk").agg(
        F.count("*").alias("n"), F.sum("v").alias("sv"), F.sum("payload").alias("sp")
    ).first()
    assert (plain.n, plain.sv, plain.sp) == (salted.n, salted.sv, salted.sp)


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land in >1 (key, salt) group."""
    probe, build = _skewed_frames(spark)
    p = probe.withColumn("_salt_p", (F.rand(42) * 8).cast("int"))
    groups = (
        p.where(F.col("k") == 7)
        .groupBy("_salt_p")
        .count()
        .collect()
    )
    assert len(groups) > 1, "salting left the hot key in one group"
    sizes = [g["count"] for g in groups]
    assert max(sizes) < sum(sizes), "no spread achieved"


def test_salted_left_join_preserves_unmatched(spark):
    probe, build = _skewed_frames(spark)
    # keys >= 100 never match; left join must keep them with null payload
    probe2 = probe.withColumn("k", F.col("k") + 60)  # some keys exceed build range
    plain = probe2.join(build, probe2.k == build.bk, "left").count()
    salted = salted_join(probe2, build, "k", "bk", how="left").count()
    assert plain == salted == probe2.count()

def test_salted_join_rejects_build_preserving_joins(spark):
    """right/full-outer would duplicate unmatched build rows once per
    salt; the helper must refuse rather than return wrong results."""
    probe, build = _skewed_frames(spark)
    import pytest

    for how in ("right", "full_outer", "full"):
        with pytest.raises(ValueError, match="probe-preserving"):
            salted_join(probe, build, "k", "bk", how=how)


def test_bloom_words_scale_with_build_cardinality():
    """VERDICT r5 #3: bitmap size must track the build side's distinct
    count (m = n*k/ln2 bits) — a static size means FPR -> 1 as the
    build grows. Power-of-two, clamped to [256, 4096] words."""
    from dpu_olap_spark.operators.events_analytics import (
        _BLOOM_MAX_WORDS,
        _BLOOM_MIN_WORDS,
        _bloom_words,
    )
    import math

    assert _bloom_words(10) == _BLOOM_MIN_WORDS
    assert _bloom_words(3_000) > _bloom_words(100)
    assert _bloom_words(10**9) == _BLOOM_MAX_WORDS
    for n in (500, 3_000, 30_000):
        w = _bloom_words(n)
        assert w & (w - 1) == 0, "not a power of two"
        if _BLOOM_MIN_WORDS < w < _BLOOM_MAX_WORDS:
            # at least the n*k/ln2 target, at most 2x it
            target = n * 4 / math.log(2) / 64
            assert target <= w <= 2 * target


def test_bloom_filter_selectivity(spark):
    """With the sized bitmap, k=4 FPR stays ~2^-4: candidates passing
    the bloom must be < matched_rows + 2.5 * FPR * probe_rows (sanity
    that the prefilter actually drops the bulk of non-matching probe
    rows rather than degrading to a pass-through)."""
    from dpu_olap_spark.operators.events_analytics import (
        _BLOOM_K,
        _bloom_words,
    )

    sf = "/root/testdata/sf0.01"
    from dpu_olap_spark.sources.tables import load_table

    orders = load_table(spark, sf, "orders")
    build = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    n_build = build.distinct().count()
    n_words = _bloom_words(n_build)

    li = load_table(spark, sf, "lineitem").select("l_orderkey")
    words_rows = (
        build.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            (
                                F.pmod(
                                    F.xxhash64(F.col("o_orderkey"), F.lit(s)),
                                    F.lit(n_words * 64),
                                )
                                / 64
                            )
                            .cast("int")
                            .alias("w"),
                            (
                                F.pmod(
                                    F.xxhash64(F.col("o_orderkey"), F.lit(s)),
                                    F.lit(n_words * 64),
                                )
                                % 64
                            )
                            .cast("int")
                            .alias("b"),
                        )
                        for s in range(_BLOOM_K)
                    ]
                )
            ).alias("e")
        )
        .select("e.w", "e.b")
        .groupBy("w")
        .agg(F.expr("bit_or(shiftleft(CAST(1 AS BIGINT), b))").alias("m"))
        .collect()
    )
    words = [0] * n_words
    for r in words_rows:
        words[int(r.w)] = int(r.m)
    words_sql = "array(" + ", ".join(f"{v}L" for v in words) + ")"
    tests = []
    for s in range(_BLOOM_K):
        h = f"pmod(xxhash64(l_orderkey, {s}), {n_words * 64})"
        tests.append(
            f"(shiftright(element_at({words_sql}, CAST({h} / 64 AS INT) + 1),"
            f" CAST({h} % 64 AS INT)) & 1) = 1"
        )
    n_probe = li.count()
    n_pass = li.where(F.expr(" AND ".join(tests))).count()
    n_match = li.join(build, li.l_orderkey == build.o_orderkey, "left_semi").count()
    fpr_budget = 2.5 * (2 ** -_BLOOM_K) * n_probe
    assert n_match <= n_pass <= n_match + fpr_budget, (
        f"bloom pass-through {n_pass} vs matches {n_match} + budget {fpr_budget:.0f}"
    )


def test_bloom_fold_property():
    """Folding the cap-size bitmap down to a smaller power-of-two size
    (word i OR-ed into i mod n_words) must be bit-identical to a
    bitmap built directly at the smaller modulus — the algebra
    (h mod 2^a mod 2^b == h mod 2^b) q_bloom_filter_join relies on to
    size the filter without a second build-side job."""
    import random

    from dpu_olap_spark.operators.events_analytics import _BLOOM_MAX_WORDS

    rng = random.Random(7)
    cap_bits = _BLOOM_MAX_WORDS * 64
    for n_words in (256, 512, 2048):
        cap = [0] * _BLOOM_MAX_WORDS
        direct = [0] * n_words
        for _ in range(5_000):
            h = rng.getrandbits(63)
            p = h % cap_bits
            cap[p // 64] |= 1 << (p % 64)
            q = h % (n_words * 64)
            direct[q // 64] |= 1 << (q % 64)
        folded = [0] * n_words
        for i, w in enumerate(cap):
            folded[i % n_words] |= w
        assert folded == direct, f"fold mismatch at n_words={n_words}"


def _brute_sessions(rows, gap_us):
    """Reference sessionization: per user, sort by (tus, event_id),
    break when the gap STRICTLY exceeds gap_us (the oracle's rule).
    Returns {(user_id, first_tus): (first_type, n_events)}."""
    from collections import defaultdict

    by_user = defaultdict(list)
    for uid, eid, etype, tus in rows:
        by_user[uid].append((tus, eid, etype))
    out = {}
    for uid, evs in by_user.items():
        evs.sort()
        sess = None
        prev = None
        for tus, eid, etype in evs:
            if prev is None or tus - prev > gap_us:
                if sess is not None:
                    out[(uid, sess[0])] = (sess[1], sess[2])
                sess = [tus, etype, 0]
            sess[2] += 1
            prev = tus
        out[(uid, sess[0])] = (sess[1], sess[2])
    return out


def test_chunked_sessions_boundary_equivalence(spark):
    """chunked_sessions (the skew-proof session_funnel builder) must
    reproduce plain sessionization on adversarial timings: events ON
    chunk boundaries, gaps of exactly the session gap (continues: the
    rule is strictly-greater), gap + 1 us (breaks), a single session
    spanning 3 chunks, and an empty chunk between sessions."""
    from dpu_olap_spark.operators.events_analytics import (
        _SESS_CHUNK_US,
        _SESS_GAP_US,
        chunked_sessions,
    )

    C, G = _SESS_CHUNK_US, _SESS_GAP_US
    rows = [
        # user 1: session crossing a chunk boundary with gap == G
        (1, 1, "view", C - G),
        (1, 2, "click", C),          # exactly G later, ON the boundary
        (1, 3, "purchase", C + G),   # still the same session
        # user 1: break by exactly G + 1 us
        (1, 4, "view", C + 2 * G + 1),
        # user 2: one session spanning 3 chunks (steady < G steps)
        *[
            (2, 10 + i, "click", C // 2 + i * (G - 1))
            for i in range((2 * C) // (G - 1) + 2)
        ],
        # user 3: empty chunk between two singleton sessions
        (3, 50, "signup", 10),
        (3, 51, "error", 3 * C + 10),
        # user 4: ties in tus (same micro, distinct events)
        (4, 60, "view", 5 * C),
        (4, 61, "click", 5 * C),
        (4, 62, "purchase", 5 * C + G + 1),
    ]
    df = spark.createDataFrame(
        rows, "user_id: long, event_id: long, event_type: string, tus: long"
    )
    got = {
        (r.user_id, r.first_tus): (r.first_touch, r.n_events)
        for r in chunked_sessions(df).collect()
    }
    want = _brute_sessions(rows, G)
    assert got == want
    # sanity on the crafted shape itself: user 2 really did span
    # multiple chunks as ONE session
    u2 = [k for k in want if k[0] == 2]
    assert len(u2) == 1 and want[u2[0]][1] == (2 * C) // (G - 1) + 2


def test_chunked_sessions_randomized_differential(spark):
    """Randomized differential check with a deliberately TINY chunk
    (2x the gap) so almost every session crosses chunk boundaries and
    the chain-merge path carries the correctness load, not the local
    sessionize. Brute-force Python sessionization is the second
    engine (the reference's randomized-test scheme)."""
    import numpy as np

    from dpu_olap_spark.operators.events_analytics import chunked_sessions

    gap = 1_000_000  # 1 s in micros
    chunk = 2 * gap
    types = np.array(["view", "click", "purchase", "signup", "error"])
    for seed in (7, 42, 1337):
        rng = np.random.default_rng(seed)
        n = 4000
        uid = rng.integers(0, 25, size=n)
        # mixture of sub-gap steps and super-gap jumps per user
        tus = np.cumsum(
            rng.choice([gap // 10, gap // 3, gap, gap + 1, 3 * gap], size=n),
        ) + uid * 17  # interleave users at distinct offsets
        etype = types[rng.integers(0, 5, size=n)]
        rows = [
            (int(uid[i]), i, str(etype[i]), int(tus[i])) for i in range(n)
        ]
        df = spark.createDataFrame(
            rows, "user_id: long, event_id: long, event_type: string, tus: long"
        )
        got = {
            (r.user_id, r.first_tus): (r.first_touch, r.n_events)
            for r in chunked_sessions(df, gap_us=gap, chunk_us=chunk).collect()
        }
        want = _brute_sessions(rows, gap)
        assert got == want, f"seed {seed}: {len(got)} vs {len(want)} sessions"
