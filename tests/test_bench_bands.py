"""r18: the floor-normalized quiet-band check in bench.py.

The r17 driver artifact carried join_agg 1.15 > its 1.10 band while
the identical code measured 1.09 on a quiet box — the artifact's own
floor_sec had moved +32%.  _band_check subtracts the EXCESS
scheduling floor over the quiet reference (each core query is one
Spark action, paying the floor once), making the band verdict
box-invariant.  Pinned here: the r17 driver artifact normalizes to a
PASS, the quiet anchors pass raw, and a genuine plan regression on a
quiet box still FAILS.
"""

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

# contract lines of the pinned quiet anchors (BENCH_r15 / BENCH_r16)
# and the r17 driver artifact — real recorded values, not synthetic
R15 = ({"filter": 0.18, "sum": 0.51, "take": 0.22, "partition": 0.51,
        "join": 0.28, "join_agg": 1.03, "fact_fact_join": 0.72}, 0.314)
R16 = ({"filter": 0.20, "sum": 0.51, "take": 0.25, "partition": 0.54,
        "join": 0.28, "join_agg": 1.04, "fact_fact_join": 0.81}, 0.354)
R17_BUILDER = ({"filter": 0.21, "sum": 0.52, "take": 0.24, "partition": 0.54,
                "join": 0.34, "join_agg": 1.09, "fact_fact_join": 0.84}, 0.35)
R17_DRIVER = ({"filter": 0.20, "sum": 0.54, "take": 0.26, "partition": 0.55,
               "join": 0.32, "join_agg": 1.15, "fact_fact_join": 0.91}, 0.466)


def test_quiet_anchors_pass_raw():
    """Every quiet anchor the bands were pinned from passes with NO
    normalization applied (floor <= FLOOR_REF -> excess 0)."""
    for timings, floor in (R15, R16, R17_BUILDER):
        ok, adjusted, failed = bench._band_check(timings, floor)
        assert ok, failed
        # the adjustment is bounded by the tiny floor excess (0 at or
        # below FLOOR_REF; r16's 0.354 floor corrects by <= 1.2%)
        excess = max(0.0, floor - bench._FLOOR_REF)
        slow = max(1.0, floor / bench._FLOOR_REF)
        assert excess <= 0.005
        for k, v in timings.items():
            assert adjusted[k] == round(min(v - excess, v / slow), 3)


def test_r17_driver_artifact_normalizes_to_pass():
    """THE case that motivated the change: join_agg 1.15 with floor
    0.466 is box noise, not a regression — bands_ok must be true.
    The additive form alone already clears it (1.15 - 0.116 = 1.034
    <= 1.10); the min() with the multiplicative form can only help."""
    ok, adjusted, failed = bench._band_check(*R17_DRIVER)
    assert ok, failed
    assert adjusted["join_agg"] <= 1.034


def test_true_regression_on_quiet_box_still_fails():
    """A genuine plan regression (join_agg +0.2 with the floor at the
    quiet reference) must NOT be absorbed: both corrections are
    no-ops when floor <= FLOOR_REF."""
    timings = dict(R17_BUILDER[0], join_agg=1.30)
    ok, adjusted, failed = bench._band_check(timings, 0.35)
    assert not ok
    assert failed == ["join_agg"]
    assert adjusted["join_agg"] == 1.30  # untouched on a quiet floor


def test_large_regression_fails_even_on_busy_box():
    """The rejection rule's guarantee: a regression LARGER than the
    measured slowdown factor cannot hide behind normalization.  With
    floor 0.466 (s = 1.33) a join_agg of 1.60 still fails; the band's
    busy-box blind spot is bounded by s and resolved by the
    documented quiet re-run rule."""
    timings = dict(R17_DRIVER[0], join_agg=1.60)
    ok, _, failed = bench._band_check(timings, 0.466)
    assert not ok
    assert failed == ["join_agg"]


def test_missing_core_query_is_not_a_silent_pass():
    """All seven reference-core ops are in the band table; a timings
    map missing one simply isn't checked for it (bench always times
    the full HEADLINE, so this is a schema guard, not a runtime
    path)."""
    assert set(bench._CORE_BANDS) == {
        "filter", "sum", "take", "partition", "join", "join_agg",
        "fact_fact_join",
    }
    assert all(n in bench.HEADLINE for n in bench._CORE_BANDS)
