"""The local oracle gate must be at least as strict as the driver.

VERDICT r5 ("What's wrong"): five oracle dtype bugs shipped because the
old gate coerced both sides with ``astype(float)`` + tolerance, so an
int64-vs-float64 skew could never fail locally while the driver's
md5-of-CSV hash failed. These tests pin the failure modes the strict
gate must now catch — no SparkSession needed (``assert_matches_oracle``
only calls ``.toPandas()`` on its first argument).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.oracle_utils import diff_report, normalize, value_hash


class _FakeSparkDF:
    def __init__(self, pdf: pd.DataFrame):
        self._pdf = pdf

    def toPandas(self) -> pd.DataFrame:
        return self._pdf


def _strict_mismatch(got: pd.DataFrame, want: pd.DataFrame) -> bool:
    g, w = normalize(got), normalize(want)
    return value_hash(g) != value_hash(w)


def test_int_vs_float_dtype_skew_fails_strict():
    """int64 0 vs float64 0.0 — equal under the old tolerant compare,
    different under the driver's CSV hash ("0" vs "0.0")."""
    got = pd.DataFrame({"k": [1, 2], "v": np.array([0, 7], dtype=np.int64)})
    want = pd.DataFrame({"k": [1, 2], "v": np.array([0.0, 7.0])})
    assert _strict_mismatch(got, want)
    report = diff_report(normalize(got), normalize(want))
    assert "DTYPE-CLASS SKEW" in report and "column v" in report


def test_float32_vs_float64_repr_drift_fails_strict():
    """float32 ROUND(x, 6) values whose shortest repr differs from the
    float64 side (the embedding_cluster_assign failure)."""
    got = pd.DataFrame({"k": [1], "cos": np.array([0.874621], dtype=np.float64)})
    want = pd.DataFrame({"k": [1], "cos": np.array([0.874622], dtype=np.float32)})
    assert _strict_mismatch(got, want)


def test_round6_boundary_fails_strict():
    """One row on a ROUND(x, 6) binary boundary (events_attribution):
    514.079331 vs 514.07933 differ by 1e-6 — inside the old tolerance,
    fatal to the driver."""
    got = pd.DataFrame({"m": [514.079331]})
    want = pd.DataFrame({"m": [514.07933]})
    assert _strict_mismatch(got, want)
    assert "1 differing CSV values" in diff_report(normalize(got), normalize(want))


def test_equal_frames_pass_strict_regardless_of_row_and_col_order():
    got = pd.DataFrame({"b": [2.0, 1.0], "a": [20, 10]})
    want = pd.DataFrame({"a": [10, 20], "b": [1.0, 2.0]})
    assert not _strict_mismatch(got, want)


def test_assert_matches_oracle_is_wired_strict(monkeypatch):
    """End-to-end through assert_matches_oracle with the oracle side
    stubbed: the dtype-skew case must raise, naming the column."""
    from tests import oracle_utils

    want = pd.DataFrame({"k": [1], "v": np.array([0.0])})
    monkeypatch.setattr(oracle_utils, "run_oracle", lambda sql, sf: want)
    got = _FakeSparkDF(pd.DataFrame({"k": [1], "v": np.array([0], dtype=np.int64)}))
    with pytest.raises(AssertionError, match="STRICT value-hash mismatch"):
        oracle_utils.assert_matches_oracle(got, "SELECT 1", "/nonexistent", "t")


def test_fixed_point_minute_rounding_is_exact_half_up():
    """The attribution minutes rule — micro-minutes = (delta_us+30)//60,
    value = that / 1e6 — must equal decimal round-half-up of
    delta_us/6e7 to 6 dp for EVERY delta, including the .5 boundaries
    binary-float ROUND gets wrong (the r5 latent failure). Pure-Python
    twin of both engines' integer arithmetic, swept over boundary-rich
    deltas up to the 1440-minute TTL."""
    from decimal import ROUND_HALF_UP, Decimal

    deltas = list(range(0, 5000))
    # every exact .5-microminute boundary near the r5 failure row and
    # the TTL edge: delta_us = 60*k + 30 sits exactly on half
    deltas += [60 * k + r for k in (8_567_988, 86_399_999, 1_439_999_999)
               for r in (-1, 0, 29, 30, 31, 59)]
    for delta in deltas:
        got = (delta + 30) // 60 / 1e6
        want = float(
            (Decimal(delta) / Decimal(60_000_000)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        assert got == want, (delta, got, want)


def test_degenerate_ols_is_deterministic_not_residue(spark):
    """ols_regression on a zero-variance-y group: with exact fixed-
    point moments the cancellation is EXACT (cov = 0, dy = 0), so the
    slope is a stable +0.0 and r2 hits its NULL guard — never the
    order-dependent ±residue that flaked corpus_heaps under DuckDB's
    parallel aggregation (r6)."""
    from ksql_query_tutorial_spark.operators.analytics import ols_regression

    rows = [("g", float(i), 3.433987) for i in range(1, 11)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    for _ in range(3):
        r = ols_regression(df.repartition(7), "x", "y", "g").collect()[0]
        assert repr(r.slope) == "0.0", r   # +0.0, not -0.0
        assert r.r2 is None, r
        assert r.intercept == 3.433987, r
    # zero x-variance: every output NULL via the dx guard
    flat = spark.createDataFrame(
        [("g", 2.5, float(i)) for i in range(10)],
        "g string, x double, y double",
    )
    r = ols_regression(flat, "x", "y", "g").collect()[0]
    assert r.slope is None and r.intercept is None and r.r2 is None, r
