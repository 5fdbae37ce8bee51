"""Modern SQL surface (plans/modern.py): recursive CTE, LATERAL, VARIANT —
cross-checked against equivalent non-SQL formulations."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_impl_spark.plans import modern as md
from datafusion_impl_spark.sources.registry import load_table
from tests.conftest import SF_DIR


def test_recursive_ema_covers_every_month_and_smooths(spark):
    rows = md.recursive_cte_revenue_ema(spark, SF_DIR).collect()
    n_months = (
        load_table(spark, SF_DIR, "orders")
        .select(F.date_trunc("month", "o_orderdate").alias("m"))
        .distinct()
        .count()
    )
    assert len(rows) == n_months
    # the EMA starts at the first month's revenue and stays inside the
    # running [min, max] revenue envelope (a convex combination must)
    assert rows[0].ema == rows[0].revenue
    lo = hi = rows[0].revenue
    for r in rows[1:]:
        lo, hi = min(lo, r.revenue), max(hi, r.revenue)
        assert lo - 0.01 <= r.ema <= hi + 0.01


def test_closed_form_ema_matches_recursive(spark):
    """The closed-form exponentially-weighted prefix sum must reproduce the
    blocked recursion — algebraically identical, but the two accumulate
    different float error (the closed form rescales by pow(0.8, ±i)), so a
    true value sitting within ~1e-7 of a half-cent boundary may round
    differently. Months and revenues must match exactly; EMAs within one
    cent."""
    rec = md.recursive_cte_revenue_ema(spark, SF_DIR).collect()
    closed = md.ema_revenue_closed_form(spark, SF_DIR).collect()
    assert [(r.month, r.revenue) for r in rec] == [
        (r.month, r.revenue) for r in closed
    ]
    assert all(
        abs(a.ema - b.ema) <= 0.011 for a, b in zip(rec, closed)
    ), max(abs(a.ema - b.ema) for a, b in zip(rec, closed))


def test_lateral_topk_matches_window_formulation(spark):
    got = [
        (r.c_mktsegment, r.o_orderkey)
        for r in md.lateral_top_orders_per_segment(spark, SF_DIR).collect()
    ]
    cust = load_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_custkey", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    want = [
        (r.c_mktsegment, r.o_orderkey)
        for r in orders.join(cust, orders.o_custkey == cust.c_custkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .orderBy("c_mktsegment", F.desc("o_totalprice"), "o_orderkey")
        .collect()
    ]
    assert got == want


def test_variant_extraction_matches_struct_path(spark):
    var = {
        (r.event_type, r.n_events, r.sum_k)
        for r in md.events_props_variant(spark, SF_DIR).collect()
    }
    from datafusion_impl_spark.operators.structured import events_props_struct

    struct = {
        (r.event_type, r.n_events, r.sum_k)
        for r in events_props_struct(spark, SF_DIR).collect()
    }
    assert var == struct


def test_sql_scripting_threshold_is_minimal_and_exact(spark):
    """The script's doubling search must return the SMALLEST power-of-two
    band boundary whose at-or-above fraction clears the cap: one halving
    step back above the threshold must violate the cap, and the reported
    counts must match a direct recount of orders."""
    from datafusion_impl_spark.plans.modern import (
        _SCRIPT_BAND,
        _SCRIPT_FRAC,
        sql_scripting_threshold_search,
    )
    from datafusion_impl_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    row = sql_scripting_threshold_search(spark, SF_DIR).collect()[0]
    orders = load_table(spark, SF_DIR, "orders").select("o_totalprice")
    n = orders.count()
    assert row.n_orders == n
    t = row.threshold
    assert t > _SCRIPT_BAND and (t / _SCRIPT_BAND) == int(t / _SCRIPT_BAND)
    n_above = orders.filter(F.col("o_totalprice") >= t).count()
    assert row.n_above == n_above
    assert n_above / n <= _SCRIPT_FRAC
    # minimality: half the threshold must violate the cap
    n_above_half = orders.filter(F.col("o_totalprice") >= t / 2).count()
    assert n_above_half / n > _SCRIPT_FRAC


def test_holt_winters_python_replay_and_fit(spark):
    """Holt-Winters invariants: a pure-python replay of the additive
    recursion from the same DECIMAL-exact monthly series reproduces every
    one-step-ahead forecast to rounding, the first month forecasts itself
    (zero residual), and the smoother beats the naive last-value forecast
    on mean absolute error over the post-warm-up months."""
    from datafusion_impl_spark.plans.modern import (
        _HW_ALPHA,
        _HW_BETA,
        _HW_GAMMA,
        holt_winters_monthly_forecast,
    )
    from datafusion_impl_spark.sources.registry import load_table
    from tests.conftest import SF_DIR

    rows = holt_winters_monthly_forecast(spark, SF_DIR).collect()
    assert len(rows) >= 24
    assert rows[0].abs_err == 0.0

    monthly = (
        load_table(spark, SF_DIR, "orders")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("y")
        )
        .orderBy("month")
        .collect()
    )
    ys = [r.y for r in monthly]
    a, b, g = _HW_ALPHA, _HW_BETA, _HW_GAMMA
    lvl, trd, seas = ys[0], 0.0, [0.0] * 12
    fcs = [ys[0]]
    for i in range(2, len(ys) + 1):
        y = ys[i - 1]
        m = ((i - 1) % 12) + 1
        sp = seas[m - 1]
        fcs.append(lvl + trd + sp)
        lvl1 = a * (y - sp) + (1.0 - a) * (lvl + trd)
        trd = b * (lvl1 - lvl) + (1.0 - b) * trd
        seas[m - 1] = g * (y - lvl1) + (1.0 - g) * sp
        lvl = lvl1
    assert len(fcs) == len(rows)
    for r, fc in zip(rows, fcs):
        assert abs(r.forecast - fc) < 0.02, (r.month, r.forecast, fc)
    # beats naive last-value forecasting after warm-up (2 seasons)
    warm = 24
    hw_err = sum(r.abs_err for r in rows[warm:]) / (len(rows) - warm)
    naive_err = sum(
        abs(ys[i] - ys[i - 1]) for i in range(warm, len(ys))
    ) / (len(ys) - warm)
    assert hw_err < naive_err, (hw_err, naive_err)
