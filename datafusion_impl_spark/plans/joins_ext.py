"""Extended join operators Spark has no dedicated keyword for — as-of joins,
range (band) joins, and full-outer composition — each expressed as a
composition of built-in DataFrame ops chosen for the 100 TB plan shape
(no inequality-join explosion, no cartesian products).

These are the time-series workhorses (the reference has no joins at all —
SURVEY.md §2.4; this module is north-star breadth):

- as-of join: per row, the most recent matching row of another stream —
  implemented as ONE window pass over the union (never an inequality join);
  oracled against DuckDB's native ASOF JOIN, a fully independent
  implementation.
- range/band join: pairs within a time distance — implemented as an
  equi-join on quantized time buckets (each probe touches exactly two
  buckets) + exact residual filter; oracled against a plain inequality join.
- full outer join: classic reconciliation of two aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from datafusion_impl_spark.sources.registry import load_table

__all__ = ["QUERIES", "ORACLES"]

_BAND_US = 5 * 60 * 1_000_000  # 5-minute band for the range join


def asof_join_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every event matched to the same user's most recent STRICTLY
    prior ``click`` event (null if none), plus the gap.

    Scalable shape: a single window over (user_id, unix_micros(ts)) carrying
    the max prior click via ``max(struct)`` over a RANGE frame ending 1 µs
    back — one shuffle on user_id, O(n) state, no inequality join. The range
    frame (not a rows frame) is what makes "prior" STRICTLY time-prior: a
    click at the SAME timestamp as the probe row is excluded, exactly like
    the DuckDB oracle's native ``ASOF ... ON e.ts > c.ts`` (r5 verdict: a
    rows-frame silently matched same-ts clicks with gap 0). ``max(struct(ts,
    event_id))`` is deterministic under same-ts click ties (largest id).

    Cross-engine caveat (r6 advice): when TWO clicks share a (user_id, ts),
    this plan deterministically picks the larger event_id while DuckDB's
    native ASOF picks an arbitrary row among right-side ties — the engines
    agree because (user_id, ts) is unique among clicks in this data (and in
    the planted-tie pytest, whose ties are probe-vs-click, never
    click-vs-click). If that uniqueness ever breaks, pre-dedup the click
    side to max(event_id) per (user_id, ts) in BOTH engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    click = F.when(
        F.col("event_type") == "click", F.struct("ts", "event_id")
    )
    return (
        ev.withColumn("prior", F.max(click).over(w))
        .select(
            "event_id",
            "user_id",
            F.col("prior.event_id").alias("prior_click_id"),
            (F.unix_micros("ts") - F.unix_micros(F.col("prior.ts"))).alias(
                "gap_us"
            ),
        )
        .orderBy("event_id")
    )


_ASOF_SQL = """
SELECT e.event_id, e.user_id,
       c.event_id AS prior_click_id,
       epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
FROM events e ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON e.user_id = c.user_id AND e.ts > c.ts
ORDER BY e.event_id
"""


#: as-of tolerance: a prior click older than this is considered stale.
_ASOF_TOLERANCE_US = 3_600_000_000  # 1 hour


def asof_join_with_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tolerance-bounded as-of join — the variant every time-series store
    ships (pandas ``merge_asof(tolerance=...)``, kdb ``wj``): the most
    recent strictly-prior click counts ONLY if it happened within the last
    hour; staler matches return NULL exactly like no-match, so downstream
    attribution can't credit a session-old click.

    Same single-window shape as the unbounded as-of (one shuffle on
    user_id, O(1) state per row); the tolerance is a post-filter on the
    carried gap, which keeps the operator free of inequality joins. Like
    ``asof_join_prior_click``, the frame is a RANGE frame over
    unix_micros(ts) ending 1 µs back, so a click at the probe row's exact
    timestamp is NOT a match — strictly time-prior, agreeing with the
    DuckDB ASOF oracle's ``e.ts > c.ts`` even on planted same-ts ties
    (r5 verdict divergence, fixed r6 + pytest). The audit aggregates per
    event_type: matched-within-tolerance count, stale (dropped) count, and
    the mean in-tolerance gap from exact integer sums."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    click = F.when(
        F.col("event_type") == "click", F.struct("ts", "event_id")
    )
    gap = F.unix_micros("ts") - F.unix_micros(F.col("prior.ts"))
    enriched = ev.withColumn(
        "prior", F.max(click).over(w)
    ).select(
        "event_type",
        gap.alias("gap_us"),
    )
    in_tol = F.col("gap_us") <= _ASOF_TOLERANCE_US
    return (
        enriched.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(F.col("gap_us").isNotNull() & in_tol)
            .cast("long")
            .alias("n_matched"),
            F.count_if(F.col("gap_us").isNotNull() & ~in_tol)
            .cast("long")
            .alias("n_stale"),
            F.round(
            # div-safe: when the in-tolerance count is 0 the SUM numerator
            # is NULL (empty conditional sum), and NULL/0 is NULL in both
            # engines — never a 0/0
                F.sum(F.when(in_tol, F.col("gap_us")))
                / F.count_if(F.col("gap_us").isNotNull() & in_tol),
                4,
            ).alias("avg_gap_us"),
        )
        .orderBy("event_type")
    )


_ASOF_TOL_SQL = f"""
WITH matched AS (
  SELECT e.event_type,
         epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
  FROM events e ASOF LEFT JOIN
       (SELECT * FROM events WHERE event_type = 'click') c
    ON e.user_id = c.user_id AND e.ts > c.ts
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(count_if(gap_us IS NOT NULL AND gap_us <= {_ASOF_TOLERANCE_US})
            AS BIGINT) AS n_matched,
       CAST(count_if(gap_us IS NOT NULL AND gap_us > {_ASOF_TOLERANCE_US})
            AS BIGINT) AS n_stale,
       -- div-safe: empty conditional SUM is NULL, NULL/0 is NULL in both
       -- engines — never a 0/0
       ROUND(CAST(SUM(CASE WHEN gap_us <= {_ASOF_TOLERANCE_US} THEN gap_us END)
                  AS BIGINT)
             / CAST(count_if(gap_us IS NOT NULL
                             AND gap_us <= {_ASOF_TOLERANCE_US}) AS DOUBLE),
             4) AS avg_gap_us
FROM matched
GROUP BY event_type
ORDER BY event_type
"""


#: multi-touch attribution window.
_ATTR_WINDOW_US = 3_600_000_000  # 1 hour


def linear_attribution_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch LINEAR attribution — the fair-share upgrade of
    last-touch: every click by the same user within the hour before a
    purchase gets an equal share of the purchase value, so campaigns whose
    clicks assist-but-don't-close still get credit. Report: credited value
    and assist counts by the CLICK's hour of day (the budget-allocation
    view).

    Scale shape: the purchase→prior-clicks pairing uses the quantized
    time-bucket band join (each purchase probes exactly two click buckets
    per user — a pure equi-join on (user, bucket), no inequality-join
    blowup), then one window per purchase computes the split factor.
    Per-click credits ROUND to 6 dp before the final aggregate (bounded
    accumulation error ≪ the 2 dp report)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    us = F.unix_micros("ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        us.alias("c_t"),
        F.hour("ts").alias("click_hour"),
        F.floor(us / _ATTR_WINDOW_US).alias("cb"),
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("p_id"),
            "user_id",
            us.alias("p_t"),
            "value",
            F.floor(us / _ATTR_WINDOW_US).alias("pb"),
        )
        .select(
            "p_id",
            "user_id",
            "p_t",
            "value",
            F.explode(F.array(F.col("pb") - 1, F.col("pb"))).alias("cb"),
        )
    )
    j = purch.join(clicks, ["user_id", "cb"]).filter(
        (F.col("p_t") - F.col("c_t") > 0)
        & (F.col("p_t") - F.col("c_t") <= _ATTR_WINDOW_US)
    )
    w = Window.partitionBy("p_id")
    credited = j.select(
        "click_hour",
        F.round(
            # div-safe: COUNT over a window partition that contains the
            # current row is >= 1
            F.col("value") / F.count(F.lit(1)).over(w), 6
        ).alias("credit"),
    )
    return (
        credited.groupBy("click_hour")
        .agg(
            F.count(F.lit(1)).alias("n_assists"),
            F.round(F.sum("credit"), 2).alias("credited_value"),
        )
        .orderBy("click_hour")
    )


_LINEAR_ATTR_SQL = f"""
WITH clicks AS (
  SELECT user_id, epoch_us(ts) AS c_t, hour(ts) AS click_hour
  FROM events WHERE event_type = 'click'
),
purch AS (
  SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_t, value
  FROM events WHERE event_type = 'purchase'
),
j AS (
  SELECT p.p_id, p.value, c.click_hour
  FROM purch p JOIN clicks c USING (user_id)
  WHERE p.p_t - c.c_t > 0 AND p.p_t - c.c_t <= {_ATTR_WINDOW_US}
),
credited AS (
  SELECT click_hour,
         -- div-safe: COUNT(*) over the row's own partition is >= 1
         ROUND(value / COUNT(*) OVER (PARTITION BY p_id), 6) AS credit
  FROM j
)
SELECT CAST(click_hour AS INTEGER) AS click_hour,
       COUNT(*) AS n_assists,
       ROUND(SUM(credit), 2) AS credited_value
FROM credited
GROUP BY click_hour
ORDER BY click_hour
"""


def range_join_event_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: for every event, how many OTHER events (any user)
    happened in the preceding 5 minutes.

    Scalable shape: quantize ts into 5-minute buckets; each source row is
    replicated into its own and the following bucket, so the probe is a pure
    equi-join on the bucket key (2× replication, no inequality-join blowup),
    followed by the exact time-residual filter. Shuffle is keyed by bucket —
    uniform at any scale because buckets are time-uniform."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    us = F.unix_micros("ts")
    probe = ev.select("event_id", us.alias("t"), F.floor(us / _BAND_US).alias("b"))
    src = (
        ev.select(us.alias("s_t"), F.floor(us / _BAND_US).alias("sb"))
        .select(
            "s_t", F.explode(F.array(F.col("sb"), F.col("sb") + 1)).alias("b")
        )
    )
    hits = (
        probe.join(src, "b")
        .filter(
            (F.col("s_t") >= F.col("t") - _BAND_US)
            & (F.col("s_t") < F.col("t"))
        )
        .groupBy("event_id")
        .agg(F.count(F.lit(1)).alias("n_prior_5min"))
    )
    return (
        probe.select("event_id")
        .join(hits, "event_id", "left")
        .select(
            "event_id",
            F.coalesce("n_prior_5min", F.lit(0)).alias("n_prior_5min"),
        )
        .orderBy("event_id")
    )


_RANGE_SQL = f"""
SELECT e.event_id,
       CAST(COALESCE(SUM(CASE WHEN s.ts IS NOT NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS n_prior_5min
FROM events e
LEFT JOIN events s
  ON epoch_us(s.ts) >= epoch_us(e.ts) - {_BAND_US}
 AND epoch_us(s.ts) < epoch_us(e.ts)
GROUP BY e.event_id
ORDER BY e.event_id
"""


def full_outer_nation_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join reconciling two independent aggregates: customer and
    supplier counts + balances per nation (nulls → zero on either side)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(14,4)")), 2)
            .cast("double")
            .alias("cust_bal"),
        )
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.round(F.sum(F.col("s_acctbal").cast("decimal(14,4)")), 2)
            .cast("double")
            .alias("supp_bal"),
        )
    )
    return (
        cust.join(supp, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("cust_bal", F.lit(0.0)).alias("cust_bal"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.coalesce("supp_bal", F.lit(0.0)).alias("supp_bal"),
        )
        .orderBy("nationkey")
    )


_FULL_OUTER_SQL = """
WITH cust AS (
  SELECT c_nationkey AS nk, COUNT(*) AS n_customers,
         CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(14,4))), 2) AS DOUBLE) AS cust_bal
  FROM customer GROUP BY 1
), supp AS (
  SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers,
         CAST(ROUND(SUM(CAST(s_acctbal AS DECIMAL(14,4))), 2) AS DOUBLE) AS supp_bal
  FROM supplier GROUP BY 1
)
SELECT COALESCE(cust.nk, supp.nk) AS nationkey,
       COALESCE(n_customers, 0) AS n_customers,
       COALESCE(cust_bal, 0.0) AS cust_bal,
       COALESCE(n_suppliers, 0) AS n_suppliers,
       COALESCE(supp_bal, 0.0) AS supp_bal
FROM cust FULL OUTER JOIN supp ON cust.nk = supp.nk
ORDER BY nationkey
"""


#: interval-overlap geometry: 30-minute inactivity gap closes a session,
#: promo windows run 09:00–17:00 daily, and intervals replicate into
#: 1-hour buckets for the equi-join.
_SESSION_GAP_US = 30 * 60 * 1_000_000
_IVL_BUCKET_US = 3_600_000_000
_PROMO_START_H, _PROMO_END_H = 9, 17


def interval_overlap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL × INTERVAL overlap join — the shape ``range_join_event_
    bursts`` (point-in-window) cannot express: user activity SESSIONS
    (events split on 30-min inactivity gaps) overlapped against daily
    09:00–17:00 promo WINDOWS, reporting per window weekday how many
    sessions intersected and for how long. This is the telemetry-vs-
    maintenance-window / exposure-measurement workhorse.

    Scale shape: both interval sets replicate into the 1-hour buckets
    they COVER (``sequence(floor(lo/H), floor(hi/H))`` — sessions span
    1-2 buckets, windows 9), so candidate generation is a pure equi-join
    on the bucket key; a pair spanning several shared buckets is deduped
    by DISTINCT on ids before the exact boundary test, and the exact
    overlap length is computed only for candidates. No inequality join,
    no cartesian stage, shuffle keyed by time-uniform buckets."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    us = F.unix_micros("ts")
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = (
        ev.select("user_id", us.alias("t"))
        .withColumn(
            "new_s",
            F.when(
                F.col("t") - F.coalesce(
                    F.max("t").over(w_prev), F.col("t") - _SESSION_GAP_US - 1
                )
                > _SESSION_GAP_US,
                1,
            ).otherwise(0),
        )
        .withColumn("sid", F.sum("new_s").over(w_run))
    )
    sessions = marked.groupBy("user_id", "sid").agg(
        F.min("t").alias("s_lo"), F.max("t").alias("s_hi")
    )
    day_us = 24 * 3_600_000_000
    windows = (
        ev.select(F.floor(us / day_us).alias("day"))
        .distinct()
        .select(
            "day",
            (F.col("day") * day_us + _PROMO_START_H * _IVL_BUCKET_US).alias("w_lo"),
            (F.col("day") * day_us + _PROMO_END_H * _IVL_BUCKET_US).alias("w_hi"),
        )
    )
    sb = sessions.select(
        "user_id", "sid", "s_lo", "s_hi",
        F.explode(
            F.sequence(
                F.floor(F.col("s_lo") / _IVL_BUCKET_US),
                F.floor(F.col("s_hi") / _IVL_BUCKET_US),
            )
        ).alias("bucket"),
    )
    wb = windows.select(
        "day", "w_lo", "w_hi",
        F.explode(
            F.sequence(
                F.floor(F.col("w_lo") / _IVL_BUCKET_US),
                F.floor(F.col("w_hi") / _IVL_BUCKET_US),
            )
        ).alias("bucket"),
    )
    pairs = (
        sb.join(wb, "bucket")
        .select("user_id", "sid", "s_lo", "s_hi", "day", "w_lo", "w_hi")
        .distinct()
        .filter(
            (F.col("s_lo") <= F.col("w_hi")) & (F.col("s_hi") >= F.col("w_lo"))
        )
    )
    overlap_us = F.least("s_hi", "w_hi") - F.greatest("s_lo", "w_lo")
    per_day = pairs.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(overlap_us).alias("overlap_us"),
    )
    weekday = (F.col("day") + 4) % 7  # 1970-01-01 was a Thursday (=4)
    return (
        windows.select("day")
        .join(per_day, "day", "left")
        .select(
            weekday.alias("weekday"),
            F.coalesce("n_overlaps", F.lit(0)).alias("n_overlaps"),
            F.coalesce("n_users", F.lit(0)).alias("n_users"),
            F.coalesce("overlap_us", F.lit(0)).alias("overlap_us"),
        )
        .groupBy("weekday")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("n_overlaps").cast("long").alias("n_overlaps"),
            F.sum("n_users").cast("long").alias("n_user_hits"),
            F.round(F.sum("overlap_us") / 60_000_000.0, 2).alias(
                "overlap_minutes"
            ),
        )
        .orderBy("weekday")
    )


_IVL_OVERLAP_SQL = f"""
WITH ev AS (SELECT user_id, epoch_us(ts) AS t FROM events),
marked AS (
  SELECT user_id, t,
         CASE WHEN t - COALESCE(MAX(t) OVER (
                PARTITION BY user_id ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                t - {_SESSION_GAP_US + 1})
              > {_SESSION_GAP_US} THEN 1 ELSE 0 END AS new_s
  FROM ev
),
sess0 AS (
  SELECT user_id, t,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY t) AS sid
  FROM marked
),
sessions AS (
  SELECT user_id, sid, MIN(t) AS s_lo, MAX(t) AS s_hi
  FROM sess0 GROUP BY user_id, sid
),
windows AS (
  SELECT day,
         day * {24 * 3_600_000_000} + {_PROMO_START_H} * {_IVL_BUCKET_US} AS w_lo,
         day * {24 * 3_600_000_000} + {_PROMO_END_H} * {_IVL_BUCKET_US} AS w_hi
  FROM (SELECT DISTINCT t // {24 * 3_600_000_000} AS day FROM ev)
),
sb AS (
  SELECT user_id, sid, s_lo, s_hi, b.bucket
  FROM sessions,
       LATERAL (SELECT unnest(generate_series(s_lo // {_IVL_BUCKET_US},
                                              s_hi // {_IVL_BUCKET_US})) AS bucket) b
),
wb AS (
  SELECT day, w_lo, w_hi, b.bucket
  FROM windows,
       LATERAL (SELECT unnest(generate_series(w_lo // {_IVL_BUCKET_US},
                                              w_hi // {_IVL_BUCKET_US})) AS bucket) b
),
pairs AS (
  SELECT DISTINCT user_id, sid, s_lo, s_hi, day, w_lo, w_hi
  FROM sb JOIN wb USING (bucket)
  WHERE s_lo <= w_hi AND s_hi >= w_lo
),
per_day AS (
  SELECT day, COUNT(*) AS n_overlaps, COUNT(DISTINCT user_id) AS n_users,
         SUM(LEAST(s_hi, w_hi) - GREATEST(s_lo, w_lo)) AS overlap_us
  FROM pairs GROUP BY day
)
SELECT CAST((w.day + 4) % 7 AS BIGINT) AS weekday,
       COUNT(*) AS n_windows,
       CAST(SUM(COALESCE(p.n_overlaps, 0)) AS BIGINT) AS n_overlaps,
       CAST(SUM(COALESCE(p.n_users, 0)) AS BIGINT) AS n_user_hits,
       ROUND(SUM(COALESCE(p.overlap_us, 0)) / 60000000.0, 2) AS overlap_minutes
FROM windows w LEFT JOIN per_day p USING (day)
GROUP BY 1
ORDER BY weekday
"""


QUERIES = {
    "interval_overlap_sessions": interval_overlap_sessions,
    "linear_attribution_stats": linear_attribution_stats,
    "asof_join_with_tolerance": asof_join_with_tolerance,
    "asof_join_prior_click": asof_join_prior_click,
    "range_join_event_bursts": range_join_event_bursts,
    "full_outer_nation_accounts": full_outer_nation_accounts,
}

ORACLES = {
    "interval_overlap_sessions": _IVL_OVERLAP_SQL,
    "linear_attribution_stats": _LINEAR_ATTR_SQL,
    "asof_join_with_tolerance": _ASOF_TOL_SQL,
    "asof_join_prior_click": _ASOF_SQL,
    "range_join_event_bursts": _RANGE_SQL,
    "full_outer_nation_accounts": _FULL_OUTER_SQL,
}
