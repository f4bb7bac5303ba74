package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.AsofJoin

/** As-of (point-in-time) join queries over the events stream — the
  * time-series enrichment shape the reference's per-(symbol, threshold)
  * slices imply everywhere two time axes meet (align a faster series to
  * the prevailing state of a slower one), and the feature-store pattern a
  * training pipeline runs to attach the latest label snapshot to each
  * example without lookahead.
  *
  * All three run [[graft.operators.AsofJoin]]'s union-merge plan: one hash
  * exchange per side on the equi-key, one sort, a running
  * last(ignoreNulls) — never a range join, never row amplification.
  * Oracles are DuckDB's native `ASOF JOIN` (backward/forward) and a
  * LATERAL argmin for the tolerance variant, so the operator is checked
  * against an independent engine's own as-of semantics, not a re-statement
  * of the same algorithm.
  */
object AsofQueries {

  type Q = (SparkSession, String) => DataFrame

  private def evBase(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    ev.select(col("user_id"), Tables.tsUs(ev).as("ts_us"), col("event_id"),
      col("event_type"), col("value"))
  }

  // ---------------------------------------------------------------------------
  // q100 — backward as-of: every click joined to the user's most recent
  // purchase at or before the click (the "prevailing state" lookup: latest
  // position/label/snapshot as of event time, no lookahead). The right
  // side is pre-aggregated to the (user, ts) grain — the operator's
  // uniqueness contract — and staleness lands as an exact integer.
  def q100AsofBackward(spark: SparkSession, d: String): DataFrame = {
    val base = evBase(spark, d)
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("value").as("click_value"))
    val purchases = base.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us").as("pts_us"))
      .agg(max(col("value")).as("purchase_value"))
    AsofJoin.join(clicks, purchases, Seq("user_id"), "ts_us", "pts_us")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("click_value"),
        col("asof_pts_us").as("purchase_ts_us"),
        col("asof_purchase_value").as("purchase_value"),
        (col("ts_us") - col("asof_pts_us")).as("staleness_us"))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  val q100Sql: String =
    """WITH l AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value AS click_value
      |  FROM events WHERE event_type = 'click'),
      |r AS (
      |  SELECT user_id, epoch_us(ts) AS pts_us, max(value) AS purchase_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT l.user_id, l.ts_us, l.event_id, l.click_value,
      |  r.pts_us AS purchase_ts_us, r.purchase_value,
      |  l.ts_us - r.pts_us AS staleness_us
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.ts_us >= r.pts_us
      |ORDER BY l.user_id, l.ts_us, l.event_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q101 — forward as-of WITH tolerance: each view joined to the user's
  // next click within 30 minutes (attribution windows, label-horizon
  // joins). Same merge, reversed time axis; the tolerance is a post-pass
  // null-out on the carried match, so it costs nothing. The oracle is an
  // independent LATERAL argmin (DuckDB's ASOF has no tolerance clause) —
  // quadratic in the oracle, one linear pass here.
  def q101AsofForwardTolerance(spark: SparkSession, d: String): DataFrame = {
    val base = evBase(spark, d)
    val views = base.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("value").as("view_value"))
    val clicks = base.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts_us").as("cts_us"))
      .agg(max(col("value")).as("click_value"))
    AsofJoin.join(views, clicks, Seq("user_id"), "ts_us", "cts_us",
        AsofJoin.Forward, tolerance = Some(1800000000L))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("view_value"),
        col("asof_cts_us").as("next_click_ts_us"),
        col("asof_click_value").as("next_click_value"),
        (col("asof_cts_us") - col("ts_us")).as("gap_us"))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  val q101Sql: String =
    """WITH v AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id, value AS view_value
      |  FROM events WHERE event_type = 'view'),
      |c AS (
      |  SELECT user_id, epoch_us(ts) AS cts_us, max(value) AS click_value
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2)
      |SELECT v.user_id, v.ts_us, v.event_id, v.view_value,
      |  s.cts_us AS next_click_ts_us, s.click_value AS next_click_value,
      |  s.cts_us - v.ts_us AS gap_us
      |FROM v LEFT JOIN LATERAL (
      |  SELECT c.cts_us, c.click_value FROM c
      |  WHERE c.user_id = v.user_id AND c.cts_us >= v.ts_us
      |    AND c.cts_us <= v.ts_us + 1800000000
      |  ORDER BY c.cts_us LIMIT 1) s ON true
      |ORDER BY v.user_id, v.ts_us, v.event_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q102 — multi-timeframe bar alignment: every bar joined to the
  // prevailing COARSE bar of its own series (every 5th bar — the slower
  // "threshold" in reference terms), carrying the full OHLC payload. This
  // is the reference's cross-slice shape (align sub-bars to the governing
  // bar of a coarser range-bar threshold) as one as-of join keyed on the
  // series — n_series × as-of merges in a single exchange.
  def q102AsofBarsMtf(spark: SparkSession, d: String): DataFrame = {
    val bars = EventBars.bars(spark, d)
      .select(col("event_type"), col("ts_us"), col("event_id"), col("rn"),
        col("open"), col("close"))
    // pre-aggregate to the (series, ts) grain — the operator's uniqueness
    // contract. (event_type, ts_us) is unique in today's fixtures, but the
    // contract must hold by construction, not by data luck: latest rn wins
    val coarse = bars.filter(col("rn") % 5 === 0)
      .groupBy(col("event_type"), col("ts_us").as("c_ts_us"))
      .agg(max(col("rn")).as("c_rn"), max_by(col("close"), col("rn")).as("c_close"))
    AsofJoin.join(bars, coarse, Seq("event_type"), "ts_us", "c_ts_us")
      .select(col("event_type"), col("ts_us"), col("event_id"), col("rn"),
        col("asof_c_rn").as("coarse_rn"),
        col("asof_c_ts_us").as("coarse_ts_us"),
        (round(col("close") - col("asof_c_close"), 6) + 0.0).as("drift_vs_coarse"),
        (col("rn") - col("asof_c_rn")).as("bars_since_coarse"))
      .orderBy(col("event_type"), col("ts_us"), col("event_id"))
  }

  val q102Sql: String =
    EventBars.duckCte +
      """, coarse AS (
        |  SELECT event_type, ts_us AS c_ts_us, max(rn) AS c_rn,
        |    arg_max(close, rn) AS c_close
        |  FROM bars WHERE rn % 5 = 0 GROUP BY 1, 2)
        |SELECT b.event_type, b.ts_us, b.event_id, b.rn,
        |  c.c_rn AS coarse_rn, c.c_ts_us AS coarse_ts_us,
        |  round(b.close - c.c_close, 6) + 0.0 AS drift_vs_coarse,
        |  b.rn - c.c_rn AS bars_since_coarse
        |FROM bars b ASOF LEFT JOIN coarse c
        |  ON b.event_type = c.event_type AND b.ts_us >= c.c_ts_us
        |ORDER BY b.event_type, b.ts_us, b.event_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q105 — q100 under the SKEW-PROOF two-phase plan (the q85 pattern for
  // the as-of merge): the bucketed merge + bucket-granular carry of
  // `AsofJoin.joinTwoPhase`, bit-identical to q100 — same oracle SQL, same
  // CORRECTNESS row — costing one extra exchange at unskewed scale and
  // staying flat under a hot user where the one-exchange form straggles
  // (SCALE.md round-7 skew rehearsal). Ship it wherever user-cardinality
  // skew is possible.
  def q105AsofTwoPhase(spark: SparkSession, d: String): DataFrame = {
    val base = evBase(spark, d)
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("value").as("click_value"))
    val purchases = base.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us").as("pts_us"))
      .agg(max(col("value")).as("purchase_value"))
    AsofJoin.joinTwoPhase(clicks, purchases, Seq("user_id"), "ts_us", "pts_us")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("click_value"),
        col("asof_pts_us").as("purchase_ts_us"),
        col("asof_purchase_value").as("purchase_value"),
        (col("ts_us") - col("asof_pts_us")).as("staleness_us"))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  // ---------------------------------------------------------------------------
  // q107 — interval attribution via the bucketed range join: activity
  // sessions (click/view/purchase, 30-min gap — q81's construction over
  // the activity slice) become intervals; every ERROR event is attributed
  // to the session containing it, or NULL when it fell in a quiet gap —
  // the ops/diagnostics shape ("which user session did this failure
  // happen in"), and the generic point-in-interval operator the band
  // join family (EventBars) specializes.
  //
  // Plan (operators/RangeJoin): intervals explode to the 30-min buckets
  // they span, points take their one bucket, and the join is pure equi on
  // (user, bucket) with the band predicate residual — each (point,
  // interval) pair appears exactly once, nothing key-coarse ever cross
  // products, hot users spread over their buckets. Left-outer attribution
  // re-attaches matches on event_id (the q100-style narrow re-join).
  private val SessionGapUs = 1800000000L

  def q107IntervalAttribution(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val base = evBase(spark, d)
    val act = base
      .filter(col("event_type").isin("click", "view", "purchase"))
      .select(col("user_id"), col("ts_us"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
    val iv = act
      .withColumn("prev", lag(col("ts_us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev").isNull || col("ts_us") - col("prev") > SessionGapUs, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("is_new"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("sid"))
      .agg(min(col("ts_us")).as("s_start"), max(col("ts_us")).as("s_end"),
        count(lit(1)).as("n_act"))
    val errors = base.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val matched = graft.operators.RangeJoin.pointInInterval(
      errors, iv, Seq("user_id"), "ts_us", "s_start", "s_end", SessionGapUs)
      .select(col("event_id"), col("iv_sid").as("session_id"),
        col("iv_s_start").as("s_start"), col("iv_s_end").as("s_end"),
        col("iv_n_act").as("n_act"))
    errors.join(matched, Seq("event_id"), "left")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("session_id"),
        col("s_start"), col("s_end"), col("n_act"))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  val q107Sql: String =
    """WITH act AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us FROM events
      |  WHERE event_type IN ('click', 'view', 'purchase')),
      |s0 AS (
      |  SELECT user_id, ts_us,
      |    CASE WHEN lag(ts_us) OVER w IS NULL
      |      OR ts_us - lag(ts_us) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
      |  FROM act WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)),
      |s1 AS (
      |  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM s0),
      |iv AS (
      |  SELECT user_id, sid, min(ts_us) AS s_start, max(ts_us) AS s_end,
      |    count(*) AS n_act
      |  FROM s1 GROUP BY 1, 2),
      |err AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events
      |  WHERE event_type = 'error')
      |SELECT e.user_id, e.ts_us, e.event_id, iv.sid AS session_id,
      |  iv.s_start, iv.s_end, iv.n_act
      |FROM err e LEFT JOIN iv
      |  ON iv.user_id = e.user_id AND e.ts_us BETWEEN iv.s_start AND iv.s_end
      |ORDER BY e.user_id, e.ts_us, e.event_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q108 — fixed-grid resampling with forward fill: each event series
  // re-sampled onto its 1-hour grid (per-slot OHLC of `value`), empty
  // slots gap-flagged and close-forward-filled — pandas `resample('1h')
  // .ohlc()` + `ffill()`, the normalization step before any fixed-step
  // model sees an irregular series. Output size is grid-bounded
  // (series × hours), independent of event volume.
  //
  // Plan: one groupBy onto (series, slot) — map-side combined, carrying
  // only OHLC sufficient stats; the grid is a per-series sequence-explode
  // of O(slots) rows; the forward fill is a running last(ignoreNulls)
  // window over the GRID-granular frame (slots, not events). Nothing
  // event-cardinality-sized is windowed or broadcast. (series, ts) unique
  // in the fixture makes arg-min/max by ts deterministic on both engines.
  private val SlotUs = 3600000000L

  def q108ResampleFfill(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = evBase(spark, d)
      .select(col("event_type"), col("ts_us"), col("event_id"), col("value"))
    val grid = e.groupBy(col("event_type"))
      .agg((min(col("ts_us")) / SlotUs).cast("long").as("s0"),
        (max(col("ts_us")) / SlotUs).cast("long").as("s1"))
      .select(col("event_type"),
        explode(sequence(col("s0"), col("s1"))).as("slot"))
    val agg = e.withColumn("slot", (col("ts_us") / SlotUs).cast("long"))
      .groupBy(col("event_type"), col("slot"))
      .agg(count(lit(1)).as("n_events"),
        // open/close tie-break BY CONSTRUCTION, not data luck: min_by on
        // ts_us alone picks an arbitrary row when two events share a
        // timestamp (partition-order dependent, and DuckDB's arg_min
        // breaks its own ties differently) — order on the UNIQUE
        // (ts_us, event_id) pair via lexicographic struct min/max, the
        // q102 discipline (r13 review)
        min(struct(col("ts_us"), col("event_id"), col("value")))
          .getField("value").as("o"),
        max(col("value")).as("h"),
        min(col("value")).as("l"),
        max(struct(col("ts_us"), col("event_id"), col("value")))
          .getField("value").as("c"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("slot"))
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(agg, Seq("event_type", "slot"), "left")
      .na.fill(0L, Seq("n_events"))
      .withColumn("is_gap", when(col("c").isNull, 1).otherwise(0))
      .withColumn("c_filled", last(col("c"), ignoreNulls = true).over(w))
      .select(col("event_type"), col("slot"), col("n_events"),
        col("o"), col("h"), col("l"), col("c"), col("c_filled"), col("is_gap"))
      .orderBy(col("event_type"), col("slot"))
  }

  val q108Sql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) AS ts_us, event_id, value FROM events),
      |b AS (
      |  SELECT event_type, min(ts_us) // 3600000000 AS s0,
      |    max(ts_us) // 3600000000 AS s1
      |  FROM e GROUP BY 1),
      |g AS (
      |  SELECT event_type, unnest(range(s0, s1 + 1)) AS slot FROM b),
      |a AS (
      |  SELECT event_type, ts_us // 3600000000 AS slot, count(*) AS n_events,
      |    (min({'t': ts_us, 'i': event_id, 'v': value})).v AS o,
      |    max(value) AS h, min(value) AS l,
      |    (max({'t': ts_us, 'i': event_id, 'v': value})).v AS c
      |  FROM e GROUP BY 1, 2),
      |j AS (
      |  SELECT g.event_type, g.slot, coalesce(a.n_events, 0) AS n_events,
      |    a.o, a.h, a.l, a.c,
      |    CASE WHEN a.c IS NULL THEN 1 ELSE 0 END AS is_gap
      |  FROM g LEFT JOIN a USING (event_type, slot))
      |SELECT event_type, slot, n_events, o, h, l, c,
      |  last_value(c IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY slot
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_filled,
      |  is_gap
      |FROM j ORDER BY event_type, slot""".stripMargin

  val all: Map[String, Q] = Map(
    "q100_asof_backward" -> (q100AsofBackward(_, _)),
    "q108_resample_ffill" -> (q108ResampleFfill(_, _)),
    "q107_interval_attribution" -> (q107IntervalAttribution(_, _)),
    "q101_asof_forward_tolerance" -> (q101AsofForwardTolerance(_, _)),
    "q102_asof_bars_mtf" -> (q102AsofBarsMtf(_, _)),
    "q105_asof_twophase" -> (q105AsofTwoPhase(_, _)))

  val oracles: Map[String, String] = Map(
    "q100_asof_backward" -> q100Sql,
    "q101_asof_forward_tolerance" -> q101Sql,
    "q102_asof_bars_mtf" -> q102Sql,
    // same semantics as q100 under a different physical plan → same oracle
    "q105_asof_twophase" -> q100Sql,
    "q107_interval_attribution" -> q107Sql,
    "q108_resample_ffill" -> q108Sql)
}
