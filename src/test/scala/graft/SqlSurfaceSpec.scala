package graft

import org.apache.spark.sql.functions._
import graft.functions.{ErfAS, GraftSqlFunctions}

/** SURVEY §7.0's SQL-text surface: the custom functions registered in the
  * FunctionRegistry so reference-shaped SQL runs as `spark.sql` strings.
  * The load-bearing pin: the gen111 TRUE no-lookahead champion chain
  * (ref sql/gen111_true_nolookahead.sql:18-96) written as ONE SQL string —
  * `exclusive_quantile_agg(ti, 0.95) OVER (... ROWS BETWEEN UNBOUNDED
  * PRECEDING AND 1 PRECEDING)` exactly as the reference spells
  * `quantileExactExclusive(0.95)(trade_intensity) OVER (...)` — must match
  * q40's DSL output row-for-row.
  */
class SqlSurfaceSpec extends GraftSuite {

  private def ensureRegistered(): Unit = GraftSqlFunctions.registerAll(spark)

  test("gen111 champion chain as spark.sql text matches q40 row-for-row") {
    ensureRegistered()
    queries.EventBars.bars(spark, sf).createOrReplaceTempView("g_bars")
    val series = "PARTITION BY event_type ORDER BY ts_us, event_id"
    val formed = """rn > 100 AND next_dir IS NOT NULL AND dir_1 = 0 AND dir_0 = 0
      AND ti_p95_prior IS NOT NULL AND ti > ti_p95_prior"""
    val z = "((hit_rate_raw - 0.5) / sqrt(0.25 / nullif(CAST(signal_count AS DOUBLE), 0.0)))"
    val sqlText = s"""
      WITH feat AS (
        SELECT event_type, rn,
          abs((close - open) / nullif(open, 0.0D)) AS ti,
          CASE WHEN close > open THEN 1 ELSE 0 END AS dir_0,
          lag(CASE WHEN close > open THEN 1 ELSE 0 END, 1) OVER ($series) AS dir_1,
          lead(CASE WHEN close > open THEN 1 ELSE 0 END, 1) OVER ($series) AS next_dir,
          exclusive_quantile_agg(abs((close - open) / nullif(open, 0.0D)), 0.95)
            OVER ($series ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            AS ti_p95_prior
        FROM g_bars),
      agg AS (
        SELECT event_type, count(*) AS total_bars,
          count_if($formed) AS signal_count,
          count_if(($formed) AND next_dir = 1) AS hits
        FROM feat GROUP BY event_type),
      hr AS (
        SELECT *,
          CAST(hits AS DOUBLE) / nullif(CAST(signal_count AS DOUBLE), 0.0)
            AS hit_rate_raw
        FROM agg)
      SELECT event_type, total_bars, signal_count, hits,
        round(hit_rate_raw, 6) AS hit_rate,
        round((hit_rate_raw - 0.5) * 100, 6) AS edge_pct,
        round($z, 6) AS z_score,
        round(1.0 - 0.5 * (1.0 + ${ErfAS.duckSql(s"($z / sqrt(2.0))")}), 6) AS p_value
      FROM hr ORDER BY event_type"""
    val got = spark.sql(sqlText).collect()
    val want = queries.ChampionQueries.q40Champion(spark, sf).collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w, s"sql $g != dsl $w") }
  }

  test("scalar/array functions evaluate through SQL text") {
    ensureRegistered()
    val r = spark.sql("""
      SELECT erf(0.5D) AS e,
        exclusive_quantile(array(1.0D, 2.0D, 3.0D, 4.0D), 0.25) AS q,
        dot_fold(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        sorted_intersect_count(array('a','b','c'), array('b','c','d')) AS i,
        md5_prefix_int('x') AS h,
        size(hashed_word_bigrams('a b c')) AS nb,
        size(hashed_word_ngrams('a b c d e', 5)) AS ng
    """).collect()(0)
    assert(r.getAs[Double]("e") == org.apache.commons.math3.special.Erf.erf(0.5))
    // h = 0.25·5 = 1.25 → between 1st and 2nd order stats: 1 + 0.25·(2−1)
    assert(r.getAs[Double]("q") == 1.25)
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Int]("i") == 2)
    assert(r.getAs[Int]("nb") == 2)
    assert(r.getAs[Int]("ng") == 1)
  }

  test("moment shims via SQL text equal the DSL forms") {
    ensureRegistered()
    val ev = Tables.events(spark, sf).select(col("value")).limit(500)
    ev.createOrReplaceTempView("g_vals")
    val got = spark.sql(
      "SELECT kurt_raw(value) AS kr, kurt_samp_excess(value) AS ke, skew_samp(value) AS ss FROM g_vals")
      .collect()(0)
    val want = ev.agg(
      graft.functions.GraftFunctions.kurtRaw(col("value")).as("kr"),
      graft.functions.GraftFunctions.kurtSampExcess(col("value"), count(col("value"))).as("ke"),
      graft.functions.GraftFunctions.skewSamp(col("value"), count(col("value"))).as("ss"))
      .collect()(0)
    assert(got == want, s"sql $got != dsl $want")
  }

  test("exclusive_quantile_agg works as a plain grouped aggregate in SQL") {
    ensureRegistered()
    val ev = Tables.events(spark, sf)
    ev.select(col("event_type"), col("value")).createOrReplaceTempView("g_ev")
    val got = spark.sql(
      """SELECT event_type, exclusive_quantile_agg(value, 0.5) AS med
        FROM g_ev GROUP BY event_type ORDER BY event_type""").collect()
    val want = ev.groupBy(col("event_type"))
      .agg(graft.functions.GraftFunctions.exclusiveQuantileAgg(col("value"), 0.5).as("med"))
      .orderBy(col("event_type")).collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("registerViews: full lake + bars as named views, zero DSL required") {
    ensureRegistered()
    Tables.registerViews(spark, sf)
    // every canonical table name resolves
    Tables.names.foreach { n =>
      assert(spark.sql(s"SELECT count(*) AS n FROM $n").head.getLong(0) > 0, n)
    }
    // a reference-shaped query over `bars` runs as pure SQL text and agrees
    // with the same computation through the DSL bar frame
    val got = spark.sql("""
      SELECT event_type, count(*) AS n,
        count_if(close > open) AS n_up
      FROM bars GROUP BY event_type ORDER BY event_type""").collect()
    val want = queries.EventBars.bars(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), count_if(col("close") > col("open")).as("n_up"))
      .orderBy(col("event_type")).collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("gen600-shaped ROLLING quantile SQL text matches q15 and rides the exec") {
    ensureRegistered()
    val ev = Tables.events(spark, sf)
    ev.select(col("event_id"), col("event_type"),
        Tables.tsUs(ev).as("ts_us"), col("value"))
      .createOrReplaceTempView("g_ev")
    val sqlDf = spark.sql("""
      SELECT event_id, event_type, value,
        row_number() OVER w AS rn,
        round(exclusive_quantile_agg(value, 0.90) OVER
          (PARTITION BY event_type ORDER BY ts_us, event_id
           ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING), 6) AS p90_prior
      FROM g_ev
      WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id)
      ORDER BY event_id""")
    assert(sqlDf.queryExecution.executedPlan.toString
      .contains("SlidingQuantileWindow"),
      "the reference's rolling shape must plan as the incremental exec")
    val got = sqlDf.collect()
    val want = queries.QuantQueries.q15RollingQuantile(spark, sf)
      .select(col("event_id"), col("event_type"), col("value"), col("rn"),
        col("p90_prior")).collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) => assert(g == w) }
  }

  test("FULL gen600 template as sed-instantiated spark.sql text matches q46 " +
    "end-to-end (scan → rolling p95 → formation → signal quantiles → " +
    "profile grid → barrier arrays → final agg)") {
    ensureRegistered()
    // The reference's whole sql/gen600_2down_template.sql:30-255 CTE chain
    // (base_bars → running_stats → signal_detection → champion_signals →
    // feature1_with_quantile → feature2_with_quantile → signals →
    // barrier_params → barrier_scan → trade_outcomes → final agg), kept
    // structurally verbatim and instantiated sed-style. Dialect deltas,
    // each a pure spelling translation:
    //   quantileExactExclusive(p)(x) OVER  → exclusive_quantile_agg(x, p) OVER
    //   lagInFrame/leadInFrame             → lag/lead (lead loses its explicit
    //                                        UNBOUNDED frame — Spark pins
    //                                        lead's frame and rejects one)
    //   groupArray / arraySlice / length   → collect_list / slice / size
    //   arrayFirstIndex(pred, arr)         → coalesce(array_position(
    //                                          transform(arr, pred), true), 0)
    //   arr[i]                             → element_at(arr, i)
    //   countIf/sumIf/avgIf                → count_if / sum(CASE…) / avg(CASE…)
    //   toUInt32                           → CAST(… AS INT)
    //   UNION-ALL profile grid             → kept verbatim
    // Fixture instantiation (the sed parameters): the cache table carries
    // trade_intensity / kyle (neutralized to 1.0 — the fixture has no
    // microstructure columns) / the lookback feature as physical columns,
    // exactly like the reference's open_deviation_bars cache; the
    // single-symbol WHERE becomes PARTITION BY event_type on every window
    // (multi-series fixture; ", event_id" is the deterministic tie-break);
    // warmup/lookback/max_bars/K are q46's fixture-scaled values, with
    // warmup 19 ≡ bars.rn > 20 (the template re-numbers AFTER the engine
    // drops each series' seed bar, so its row_number sits one below the
    // engine's rn); q46's metric-block subset of the final SELECT (the
    // funnel scalar subqueries and kelly/median columns are reference
    // outputs q46 does not emit).
    val w = "PARTITION BY event_type ORDER BY close_time_ms, event_id"
    val bars = queries.EventBars.bars(spark, sf)
    bars
      .withColumn("close_time_ms", col("ts_us"))
      .withColumn("trade_intensity",
        abs((col("close") - col("open")) / nullif(col("open"), lit(0.0))))
      .withColumn("kyle_lambda_proxy", lit(1.0))
      .withColumn("lookback_duration_us",
        (col("ts_us") - lag(col("ts_us"), 1).over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("event_type")).orderBy(col("ts_us"), col("event_id"))))
          .cast("double"))
      .createOrReplaceTempView("odb_cache_base")
    // feature1 (opposite wick) as a cache column, like the reference's
    // precomputed bar-level features
    spark.sql("""CREATE OR REPLACE TEMP VIEW open_deviation_bars AS
      SELECT *,
        CASE WHEN close <= open THEN (high - open) / nullif(high - low, 0)
             ELSE (open - low) / nullif(high - low, 0) END AS opposite_wick_src
      FROM odb_cache_base""")
    val template = s"""
WITH
base_bars AS (
    SELECT
        close_time_ms, event_type, event_id,
        open, high, low, close,
        trade_intensity,
        kyle_lambda_proxy,
        __FEATURE_COL_1__,
        __FEATURE_COL_2__,
        CASE
            WHEN close <= open THEN (high - open) / nullif(high - low, 0)
            ELSE (open - low) / nullif(high - low, 0)
        END AS opposite_wick_pct,
        slice(collect_list(high) OVER (
            $w ROWS BETWEEN CURRENT ROW AND __K__ FOLLOWING
        ), 2, __K__) AS fwd_highs,
        slice(collect_list(low) OVER (
            $w ROWS BETWEEN CURRENT ROW AND __K__ FOLLOWING
        ), 2, __K__) AS fwd_lows,
        slice(collect_list(open) OVER (
            $w ROWS BETWEEN CURRENT ROW AND __K__ FOLLOWING
        ), 2, __K__) AS fwd_opens,
        slice(collect_list(close) OVER (
            $w ROWS BETWEEN CURRENT ROW AND __K__ FOLLOWING
        ), 2, __K__) AS fwd_closes,
        CASE WHEN close > open THEN 1 ELSE 0 END AS direction,
        row_number() OVER ($w) AS rn
    FROM open_deviation_bars
    WHERE close_time_ms <= 9223372036854775807
),
running_stats AS (
    SELECT
        *,
        exclusive_quantile_agg(trade_intensity, __TI_GATE__) OVER (
            $w
            ROWS BETWEEN __LOOKBACK__ PRECEDING AND 1 PRECEDING
        ) AS ti_p95_rolling
    FROM base_bars
),
signal_detection AS (
    SELECT
        close_time_ms, event_type, event_id,
        open, high, low, close,
        direction,
        rn,
        trade_intensity AS ti_0,
        kyle_lambda_proxy AS kyle_0,
        direction AS dir_0,
        lag(direction, 1) OVER w AS dir_1,
        lag(ti_p95_rolling, 0) OVER w AS ti_p95_prior,
        __FEATURE_COL_1__ AS feature1_val,
        __FEATURE_COL_2__ AS feature2_val,
        lead(open, 1) OVER w AS entry_price,
        fwd_highs,
        fwd_lows,
        fwd_opens,
        fwd_closes
    FROM running_stats
    WINDOW w AS ($w)
),
champion_signals AS (
    SELECT *
    FROM signal_detection
    WHERE dir_1 = 0 AND dir_0 = 0
      AND ti_0 > ti_p95_prior
      AND kyle_0 > 0
      AND rn > __WARMUP__
      AND ti_p95_prior IS NOT NULL
      AND ti_p95_prior > 0
      AND entry_price IS NOT NULL
      AND entry_price > 0
      AND feature1_val IS NOT NULL
      AND feature2_val IS NOT NULL
),
feature1_with_quantile AS (
    SELECT
        *,
        exclusive_quantile_agg(feature1_val, __QUANTILE_PCT_1__) OVER (
            $w
            ROWS BETWEEN __LOOKBACK__ PRECEDING AND 1 PRECEDING
        ) AS feature1_q
    FROM champion_signals
),
feature2_with_quantile AS (
    SELECT
        *,
        exclusive_quantile_agg(feature2_val, __QUANTILE_PCT_2__) OVER (
            $w
            ROWS BETWEEN __LOOKBACK__ PRECEDING AND 1 PRECEDING
        ) AS feature2_q
    FROM feature1_with_quantile
),
signals AS (
    SELECT *
    FROM feature2_with_quantile
    WHERE feature1_q IS NOT NULL
      AND feature2_q IS NOT NULL
      AND feature1_val __DIRECTION_1__ feature1_q
      AND feature2_val __DIRECTION_2__ feature2_q
),
barrier_params AS (
    SELECT
        s.*,
        bp.barrier_profile,
        bp.tp_mult,
        bp.sl_mult,
        bp.max_bars,
        s.entry_price * (1.0 + bp.tp_mult * (__THRESHOLD_DBPS__ / 100000.0)) AS tp_price,
        s.entry_price * (1.0 - bp.sl_mult * (__THRESHOLD_DBPS__ / 100000.0)) AS sl_price
    FROM signals s
    CROSS JOIN (
        SELECT 'inverted' AS barrier_profile, 2.5 AS tp_mult, 5.0 AS sl_mult, CAST(30 AS INT) AS max_bars
        UNION ALL
        SELECT 'symmetric', 5.0, 5.0, CAST(20 AS INT)
        UNION ALL
        SELECT 'momentum', 7.5, 2.5, CAST(20 AS INT)
    ) bp
),
barrier_scan AS (
    SELECT
        close_time_ms,
        entry_price,
        barrier_profile,
        tp_mult,
        sl_mult,
        max_bars,
        tp_price,
        sl_price,
        fwd_opens,
        fwd_closes,
        size(fwd_highs) AS available_bars,
        coalesce(array_position(transform(slice(fwd_highs, 1, max_bars), x -> x >= tp_price), true), 0) AS raw_tp_bar,
        coalesce(array_position(transform(slice(fwd_lows, 1, max_bars), x -> x <= sl_price), true), 0) AS raw_sl_bar,
        size(slice(fwd_highs, 1, max_bars)) AS window_bars
    FROM barrier_params
),
trade_outcomes AS (
    SELECT
        close_time_ms,
        entry_price,
        barrier_profile,
        CASE
            WHEN raw_sl_bar > 0 AND raw_tp_bar > 0 AND raw_sl_bar <= raw_tp_bar THEN 'SL'
            WHEN raw_sl_bar > 0 AND raw_tp_bar > 0 AND raw_tp_bar < raw_sl_bar THEN 'TP'
            WHEN raw_sl_bar > 0 AND raw_tp_bar = 0 THEN 'SL'
            WHEN raw_tp_bar > 0 AND raw_sl_bar = 0 THEN 'TP'
            WHEN window_bars >= max_bars THEN 'TIME'
            ELSE 'INCOMPLETE'
        END AS exit_type,
        CASE
            WHEN raw_sl_bar > 0 AND raw_tp_bar > 0 AND raw_sl_bar <= raw_tp_bar THEN raw_sl_bar
            WHEN raw_sl_bar > 0 AND raw_tp_bar > 0 AND raw_tp_bar < raw_sl_bar THEN raw_tp_bar
            WHEN raw_sl_bar > 0 AND raw_tp_bar = 0 THEN raw_sl_bar
            WHEN raw_tp_bar > 0 AND raw_sl_bar = 0 THEN raw_tp_bar
            WHEN window_bars >= max_bars THEN max_bars
            ELSE 0
        END AS exit_bar,
        CASE
            WHEN raw_sl_bar > 0 AND (raw_tp_bar = 0 OR raw_sl_bar <= raw_tp_bar)
                THEN least(element_at(fwd_opens, CAST(raw_sl_bar AS INT)), sl_price)
            WHEN raw_tp_bar > 0 AND (raw_sl_bar = 0 OR raw_tp_bar < raw_sl_bar)
                THEN tp_price
            WHEN window_bars >= max_bars
                THEN element_at(fwd_closes, max_bars)
            ELSE 0
        END AS exit_price
    FROM barrier_scan
)
SELECT
    barrier_profile,
    count(*) AS total_signals,
    count_if(exit_type = 'TP') AS tp_count,
    count_if(exit_type = 'SL') AS sl_count,
    count_if(exit_type = 'TIME') AS time_count,
    round(CAST(count_if(exit_type = 'TP') AS DOUBLE)
      / nullif(CAST(count_if(exit_type IN ('TP', 'SL', 'TIME')) AS DOUBLE), 0.0), 6) + 0.0 AS win_rate,
    round(sum(CASE WHEN exit_type = 'TP' OR (exit_type = 'TIME' AND exit_price > entry_price)
                   THEN (exit_price - entry_price) / entry_price END)
      / nullif(abs(sum(CASE WHEN exit_type = 'SL' OR (exit_type = 'TIME' AND exit_price <= entry_price)
                            THEN (exit_price - entry_price) / entry_price END)), 0.0), 6) + 0.0 AS profit_factor,
    round(avg((exit_price - entry_price) / entry_price), 6) + 0.0 AS expected_value_pct,
    round(avg(exit_bar), 6) + 0.0 AS avg_bars_held
FROM trade_outcomes
WHERE exit_type != 'INCOMPLETE'
GROUP BY barrier_profile
ORDER BY barrier_profile"""
    val instantiated = Seq(
      "__FEATURE_COL_1__" -> "opposite_wick_src",
      "__FEATURE_COL_2__" -> "lookback_duration_us",
      "__QUANTILE_PCT_1__" -> "0.40",
      "__QUANTILE_PCT_2__" -> "0.60",
      "__DIRECTION_1__" -> ">",
      "__DIRECTION_2__" -> "<",
      "__THRESHOLD_DBPS__" -> "250",
      "__TI_GATE__" -> "0.50",
      "__LOOKBACK__" -> "100",
      "__WARMUP__" -> "19",
      "__K__" -> "35")
      .foldLeft(template) { case (t, (k, v)) => t.replace(k, v) }
    val sqlDf = spark.sql(instantiated)
    assert(sqlDf.queryExecution.executedPlan.toString
      .contains("SlidingQuantileWindow"),
      "the template's rolling quantiles must ride the incremental exec")
    val got = sqlDf.collect()
    val want = queries.AdaptiveQueries.q46Gen600Chain(spark, sf).collect()
    assert(got.length == want.length && got.nonEmpty,
      s"${got.length} profiles vs ${want.length}")
    got.zip(want).foreach { case (g, x) => assert(g == x, s"sql $g != q46 $x") }
  }

  test("FULL gen720 walk-forward template as spark.sql text matches the DSL " +
    "two-segment barrier operators trade-for-trade (434-combo grid)") {
    ensureRegistered()
    import org.apache.spark.sql.expressions.Window
    import graft.operators.{Barriers, BarFrame}
    // The reference's per-trade WFO extraction template
    // (sql/gen720_wf_3down_template.sql:34-246): aligned scan → forward
    // arrays → rolling p95 → 3down formation → inline 434-combo grid
    // (8 phase1 × 7 sl_tight × 9 max_bars, phase1 < max_bars) →
    // two-segment SL scan (wide bars 1..phase1, tight after, seg2 offset,
    // effective-SL gap fill) → per-trade rows. Dialect deltas as in the
    // gen600 test, plus: the triple arrayJoin grid becomes three crossed
    // explode subqueries with D-suffixed literals (ClickHouse float
    // literals are Float64; Spark parses bare 7.5 as DECIMAL, which would
    // silently type the carried grid column differently); toString/
    // toUInt32 → CAST; the single-symbol aligned LIMIT becomes a no-op
    // bound (multi-series fixture, windows PARTITION BY event_type). SQL
    // text and DSL run the SAME engine, so rows must match bit-for-bit
    // with no rounding discipline.
    val w = "PARTITION BY event_type ORDER BY close_time_ms, event_id"
    queries.EventBars.bars(spark, sf)
      .withColumn("close_time_ms", col("ts_us"))
      .withColumn("trade_intensity",
        abs((col("close") - col("open")) / nullif(col("open"), lit(0.0))))
      .withColumn("kyle_lambda_proxy", lit(1.0))
      .createOrReplaceTempView("g720_cache")
    val sqlText = s"""
WITH
base_bars AS (
    SELECT
        close_time_ms, event_type, event_id,
        open, high, low, close,
        trade_intensity,
        kyle_lambda_proxy,
        slice(collect_list(high) OVER (
            $w ROWS BETWEEN CURRENT ROW AND 41 FOLLOWING), 2, 40) AS fwd_highs,
        slice(collect_list(low) OVER (
            $w ROWS BETWEEN CURRENT ROW AND 41 FOLLOWING), 2, 40) AS fwd_lows,
        slice(collect_list(open) OVER (
            $w ROWS BETWEEN CURRENT ROW AND 41 FOLLOWING), 2, 40) AS fwd_opens,
        slice(collect_list(close) OVER (
            $w ROWS BETWEEN CURRENT ROW AND 41 FOLLOWING), 2, 40) AS fwd_closes,
        CASE WHEN close > open THEN 1 ELSE 0 END AS direction,
        row_number() OVER ($w) AS rn
    FROM g720_cache
    WHERE close_time_ms <= 9223372036854775807
),
running_stats AS (
    SELECT *,
        exclusive_quantile_agg(trade_intensity, 0.50) OVER (
            $w ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING) AS ti_p95_rolling
    FROM base_bars
),
signal_detection AS (
    SELECT
        close_time_ms, event_type, event_id,
        open, high, low, close, direction, rn,
        trade_intensity AS ti_0,
        kyle_lambda_proxy AS kyle_0,
        direction AS dir_0,
        lag(direction, 1) OVER w AS dir_1,
        lag(direction, 2) OVER w AS dir_2,
        lag(ti_p95_rolling, 0) OVER w AS ti_p95_prior,
        lead(open, 1) OVER w AS entry_price,
        fwd_highs, fwd_lows, fwd_opens, fwd_closes
    FROM running_stats
    WINDOW w AS ($w)
),
formation_signals AS (
    SELECT *
    FROM signal_detection
    WHERE dir_2 = 0 AND dir_1 = 0 AND dir_0 = 0
      AND ti_0 > ti_p95_prior
      AND kyle_0 > 0
      AND rn > 19
      AND ti_p95_prior IS NOT NULL
      AND ti_p95_prior > 0
      AND entry_price IS NOT NULL
      AND entry_price > 0
),
barrier_grid AS (
    SELECT
        phase1_bars,
        sl_tight_mult,
        max_bars,
        concat('p', CAST(phase1_bars AS STRING),
               '_slt', lpad(CAST(CAST(sl_tight_mult * 10 AS INT) AS STRING), 3, '0'),
               '_mb', CAST(max_bars AS STRING)) AS barrier_id
    FROM (SELECT explode(array(2, 3, 5, 7, 10, 15, 20, 30)) AS phase1_bars)
    CROSS JOIN (SELECT explode(array(7.5D, 5.0D, 3.5D, 2.5D, 1.0D, 0.5D, 0.0D)) AS sl_tight_mult)
    CROSS JOIN (SELECT explode(array(10, 15, 20, 30, 40)) AS max_bars)
    WHERE phase1_bars < max_bars
),
signal_barrier AS (
    SELECT
        s.close_time_ms AS signal_ts_ms,
        s.event_type, s.event_id,
        s.entry_price,
        s.fwd_highs, s.fwd_lows, s.fwd_opens, s.fwd_closes,
        g.barrier_id, g.phase1_bars, g.sl_tight_mult, g.max_bars,
        s.entry_price * (1.0 + 2.5 * (250 / 100000.0)) AS tp_price,
        s.entry_price * (1.0 - 5.0 * (250 / 100000.0)) AS sl_wide_price,
        s.entry_price * (1.0 - g.sl_tight_mult * (250 / 100000.0)) AS sl_tight_price
    FROM formation_signals s
    CROSS JOIN barrier_grid g
),
barrier_scan AS (
    SELECT
        signal_ts_ms, event_type, event_id, entry_price, barrier_id,
        phase1_bars, sl_tight_mult, max_bars,
        tp_price, sl_wide_price, sl_tight_price, fwd_opens, fwd_closes,
        size(fwd_highs) AS available_bars,
        coalesce(array_position(transform(slice(fwd_highs, 1, max_bars), x -> x >= tp_price), true), 0) AS raw_tp_bar,
        coalesce(array_position(transform(slice(fwd_lows, 1, phase1_bars), x -> x <= sl_wide_price), true), 0) AS raw_sl_seg1,
        coalesce(array_position(transform(
            slice(fwd_lows, phase1_bars + 1, max_bars - phase1_bars), x -> x <= sl_tight_price), true), 0) AS raw_sl_seg2_local,
        size(slice(fwd_highs, 1, max_bars)) AS window_bars
    FROM signal_barrier
),
barrier_merged AS (
    SELECT *,
        CASE
            WHEN raw_sl_seg1 > 0 THEN raw_sl_seg1
            WHEN raw_sl_seg2_local > 0 THEN raw_sl_seg2_local + phase1_bars
            ELSE 0
        END AS raw_sl_bar,
        CASE
            WHEN raw_sl_seg1 > 0 THEN sl_wide_price
            WHEN raw_sl_seg2_local > 0 THEN sl_tight_price
            ELSE 0
        END AS effective_sl_price
    FROM barrier_scan
),
trade_outcomes AS (
    SELECT
        signal_ts_ms, event_type, event_id, entry_price, barrier_id,
        phase1_bars, sl_tight_mult, max_bars,
        CASE
            WHEN raw_sl_bar > 0 AND raw_tp_bar > 0 AND raw_sl_bar <= raw_tp_bar THEN 'SL'
            WHEN raw_sl_bar > 0 AND raw_tp_bar > 0 AND raw_tp_bar < raw_sl_bar THEN 'TP'
            WHEN raw_sl_bar > 0 AND raw_tp_bar = 0 THEN 'SL'
            WHEN raw_tp_bar > 0 AND raw_sl_bar = 0 THEN 'TP'
            WHEN window_bars >= max_bars THEN 'TIME'
            ELSE 'INCOMPLETE'
        END AS exit_type,
        CASE
            WHEN raw_sl_bar > 0 AND raw_tp_bar > 0 AND raw_sl_bar <= raw_tp_bar THEN raw_sl_bar
            WHEN raw_sl_bar > 0 AND raw_tp_bar > 0 AND raw_tp_bar < raw_sl_bar THEN raw_tp_bar
            WHEN raw_sl_bar > 0 AND raw_tp_bar = 0 THEN raw_sl_bar
            WHEN raw_tp_bar > 0 AND raw_sl_bar = 0 THEN raw_tp_bar
            WHEN window_bars >= max_bars THEN max_bars
            ELSE 0
        END AS exit_bar,
        CASE
            WHEN raw_sl_bar > 0 AND (raw_tp_bar = 0 OR raw_sl_bar <= raw_tp_bar)
                THEN least(element_at(fwd_opens, CAST(raw_sl_bar AS INT)), effective_sl_price)
            WHEN raw_tp_bar > 0 AND (raw_sl_bar = 0 OR raw_tp_bar < raw_sl_bar)
                THEN tp_price
            WHEN window_bars >= max_bars
                THEN element_at(fwd_closes, max_bars)
            ELSE 0
        END AS exit_price
    FROM barrier_merged
)
SELECT
    '3down' AS formation,
    barrier_id,
    phase1_bars, sl_tight_mult, max_bars,
    event_type, event_id,
    signal_ts_ms,
    entry_price,
    exit_type,
    exit_bar,
    exit_price,
    (exit_price - entry_price) / entry_price AS return_pct
FROM trade_outcomes
ORDER BY event_type, event_id, barrier_id"""
    val sqlRows = spark.sql(sqlText).collect()
    assert(sqlRows.nonEmpty, "gen720 text must produce trades on the fixture")
    assert(spark.sql(sqlText).select(col("barrier_id")).distinct().count() >= 200,
      "the inline grid must expand to hundreds of combos")

    // DSL side: the registered operators (EventBars + Barriers.twoSegmentSl)
    // with the identical parameters
    val bars = queries.EventBars.bars(spark, sf)
    val ws = Window.partitionBy(col("event_type")).orderBy(col("ts_us"), col("event_id"))
    val sig0 = bars
      .withColumn("ti", abs((col("close") - col("open")) / nullif(col("open"), lit(0.0))))
      .withColumn("dir_0", BarFrame.direction(col("open"), col("close")))
      .withColumn("dir_1", lag(col("dir_0"), 1).over(ws))
      .withColumn("dir_2", lag(col("dir_0"), 2).over(ws))
      .withColumn("ti_p95_prior",
        graft.functions.GraftFunctions.exclusiveQuantileAgg(col("ti"), 0.50)
          .over(ws.rowsBetween(-100, -1)))
      .withColumn("entry_price", lead(col("open"), 1).over(ws))
      .filter(col("dir_2") === 0 && col("dir_1") === 0 && col("dir_0") === 0 &&
        col("ti") > col("ti_p95_prior") &&
        col("rn") > 20 && // engine rn counts the dropped seed bar; text rn > 19
        col("ti_p95_prior").isNotNull && col("ti_p95_prior") > 0 &&
        col("entry_price").isNotNull && col("entry_price") > 0)
    val sig = queries.EventBars.forwardArraysFor(sig0, bars, 40)
    import spark.implicits._
    val grid = (for {
      p1 <- Seq(2, 3, 5, 7, 10, 15, 20, 30)
      slt <- Seq(7.5, 5.0, 3.5, 2.5, 1.0, 0.5, 0.0)
      mb <- Seq(10, 15, 20, 30, 40)
      if p1 < mb
    } yield (p1, slt, mb)).toDF("phase1_bars", "sl_tight_mult", "max_bars")
    val trades = Barriers.twoSegmentSl(
      sig.crossJoin(broadcast(grid))
        .withColumn("tp_pct", lit(2.5 * (250 / 100000.0)))
        .withColumn("sl_wide_pct", lit(5.0 * (250 / 100000.0)))
        .withColumn("sl_tight_pct", col("sl_tight_mult") * (250 / 100000.0)))
    val dslRows = trades
      .select(col("event_type"), col("event_id"),
        col("phase1_bars"), col("sl_tight_mult"), col("max_bars"),
        col("entry_price"), col("exit_type"), col("exit_bar"), col("exit_price"))
      .collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
        r.getAs[Int]("phase1_bars"), r.getAs[Double]("sl_tight_mult"),
        r.getAs[Int]("max_bars")) ->
        ((r.getAs[Double]("entry_price"), r.getAs[String]("exit_type"),
          r.get(r.fieldIndex("exit_bar")).toString.toLong,
          r.getAs[Double]("exit_price"))))
      .toMap
    val sqlMap = sqlRows
      .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("event_id"),
        r.getAs[Int]("phase1_bars"), r.getAs[Double]("sl_tight_mult"),
        r.getAs[Int]("max_bars")) ->
        ((r.getAs[Double]("entry_price"), r.getAs[String]("exit_type"),
          r.get(r.fieldIndex("exit_bar")).toString.toLong,
          r.getAs[Double]("exit_price"))))
      .toMap
    assert(sqlMap.keySet == dslRows.keySet,
      s"trade sets differ: sql=${sqlMap.size} dsl=${dslRows.size}; " +
        s"sql-only=${(sqlMap.keySet -- dslRows.keySet).take(2)} " +
        s"dsl-only=${(dslRows.keySet -- sqlMap.keySet).take(2)}")
    sqlMap.foreach { case (k, s) =>
      assert(dslRows(k) == s, s"trade $k: sql=$s dsl=${dslRows(k)}")
    }
  }

  test("FULL gen200 template as spark.sql text matches q18 trade-for-trade " +
    "(band self-join forward arrays + arrayJoin grid + slice/first-index scan)") {
    // The reference's sql/gen200_triple_barrier.sql:100-266 CTE chain,
    // structurally verbatim and sed-instantiated to q18's fixture
    // parameters (tp_mult=4.0 / sl_mult=2.0 × the 0.0025 bar range ≡
    // tp 1% / sl 0.5%; max_bars=20; rn%25=0 as the champion predicate
    // stand-in — q18's own signal rule). The shape this test pins that
    // gen600's transcription does NOT: forward arrays come from the
    // AUDIT-#3 BAND SELF-JOIN (:158-171 — signals × base_bars ON rn
    // BETWEEN s.rn+1 AND s.rn+K, groupArray per signal), not a window
    // collect, and the param grid arrives by arrayJoin (:174-186 →
    // LATERAL VIEW explode). Dialect spellings as in the gen600 test;
    // groupArray's implicit order becomes an explicit struct-sorted
    // collect_list (Spark's collect_list is unordered by contract).
    val k = 35
    queries.EventBars.bars(spark, sf).createOrReplaceTempView("gen200_bars")
    val sqlText = s"""
WITH
base_bars AS (
    SELECT event_type, ts_us, event_id, rn, open, high, low, close
    FROM gen200_bars
),
signal_detection AS (
    SELECT *,
        lead(open, 1) OVER (PARTITION BY event_type
                            ORDER BY ts_us, event_id) AS entry_price
    FROM base_bars
),
signals AS (
    SELECT * FROM signal_detection
    WHERE rn % 25 = 0
      AND entry_price IS NOT NULL
      AND entry_price > 0
),
forward_arrays AS (
    SELECT
        s.event_type, s.event_id, s.entry_price, s.rn AS signal_rn,
        transform(array_sort(collect_list(struct(b.rn, b.high, b.low, b.open, b.close))),
                  x -> x.high) AS fwd_highs,
        transform(array_sort(collect_list(struct(b.rn, b.high, b.low, b.open, b.close))),
                  x -> x.low) AS fwd_lows,
        transform(array_sort(collect_list(struct(b.rn, b.high, b.low, b.open, b.close))),
                  x -> x.open) AS fwd_opens,
        transform(array_sort(collect_list(struct(b.rn, b.high, b.low, b.open, b.close))),
                  x -> x.close) AS fwd_closes
    FROM signals s
    INNER JOIN base_bars b
        ON s.event_type = b.event_type
       AND b.rn BETWEEN s.rn + 1 AND s.rn + $k
    GROUP BY s.event_type, s.event_id, s.entry_price, s.rn
),
param_expanded AS (
    SELECT fa.*, tp_mult, sl_mult, max_bars
    FROM forward_arrays fa
    LATERAL VIEW explode(array(4.0D)) t1 AS tp_mult
    LATERAL VIEW explode(array(2.0D)) t2 AS sl_mult
    LATERAL VIEW explode(array(20)) t3 AS max_bars
),
param_with_prices AS (
    SELECT *,
        entry_price * (1.0 + tp_mult * 0.0025) AS tp_price,
        entry_price * (1.0 - sl_mult * 0.0025) AS sl_price
    FROM param_expanded
),
barrier_scan AS (
    SELECT
        event_type, event_id, entry_price, tp_mult, sl_mult, max_bars,
        tp_price, sl_price, fwd_opens, fwd_closes,
        size(fwd_highs) AS available_bars,
        coalesce(array_position(
            transform(slice(fwd_highs, 1, max_bars), x -> x >= tp_price),
            true), 0) AS raw_tp_bar,
        coalesce(array_position(
            transform(slice(fwd_lows, 1, max_bars), x -> x <= sl_price),
            true), 0) AS raw_sl_bar,
        size(slice(fwd_highs, 1, max_bars)) AS window_bars
    FROM param_with_prices
),
trade_outcomes AS (
    SELECT
        event_type, event_id, entry_price, tp_price, sl_price,
        CASE
            WHEN raw_sl_bar > 0 AND raw_tp_bar > 0 AND raw_sl_bar <= raw_tp_bar THEN 'SL'
            WHEN raw_sl_bar > 0 AND raw_tp_bar > 0 AND raw_tp_bar < raw_sl_bar THEN 'TP'
            WHEN raw_sl_bar > 0 AND raw_tp_bar = 0 THEN 'SL'
            WHEN raw_tp_bar > 0 AND raw_sl_bar = 0 THEN 'TP'
            WHEN window_bars >= max_bars THEN 'TIME'
            ELSE 'INCOMPLETE'
        END AS exit_type,
        CAST(CASE
            WHEN raw_sl_bar > 0 AND raw_tp_bar > 0 AND raw_sl_bar <= raw_tp_bar THEN raw_sl_bar
            WHEN raw_sl_bar > 0 AND raw_tp_bar > 0 AND raw_tp_bar < raw_sl_bar THEN raw_tp_bar
            WHEN raw_sl_bar > 0 AND raw_tp_bar = 0 THEN raw_sl_bar
            WHEN raw_tp_bar > 0 AND raw_sl_bar = 0 THEN raw_tp_bar
            WHEN window_bars >= max_bars THEN max_bars
            ELSE 0
        END AS BIGINT) AS exit_bar,
        CASE
            WHEN raw_sl_bar > 0 AND (raw_tp_bar = 0 OR raw_sl_bar <= raw_tp_bar)
                THEN least(element_at(fwd_opens, CAST(raw_sl_bar AS INT)), sl_price)
            WHEN raw_tp_bar > 0 AND (raw_sl_bar = 0 OR raw_tp_bar < raw_sl_bar)
                THEN tp_price
            WHEN window_bars >= max_bars
                THEN element_at(fwd_closes, max_bars)
            ELSE 0
        END AS exit_price
    FROM barrier_scan
)
SELECT event_type, event_id,
    (floor(entry_price * 1e6 + 0.5) / 1e6) AS entry_price,
    exit_type, exit_bar,
    (floor(exit_price * 1e6 + 0.5) / 1e6) AS exit_price,
    (floor(((exit_price - entry_price) / entry_price) * 1e6 + 0.5) / 1e6) AS return_pct
FROM trade_outcomes
WHERE exit_type != 'INCOMPLETE'
ORDER BY event_type, event_id"""
    val got = spark.sql(sqlText).collect()
    val want = queries.BarrierQueries.q18TripleBarrier(spark, sf).collect()
    assert(got.nonEmpty && got.length == want.length,
      s"gen200 text: ${got.length} trades vs q18's ${want.length}")
    got.zip(want).foreach { case (g, x) => assert(g == x, s"sql $g != q18 $x") }
  }

  test("FULL gen201 template as spark.sql text matches q20 trade-for-trade " +
    "(running-max arrayMap + dual-array arrayFirstIndex trailing stop)") {
    // The reference's sql/gen201_trailing_stop.sql:100-246 chain,
    // sed-instantiated to q20's parameters (tp_mult=8.0 / trail_mult=4.0
    // × 0.0025 ≡ tp 2% / trail 1%; max_bars=15). The two shapes this
    // test pins: the per-bar running-max construction
    // arrayMap(i -> greatest(entry, arrayReduce('max', arraySlice(h,1,i))),
    // arrayEnumerate(h)) (:144-155 → transform(sequence(...))) and the
    // TWO-ARRAY lambda arrayFirstIndex((l, ts) -> l <= ts, lows, sls)
    // (:188-196 → array_position over zip_with). Trailing SL wins ties;
    // gap fill = least(open, trailing_sl[bar]).
    val k = 35
    queries.EventBars.bars(spark, sf).createOrReplaceTempView("gen200_bars")
    val sqlText = s"""
WITH
base_bars AS (
    SELECT event_type, ts_us, event_id, rn, open, high, low, close
    FROM gen200_bars
),
signal_detection AS (
    SELECT *,
        lead(open, 1) OVER (PARTITION BY event_type
                            ORDER BY ts_us, event_id) AS entry_price
    FROM base_bars
),
signals AS (
    SELECT * FROM signal_detection
    WHERE rn % 25 = 0
      AND entry_price IS NOT NULL
      AND entry_price > 0
),
forward_arrays AS (
    SELECT
        s.event_type, s.event_id, s.entry_price, s.rn AS signal_rn,
        transform(array_sort(collect_list(struct(b.rn, b.high, b.low, b.open, b.close))),
                  x -> x.high) AS fwd_highs,
        transform(array_sort(collect_list(struct(b.rn, b.high, b.low, b.open, b.close))),
                  x -> x.low) AS fwd_lows,
        transform(array_sort(collect_list(struct(b.rn, b.high, b.low, b.open, b.close))),
                  x -> x.open) AS fwd_opens,
        transform(array_sort(collect_list(struct(b.rn, b.high, b.low, b.open, b.close))),
                  x -> x.close) AS fwd_closes
    FROM signals s
    INNER JOIN base_bars b
        ON s.event_type = b.event_type
       AND b.rn BETWEEN s.rn + 1 AND s.rn + $k
    GROUP BY s.event_type, s.event_id, s.entry_price, s.rn
),
param_expanded AS (
    SELECT fa.*, tp_mult, trail_mult, max_bars
    FROM forward_arrays fa
    LATERAL VIEW explode(array(8.0D)) t1 AS tp_mult
    LATERAL VIEW explode(array(4.0D)) t2 AS trail_mult
    LATERAL VIEW explode(array(15)) t3 AS max_bars
),
param_with_trailing AS (
    SELECT *,
        entry_price * (1.0 + tp_mult * 0.0025) AS tp_price,
        trail_mult * 0.0025 AS trail_pct,
        transform(sequence(1, size(fwd_highs)),
                  i -> greatest(entry_price, array_max(slice(fwd_highs, 1, i))))
            AS running_maxes
    FROM param_expanded
),
param_with_prices AS (
    SELECT *,
        transform(running_maxes, rm -> rm * (1.0 - trail_pct)) AS trailing_sls
    FROM param_with_trailing
),
barrier_scan AS (
    SELECT
        event_type, event_id, entry_price, tp_mult, trail_mult, max_bars,
        tp_price, trailing_sls, fwd_opens, fwd_closes,
        size(fwd_highs) AS available_bars,
        coalesce(array_position(
            transform(slice(fwd_highs, 1, max_bars), x -> x >= tp_price),
            true), 0) AS raw_tp_bar,
        coalesce(array_position(
            zip_with(slice(fwd_lows, 1, max_bars),
                     slice(trailing_sls, 1, max_bars),
                     (l, ts) -> l <= ts),
            true), 0) AS raw_trail_bar,
        size(slice(fwd_highs, 1, max_bars)) AS window_bars
    FROM param_with_prices
),
trade_outcomes AS (
    SELECT
        event_type, event_id, entry_price, tp_price,
        CASE
            WHEN raw_trail_bar > 0 AND raw_tp_bar > 0 AND raw_trail_bar <= raw_tp_bar THEN 'TRAIL'
            WHEN raw_trail_bar > 0 AND raw_tp_bar > 0 AND raw_tp_bar < raw_trail_bar THEN 'TP'
            WHEN raw_trail_bar > 0 AND raw_tp_bar = 0 THEN 'TRAIL'
            WHEN raw_tp_bar > 0 AND raw_trail_bar = 0 THEN 'TP'
            WHEN window_bars >= max_bars THEN 'TIME'
            ELSE 'INCOMPLETE'
        END AS exit_type,
        CAST(CASE
            WHEN raw_trail_bar > 0 AND raw_tp_bar > 0 AND raw_trail_bar <= raw_tp_bar THEN raw_trail_bar
            WHEN raw_trail_bar > 0 AND raw_tp_bar > 0 AND raw_tp_bar < raw_trail_bar THEN raw_tp_bar
            WHEN raw_trail_bar > 0 AND raw_tp_bar = 0 THEN raw_trail_bar
            WHEN raw_tp_bar > 0 AND raw_trail_bar = 0 THEN raw_tp_bar
            WHEN window_bars >= max_bars THEN max_bars
            ELSE 0
        END AS BIGINT) AS exit_bar,
        CASE
            WHEN raw_trail_bar > 0 AND (raw_tp_bar = 0 OR raw_trail_bar <= raw_tp_bar)
                THEN least(element_at(fwd_opens, CAST(raw_trail_bar AS INT)),
                           element_at(trailing_sls, CAST(raw_trail_bar AS INT)))
            WHEN raw_tp_bar > 0 AND (raw_trail_bar = 0 OR raw_tp_bar < raw_trail_bar)
                THEN tp_price
            WHEN window_bars >= max_bars
                THEN element_at(fwd_closes, max_bars)
            ELSE 0
        END AS exit_price
    FROM barrier_scan
)
SELECT event_type, event_id,
    (floor(entry_price * 1e6 + 0.5) / 1e6) AS entry_price,
    exit_type, exit_bar,
    (floor(exit_price * 1e6 + 0.5) / 1e6) AS exit_price,
    (floor(((exit_price - entry_price) / entry_price) * 1e6 + 0.5) / 1e6) AS return_pct
FROM trade_outcomes
WHERE exit_type != 'INCOMPLETE'
ORDER BY event_type, event_id"""
    val got = spark.sql(sqlText).collect()
    val want = queries.BarrierQueries.q20TrailingStop(spark, sf).collect()
    assert(got.nonEmpty && got.length == want.length,
      s"gen201 text: ${got.length} trades vs q20's ${want.length}")
    got.zip(want).foreach { case (g, x) => assert(g == x, s"sql $g != q20 $x") }
  }

  test("GraftExtensions applies its injections to a fresh extensions set") {
    // full builder-path coverage needs a fresh SparkContext (one JVM, one
    // context here); instantiating and applying pins the wiring compiles
    // and registers without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
  }
}
