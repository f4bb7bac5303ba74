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

  test("GraftExtensions applies its injections to a fresh extensions set") {
    // full builder-path coverage needs a fresh SparkContext (one JVM, one
    // context here); instantiating and applying pins the wiring compiles
    // and registers without error
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
  }
}
