package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.{ErfAS, GraftFunctions => GF}
import graft.operators.BarFrame

/** Quantile / statistics operator coverage: exact-exclusive quantiles
  * (aggregate + rolling + expanding no-lookahead window forms — the
  * reference's load-bearing operator, SURVEY.md §4.3.1), erf-based
  * z→p significance math (A9), and moment aggregates with cross-engine
  * semantics shims (A7).
  *
  * The DuckDB oracle has neither `quantileExactExclusive` nor `erf`, so the
  * oracle SQL spells out the exact same arithmetic (list interpolation /
  * A&S erf) — both engines then agree to the last ulp, making the rounded
  * hash compare airtight.
  */
object QuantQueries {

  type Q = (SparkSession, String) => DataFrame

  /** DuckDB SQL for exclusive-quantile interpolation over a sorted DOUBLE
    * list `l` with length `n` — mirrors QuantileExactExclusive.nullSafeEval. */
  /** ONE definition of the DuckDB exclusive-quantile interpolation over a
    * sorted list (shared by the quant/champion/adaptive oracles — three
    * verbatim copies had started to drift, r13 review). CAST to DOUBLE:
    * DuckDB parses the 0.x literal as exact DECIMAL, whose h differs
    * from Spark's double h by ~1 ulp — harmless on small-magnitude
    * inputs, but magnified across the round(x, 6) boundary by
    * 1e9-scale values (the AdaptiveQueries lesson, now everywhere). */
  private[queries] def qexcSql(l: String, n: String, q: String): String = {
    val h = s"(CAST($q AS DOUBLE) * ($n + 1))"
    val idx = s"CAST(floor($h) AS INT)"
    s"""(CASE WHEN $n = 0 THEN NULL
       |  WHEN $h < 1 THEN $l[1]
       |  WHEN $h >= $n THEN $l[$n]
       |  ELSE $l[$idx] + ($h - floor($h)) * ($l[$idx + 1] - $l[$idx])
       |END)""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q13 — exclusive quantile as a plain aggregate (A4; ref
  // eval/extraction.py:208-209 quantileExactExclusive on trade returns).
  def q13ExclQuantileAgg(spark: SparkSession, d: String): DataFrame =
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(
        count(col("value")).as("n"),
        round(GF.quantileExactExclusive(collect_list(col("value")), 0.25), 6).as("q25"),
        round(GF.quantileExactExclusive(collect_list(col("value")), 0.50), 6).as("q50"),
        round(GF.quantileExactExclusive(collect_list(col("value")), 0.95), 6).as("q95"))
      .orderBy(col("event_type"))

  val q13Sql: String = {
    def f(q: String) = qexcSql("l", "n", q)
    s"""WITH g AS (
       |  SELECT event_type, count(value) AS n,
       |    list_sort(list(value) FILTER (WHERE value IS NOT NULL)) AS l
       |  FROM events GROUP BY event_type)
       |SELECT event_type, n,
       |  round(${f("0.25")}, 6) AS q25,
       |  round(${f("0.50")}, 6) AS q50,
       |  round(${f("0.95")}, 6) AS q95
       |FROM g ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q14 — hit-rate significance block (A9; ref sql/gen01_single_feature.sql:65-69):
  // hit_rate, edge, z = (hr-0.5)/sqrt(0.25/n), p = 1 - 0.5*(1+erf(z/sqrt(2))).
  def q14ErfZscore(spark: SparkSession, d: String): DataFrame = {
    val hr = col("hits").cast("double") / col("n")
    val z = (hr - 0.5) / sqrt(lit(0.25) / col("n"))
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), count_if(col("value") > 50).as("hits"))
      .withColumn("hit_rate", round(hr, 6))
      .withColumn("z_score", round(z, 6))
      .withColumn("p_value",
        round(lit(1.0) - lit(0.5) * (lit(1.0) + ErfAS.erfAS(z / lit(math.sqrt(2.0)))), 6))
      .orderBy(col("event_type"))
  }

  val q14Sql: String = {
    val hr = "(hits / n)"
    val z = s"(($hr - 0.5) / sqrt(0.25 / n))"
    s"""WITH g AS (
       |  SELECT event_type, count(*) AS n,
       |    count(*) FILTER (WHERE value > 50) AS hits
       |  FROM events GROUP BY event_type)
       |SELECT event_type, n, hits,
       |  round($hr, 6) AS hit_rate,
       |  round($z, 6) AS z_score,
       |  round(1.0 - 0.5 * (1.0 + ${ErfAS.duckSql(s"($z / sqrt(2.0))")}), 6) AS p_value
       |FROM g ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q15 — rolling no-lookahead exclusive quantile (A5/W6, THE load-bearing
  // operator; ref sql/gen600_2down_template.sql:69-72: p95 over ROWS BETWEEN
  // 999 PRECEDING AND 1 PRECEDING). 100-row lookback here; signal flag
  // `value > p90_prior` mirrors the adaptive-threshold formation gate.
  def q15RollingQuantile(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    // DECLARATIVE sliding-frame form, planned by SlidingQuantileStrategy as
    // the streaming SlidingQuantileWindowExec (ensureConfs registers it in
    // every engine session): the rn window and the quantile node share one
    // exchange+sort, and the quantile runs as an insert/evict sorted
    // multiset — O(lookback) state, no per-row 100-double buffer + sort.
    // Arithmetic is the same shared interpolator as the collect_list form
    // and the SeriesReplay kernel (SlidingQuantileWindowSpec pins all
    // three bit-identical); the multi-op SeriesReplay pass remains the
    // shape for the quantile+shift chains (AdaptiveQueries).
    val base = ev
      .select(col("event_id"), col("event_type"), Tables.tsUs(ev).as("ts_us"), col("value"))
    val w = graft.operators.BarFrame.series(
      Seq(col("event_type")), col("ts_us"), col("event_id"))
    base
      .withColumn("rn", row_number().over(w))
      .withColumn("p90_raw",
        graft.functions.GraftFunctions.exclusiveQuantileAgg(col("value"), 0.90)
          .over(w.rowsBetween(-100, -1)))
      .withColumn("p90_prior", round(col("p90_raw"), 6))
      .withColumn("is_signal",
        when(col("p90_prior").isNotNull && col("value") > col("p90_prior"), 1).otherwise(0))
      .select("event_id", "event_type", "value", "rn", "p90_prior", "is_signal")
      .orderBy(col("event_id"))
  }

  val q15Sql: String = {
    val f = qexcSql("l", "len(l)", "0.90")
    s"""WITH b AS (
       |  SELECT event_id, event_type, value,
       |    row_number() OVER w AS rn,
       |    list_sort(list_filter(
       |      list(value) OVER (PARTITION BY event_type ORDER BY epoch_us(ts), event_id
       |                        ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING),
       |      x -> x IS NOT NULL)) AS l
       |  FROM events
       |  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts), event_id))
       |SELECT event_id, event_type, value, rn,
       |  round($f, 6) AS p90_prior,
       |  CASE WHEN $f IS NOT NULL AND value > $f THEN 1 ELSE 0 END AS is_signal
       |FROM b ORDER BY event_id""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q16 — expanding (TRUE no-lookahead) exclusive quantile with warmup gate
  // (A5/W5; ref sql/gen111_true_nolookahead.sql:49-52 + rn > warmup gate :47).
  def q16ExpandingQuantile(spark: SparkSession, d: String): DataFrame = {
    val w = BarFrame.series(Seq(col("event_type")), col("ts_us"), col("event_id"))
    val ev = Tables.events(spark, d)
    ev
      .select(col("event_id"), col("event_type"), Tables.tsUs(ev).as("ts_us"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("p95_prior",
        round(BarFrame.expandingExclusiveQuantile(col("value"), 0.95, w), 6))
      .filter(col("rn") > 30)
      .select("event_id", "event_type", "value", "rn", "p95_prior")
      .orderBy(col("event_id"))
  }

  val q16Sql: String = {
    val f = qexcSql("l", "len(l)", "0.95")
    s"""WITH b AS (
       |  SELECT event_id, event_type, value,
       |    row_number() OVER w AS rn,
       |    list_sort(list_filter(
       |      list(value) OVER (PARTITION BY event_type ORDER BY epoch_us(ts), event_id
       |                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |      x -> x IS NOT NULL)) AS l
       |  FROM events
       |  WINDOW w AS (PARTITION BY event_type ORDER BY epoch_us(ts), event_id))
       |SELECT event_id, event_type, value, rn, round($f, 6) AS p95_prior
       |FROM b WHERE rn > 30 ORDER BY event_id""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q17 — moment aggregates with sample-semantics shims (A7; ref
  // eval/extraction.py:205-207 stddevSamp/skewSamp/kurtSamp; the shims
  // reconcile Spark's population g1/g2 with the sample G1/G2 the oracle and
  // ClickHouse report — SURVEY.md §4.3.3).
  def q17Moments(spark: SparkSession, d: String): DataFrame = {
    val n = count(col("value"))
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(
        n.as("n"),
        round(avg(col("value")), 6).as("mean"),
        round(stddev_samp(col("value")), 6).as("sd"),
        round(GF.skewSamp(col("value"), n), 6).as("skew"),
        round(GF.kurtSampExcess(col("value"), n), 6).as("kurt"))
      .orderBy(col("event_type"))
  }

  val q17Sql: String =
    """SELECT event_type, count(value) AS n,
      |  round(avg(value), 6) AS mean,
      |  round(stddev_samp(value), 6) AS sd,
      |  round(skewness(value), 6) AS skew,
      |  round(kurtosis(value), 6) AS kurt
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Map[String, Q] = Map(
    "q13_excl_quantile_agg" -> (q13ExclQuantileAgg _),
    "q14_erf_zscore" -> (q14ErfZscore _),
    "q15_rolling_quantile" -> (q15RollingQuantile _),
    "q16_expanding_quantile" -> (q16ExpandingQuantile _),
    "q17_moments" -> (q17Moments _))

  val oracles: Map[String, String] = Map(
    "q13_excl_quantile_agg" -> q13Sql,
    "q14_erf_zscore" -> q14Sql,
    "q15_rolling_quantile" -> q15Sql,
    "q16_expanding_quantile" -> q16Sql,
    "q17_moments" -> q17Sql)
}
