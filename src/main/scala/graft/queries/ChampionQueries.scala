package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ErfAS
import graft.operators.{BarFrame, Formations}

/** The flagship end-to-end slice (SURVEY.md §7.1.4): the gen111 TRUE
  * no-lookahead champion query and the gen600-style formation census —
  * the full CTE chain bars → expanding/rolling exclusive quantiles →
  * lag/lead → formation predicates → countIf significance block, restated
  * as one windowed projection + one aggregation.
  *
  * Plan shape: a single Window stage per series (all lags, leads, rn and
  * prior-value lists share the one sort/shuffle), then a hash aggregate.
  * The formation census unpivots all registry predicates through `stack`
  * so ALL formations are evaluated in ONE pass over the bars — the
  * reference runs 22 separate template queries for this (§3.1); collapsing
  * the re-scans is the structural Spark win.
  */
object ChampionQueries {

  type Q = (SparkSession, String) => DataFrame

  /** DuckDB exclusive-quantile interpolation over sorted list `l` —
    * the shared QuantQueries.qexcSql (one definition, CAST included). */
  private def qexc(l: String, q: String): String =
    QuantQueries.qexcSql(l, s"len($l)", q)

  // ---------------------------------------------------------------------------
  // q40 — champion pattern, TRUE no-lookahead (sql/gen111_true_nolookahead
  // .sql:18-96): expanding exclusive p95 over ONLY past bars, warmup gate,
  // 2-down + intensity formation, outcome = next bar direction, hit-rate /
  // edge / z / p significance block (A9).
  def q40Champion(spark: SparkSession, d: String): DataFrame = {
    val w = BarFrame.series(Seq(col("event_type")), col("ts_us"), col("event_id"))
    val bars = EventBars.bars(spark, d)
      // P4 nullIf guard: zero-open bars exist at larger SFs; ti goes NULL
      // and every formation predicate is already NULL-safe (→ false)
      .withColumn("r", (col("close") - col("open")) / nullif(col("open"), lit(0.0)))
      .withColumn("ti", abs(col("r")))
      .withColumn("dir_0", BarFrame.direction(col("open"), col("close")))
      .withColumn("dir_1", lag(col("dir_0"), 1).over(w))
      .withColumn("next_dir", lead(col("dir_0"), 1).over(w))
      .withColumn("ti_p95_prior", BarFrame.expandingExclusiveQuantile(col("ti"), 0.95, w))
    val formed = col("rn") > 100 && col("next_dir").isNotNull &&
      col("dir_1") === 0 && col("dir_0") === 0 &&
      col("ti_p95_prior").isNotNull && col("ti") > col("ti_p95_prior")
    val agg = bars.groupBy(col("event_type")).agg(
      count(lit(1)).as("total_bars"),
      count_if(formed).as("signal_count"),
      count_if(formed && col("next_dir") === 1).as("hits"))
    val hr = col("hits").cast("double") / nullif(col("signal_count").cast("double"), lit(0.0))
    val z = (hr - 0.5) / sqrt(lit(0.25) / nullif(col("signal_count").cast("double"), lit(0.0)))
    agg
      .withColumn("hit_rate", round(hr, 6))
      .withColumn("edge_pct", round((hr - 0.5) * 100, 6))
      .withColumn("z_score", round(z, 6))
      .withColumn("p_value",
        round(lit(1.0) - lit(0.5) * (lit(1.0) + ErfAS.erfAS(z / lit(math.sqrt(2.0)))), 6))
      .orderBy(col("event_type"))
  }

  val q40Sql: String = {
    val p95 = qexc("lti", "0.95")
    val formed = s"""(rn > 100 AND next_dir IS NOT NULL AND dir_1 = 0 AND dir_0 = 0
       | AND ti_p95_prior IS NOT NULL AND ti > ti_p95_prior)""".stripMargin
    val hr = "(hits / nullif(CAST(signal_count AS DOUBLE), 0.0))"
    val z = s"(($hr - 0.5) / sqrt(0.25 / nullif(CAST(signal_count AS DOUBLE), 0.0)))"
    s"""${EventBars.duckCte},
       |feat AS (
       |  SELECT event_type, rn,
       |    (close - open) / nullif(open, 0) AS r,
       |    abs((close - open) / nullif(open, 0)) AS ti,
       |    CASE WHEN close > open THEN 1 ELSE 0 END AS dir_0,
       |    lag(CASE WHEN close > open THEN 1 ELSE 0 END, 1) OVER w AS dir_1,
       |    lead(CASE WHEN close > open THEN 1 ELSE 0 END, 1) OVER w AS next_dir,
       |    list_sort(list_filter(list(abs((close - open) / nullif(open, 0))) OVER pw,
       |      x -> x IS NOT NULL)) AS lti
       |  FROM bars
       |  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id),
       |         pw AS (PARTITION BY event_type ORDER BY ts_us, event_id
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |gated AS (SELECT *, $p95 AS ti_p95_prior FROM feat),
       |agg AS (
       |  SELECT event_type, count(*) AS total_bars,
       |    count(*) FILTER (WHERE $formed) AS signal_count,
       |    count(*) FILTER (WHERE $formed AND next_dir = 1) AS hits
       |  FROM gated GROUP BY event_type)
       |SELECT event_type, total_bars, signal_count, hits,
       |  round($hr, 6) AS hit_rate,
       |  round(($hr - 0.5) * 100, 6) AS edge_pct,
       |  round($z, 6) AS z_score,
       |  round(1.0 - 0.5 * (1.0 + ${ErfAS.duckSql(s"($z / sqrt(2.0))")}), 6) AS p_value
       |FROM agg ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q41 — formation census: every registry formation evaluated in ONE pass
  // over the bars (stack-unpivot of the predicate flags), with rolling
  // exclusive-quantile gates and next-bar hit rates per (formation,
  // event_type).
  def q41FormationCensus(spark: SparkSession, d: String): DataFrame = {
    // replay form: the five-stage window stack (two of them sliding-frame
    // rolling quantiles that WindowExec re-materializes+sorts per row) is
    // one per-series pass with incrementally-maintained sorted windows;
    // FormationsReplaySpec pins row-for-row equality to the declarative form
    val prepped = Formations.withFormationColumnsReplay(EventBars.bars(spark, d))
      .filter(Formations.warmupGate(100) && col("next_dir").isNotNull)
    val flagged = Formations.registry.foldLeft(prepped) { case (df, (name, pred)) =>
      df.withColumn(s"f_$name", when(pred, 1).otherwise(0))
    }
    val stackExpr = Formations.registry.map { case (name, _) =>
      s"'$name', f_$name"
    }.mkString(s"stack(${Formations.registry.size}, ", ", ", ") as (formation, flag)")
    flagged
      .select(col("event_type"), col("next_dir"), expr(stackExpr))
      .filter(col("flag") === 1)
      .groupBy(col("formation"), col("event_type"))
      .agg(
        count(lit(1)).as("signal_count"),
        count_if(col("next_dir") === 1).as("hits"),
        round(count_if(col("next_dir") === 1).cast("double") / count(lit(1)), 6)
          .as("hit_rate"))
      .orderBy(col("formation"), col("event_type"))
  }

  val q41Sql: String = {
    val preds: Seq[(String, String)] = Seq(
      "2down" -> "(dir_1 = 0 AND dir_0 = 0 AND ti_p95 IS NOT NULL AND ti > ti_p95)",
      "2down_ng" -> "(dir_1 = 0 AND dir_0 = 0)",
      "3down" -> "(dir_2 = 0 AND dir_1 = 0 AND dir_0 = 0)",
      "dud" -> "(dir_2 = 0 AND dir_1 = 1 AND dir_0 = 0)",
      "duu_s" -> "(dir_2 = 0 AND dir_1 = 1 AND dir_0 = 1)",
      "2up_s" -> "(dir_1 = 1 AND dir_0 = 1 AND ti_p95 IS NOT NULL AND ti > ti_p95)",
      "2up_ng_s" -> "(dir_1 = 1 AND dir_0 = 1)",
      "exh_l" -> "(dir_0 = 0 AND ti_p75 IS NOT NULL AND ti > ti_p75)",
      "vwap_l" -> "(r_p10 IS NOT NULL AND r < r_p10)",
      "hvd" -> "(dir_0 = 0 AND ti_p90 IS NOT NULL AND ti > ti_p90)",
      "wl1d" -> "(dir_0 = 0 AND owp IS NOT NULL AND owp < 0.001)",
      "wl2d" -> "(dir_1 = 0 AND dir_0 = 0 AND owp IS NOT NULL AND owp < 0.001)",
      "exh_s" -> "(dir_0 = 1 AND ti_p75 IS NOT NULL AND ti > ti_p75)",
      "vwap_s" -> "(r_p90 IS NOT NULL AND r > r_p90)",
      "hvu" -> "(dir_0 = 1 AND ti_p90 IS NOT NULL AND ti > ti_p90)",
      "3up_s" -> "(dir_2 = 1 AND dir_1 = 1 AND dir_0 = 1)",
      "udu_s" -> "(dir_2 = 1 AND dir_1 = 0 AND dir_0 = 1)",
      "u1d" -> "(dir_1 = 1 AND dir_0 = 0)",
      "d1u" -> "(dir_1 = 0 AND dir_0 = 1)",
      "2down_g75" -> "(dir_1 = 0 AND dir_0 = 0 AND ti_p75 IS NOT NULL AND ti > ti_p75)",
      "2down_wick" -> "(dir_1 = 0 AND dir_0 = 0 AND owp IS NOT NULL AND owp > 0.3)",
      "dud_g75" -> "(dir_2 = 0 AND dir_1 = 1 AND dir_0 = 0 AND ti_p75 IS NOT NULL AND ti > ti_p75)")
    val blocks = preds.map { case (name, pred) =>
      s"""SELECT '$name' AS formation, event_type,
         |  count(*) AS signal_count,
         |  count(*) FILTER (WHERE next_dir = 1) AS hits,
         |  round(count(*) FILTER (WHERE next_dir = 1) / CAST(count(*) AS DOUBLE), 6) AS hit_rate
         |FROM gated WHERE rn > 100 AND next_dir IS NOT NULL AND $pred
         |GROUP BY event_type""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""${EventBars.duckCte},
       |feat AS (
       |  SELECT event_type, rn, open, high, low, close,
       |    (close - open) / nullif(open, 0) AS r,
       |    abs((close - open) / nullif(open, 0)) AS ti,
       |    CASE WHEN close > open THEN 1 ELSE 0 END AS dir_0,
       |    lag(CASE WHEN close > open THEN 1 ELSE 0 END, 1) OVER w AS dir_1,
       |    lag(CASE WHEN close > open THEN 1 ELSE 0 END, 2) OVER w AS dir_2,
       |    lead(CASE WHEN close > open THEN 1 ELSE 0 END, 1) OVER w AS next_dir,
       |    (CASE WHEN close > open THEN open - low ELSE high - open END)
       |      / nullif(high - low, 0) AS owp,
       |    list_sort(list_filter(list(abs((close - open) / nullif(open, 0))) OVER pw,
       |      x -> x IS NOT NULL)) AS lti,
       |    list_sort(list_filter(list((close - open) / nullif(open, 0)) OVER pw,
       |      x -> x IS NOT NULL)) AS lr
       |  FROM bars
       |  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id),
       |         pw AS (PARTITION BY event_type ORDER BY ts_us, event_id
       |                ROWS BETWEEN 100 PRECEDING AND 1 PRECEDING)),
       |gated AS (
       |  SELECT *, ${qexc("lti", "0.75")} AS ti_p75,
       |    ${qexc("lti", "0.90")} AS ti_p90,
       |    ${qexc("lti", "0.95")} AS ti_p95,
       |    ${qexc("lr", "0.10")} AS r_p10,
       |    ${qexc("lr", "0.90")} AS r_p90
       |  FROM feat)
       |SELECT * FROM (
       |  $blocks
       |) ORDER BY formation, event_type""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q40_champion" -> (q40Champion _),
    "q41_formation_census" -> (q41FormationCensus _))

  val oracles: Map[String, String] = Map(
    "q40_champion" -> q40Sql,
    "q41_formation_census" -> q41Sql)
}
