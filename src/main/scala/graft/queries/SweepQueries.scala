package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Barriers, BarFrame, Formations, Laguerre}

/** The gen600-style sweep (SURVEY.md §3.1, the reference's main entry
  * point): formations × barrier profiles × per-combo metrics — in ONE
  * Spark job over ONE shared signal/forward-array frame.
  *
  * The reference instantiates 300,960 SQL files and re-scans the bars
  * table once per config (§3.1 step 1-2; 66,960 rescans of the same
  * series). Here the scan+window work happens once: formation flags are
  * computed per bar, forward arrays are collected only for rows that fire
  * ANY formation (banded join), the barrier grid is a broadcast literal,
  * and the barrier scan + metrics aggregate fan out columnar — the
  * structural win that makes the sweep latency independent of the number
  * of configs (up to the grid's aggregate cost).
  */
object SweepQueries {

  type Q = (SparkSession, String) => DataFrame

  private val K = 35

  // formations swept (subset of the registry that needs no quantile gate —
  // the gated ones join the sweep exactly the same way, at the cost of a
  // longer oracle; coverage of the gated path is q41)
  private val sweepFormations = Seq(
    "2down_ng" -> "(dir_1 = 0 AND dir_0 = 0)",
    "dud" -> "(dir_2 = 0 AND dir_1 = 1 AND dir_0 = 0)",
    "duu_s" -> "(dir_2 = 0 AND dir_1 = 1 AND dir_0 = 1)")

  private val grid = Seq( // (profile, tp_pct, sl_pct, max_bars)
    ("inverted", 0.005, 0.01, 20),
    ("symmetric", 0.0075, 0.0075, 20),
    ("momentum", 0.01, 0.005, 30))

  // ---------------------------------------------------------------------------
  // q43 — full sweep: per (formation, barrier_profile) the gen200 metrics
  // block over triple-barrier outcomes of next-bar-open entries.
  def q43FormationBarrierSweep(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = BarFrame.series(Seq(col("event_type")), col("ts_us"), col("event_id"))
    val flagged = EventBars.bars(spark, d)
      .withColumn("dir_0", BarFrame.direction(col("open"), col("close")))
      .withColumn("dir_1", lag(col("dir_0"), 1).over(w))
      .withColumn("dir_2", lag(col("dir_0"), 2).over(w))
    val anySignal = col("rn") > 100 && sweepFormations.map { case (_, p) => expr(p) }
      .reduce(_ || _)
    val sig = EventBars.signalForwardArrays(flagged, anySignal, K)
      .withColumn("entry_price", try_element_at(col("fwd_opens"), lit(1)))
      .filter(col("entry_price").isNotNull && col("entry_price") > 0)
    val stackExpr = sweepFormations.map { case (name, p) =>
      s"'$name', CASE WHEN $p THEN 1 ELSE 0 END"
    }.mkString(s"stack(${sweepFormations.size}, ", ", ", ") as (formation, flag)")
    val perFormation = sig
      .select(col("*"), expr(stackExpr))
      .filter(col("flag") === 1)
    val gridDf = grid.toDF("barrier_profile", "tp_pct", "sl_pct", "max_bars")
    val trades = Barriers.tripleBarrier(perFormation.crossJoin(broadcast(gridDf)))
    Barriers.metricsAgg(trades, col("formation"), col("barrier_profile"))
      .select(col("formation"), col("barrier_profile"),
        col("total_signals"), col("tp_count"), col("sl_count"), col("time_count"),
        (round(col("win_rate"), 6) + 0.0).as("win_rate"),
        (round(col("profit_factor"), 6) + 0.0).as("profit_factor"),
        (round(col("expected_value_pct"), 6) + 0.0).as("expected_value_pct"),
        (round(col("avg_bars_held"), 6) + 0.0).as("avg_bars_held"))
      .orderBy(col("formation"), col("barrier_profile"))
  }

  val q43Sql: String = {
    val formationBlocks = sweepFormations.map { case (name, p) =>
      s"SELECT '$name' AS formation, * FROM signals WHERE $p"
    }.mkString("\n  UNION ALL\n  ")
    val gridValues = grid.map { case (n, tp, sl, mb) => s"('$n', $tp, $sl, $mb)" }
      .mkString(", ")
    val slWins = "raw_sl_bar > 0 AND (raw_tp_bar = 0 OR raw_sl_bar <= raw_tp_bar)"
    val tpWins = "raw_tp_bar > 0 AND (raw_sl_bar = 0 OR raw_tp_bar < raw_sl_bar)"
    val ret = "((exit_price - entry_price) / entry_price)"
    val isWin = "(exit_type = 'TP' OR (exit_type = 'TIME' AND exit_price > entry_price))"
    val isLoss = "(exit_type = 'SL' OR (exit_type = 'TIME' AND exit_price <= entry_price))"
    val winRate = "(CAST(count(*) FILTER (WHERE exit_type = 'TP') AS DOUBLE) / nullif(CAST(count(*) AS DOUBLE), 0.0))"
    s"""${EventBars.duckCte},
       |dirs AS (
       |  SELECT *,
       |    CASE WHEN close > open THEN 1 ELSE 0 END AS dir_0,
       |    lag(CASE WHEN close > open THEN 1 ELSE 0 END, 1) OVER w AS dir_1,
       |    lag(CASE WHEN close > open THEN 1 ELSE 0 END, 2) OVER w AS dir_2
       |  FROM bars
       |  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id)),
       |${EventBars.duckFwdCte(K).replace("FROM bars", "FROM dirs")},
       |signals AS (
       |  SELECT *, fwd_opens[1] AS entry_price
       |  FROM fwd
       |  WHERE rn > 100 AND fwd_opens[1] IS NOT NULL AND fwd_opens[1] > 0),
       |tagged AS (
       |  $formationBlocks),
       |grid AS (
       |  SELECT * FROM (VALUES $gridValues)
       |    g(barrier_profile, tp_pct, sl_pct, max_bars)),
       |scan AS (
       |  SELECT t.formation, g.barrier_profile, t.entry_price, g.max_bars,
       |    t.entry_price * (1.0 + g.tp_pct) AS tp_price,
       |    t.entry_price * (1.0 - g.sl_pct) AS sl_price,
       |    least(len(t.fwd_highs), g.max_bars) AS window_bars,
       |    coalesce(list_position(list_transform(list_slice(t.fwd_highs, 1, g.max_bars),
       |      x -> x >= t.entry_price * (1.0 + g.tp_pct)), true), 0) AS raw_tp_bar,
       |    coalesce(list_position(list_transform(list_slice(t.fwd_lows, 1, g.max_bars),
       |      x -> x <= t.entry_price * (1.0 - g.sl_pct)), true), 0) AS raw_sl_bar,
       |    t.fwd_opens, t.fwd_closes
       |  FROM tagged t CROSS JOIN grid g),
       |outcome AS (
       |  SELECT *,
       |    CASE WHEN $slWins THEN 'SL' WHEN $tpWins THEN 'TP'
       |         WHEN window_bars >= max_bars THEN 'TIME' ELSE 'INCOMPLETE' END AS exit_type,
       |    CASE WHEN $slWins THEN raw_sl_bar WHEN $tpWins THEN raw_tp_bar
       |         WHEN window_bars >= max_bars THEN max_bars ELSE 0 END AS exit_bar,
       |    CASE WHEN $slWins THEN least(fwd_opens[raw_sl_bar], sl_price)
       |         WHEN $tpWins THEN tp_price
       |         WHEN window_bars >= max_bars THEN fwd_closes[max_bars]
       |         ELSE 0 END AS exit_price
       |  FROM scan),
       |trades AS (SELECT * FROM outcome WHERE exit_type != 'INCOMPLETE')
       |SELECT formation, barrier_profile,
       |  count(*) AS total_signals,
       |  count(*) FILTER (WHERE exit_type = 'TP') AS tp_count,
       |  count(*) FILTER (WHERE exit_type IN ('SL', 'TRAIL')) AS sl_count,
       |  count(*) FILTER (WHERE exit_type = 'TIME') AS time_count,
       |  round($winRate, 6) + 0.0 AS win_rate,
       |  round(sum($ret) FILTER (WHERE $isWin)
       |    / nullif(abs(sum($ret) FILTER (WHERE $isLoss)), 0.0), 6) + 0.0 AS profit_factor,
       |  round(avg($ret), 6) + 0.0 AS expected_value_pct,
       |  round(avg(exit_bar), 6) + 0.0 AS avg_bars_held
       |FROM trades
       |GROUP BY formation, barrier_profile
       |ORDER BY formation, barrier_profile""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q47 — E30: the gen800 regime-gated sweep (scripts/gen800_sweep.py:31-60):
  // Laguerre regime labels join the bar frame as a GATE dimension —
  // (formation × regime_gate × barrier_profile) metrics from one shared
  // signal frame. Regime gates (gen800_sweep.py REGIME_GATES):
  // bullish_only (regime = 2), not_bearish (regime ≥ 1), any_regime.
  //
  // The Laguerre recursion is sequential per series (flatMapGroups), so no
  // DuckDB oracle exists for the gated slices — the driver records the
  // rows-only check; SweepSpec pins (a) the any_regime slice row-for-row
  // against oracle-checked q43 and (b) gate monotonicity + a census
  // cross-check against an independent Scala recomputation.
  private val regimeGates = Seq(
    "any_regime" -> "true",
    "bullish_only" -> "(regime = 2)",
    "not_bearish" -> "(regime >= 1)")

  def q47RegimeGatedSweep(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = BarFrame.series(Seq(col("event_type")), col("ts_us"), col("event_id"))
    // join-free regime attachment: one exchange feeds the recursion AND
    // the direction windows (no 3-column equi-join shuffle of the bars)
    val flagged = Laguerre.attachRegimes(EventBars.bars(spark, d)).drop("rsi")
      .withColumn("dir_0", BarFrame.direction(col("open"), col("close")))
      .withColumn("dir_1", lag(col("dir_0"), 1).over(w))
      .withColumn("dir_2", lag(col("dir_0"), 2).over(w))
    val anySignal = col("rn") > 100 && sweepFormations.map { case (_, p) => expr(p) }
      .reduce(_ || _)
    val sig = EventBars.signalForwardArrays(flagged, anySignal, K)
      .withColumn("entry_price", try_element_at(col("fwd_opens"), lit(1)))
      .filter(col("entry_price").isNotNull && col("entry_price") > 0)
    val formationStack = sweepFormations.map { case (name, p) =>
      s"'$name', CASE WHEN $p THEN 1 ELSE 0 END"
    }.mkString(s"stack(${sweepFormations.size}, ", ", ", ") as (formation, flag)")
    val gateStack = regimeGates.map { case (name, p) =>
      s"'$name', CASE WHEN $p THEN 1 ELSE 0 END"
    }.mkString(s"stack(${regimeGates.size}, ", ", ", ") as (regime_gate, gate_flag)")
    val perCombo = sig
      .select(col("*"), expr(formationStack)).filter(col("flag") === 1)
      .select(col("*"), expr(gateStack)).filter(col("gate_flag") === 1)
    val gridDf = grid.toDF("barrier_profile", "tp_pct", "sl_pct", "max_bars")
    val trades = Barriers.tripleBarrier(perCombo.crossJoin(broadcast(gridDf)))
    Barriers.metricsAgg(trades, col("formation"), col("regime_gate"), col("barrier_profile"))
      .select(col("formation"), col("regime_gate"), col("barrier_profile"),
        col("total_signals"), col("tp_count"), col("sl_count"), col("time_count"),
        (round(col("win_rate"), 6) + 0.0).as("win_rate"),
        (round(col("profit_factor"), 6) + 0.0).as("profit_factor"),
        (round(col("expected_value_pct"), 6) + 0.0).as("expected_value_pct"),
        (round(col("avg_bars_held"), 6) + 0.0).as("avg_bars_held"))
      .orderBy(col("formation"), col("regime_gate"), col("barrier_profile"))
  }

  val all: Map[String, Q] = Map(
    "q43_formation_barrier_sweep" -> (q43FormationBarrierSweep _),
    "q47_regime_gated_sweep" -> (q47RegimeGatedSweep _))

  val oracles: Map[String, String] = Map(
    "q43_formation_barrier_sweep" -> q43Sql)
}
