package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Barriers

/** The gen800 trade-reconstruction twin (scripts/gen800_reconstruct.py:
  * 1-60) — the reference's last artifact-producing script: run the
  * #1-ranked config and emit EVERY trade (entry/exit prices, exit type,
  * bars held, per-trade return) plus the cumulative hedged equity curve
  * with its underwater annotations. Hedging (AP-16) means each signal
  * opens an independent position — exactly the engine's per-signal
  * barrier-scan semantics, so the per-trade log IS the two-segment SL
  * scan (B2/B6) and the equity curve is the running sum over the
  * entry-ordered trade sequence (the gen800_rank/q137 cum machinery).
  *
  * Faithful pieces: bullish-gated pattern signals after the reference's
  * warmup (warmup_bars = max(atr_period, 20) + 10 = 42,
  * gen800_reconstruct.py:117), next-open entry (AP-15/B5), fixed
  * tp_mult 2.5 / sl_mult 5.0 with a config grid over (phase1_bars,
  * sl_tight_mult, max_bars) — the `p{N}_slt{NN}_mb{NN}` barrier axis —
  * and stagnation metrics on the hedged curve (underwater ratio, longest
  * underwater run, gen800_reconstruct.py:279-300). The champion is
  * picked the way gen800_rank feeds gen800_reconstruct: the absolute
  * gates (n_trades ≥ 30, PF > 1, uncapped omega > 1 — the q137
  * formulas) then the stagnation-first order (underwater_ratio ASC, max
  * underwater run ASC, cfg ASC); when NO config passes the gates the
  * pick degrades to the ungated order (the q141 graceful-degradation
  * tier — the reference's corpus always has gate-passers, the smoke
  * fixture may not, and reconstruction must stay total; both engines
  * resolve the data-dependent tier from the same aggregates). Laguerre
  * regime gating is q47's lane; the bullish-bar gate stands in for
  * `bullish_only` so the oracle stays self-contained.
  *
  * Scale shape: ONE banded-join forward-array pass over bars (signals
  * only — AUDIT #3), a broadcast 4-config grid, one window pass per
  * config partition for the equity scan, an O(configs) ranking, and a
  * broadcast champion join. The corpus never shuffles for the grid or
  * the champion pick.
  */
object ReconstructQueries {

  type Q = (SparkSession, String) => DataFrame

  private val K = 35 // forward window; >= max max_bars
  private val Warmup = 42 // max(atr_period=32, 20) + 10

  import BarrierQueries.{grid6, grid6Sql}

  /** The gen800 barrier-config grid: tp/sl wide fixed at 2.5x/5.0x the
    * 0.004 bar range (literals 0.01/0.02 in BOTH engines); the axis is
    * (phase1_bars, sl_tight_mult in {3.5, 2.0}, max_bars). */
  private val Grid: Seq[(String, Int, Double, Int)] = Seq(
    ("p5_slt35_mb10", 5, 0.014, 10),
    ("p7_slt35_mb10", 7, 0.014, 10),
    ("p5_slt20_mb15", 5, 0.008, 15),
    ("p7_slt20_mb15", 7, 0.008, 15))

  def q144Reconstruct(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val grid = Grid.toDF("cfg_id", "phase1_bars", "sl_tight_pct", "max_bars")
    val sig = EventBars.signalForwardArrays(
      EventBars.bars(spark, d),
      col("rn") % 25 === 0 && col("close") > col("open") &&
        col("rn") > Warmup, K)
      .withColumn("entry_price", try_element_at(col("fwd_opens"), lit(1)))
      .filter(col("entry_price").isNotNull && col("entry_price") > 0)
      .crossJoin(broadcast(grid))
      .withColumn("tp_pct", lit(0.01))
      .withColumn("sl_wide_pct", lit(0.02))
    // total order for the hedged curve: (ts_us, event_type, event_id) —
    // the multi-asset analog of the reference's EntryTime sort
    val wC = Window.partitionBy(col("cfg_id"))
      .orderBy(col("ts_us"), col("event_type"), col("event_id"))
    val wF = wC.rowsBetween(Window.unboundedPreceding, 0)
    val trades = Barriers.twoSegmentSl(sig)
      // per-trade return on the 1e-6 grid BEFORE the cum scan, so both
      // engines accumulate identical doubles in the identical order
      .withColumn("ret", grid6(col("return_pct")))
      .select(col("cfg_id"), col("event_type"), col("event_id"), col("ts_us"),
        col("entry_price"), col("exit_type"), col("exit_bar"), col("exit_price"),
        col("ret"))
      .withColumn("cum", sum(col("ret")).over(wF))
      .withColumn("peak", max(col("cum")).over(wF))
      .withColumn("uw", (col("peak") > col("cum")).cast("int"))
      .withColumn("trade_n", row_number().over(wC).cast("long"))
      // read by the stats aggregation, the champion pick and the final
      // trade-log join — one materialization (trivially bounded:
      // |signals| x 4 configs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxRun = trades.filter(col("uw") === 1)
      .withColumn("grp", col("trade_n") - row_number().over(
        Window.partitionBy(col("cfg_id")).orderBy(col("trade_n"))))
      .groupBy(col("cfg_id"), col("grp")).agg(count(lit(1)).as("len"))
      .groupBy(col("cfg_id")).agg(max(col("len")).as("max_uw"))
    // gen800_rank's absolute gates (scripts/gen800_rank.py:85-93, the
    // q137 formulas on the same 6 dp returns); the tier fallback is the
    // q141 graceful-degradation pattern — the reference's corpus always
    // has gate-passing configs, the sf0.001 smoke fixture may not, and
    // the reconstruct selection must stay total
    val wins = sum(greatest(col("ret"), lit(0.0)))
    val losses = sum(greatest(-col("ret"), lit(0.0)))
    val stats = trades.groupBy(col("cfg_id"))
      .agg(
        count(lit(1)).as("n_trades"),
        round(sum(col("uw")).cast("double") / count(lit(1)), 6)
          .as("underwater_ratio"),
        round(when(losses === 0.0, when(wins > 0.0, lit(10.0)).otherwise(lit(null)))
          .otherwise(least(wins / losses, lit(10.0))), 4).as("pf"),
        round(wins / nullif(losses, lit(0.0)), 4).as("omega"))
    val joined = stats.join(maxRun, Seq("cfg_id"), "left")
      .na.fill(0L, Seq("max_uw"))
    val gate = col("n_trades") >= 30 && col("pf") > 1.0 && col("omega") > 1.0
    val pick = joined.agg(count(when(gate, 1)).as("c1"))
      .select(when(col("c1") > 0, 1).otherwise(2).as("tier"))
    val champ = joined.crossJoin(broadcast(pick))
      .filter((col("tier") === 1 && gate) || col("tier") === 2)
      // partitionless rank window: O(configs) frame (4 rows), bounded
      .withColumn("rk", row_number().over(
        Window.orderBy(col("underwater_ratio"), col("max_uw"), col("cfg_id"))))
      .filter(col("rk") === 1).select(col("cfg_id"))
    trades.join(broadcast(champ), "cfg_id")
      .select(col("cfg_id").as("config_id"), col("trade_n"),
        col("event_type"), col("event_id"),
        grid6(col("entry_price")).as("entry_price"), col("exit_type"),
        col("exit_bar").as("duration_bars"),
        grid6(col("exit_price")).as("exit_price"),
        col("ret").as("return_pct"),
        // running sums of 6 dp lattice values in a pinned order; 10 dp
        // output rounding (the r15 quantized-input rule)
        round(col("cum"), 10).as("equity"),
        round(col("peak"), 10).as("peak_equity"),
        round(col("peak") - col("cum"), 10).as("drawdown"),
        col("uw").as("underwater"))
      .orderBy(col("trade_n"))
  }

  val q144Sql: String = {
    val gridVals = Grid.map { case (id, p1, slt, mb) =>
      s"('$id', $p1, $slt, $mb)" }.mkString(",\n       |               ")
    val slWins = "raw_sl_bar > 0 AND (raw_tp_bar = 0 OR raw_sl_bar <= raw_tp_bar)"
    val tpWins = "raw_tp_bar > 0 AND (raw_sl_bar = 0 OR raw_tp_bar < raw_sl_bar)"
    s"""${EventBars.duckCte},
       |${EventBars.duckFwdCte(K)},
       |signals AS (
       |  SELECT *, fwd_opens[1] AS entry_price
       |  FROM fwd
       |  WHERE rn % 25 = 0 AND close > open AND rn > $Warmup
       |    AND fwd_opens[1] IS NOT NULL AND fwd_opens[1] > 0),
       |grid AS (
       |  SELECT * FROM (VALUES $gridVals)
       |       g(cfg_id, phase1_bars, sl_tight_pct, max_bars)),
       |scan AS (
       |  SELECT s.event_type, s.event_id, s.ts_us, s.entry_price,
       |    g.cfg_id, g.phase1_bars, g.max_bars,
       |    s.entry_price * (1.0 + 0.01) AS tp_price,
       |    s.entry_price * (1.0 - 0.02) AS sl_wide_price,
       |    s.entry_price * (1.0 - g.sl_tight_pct) AS sl_tight_price,
       |    least(len(s.fwd_highs), g.max_bars) AS window_bars,
       |    coalesce(list_position(list_transform(
       |      list_slice(s.fwd_highs, 1, g.max_bars),
       |      x -> x >= s.entry_price * (1.0 + 0.01)), true), 0) AS raw_tp_bar,
       |    coalesce(list_position(list_transform(
       |      list_slice(s.fwd_lows, 1, g.phase1_bars),
       |      x -> x <= s.entry_price * (1.0 - 0.02)), true), 0) AS seg1,
       |    coalesce(list_position(list_transform(
       |      list_slice(s.fwd_lows, g.phase1_bars + 1, g.max_bars),
       |      x -> x <= s.entry_price * (1.0 - g.sl_tight_pct)), true), 0)
       |      AS seg2_local,
       |    s.fwd_opens, s.fwd_closes
       |  FROM signals s CROSS JOIN grid g),
       |sl AS (
       |  SELECT *,
       |    CASE WHEN seg1 > 0 THEN seg1
       |         WHEN seg2_local > 0 THEN seg2_local + phase1_bars
       |         ELSE 0 END AS raw_sl_bar,
       |    CASE WHEN seg1 > 0 THEN sl_wide_price ELSE sl_tight_price END
       |      AS sl_price_eff
       |  FROM scan),
       |outcome AS (
       |  SELECT cfg_id, event_type, event_id, ts_us, entry_price,
       |    CASE WHEN $slWins THEN 'SL' WHEN $tpWins THEN 'TP'
       |         WHEN window_bars >= max_bars THEN 'TIME'
       |         ELSE 'INCOMPLETE' END AS exit_type,
       |    CASE WHEN $slWins THEN raw_sl_bar WHEN $tpWins THEN raw_tp_bar
       |         WHEN window_bars >= max_bars THEN max_bars ELSE 0 END AS exit_bar,
       |    CASE WHEN $slWins THEN least(fwd_opens[raw_sl_bar], sl_price_eff)
       |         WHEN $tpWins THEN tp_price
       |         WHEN window_bars >= max_bars THEN fwd_closes[max_bars]
       |         ELSE 0 END AS exit_price
       |  FROM sl),
       |tr AS (
       |  SELECT cfg_id, event_type, event_id, ts_us, entry_price, exit_type,
       |    exit_bar, exit_price,
       |    ${grid6Sql("((exit_price - entry_price) / entry_price)")} AS ret
       |  FROM outcome WHERE exit_type != 'INCOMPLETE'),
       |eq AS (
       |  SELECT *, sum(ret) OVER w AS cum,
       |    row_number() OVER (PARTITION BY cfg_id
       |      ORDER BY ts_us, event_type, event_id) AS trade_n
       |  FROM tr
       |  WINDOW w AS (PARTITION BY cfg_id ORDER BY ts_us, event_type, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |flags AS (
       |  SELECT *, CASE WHEN peak > cum THEN 1 ELSE 0 END AS uw
       |  FROM (
       |    SELECT *, max(cum) OVER w AS peak
       |    FROM eq
       |    WINDOW w AS (PARTITION BY cfg_id ORDER BY ts_us, event_type, event_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))),
       |runs AS (
       |  SELECT cfg_id,
       |    trade_n - row_number() OVER (PARTITION BY cfg_id ORDER BY trade_n)
       |      AS grp
       |  FROM flags WHERE uw = 1),
       |mr AS (
       |  SELECT cfg_id, max(len) AS max_uw
       |  FROM (SELECT cfg_id, grp, count(*) AS len FROM runs GROUP BY cfg_id, grp)
       |  GROUP BY cfg_id),
       |stats AS (
       |  SELECT cfg_id, count(*) AS n_trades,
       |    round(sum(uw)::DOUBLE / count(*), 6) AS underwater_ratio,
       |    round(CASE WHEN sum(greatest(-ret, 0.0)) = 0.0
       |      THEN CASE WHEN sum(greatest(ret, 0.0)) > 0.0 THEN 10.0 END
       |      ELSE least(sum(greatest(ret, 0.0)) / sum(greatest(-ret, 0.0)), 10.0)
       |    END, 4) AS pf,
       |    round(sum(greatest(ret, 0.0)) / nullif(sum(greatest(-ret, 0.0)), 0.0), 4)
       |      AS omega
       |  FROM flags GROUP BY cfg_id),
       |joined AS (
       |  SELECT s.*, coalesce(mr.max_uw, 0) AS max_uw
       |  FROM stats s LEFT JOIN mr ON mr.cfg_id = s.cfg_id),
       |pick AS (
       |  SELECT CASE WHEN count(*) FILTER (WHERE n_trades >= 30 AND pf > 1.0
       |    AND omega > 1.0) > 0 THEN 1 ELSE 2 END AS tier
       |  FROM joined),
       |champ AS (
       |  SELECT cfg_id FROM (
       |    SELECT j.cfg_id,
       |      row_number() OVER (ORDER BY underwater_ratio, max_uw, j.cfg_id)
       |        AS rk
       |    FROM joined j, pick
       |    WHERE (tier = 1 AND n_trades >= 30 AND pf > 1.0 AND omega > 1.0)
       |      OR tier = 2)
       |  WHERE rk = 1)
       |SELECT f.cfg_id AS config_id, CAST(trade_n AS BIGINT) AS trade_n,
       |  event_type, event_id,
       |  ${grid6Sql("entry_price")} AS entry_price, exit_type,
       |  CAST(exit_bar AS BIGINT) AS duration_bars,
       |  ${grid6Sql("exit_price")} AS exit_price, ret AS return_pct,
       |  round(cum, 10) AS equity, round(peak, 10) AS peak_equity,
       |  round(peak - cum, 10) AS drawdown, uw AS underwater
       |FROM flags f JOIN champ USING (cfg_id)
       |ORDER BY trade_n""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q144_reconstruct" -> (q144Reconstruct _))

  val oracles: Map[String, String] = Map(
    "q144_reconstruct" -> q144Sql)
}
