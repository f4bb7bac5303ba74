package graft.eval

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-scale alternative to the collected/broadcast bar series in
  * [[EvalPipeline.perConfigStats]] (E7 rolling per-trade OU calibration,
  * ou_barriers.py:66-101): the same per-trade ratios as
  * [[Stats.rollingOuRatios]], computed as a distributed chunked range
  * join so the bar table is never collected to the driver and never
  * broadcast.
  *
  * Shape (all stages shuffle O(nBars) once or O(nTrades) rows — nothing
  * quadratic, no global single-partition sort):
  *  1. global bar index `rn`: range-repartition by ts + per-partition
  *     sort + zipWithIndex (the scalable global-ordinal primitive);
  *  2. as-of (trade ts → last bar index ≤ ts): bars and trades are
  *     bucketed into time chunks; a window *partitioned by chunk* gives
  *     the within-chunk answer, and a broadcast cumulative per-chunk
  *     max (tiny: one row per chunk) fills trades whose chunk has no
  *     earlier bar;
  *  3. window gather: bars are bucketed by `rn / lookback`, each trade
  *     explodes to the ≤2 buckets covering [idx-lookback, idx) — an
  *     equi join, so candidate fan-in is ≤ 2·lookback bars per trade;
  *  4. per-trade OU calibration on the gathered closes (executors).
  */
object OuRangeJoin {

  /** Per-trade ratios (config_id, ts_us, ou_ratio) — ou_ratio is NULL
    * exactly where Stats.rollingOuRatios yields None (warmup / failed
    * calibration). `chunkUs` is the as-of time-bucket width; any value
    * works, it only trades chunk count against per-chunk fan-in.
    */
  def perTradeRatios(bars: DataFrame, trades: DataFrame,
      empiricalTpFrac: Double, lookback: Int,
      chunkUs: Long = 3600L * 1000000L): DataFrame = {
    val spark = bars.sparkSession
    import spark.implicits._

    // 1. global bar ordinal without a global sort: range partitions are
    // ordered by partition index, so per-partition sort + zipWithIndex
    // yields the globally sorted 0-based index
    val sorted = bars.select(col("ts_us").cast("long"), col("close").cast("double"))
      .repartitionByRange(col("ts_us")).sortWithinPartitions(col("ts_us"))
    val indexed = spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) => (r.getLong(0), r.getDouble(1), i) })
      .toDF("b_ts", "close", "rn")

    // 2. as-of: union bars (kind 0) and trades (kind 1); within each time
    // chunk a running max of bar rn answers trades whose chunk holds an
    // earlier-or-equal bar (bars sort first on ties → barTs <= tradeTs
    // inclusive, matching Stats.rollingOuRatios' searchsorted-right)
    val barEvents = indexed.select(
      (col("b_ts") / chunkUs).cast("long").as("c"), col("b_ts").as("ts_us"),
      lit(0).as("kind"), col("rn"), lit(null).cast("string").as("config_id"))
    val tradeEvents = trades.select(
      (col("ts_us") / chunkUs).cast("long").as("c"), col("ts_us").cast("long"),
      lit(1).as("kind"), lit(null).cast("long").as("rn"), col("config_id"))
    val wc = Window.partitionBy(col("c")).orderBy(col("ts_us"), col("kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withinChunk = barEvents.unionByName(tradeEvents)
      .withColumn("in_chunk_idx", max(col("rn")).over(wc))
    // cumulative per-chunk max over STRICTLY EARLIER chunks: one row per
    // chunk (bars' and trades' chunks both present), tiny → broadcast
    val chunkCum = withinChunk.groupBy(col("c")).agg(max(col("rn")).as("cmax"))
      .withColumn("prev_cum", max(col("cmax")).over(
        Window.orderBy(col("c")).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col("c"), col("prev_cum"))
    val withIdx = withinChunk.filter(col("kind") === 1)
      .join(broadcast(chunkCum), "c")
      .select(col("config_id"), col("ts_us"),
        coalesce(col("in_chunk_idx"), col("prev_cum")).as("idx"))

    // 3. gather [idx-lookback, idx): bars bucketed by rn/lookback, each
    // trade hits at most 2 buckets; trades still warming up keep a NULL
    // ratio via the left join below
    val eligible = withIdx.filter(col("idx").isNotNull && col("idx") >= lookback)
    val barBuckets = indexed.select(
      (col("rn") / lookback).cast("long").as("g"), col("rn"), col("close"))
    val probed = eligible.withColumn("g",
        explode(array_distinct(array(
          ((col("idx") - lookback) / lookback).cast("long"),
          ((col("idx") - 1) / lookback).cast("long")))))
    val gathered = probed.join(barBuckets, "g")
      .filter(col("rn") >= col("idx") - lookback && col("rn") < col("idx"))
      .groupBy(col("config_id"), col("ts_us"), col("idx"))
      .agg(sort_array(collect_list(struct(col("rn"), col("close")))).as("win"))

    // 4. per-trade calibration on executors — identical math to the
    // broadcast path (Stats.ouBarrierRatio over the ordered closes)
    val ratios = gathered
      .select(col("config_id"), col("ts_us"), col("win.close").as("closes"))
      .as[(String, Long, Seq[Double])]
      .map { case (cid, ts, closes) =>
        (cid, ts, Stats.ouBarrierRatio(closes.toArray, empiricalTpFrac))
      }
      .toDF("config_id", "ts_us", "ou_ratio")

    trades.select(col("config_id"), col("ts_us").cast("long"))
      .join(ratios, Seq("config_id", "ts_us"), "left")
  }

  /** Per-config median of the defined per-trade ratios — the same
    * reduction EvalPipeline's broadcast path applies
    * (ou_barriers.py:176-180). Configs with no defined ratio are absent.
    */
  def perConfigMedians(bars: DataFrame, trades: DataFrame,
      empiricalTpFrac: Double, lookback: Int,
      chunkUs: Long = 3600L * 1000000L): DataFrame = {
    val spark = bars.sparkSession
    import spark.implicits._
    perTradeRatios(bars, trades, empiricalTpFrac, lookback, chunkUs)
      .filter(col("ou_ratio").isNotNull)
      .groupBy(col("config_id"))
      .agg(sort_array(collect_list(col("ou_ratio"))).as("rs"))
      .as[(String, Seq[Double])]
      .map { case (cid, rs) =>
        val m =
          if (rs.length % 2 == 1) rs(rs.length / 2)
          else (rs(rs.length / 2 - 1) + rs(rs.length / 2)) / 2.0
        (cid, m)
      }
      .toDF("config_id", "ou_ratio")
  }
}
