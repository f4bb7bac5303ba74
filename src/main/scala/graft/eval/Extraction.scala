package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions => GF}

/** Extraction layer (SURVEY.md §7.1.7; reference eval/extraction.py:
  * 200-242): the two per-config aggregation modes every downstream metric
  * reads —
  *  - **moments**: n, mean/std/skew/kurt (sample semantics), exclusive
  *    q01/q05, win rate, profit factor, Kelly;
  *  - **returns**: the ordered per-trade return + timestamp arrays.
  *
  * Input: a trades frame with `return_pct`, an ordering timestamp
  * `ts_us`, and the config key columns. One shuffle on the config key per
  * mode; at sweep scale the config axis is the parallelism.
  */
object Extraction {

  /** extraction.py:200-231 — the moments record. */
  def moments(trades: DataFrame, keys: Column*): DataFrame = {
    val n = count(col("return_pct"))
    val isWin = col("return_pct") > 0
    val isLoss = col("return_pct") < 0
    val winRate = count_if(isWin).cast("double") / n
    val avgWin = avg(when(isWin, col("return_pct")))
    val avgLoss = avg(when(isLoss, col("return_pct")))
    val rr = avgWin / nullif(abs(avgLoss), lit(0.0))
    trades.groupBy(keys: _*).agg(
      n.as("n_trades"),
      avg(col("return_pct")).as("mean_return"),
      stddev_samp(col("return_pct")).as("std_return"),
      GF.skewSamp(col("return_pct"), n).as("skew"),
      (GF.kurtSampExcess(col("return_pct"), n) + lit(3.0)).as("kurt"),
      GF.quantileExactExclusive(collect_list(col("return_pct")), 0.01).as("q01"),
      GF.quantileExactExclusive(collect_list(col("return_pct")), 0.05).as("q05"),
      winRate.as("win_rate"),
      (sum(when(isWin, col("return_pct"))) /
        nullif(abs(sum(when(isLoss, col("return_pct")))), lit(0.0)))
        .as("profit_factor"),
      (winRate - (lit(1.0) - winRate) / nullif(rr, lit(0.0))).as("kelly_fraction"))
  }

  /** extraction.py:234-242 — returns mode: time-ordered arrays (struct
    * sort fixes collect_list's shuffle nondeterminism, SURVEY §4.3.4). */
  def returnsArrays(trades: DataFrame, keys: Column*): DataFrame =
    trades.groupBy(keys: _*)
      .agg(sort_array(collect_list(struct(col("ts_us"), col("return_pct"))))
        .as("ordered"))
      .withColumn("returns", expr("transform(ordered, x -> x.return_pct)"))
      .withColumn("close_times_us", expr("transform(ordered, x -> x.ts_us)"))
      .drop("ordered")
}
