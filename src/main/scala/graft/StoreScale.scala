package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout scaling rehearsal (dev tool, the EvalScale pattern):
  * quantifies what the r14 bucketed-table lane buys on the engine's own
  * repeated-join shape — a per-config trade log joined to a per-config
  * eval table on config_id, then aggregated per config (the gen720 →
  * selection-layer read pattern, SURVEY §3). The same 20M-row trade log
  * and 300k-row eval table are written twice: plain parquet and
  * `ResultSink.writeBucketed` (matching bucket counts). The plain form
  * pays one full-corpus Exchange per join side plus another for the
  * post-join aggregation; the bucketed form's scans come out
  * hash-partitioned on config_id, so the WHOLE chain — join AND
  * aggregation — plans with zero exchanges (the PlanShapeSpec pin,
  * weighed here at 10× row count). Broadcast is disabled so the
  * comparison measures the exchange, not the small-side special case —
  * at 100 TB the eval side is NOT broadcastable (per-config × per-fold ×
  * per-asset rows).
  *
  * Usage: runMain graft.StoreScale <workDir> [nTrades] [nConfigs] [nBuckets]
  * MUTATES <workDir> and the session catalog (graft_store_* tables).
  */
object StoreScale {

  def main(args: Array[String]): Unit = {
    val dst = args.headOption.getOrElse(
      sys.error("usage: StoreScale <workDir> [nTrades] [nConfigs] [nBuckets]"))
    val nTrades = args.lift(1).map(_.toLong).getOrElse(20000000L)
    val nConfigs = args.lift(2).map(_.toInt).getOrElse(4096)
    val nBuckets = args.lift(3).map(_.toInt).getOrElse(64)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.warehouse.dir", s"$dst/warehouse")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // deterministic synthetic frames (the gen720 per-trade shape: config
    // axis × trade payload; eval rows per (config, fold))
    val trades = spark.range(nTrades).select(
      (col("id") % nConfigs).cast("int").as("config_id"),
      col("id").as("trade_id"),
      ((col("id") * 2654435761L) % 10000).cast("double").divide(10000).as("return_pct"),
      (col("id") % 97).cast("int").as("exit_bar"))
    val evals = spark.range(nConfigs.toLong * 73).select(
      (col("id") % nConfigs).cast("int").as("config_id"),
      (col("id") / nConfigs).cast("int").as("fold"),
      ((col("id") * 1103515245L) % 1000).cast("double").divide(1000).as("oos_score"))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    // ---- write both layouts (writes timed too: bucketing's cost side)
    val (_, wPlainT) = timed {
      trades.write.mode(SaveMode.Overwrite).parquet(s"$dst/plain/trades")
      evals.write.mode(SaveMode.Overwrite).parquet(s"$dst/plain/evals")
    }
    val (_, wBktT) = timed {
      sources.ResultSink.writeBucketed(trades, "graft_store_trades",
        s"$dst/bucketed/trades", "config_id", nBuckets, Seq("trade_id"))
      sources.ResultSink.writeBucketed(evals, "graft_store_evals",
        s"$dst/bucketed/evals", "config_id", nBuckets)
    }

    // the repeated read shape: join on config_id, per-config aggregate
    def chain(t: DataFrame, e: DataFrame): DataFrame =
      t.join(e, "config_id")
        .groupBy(col("config_id"))
        .agg(count(lit(1)).as("n"),
          sum(col("return_pct") * col("oos_score")).as("wsum"),
          max(col("exit_bar")).as("worst_exit"))

    // plan probe with AQE OFF: under AQE the pre-execution executedPlan is
    // the INITIAL adaptive plan, not what runs (r14 advice) — and these
    // plans have nothing for AQE to improve (the probe's whole point is
    // the static exchange count bucketing removes), so the AQE-off plan
    // is the honest structural comparison. Timed runs stay under AQE.
    def exchanges(mk: => DataFrame): Int = {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      try "Exchange".r.findAllIn(mk.queryExecution.executedPlan.toString).length
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    }

    def run(label: String, t: => DataFrame, e: => DataFrame): (Double, Long, Int) = {
      val nEx = exchanges(chain(t, e))
      println(s"[storescale] $label: $nEx exchanges (AQE-off plan probe)")
      // two timed runs, keep the second (page cache warm for BOTH forms)
      timed(chain(t, e).write.format("noop").mode("overwrite").save())
      val (_, wall) = timed(chain(t, e).write.format("noop").mode("overwrite").save())
      val rows = chain(t, e).count()
      (wall, rows, nEx)
    }

    val (plainWall, plainRows, plainEx) = run("plain",
      spark.read.parquet(s"$dst/plain/trades"),
      spark.read.parquet(s"$dst/plain/evals"))
    val (bktWall, bktRows, bktEx) = run("bucketed",
      spark.table("graft_store_trades"),
      spark.table("graft_store_evals"))
    require(plainRows == bktRows, s"row drift: $plainRows vs $bktRows")

    println(s"""{"mode":"bucketjoin","n_trades":$nTrades,"n_configs":$nConfigs,""" +
      s""""n_buckets":$nBuckets,"rows_out":$plainRows,""" +
      f""""write_plain_sec":$wPlainT%.1f,"write_bucketed_sec":$wBktT%.1f,""" +
      f""""join_plain_sec":$plainWall%.1f,"join_bucketed_sec":$bktWall%.1f,""" +
      s""""exchanges_plain":$plainEx,"exchanges_bucketed":$bktEx}""")
  }
}
