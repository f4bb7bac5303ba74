package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Eval-layer (L3) scaling rehearsal (dev tool): one sweep's per-trade
  * output drives the full walk-forward stage 1–4 (per-fold OOS metrics →
  * Vorob'ev stability → CPCV/PBO screening → GT-composite) at growing
  * barrier-config counts. The reference extracts 1,008 configs
  * sequentially over SSH and evaluates folds in numpy on the driver; the
  * claim here is that fold evaluation is ONE groupBy(barrier_id) shuffle
  * with executors emitting O(nBarriers × nFolds) metric rows, so the
  * barrier axis scales with the cluster and the driver-side stage-4 cost
  * stays bounded by the screened top-K.
  *
  * Usage: runMain graft.EvalScale [sfDir]
  */
object EvalScale {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // shared signal frame: every 5th bar, dense signal_idx in arrival order
    val w = Window.orderBy(col("event_type"), col("ts_us"), col("event_id"))
    val sig = queries.EventBars.signalForwardArrays(
        queries.EventBars.bars(spark, sfDir), col("rn") % 5 === 0, 35)
      .withColumn("entry_price", try_element_at(col("fwd_opens"), lit(1)))
      .filter(col("entry_price").isNotNull && col("entry_price") > 0)
      .withColumn("signal_idx", row_number().over(w) - 1)
      .repartition(spark.sparkContext.defaultParallelism)
      .cache()
    val nSignals = sig.count().toInt

    def gridDf(n: Int) = {
      val side = math.sqrt(n.toDouble).toInt
      (for (i <- 0 until side; j <- 0 until n / side) yield (
        s"b${i}_$j", 0.002 + 0.0008 * i, 0.002 + 0.0008 * j, 10 + 2 * (j % 6)))
        .toDF("barrier_id", "tp_pct", "sl_pct", "max_bars")
    }

    Seq(64, 256, 1024).foreach { n =>
      val t0 = System.nanoTime()
      val trades = operators.Barriers.tripleBarrier(
          sig.crossJoin(broadcast(gridDf(n))))
        .select(col("barrier_id"), col("signal_idx"),
          col("return_pct").cast("double"))
      val report = eval.WalkForward.run(trades, nSignals, screenTopK = 25)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"""{"n_barriers":$n,"n_signals":$nSignals,""" +
        f""""fold_rows":${report.foldRows.length},""" +
        f""""survivors":${report.finalBarrierIds.length},""" +
        f""""vorob_dev":${report.vorob.map(_.deviation).getOrElse(-1.0)}%.4f,""" +
        f""""wall_s":$wall%.1f}""")
    }
    spark.stop()
  }
}
