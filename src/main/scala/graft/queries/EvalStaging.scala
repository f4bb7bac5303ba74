package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Staged shared eval frames (the DedupQueries.Staging discipline on the
  * eval axis): q72's KDE regularity lane and the q122/q123 TAMRS frame are
  * the two expensive chains the selection layer re-derived per query —
  * q123 alone rebuilt BOTH inline (r10 bench: 10.5 s, ~all of it shared
  * work). Each is now built ONCE per (JVM, corpus), written to a temp
  * parquet staging table, and read back by every consumer — the local
  * form of the checkpointed staging table a 100 TB run would write
  * between the metric pass and the selection layer (SURVEY §3's staged
  * materialization story; the bench reports the build as its own
  * `q_staging_eval` row so q72/q122/q123 report plan cost, not
  * build-order accounting).
  *
  * The RAW builders stay where they were (RankingQueries.
  * q72SignalRegularity, EvalStatsQueries.tamrsFrameRaw): PlanShapeSpec
  * audits the raw KDE plan, and the DuckDB oracles replay the raw chains
  * — staging changes where the rows are read from, never what they are. */
private[graft] object EvalStaging {
  private lazy val root =
    java.nio.file.Files.createTempDirectory("graft_eval_staging")
  private val done = new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def pathKey(d: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private def staged(kind: String, d: String)(build: => DataFrame)
      (spark: SparkSession): DataFrame = {
    val p = done.computeIfAbsent(s"${kind}_${pathKey(d)}", key => {
      val path = root.resolve(key).toString
      graft.sources.ResultSink.append(build, path, Nil)
      path
    })
    graft.sources.ResultSink.read(spark, p)
  }

  /** q72's full regularity output (cfg, n, qualified, n_peaks,
    * kde_peak_cv, raw_iat_cv, coverage, bandwidth_factor), staged. */
  def regularity(spark: SparkSession, d: String): DataFrame =
    staged("regularity", d)(RankingQueries.q72SignalRegularity(spark, d))(spark)

  /** The joined TAMRS frame (cfg, n_trades, tamrs, rachev_ratio,
    * sl_cdar_ratio, ou_barrier_ratio), staged. */
  def tamrs(spark: SparkSession, d: String): DataFrame =
    staged("tamrs", d)(EvalStatsQueries.tamrsFrameRaw(spark, d))(spark)

  /** Pre-build both frames (the Bench `q_staging_eval` hook). */
  def build(spark: SparkSession, d: String): Unit = {
    regularity(spark, d)
    tamrs(spark, d)
  }
}
