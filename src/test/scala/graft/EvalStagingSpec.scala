package graft

import org.apache.spark.sql.DataFrame

/** Pins the written eval staging frames (queries.EvalStaging) to the raw
  * chains they replace for q72/q122/q123: bit-exact rows after the parquet
  * round-trip, written once per (JVM, corpus), and the build's AQE toggle
  * restored to the session value (the StagingSpec discipline on the eval
  * axis).
  */
class EvalStagingSpec extends GraftSuite {

  private def key(df: DataFrame): Set[Seq[Any]] =
    df.collect().map { r =>
      (0 until r.length).map { i =>
        r.get(i) match {
          // NaN != NaN and -0.0 vs 0.0 would false-negative a Set compare
          case d: java.lang.Double => java.lang.Double.doubleToLongBits(d)
          case v => v
        }
      }
    }.toSet

  test("staged regularity frame == raw q72 chain (bit-exact)") {
    val raw = key(queries.RankingQueries.q72SignalRegularity(spark, sf))
    val staged = key(queries.EvalStaging.regularity(spark, sf))
    assert(raw == staged,
      s"staging drifted from raw: ${(raw diff staged).take(2)} / ${(staged diff raw).take(2)}")
    assert(raw.nonEmpty, "regularity chain produced no rows — fixture changed?")
  }

  test("staged tamrs frame == raw chain (bit-exact)") {
    val raw = key(queries.EvalStatsQueries.tamrsFrameRaw(spark, sf))
    val staged = key(queries.EvalStaging.tamrs(spark, sf))
    assert(raw == staged,
      s"staging drifted from raw: ${(raw diff staged).take(2)} / ${(staged diff raw).take(2)}")
    assert(raw.nonEmpty, "tamrs chain produced no rows — fixture changed?")
  }

  test("staging is written once: second consumer reads the same files") {
    val f1 = queries.EvalStaging.regularity(spark, sf).inputFiles.toSet
    val f2 = queries.EvalStaging.regularity(spark, sf).inputFiles.toSet
    assert(f1 == f2 && f1.nonEmpty)
  }

  test("build() restores the session AQE setting") {
    val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    queries.EvalStaging.build(spark, sf)
    assert(spark.conf.get("spark.sql.adaptive.enabled", "true") == before)
  }
}
