package graft

import org.apache.spark.sql.DataFrame

/** Pins the written eval staging frames (queries.EvalStaging) to the raw
  * chains they replace for q72/q122/q123: bit-exact rows after the parquet
  * round-trip, written once per (JVM, corpus), and the build's AQE toggle
  * restored to the session value (the StagingSpec discipline on the eval
  * axis).
  */
class EvalStagingSpec extends GraftSuite {

  // sorted MULTISET of rows, not a Set: a staged frame that dropped or
  // duplicated a row whose values tie another row would pass a Set compare
  // (r12 ADVICE)
  private def key(df: DataFrame): Seq[String] =
    df.collect().map { r =>
      (0 until r.length).map { i =>
        r.get(i) match {
          // NaN != NaN and -0.0 vs 0.0 would false-negative the compare
          case d: java.lang.Double => java.lang.Double.doubleToLongBits(d)
          case v => v
        }
      }.mkString("|")
    }.toSeq.sorted

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

  test("build() never flips the caller session's AQE — a concurrent query " +
    "keeps its own regime (r12 verdict)") {
    // EvalStaging memoizes per corpus PATH — a symlink alias to the same
    // fixture forces a genuinely live build to poll against
    val alias = java.nio.file.Files.createTempDirectory("graft_aqe_probe")
      .resolve("sf").toString
    java.nio.file.Files.createSymbolicLink(
      java.nio.file.Paths.get(alias), java.nio.file.Paths.get(sf))
    val before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    @volatile var failure: Option[Throwable] = None
    @volatile var done = false
    val t = new Thread(() => {
      try queries.EvalStaging.build(spark, alias)
      catch { case e: Throwable => failure = Some(e) }
      finally done = true
    })
    t.start()
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    seen += spark.conf.get("spark.sql.adaptive.enabled", "true")
    while (!done) {
      seen += spark.conf.get("spark.sql.adaptive.enabled", "true")
      Thread.sleep(2)
    }
    t.join()
    failure.foreach(throw _)
    assert(seen.nonEmpty && seen.forall(_ == before),
      s"caller session saw AQE flip during build: ${seen.distinct}")
  }
}
