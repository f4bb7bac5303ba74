package graft

/** Pins the written dedup staging table (DedupQueries.Staging) to the
  * inline scored-candidate chain it replaces for q49/q61/q79: same pair
  * set, same (bit-exact) Jaccard scores after the parquet round-trip, and
  * the counts sidecar matches the corpus.
  */
class StagingSpec extends GraftSuite {

  test("staged scored-candidate table == inline chain (pairs + bit-exact jac)") {
    val (docs, _, inline) = queries.DedupQueries.scoredCandidatePairs(spark, sf)
    val (staged, counts) = queries.DedupQueries.Staging.scoredAndCounts(spark, sf)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map { r =>
        (r.getAs[Long]("d1"), r.getAs[Long]("d2"),
          java.lang.Double.doubleToLongBits(r.getAs[Double]("jac")))
      }.toSet
    val a = key(inline)
    val b = key(staged)
    assert(a == b, s"staging drifted from inline: ${(a diff b).take(3)} / ${(b diff a).take(3)}")
    assert(a.nonEmpty, "chain produced no candidates — fixture changed?")
    val c = counts.collect()
    assert(c.length == 1)
    assert(c(0).getAs[Long]("n_docs") == docs.count())
    assert(c(0).getAs[Long]("n_after_exact") <= c(0).getAs[Long]("n_docs"))
  }

  test("staging is written once: second consumer reads the same files") {
    val (s1, _) = queries.DedupQueries.Staging.scoredAndCounts(spark, sf)
    val (s2, _) = queries.DedupQueries.Staging.scoredAndCounts(spark, sf)
    // same physical location ⇒ the chain was not re-derived
    val f1 = s1.inputFiles.toSet
    val f2 = s2.inputFiles.toSet
    assert(f1 == f2 && f1.nonEmpty)
  }
}
