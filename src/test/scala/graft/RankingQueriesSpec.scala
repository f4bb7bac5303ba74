package graft

import org.apache.spark.sql.functions._
import graft.eval.{Ranking, Regularity}
import graft.queries.RankingQueries

/** Cross-validation of the distributed ranking/selection queries (q68-q72)
  * against the driver-side golden implementations that already carry their
  * own reference-parity tests (EvalStackSpec): the SQL/DataFrame forms and
  * the imperative ports must agree on the same inputs. The DuckDB oracle
  * pins engine-vs-engine parity; this spec pins query-vs-library parity.
  */
class RankingQueriesSpec extends GraftSuite {

  test("q68 TOPSIS closeness matches Ranking.topsis on the same metric matrix") {
    val rows = RankingQueries.q68Topsis(spark, sf)
      .orderBy(col("cfg")).collect()
    assert(rows.length == 50)
    val matrix = rows.map(r => Array(
      r.getAs[Double]("omega"), r.getAs[Double]("win_rate"),
      r.getAs[Double]("sr"), r.getAs[Double]("maxdd")))
    val expect = Ranking.topsis(matrix, Array(0.4, 0.2, 0.2, 0.2), Array(1, 1, 1, -1))
    rows.zip(expect).foreach { case (r, e) =>
      assert(math.abs(r.getAs[Double]("closeness") - e) < 2e-6,
        s"${r.getAs[String]("cfg")}: ${r.getAs[Double]("closeness")} vs $e")
    }
    // rank is a permutation of 1..n consistent with closeness desc
    val byRank = rows.sortBy(_.getAs[Int]("rank"))
    assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to 50))
    byRank.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("closeness") >= b.getAs[Double]("closeness"))
    }
  }

  test("q69 e-BH rejection set is the top-k* prefix and satisfies the threshold") {
    val rows = RankingQueries.q69EbhFdr(spark, sf).orderBy(col("k")).collect()
    val kk = rows.length.toDouble
    val kstar = rows.head.getAs[Long]("kstar")
    rows.foreach { r =>
      val k = r.getAs[Long]("k")
      assert((r.getAs[Int]("rejected") == 1) == (k <= kstar))
    }
    // every rejected rank meets k·e/K ≥ 1/α; the first non-rejected does not
    // meet it at any higher k (kstar is the max qualifying rank)
    if (kstar > 0) {
      val at = rows(kstar.toInt - 1)
      assert(kstar * at.getAs[Double]("evalue") / kk >= 20.0)
    }
    rows.filter(_.getAs[Long]("k") > kstar).foreach { r =>
      assert(r.getAs[Long]("k") * r.getAs[Double]("evalue") / kk < 20.0)
    }
  }

  test("q70 composite equals the E25 formula over its own output columns") {
    val rows = RankingQueries.q70GtComposite(spark, sf).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      val expect = r.getAs[Double]("omega") *
        math.min(1.0, math.abs(r.getAs[Double]("dsr"))) *
        (1.0 - r.getAs[Double]("pbo")) *
        math.max(0.0, 1.0 - r.getAs[Double]("maxdd") / 0.15)
      assert(math.abs(r.getAs[Double]("gt_composite")
        - math.rint(expect * 1e6) / 1e6) < 1e-9)
    }
  }

  test("q71 knee flags match Ranking.kneeDetect on the same (omega, maxdd) front") {
    val rows = RankingQueries.q71Knee(spark, sf).orderBy(col("cfg")).collect()
    val matrix = rows.map(r =>
      Array(r.getAs[Double]("omega"), r.getAs[Double]("maxdd")))
    val knees = Ranking.kneeDetect(matrix, Array(1, -1)).toSet
    rows.zipWithIndex.foreach { case (r, i) =>
      assert((r.getAs[Int]("is_knee") == 1) == knees.contains(i),
        s"${r.getAs[String]("cfg")}: flag ${r.getAs[Int]("is_knee")}, expected ${knees.contains(i)}")
    }
  }

  test("q72 regularity matches Regularity.compute per config") {
    // sf0.001 leaves every config under the n>=20 signal gate; sf0.01 has
    // ~100 signals per config, so both the included and excluded branches
    // are exercised
    val d = "/root/testdata/sf0.01"
    val sig = RankingQueries.cfgReturns(spark, d)
      .filter(col("r") > 0.0)
      .select(col("cfg"), col("ts_us"))
      .collect()
      .groupBy(_.getAs[String]("cfg"))
      .map { case (c, rs) => c -> rs.map(_.getAs[Long]("ts_us")).sorted }
    val rows = RankingQueries.q72SignalRegularity(spark, d)
      .orderBy(col("cfg")).collect()
    assert(rows.length == sig.size)
    assert(rows.exists(_.getAs[Int]("qualified") == 1))
    rows.foreach { r =>
      val cfg = r.getAs[String]("cfg")
      // compute() takes "ms" but every output is scale-invariant, so µs
      // timestamps produce identical results
      Regularity.compute(sig(cfg)) match {
        case None =>
          // gated configs keep their row with qualified = 0 and NULL metrics
          assert(r.getAs[Int]("qualified") == 0, s"$cfg gate")
          assert(r.isNullAt(r.fieldIndex("n_peaks")), s"$cfg gated peaks")
        case Some(st) =>
          assert(r.getAs[Int]("qualified") == 1, s"$cfg qualified")
          assert(r.getAs[Long]("n_peaks") == st.nPeaks.toLong, s"$cfg peaks")
          assert(math.abs(r.getAs[Double]("coverage") - st.temporalCoverage) < 1e-9, s"$cfg cov")
          (Option(r.getAs[java.lang.Double]("kde_peak_cv")), st.kdePeakCv) match {
            case (Some(a), Some(b)) => assert(math.abs(a - b) < 2e-6, s"$cfg kde cv")
            case (None, None) =>
            case (a, b) => fail(s"$cfg kde cv presence: $a vs $b")
          }
          (Option(r.getAs[java.lang.Double]("raw_iat_cv")), st.rawIatCv) match {
            case (Some(a), Some(b)) => assert(math.abs(a - b) < 2e-6, s"$cfg iat cv")
            case (None, None) =>
            case (a, b) => fail(s"$cfg iat cv presence: $a vs $b")
          }
      }
    }
  }
}
