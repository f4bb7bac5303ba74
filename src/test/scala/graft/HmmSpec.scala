package graft

import graft.eval.Hmm

/** E24 HMM regime detection: EM invariants, segmentation recovery on
  * well-separated synthetic regimes, the reference's guard behaviors, and
  * the distributed attach form.
  */
class HmmSpec extends GraftSuite {

  // deterministic "noise": low-discrepancy fractional parts, zero-mean
  private def wobble(i: Int): Double = ((i * 0.6180339887498949) % 1.0) - 0.5

  // three interleaved segments with well-separated means
  private def segmented(segLen: Int): (Array[Double], Array[Int]) = {
    val truth = Array.tabulate(6 * segLen)(i => (i / segLen) % 3)
    val x = truth.zipWithIndex.map { case (s, i) =>
      Array(0.0, 5.0, 10.0)(s) + 0.3 * wobble(i)
    }
    (x, truth)
  }

  test("EM log-likelihood is finite and improves over the init fit") {
    val (x, _) = segmented(60)
    val one = Hmm.fit(x, nStates = 3, nIter = 1)
    val full = Hmm.fit(x, nStates = 3, nIter = 100)
    assert(!one.logLik.isNaN && !full.logLik.isNaN)
    assert(full.logLik >= one.logLik - 1e-9,
      s"EM worsened: ${one.logLik} -> ${full.logLik}")
    assert(full.iters <= 100)
  }

  test("well-separated regimes are recovered up to label permutation") {
    val (x, truth) = segmented(60)
    val labels = Hmm.detectRegimes(x, nStates = 3)
    assert(labels.length == x.length)
    // each true segment maps to ONE decoded state, and distinct true
    // states map to distinct decoded states
    val mapping = truth.zip(labels).groupBy(_._1)
      .map { case (t, pairs) =>
        val dominant = pairs.groupBy(_._2).maxBy(_._2.length)
        assert(dominant._2.length >= pairs.length * 95 / 100,
          s"true state $t not coherent: ${pairs.groupBy(_._2).view.mapValues(_.length).toMap}")
        t -> dominant._1
      }
    assert(mapping.values.toSet.size == 3, s"states collapsed: $mapping")
  }

  test("guards: few valid points => all zeros; NaNs are median-filled") {
    assert(Hmm.detectRegimes(Array.fill(20)(1.0)).forall(_ == 0)) // < 30 valid
    val (x, _) = segmented(60)
    val withNans = x.zipWithIndex.map { case (v, i) => if (i % 37 == 0) Double.NaN else v }
    val labels = Hmm.detectRegimes(withNans, nStates = 3)
    assert(labels.length == withNans.length && labels.distinct.length == 3)
  }

  test("attachRegimes: per-series distributed fit matches the local decode") {
    import spark.implicits._
    val (x, _) = segmented(40)
    val rows = x.zipWithIndex.flatMap { case (v, i) =>
      Seq(("A", i.toLong, v), ("B", i.toLong, v + 100.0)) // shifted twin series
    }
    val df = rows.toSeq.toDF("series", "ord", "feat")
    val out = Hmm.attachRegimes(df, "series", "ord", "feat").collect()
      .groupBy(_.getString(0))
    val local = Hmm.detectRegimes(x, 3)
    out.foreach { case (s, rs) =>
      val got = rs.sortBy(_.getLong(1)).map(_.getInt(3))
      val expected = if (s == "A") local else Hmm.detectRegimes(x.map(_ + 100.0), 3)
      assert(got.sameElements(expected), s"series $s diverges from local decode")
    }
  }
}
