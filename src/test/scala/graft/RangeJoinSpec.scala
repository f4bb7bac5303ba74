package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

/** Pins the bucketed point-in-interval join to a driver-side brute force
  * (overlapping/touching/empty intervals, boundary-inclusive points,
  * negative times) and pins the plan: the band condition rides an
  * EQUI join on (key, bucket) — no cartesian/broadcast-nested-loop. */
class RangeJoinSpec extends GraftSuite {

  private def frames(seed: Long) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val pts = (0 until 300).map { i =>
      (s"k${rnd.nextInt(4)}", rnd.nextLong() % 2000 - 500, i.toLong)
    }
    val ivs = (0 until 60).map { i =>
      val s = rnd.nextLong() % 1500 - 400
      (s"k${rnd.nextInt(4)}", s, s + rnd.nextInt(300), i.toLong)
    }
    (pts, ivs, pts.toDF("k", "t", "pid"), ivs.toDF("k", "s", "e", "ivid"))
  }

  test("matches == brute force, each qualifying pair exactly once") {
    val (pts, ivs, pdf, ivdf) = frames(51L)
    val got = RangeJoin.pointInInterval(pdf, ivdf, Seq("k"), "t", "s", "e",
        bucketUs = 128L)
      .select(col("pid"), col("iv_ivid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val want = (for {
      (pk, t, pid) <- pts
      (ik, s, e, ivid) <- ivs
      if pk == ik && t >= s && t <= e
    } yield (pid, ivid)).sorted
    assert(got.length == want.length, s"${got.length} != ${want.length}")
    assert(got.toSeq == want.toSeq)
  }

  test("plan is an equi join on (key, bucket) — no nested loop") {
    val (_, _, pdf, ivdf) = frames(52L)
    val plan = RangeJoin.pointInInterval(pdf, ivdf, Seq("k"), "t", "s", "e", 128L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"range join must stay equi-keyed:\n$plan")
  }

  test("an open-ended sentinel interval fails fast with a diagnostic " +
    "instead of allocating a multi-GB bucket sequence") {
    import spark.implicits._
    // one 'still open' interval with end = Long.MaxValue: pre-guard this
    // tried to explode ~4×10⁸ bucket rows for the single row (an OOM or
    // a deep kernel error, either way executor-killing); now the bound
    // itself raises with the span and the fix in the message
    val pdf = Seq(("a", 100L, 1L)).toDF("k", "t", "pid")
    val ivdf = Seq(("a", 0L, Long.MaxValue, 1L)).toDF("k", "s", "e", "ivid")
    val e = intercept[Exception](
      RangeJoin.pointInInterval(pdf, ivdf, Seq("k"), "t", "s", "e",
        bucketUs = 6L * 3600 * 1000 * 1000).collect())
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("range-join interval spans")),
      messages(e).mkString(" | "))
    // sane intervals on the same call path still join
    val ok = RangeJoin.pointInInterval(pdf,
      Seq(("a", 0L, 200L, 1L)).toDF("k", "s", "e", "ivid"),
      Seq("k"), "t", "s", "e", bucketUs = 64L).collect()
    assert(ok.length == 1)
  }
}
