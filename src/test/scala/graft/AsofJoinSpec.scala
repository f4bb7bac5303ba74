package graft

import org.apache.spark.sql.functions._
import graft.operators.AsofJoin

/** Pins the union-merge as-of join to a driver-side brute force on
  * randomized multi-key data: backward/forward, inclusive same-time
  * matches, tolerance null-outs, and no-match NULLs. Also pins the plan
  * shape: no join operator at all (the merge is a window pass), so row
  * amplification is structurally impossible.
  */
class AsofJoinSpec extends GraftSuite {

  // (key, t, v) frames with collisions across keys and same-t collisions
  // BETWEEN sides (never within the right side — uniqueness contract)
  private def frames(seed: Long, nl: Int, nr: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val left = (0 until nl).map { i =>
      (s"k${rnd.nextInt(5)}", (rnd.nextInt(200) * 10).toLong, i.toLong)
    }
    val right = rnd.shuffle((0 until 1000).map(t => (t, t * 10L)).toList)
      .take(nr).flatMap { case (_, t) =>
        (0 until 5).filter(_ => rnd.nextBoolean()).map(k => (s"k$k", t, rnd.nextInt(100)))
      }.distinct
    (left.toDF("k", "t", "lid"),
      right.toDF("k", "rt", "rv").groupBy("k", "rt").agg(max("rv").as("rv")))
  }

  private def brute(
      left: Seq[(String, Long, Long)], right: Seq[(String, Long, Int)],
      fwd: Boolean, tol: Option[Long]): Map[Long, Option[(Long, Int)]] =
    left.map { case (k, t, lid) =>
      val cand = right.filter(r => r._1 == k &&
        (if (fwd) r._2 >= t else r._2 <= t) &&
        tol.forall(x => math.abs(r._2 - t) <= x))
      lid -> (if (cand.isEmpty) None
              else Some {
                val m = if (fwd) cand.minBy(_._2) else cand.maxBy(_._2)
                (m._2, m._3)
              })
    }.toMap

  private def check(seed: Long, fwd: Boolean, tol: Option[Long]): Unit = {
    val (l, r) = frames(seed, 400, 120)
    val dir = if (fwd) AsofJoin.Forward else AsofJoin.Backward
    val res = AsofJoin.join(l, r, Seq("k"), "t", "rt", dir, tol)
    assert(res.columns.toSeq ==
      Seq("k", "t", "lid", "asof_rt", "asof_rv"))
    val got = res.collect().map { row =>
      row.getLong(2) -> (if (row.isNullAt(3)) None
                         else Some((row.getLong(3), row.getInt(4))))
    }.toMap
    val rightRows = r.collect().map(x => (x.getString(0), x.getLong(1), x.getInt(2))).toSeq
    val leftRows = l.collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSeq
    val want = brute(leftRows, rightRows, fwd, tol)
    assert(got.size == leftRows.size)
    want.foreach { case (lid, exp) =>
      assert(got(lid) == exp, s"lid=$lid: got ${got(lid)}, want $exp")
    }
  }

  test("backward matches brute force (incl. same-time inclusive matches)") {
    check(seed = 11L, fwd = false, tol = None)
  }

  test("forward matches brute force") {
    check(seed = 12L, fwd = true, tol = None)
  }

  test("backward with tolerance nulls out stale matches") {
    check(seed = 13L, fwd = false, tol = Some(70L))
  }

  test("forward with tolerance") {
    check(seed = 14L, fwd = true, tol = Some(30L))
  }

  test("plan contains no join operator and exactly one exchange") {
    import spark.implicits._
    val (l, _) = frames(15L, 100, 40)
    // right side already unique per (k, rt): the merge itself must add
    // exactly ONE hash exchange (the window) and no join operator
    val r = (0 until 40).map(i => (s"k${i % 5}", i * 25L, i)).toDF("k", "rt", "rv")
    val res = AsofJoin.join(l, r, Seq("k"), "t", "rt")
    val plan = res.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 hash exchange, got $exchanges:\n$plan")
  }

  test("two-phase form is bit-identical to the merge on every direction/tolerance") {
    // bucketUs = 70 over t ∈ [0, 2000): ~29 buckets per key — plenty of
    // rights-only buckets, lefts-only buckets (carry path), and empty ones
    for ((seed, fwd, tol) <- Seq((31L, false, None), (32L, true, None),
        (33L, false, Some(70L)), (34L, true, Some(30L)))) {
      val (l, r) = frames(seed, 400, 120)
      val dir = if (fwd) AsofJoin.Forward else AsofJoin.Backward
      val a = AsofJoin.join(l, r, Seq("k"), "t", "rt", dir, tol)
        .collect().map(_.toSeq).sortBy(_.toString)
      val b = AsofJoin.joinTwoPhase(l, r, Seq("k"), "t", "rt", dir, tol,
          bucketUs = 70L)
        .collect().map(_.toSeq).sortBy(_.toString)
      assert(a.length == b.length, s"seed=$seed")
      a.zip(b).foreach { case (x, y) =>
        assert(x == y, s"seed=$seed fwd=$fwd tol=$tol: merge=$x twoPhase=$y")
      }
    }
  }

  test("same-time right row is visible to the left row on both directions") {
    import spark.implicits._
    val l = Seq(("a", 100L, 1L)).toDF("k", "t", "lid")
    val r = Seq(("a", 100L, 7)).toDF("k", "rt", "rv")
    Seq(AsofJoin.Backward, AsofJoin.Forward).foreach { d =>
      val row = AsofJoin.join(l, r, Seq("k"), "t", "rt", d).collect().head
      assert(row.getLong(3) == 100L && row.getInt(4) == 7, s"direction $d")
    }
  }

  test("NULL right times never match (DuckDB ASOF semantics) in both forms") {
    import spark.implicits._
    // the null-timed row would sort FIRST under ASC NULLS FIRST and, before
    // the fix, become the prevailing match with a NULL matched time
    val l = Seq(("a", 100L, 1L), ("a", 5L, 2L)).toDF("k", "t", "lid")
    val r = Seq(("a", Some(50L), 7), ("a", None, 99))
      .toDF("k", "rt", "rv")
    for (d <- Seq(AsofJoin.Backward, AsofJoin.Forward);
         form <- Seq("merge", "twoPhase")) {
      val res = form match {
        case "merge" => AsofJoin.join(l, r, Seq("k"), "t", "rt", d)
        case _ => AsofJoin.joinTwoPhase(l, r, Seq("k"), "t", "rt", d, bucketUs = 70L)
      }
      val got = res.collect().map { row =>
        row.getLong(2) -> (if (row.isNullAt(3)) None
                           else Some((row.getLong(3), row.getInt(4))))
      }.toMap
      val want = d match {
        case AsofJoin.Backward =>
          Map(1L -> Some((50L, 7)), 2L -> None)
        case _ =>
          Map(1L -> None, 2L -> Some((50L, 7)))
      }
      assert(got == want, s"direction $d form $form: $got vs $want")
    }
  }

  test("NULL LEFT times never match either — in both directions and forms") {
    import spark.implicits._
    // pre-fix, Forward's plain .desc ordering put the null-timed left row
    // LAST (desc default is NULLS LAST): its running frame then held every
    // right row and it silently matched the earliest one, while Backward
    // and the two-phase form returned NULL for the same row — direction-
    // and plan-dependent wrong data (r13 review)
    val l = Seq(("a", Some(100L), 1L), ("a", Option.empty[Long], 2L))
      .toDF("k", "t", "lid")
    val r = Seq(("a", 50L, 7), ("a", 150L, 8)).toDF("k", "rt", "rv")
    for (d <- Seq(AsofJoin.Backward, AsofJoin.Forward);
         form <- Seq("merge", "twoPhase")) {
      val res = form match {
        case "merge" => AsofJoin.join(l, r, Seq("k"), "t", "rt", d)
        case _ => AsofJoin.joinTwoPhase(l, r, Seq("k"), "t", "rt", d, bucketUs = 70L)
      }
      val byLid = res.collect().map(row => row.getLong(2) -> row.isNullAt(3)).toMap
      assert(!byLid(1L), s"direction $d form $form: the timed row must match")
      assert(byLid(2L),
        s"direction $d form $form: a NULL-timed left row must never match")
    }
  }

  test("output-name collisions between left columns and prefixed right " +
    "payload are refused with a diagnostic") {
    import spark.implicits._
    val l = Seq(("a", 100L, 5)).toDF("k", "t", "asof_rv")
    val r = Seq(("a", 50L, 7)).toDF("k", "rt", "rv")
    Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "merge" -> (() => AsofJoin.join(l, r, Seq("k"), "t", "rt")),
      "twoPhase" -> (() => AsofJoin.joinTwoPhase(l, r, Seq("k"), "t", "rt"))
    ).foreach { case (form, f) =>
      val e = intercept[IllegalArgumentException](f())
      assert(e.getMessage.contains("asof_rv"), s"$form: ${e.getMessage}")
    }
  }

  test("joinTwoPhase refuses non-numeric time columns and unorderable " +
    "payloads with a diagnostic (join() handles both)") {
    import spark.implicits._
    val lTs = Seq(("a", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 1L))
      .toDF("k", "t", "lid")
    val rTs = Seq(("a", java.sql.Timestamp.valueOf("2026-01-01 00:00:00"), 7))
      .toDF("k", "rt", "rv")
    val eTs = intercept[IllegalArgumentException](
      AsofJoin.joinTwoPhase(lTs, rTs, Seq("k"), "t", "rt"))
    assert(eTs.getMessage.contains("numeric time column"), eTs.getMessage)
    val lN = Seq(("a", 100L, 1L)).toDF("k", "t", "lid")
    val rMap = Seq(("a", 50L, Map("x" -> 1))).toDF("k", "rt", "rv")
    val eMap = intercept[IllegalArgumentException](
      AsofJoin.joinTwoPhase(lN, rMap, Seq("k"), "t", "rt"))
    assert(eMap.getMessage.contains("not orderable"), eMap.getMessage)
    // join() supports both shapes the two-phase form refuses
    assert(AsofJoin.join(lTs, rTs, Seq("k"), "t", "rt").collect().length == 1)
    assert(AsofJoin.join(lN, rMap, Seq("k"), "t", "rt").collect().length == 1)
  }
}
