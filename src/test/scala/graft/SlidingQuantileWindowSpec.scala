package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, GraftSqlFunctions}
import graft.operators.BarFrame

/** Pins the SlidingQuantileWindowExec strategy three ways: (1) bit-equality
  * with the declarative collect_list form on randomized null-bearing
  * multi-series data, (2) plan shape — the sliding agg form PLANS as the
  * custom exec (DSL and SQL text), multiple columns share one node, and
  * ineligible nodes fall back to WindowExec, (3) the expanding frame stays
  * on WindowExec's incremental unbounded-preceding processor.
  */
class SlidingQuantileWindowSpec extends GraftSuite {

  private def ensure(): Unit = GraftSqlFunctions.registerAll(spark)

  // executedPlan.toString renders THROUGH the AdaptiveSparkPlan leaf
  // (collect() cannot — AQE's wrapper has no children until execution),
  // same convention as PlanShapeSpec
  private def planStr(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def randomFrame(seed: Long, n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val rows = rnd.shuffle((0 until n).map { i =>
      val v: Option[Double] =
        if (rnd.nextDouble() < 0.1) None
        else Some(math.floor(rnd.nextDouble() * 40) / 8.0) // duplicate-heavy
      (s"s${i % 4}", i.toLong, v)
    }.toList)
    rows.toDF("series", "ts", "x")
  }

  test("sliding agg form == declarative collect_list form (nulls, dups, warmup)") {
    ensure()
    // three seeds × varied frame lengths: warmup-only series (L > series
    // length), tiny frames, and frames spanning partition boundaries
    for ((seed, l1, l2) <- Seq((21L, 37, 5), (22L, 500, 2), (23L, 1, 97))) {
      val df = randomFrame(seed, 1200).cache()
      try {
        val w = BarFrame.series(Seq(col("series")), col("ts"))
        val fast = df
          .withColumn("q1", GraftFunctions.exclusiveQuantileAgg(col("x"), 0.95)
            .over(w.rowsBetween(-l1, -1)))
          .withColumn("q2", GraftFunctions.exclusiveQuantileAgg(col("x"), 0.25)
            .over(w.rowsBetween(-l2, -1)))
        assert(planStr(fast).contains("SlidingQuantileWindow"),
          "sliding agg frame must plan as SlidingQuantileWindowExec")
        val decl = df
          .withColumn("q1", BarFrame.rollingExclusiveQuantile(col("x"), 0.95, l1, w))
          .withColumn("q2", BarFrame.rollingExclusiveQuantile(col("x"), 0.25, l2, w))
        val f = fast.orderBy("series", "ts").collect()
        val d = decl.orderBy("series", "ts").collect()
        assert(f.length == d.length && f.length == 1200)
        f.zip(d).foreach { case (a, b) =>
          assert(a == b, s"seed=$seed: fast $a != declarative $b")
        }
      } finally df.unpersist()
    }
  }

  test("strategy registration is idempotent across ensureConfs/registerAll") {
    ensure(); ensure()
    graft.SparkEntry.ensureConfs(spark)
    val n = spark.experimental.extraStrategies
      .count(_ == graft.plans.SlidingQuantileStrategy)
    assert(n == 1, s"expected one registration, found $n")
  }

  test("multi-column census shape shares ONE exec node") {
    ensure()
    val df = randomFrame(22L, 200)
    val w = BarFrame.series(Seq(col("series")), col("ts"))
    val five = (1 to 5).foldLeft(df) { (acc, i) =>
      acc.withColumn(s"q$i", GraftFunctions.exclusiveQuantileAgg(col("x"), i / 10.0)
        .over(w.rowsBetween(-20, -1)))
    }
    val p = planStr(five)
    assert("SlidingQuantileWindow ".r.findAllIn(p).length == 1,
      s"expected one shared exec node:\n$p")
    assert("QuantileSpec\\(".r.findAllIn(p).length == 5,
      s"expected 5 quantile specs in the one node:\n$p")
  }

  test("SQL text (reference shape) plans as the exec and matches the DSL") {
    ensure()
    val df = randomFrame(23L, 600)
    df.createOrReplaceTempView("sq_t")
    val sql = spark.sql(
      """SELECT series, ts,
        |  exclusive_quantile_agg(x, 0.9) OVER
        |    (PARTITION BY series ORDER BY ts ROWS BETWEEN 50 PRECEDING AND 1 PRECEDING) AS q
        |FROM sq_t""".stripMargin)
    assert(planStr(sql).contains("SlidingQuantileWindow"),
      "SQL-text sliding frame must plan as the exec")
    val w = BarFrame.series(Seq(col("series")), col("ts"))
    val dsl = df.select(col("series"), col("ts"),
      GraftFunctions.exclusiveQuantileAgg(col("x"), 0.9)
        .over(w.rowsBetween(-50, -1)).as("q"))
    val a = sql.orderBy("series", "ts").collect()
    val b = dsl.orderBy("series", "ts").collect()
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("mixed window node SPLITS: quantiles on the exec, the rest on Window, one exchange") {
    ensure()
    val df = randomFrame(24L, 400)
    val w = BarFrame.series(Seq(col("series")), col("ts"))
    // quantile + sum + row_number merged into ONE logical node by the
    // analyzer/CollapseWindow (same partition+order) — the strategy must
    // carve the quantile out and leave the rest on WindowExec, sharing the
    // single exchange+sort
    val mixed = df
      .withColumn("q", GraftFunctions.exclusiveQuantileAgg(col("x"), 0.5)
        .over(w.rowsBetween(-9, -1)))
      .withColumn("s", sum(col("x")).over(w.rowsBetween(-9, -1)))
      .withColumn("rn", row_number().over(w))
    val p = planStr(mixed)
    assert(p.contains("SlidingQuantileWindow"), s"quantile must stay on the exec:\n$p")
    assert("\\bWindow \\[".r.findAllIn(p).length == 1,
      s"non-quantile exprs ride one regular Window:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1,
      s"the split must not add an exchange:\n$p")
    val decl = df
      .withColumn("q", BarFrame.rollingExclusiveQuantile(col("x"), 0.5, 9, w))
      .withColumn("s", sum(col("x")).over(w.rowsBetween(-9, -1)))
      .withColumn("rn", row_number().over(w))
    val a = mixed.orderBy("series", "ts").collect()
    val b = decl.orderBy("series", "ts").collect()
    a.zip(b).foreach { case (x, y) => assert(x == y) }
  }

  test("expanding (unbounded-preceding) frame is NOT claimed by the strategy") {
    ensure()
    val df = randomFrame(25L, 300)
    val w = BarFrame.series(Seq(col("series")), col("ts"))
    val expanding = df.withColumn("q",
      BarFrame.expandingExclusiveQuantile(col("x"), 0.75, w))
    assert(!planStr(expanding).contains("SlidingQuantileWindow"),
      "unbounded-preceding frames stay on WindowExec")
    // and it still evaluates (WindowExec's growing-frame processor)
    assert(expanding.count() == 300)
  }

  test("Long frame bound beyond Int range is NOT claimed (no silent wrap)") {
    ensure()
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete}
    import org.apache.spark.sql.catalyst.plans.logical
    // hand-built logical node: the public DSL/SQL surfaces reject Long
    // bounds at analysis, but the strategy must be robust to any producer
    val child = randomFrame(26L, 300).queryExecution.analyzed
    val series = child.output.find(_.name == "series").get
    val ts = child.output.find(_.name == "ts").get
    val x = child.output.find(_.name == "x").get
    def node(lower: Long): logical.Window = {
      val frame = SpecifiedWindowFrame(RowFrame, Literal(lower), Literal(-1))
      val spec = WindowSpecDefinition(Seq(series),
        Seq(SortOrder(ts, Ascending)), frame)
      val agg = AggregateExpression(
        graft.functions.ExclusiveQuantileAgg(x, 0.5), Complete, isDistinct = false)
      logical.Window(Seq(Alias(WindowExpression(agg, spec), "q")()),
        Seq(series), Seq(SortOrder(ts, Ascending)), child, None)
    }
    // -(1L<<32)-2 wraps to -2 under toInt: before the isValidInt guard the
    // strategy claimed this window with lookback 2 instead of deferring
    assert(graft.plans.SlidingQuantileStrategy(node(-(1L << 32) - 2L)).isEmpty,
      "out-of-Int-range Long frames must fall through to the default planner")
    // positive control: an in-range Long bound IS still claimed
    assert(graft.plans.SlidingQuantileStrategy(node(-10L)).nonEmpty,
      "in-range Long frames stay on the exec")
  }
}
