package graft

import org.apache.spark.sql.functions._
import graft.operators.{BarFrame, SeriesReplay}
import graft.operators.SeriesReplay.{RollingQ, Shift}

/** Pins the incremental SeriesReplay kernel to the declarative window forms
  * it replaces: rolling exclusive quantiles == collect_list + exact
  * quantile, shifts == lag/lead, rowNumber == row_number, on randomized
  * multi-series data WITH NULLS (null feature rows occupy a frame slot but
  * contribute no value — the exact W6 contract).
  */
class SeriesReplaySpec extends GraftSuite {

  private def randomFrame(seed: Long, n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    // 3 series, shuffled input order, ~8% null values, duplicate values to
    // exercise multiset removal of repeated keys
    val rows = rnd.shuffle((0 until n).map { i =>
      val series = s"s${i % 3}"
      val v: Option[Double] =
        if (rnd.nextDouble() < 0.08) None
        else Some(math.floor(rnd.nextDouble() * 50) / 10.0)
      (series, i.toLong, rnd.nextLong().abs % 1000000, v)
    }.toList)
    rows.toDF("series", "ts", "id", "x")
      .select(col("series"), col("ts"), col("id"), col("x"),
        (col("x") * 2 + col("ts")).as("y"))
  }

  test("rolling quantiles match the declarative collect_list form (nulls, dups)") {
    val df = randomFrame(42L, 900).cache()
    try {
      val w = BarFrame.series(Seq(col("series")), col("ts"), col("id"))
      val decl = df
        .withColumn("q1", BarFrame.rollingExclusiveQuantile(col("x"), 0.90, 37, w))
        .withColumn("q2", BarFrame.rollingExclusiveQuantile(col("x"), 0.25, 5, w))
        .withColumn("q3", BarFrame.rollingExclusiveQuantile(col("y"), 0.5, 100, w))
      val repl = SeriesReplay.attach(df, "series", Seq("ts", "id"),
        quantiles = Seq(RollingQ("x", "q1", 0.90, 37), RollingQ("x", "q2", 0.25, 5),
          RollingQ("y", "q3", 0.5, 100)))
      val key = Seq("series", "ts", "id")
      val d = decl.select(key.map(col) ++ Seq(col("q1"), col("q2"), col("q3")): _*)
        .orderBy(key.map(col): _*).collect()
      val r = repl.select(key.map(col) ++ Seq(col("q1"), col("q2"), col("q3")): _*)
        .orderBy(key.map(col): _*).collect()
      assert(d.length == r.length && d.length == 900)
      d.zip(r).foreach { case (a, b) =>
        assert(a == b, s"declarative $a != replay $b") // bit-exact, incl. nulls
      }
    } finally df.unpersist()
  }

  test("shifts and rowNumber match lag/lead/row_number; warmup frames are NULL") {
    val df = randomFrame(7L, 300).cache()
    try {
      val w = BarFrame.series(Seq(col("series")), col("ts"), col("id"))
      val decl = df
        .withColumn("lx1", lag(col("x"), 1).over(w))
        .withColumn("lt3", lag(col("ts"), 3).over(w))
        .withColumn("nx2", lead(col("x"), 2).over(w))
        .withColumn("rn", row_number().over(w))
      val repl = SeriesReplay.attach(df, "series", Seq("ts", "id"),
        quantiles = Nil,
        shifts = Seq(Shift("x", "lx1", -1), Shift("ts", "lt3", -3), Shift("x", "nx2", 2)),
        rowNumberCol = Some("rn"))
      val key = Seq("series", "ts", "id")
      val cols = key.map(col) ++ Seq(col("lx1"), col("lt3"), col("nx2"), col("rn"))
      val d = decl.select(cols: _*).orderBy(key.map(col): _*).collect()
      val r = repl.select(cols: _*).orderBy(key.map(col): _*).collect()
      assert(d.length == r.length && d.length == 300)
      d.zip(r).foreach { case (a, b) => assert(a == b, s"declarative $a != replay $b") }
      // warmup: the first row of each series has NULL lag and a NULL
      // quantile upstream by construction (sanity on the contract)
      val firsts = repl.withColumn("first", col("rn") === 1).filter(col("first"))
      assert(firsts.count() == 3)
      assert(firsts.filter(col("lx1").isNotNull).count() == 0)
    } finally df.unpersist()
  }
}
