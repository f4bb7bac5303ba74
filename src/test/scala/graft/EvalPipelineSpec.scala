package graft

import org.apache.spark.sql.functions._
import graft.eval.{EvalPipeline, Extraction, Ranking}

/** End-to-end §3.2 pipeline over a synthetic multi-config trade frame, plus
  * extraction-layer and Spearman goldens.
  */
class EvalPipelineSpec extends GraftSuite {

  private def tradeFrame() = {
    import spark.implicits._
    val rng = new scala.util.Random(5)
    // 4 configs × 120 trades: one strong, one weak, two mediocre
    val rows = for {
      (cid, drift) <- Seq(("strong", 0.01), ("weak", -0.008),
        ("mid_a", 0.001), ("mid_b", 0.0005))
      i <- 0 until 120
    } yield (cid, i.toLong * 3600L * 1000000L, drift + rng.nextGaussian() * 0.005)
    rows.toDF("config_id", "ts_us", "return_pct")
  }

  test("extraction moments: n/win-rate/quantiles consistent with a local recompute") {
    val df = tradeFrame()
    val m = Extraction.moments(df, col("config_id")).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(m.size == 4)
    val local = df.filter(col("config_id") === "strong")
      .select("return_pct").collect().map(_.getDouble(0))
    val row = m("strong")
    assert(row.getAs[Long]("n_trades") == 120)
    assert(math.abs(row.getAs[Double]("mean_return") - local.sum / local.length) < 1e-12)
    assert(math.abs(row.getAs[Double]("win_rate") -
      local.count(_ > 0).toDouble / local.length) < 1e-12)
    // q05 exclusive golden
    val sorted = local.sorted
    val h = 0.05 * (sorted.length + 1)
    val want = {
      val fh = math.floor(h); val i = fh.toInt
      if (h < 1) sorted.head else sorted(i - 1) + (h - fh) * (sorted(i) - sorted(i - 1))
    }
    assert(math.abs(row.getAs[Double]("q05") - want) < 1e-12)
  }

  test("extraction returns mode: arrays are time-ordered per config") {
    val arr = Extraction.returnsArrays(tradeFrame(), col("config_id"))
      .filter(col("config_id") === "mid_a").collect().head
    val ts = arr.getSeq[Long](arr.fieldIndex("close_times_us"))
    assert(ts == ts.sorted)
    assert(arr.getSeq[Double](arr.fieldIndex("returns")).length == 120)
  }

  test("pipeline: strong config wins TOPSIS, RW rejects it, weak config does not rank") {
    val res = EvalPipeline.run(tradeFrame(), nBootstrap = 200)
    assert(res.reports.length == 4)
    val byId = res.reports.map(r => r.configId -> r).toMap
    val winner = res.reports.maxBy(_.topsisScore)
    assert(winner.configId == "strong", s"winner was ${winner.configId}")
    assert(res.romanoWolfRejected.contains("strong"))
    assert(!res.romanoWolfRejected.contains("weak"))
    assert(byId("strong").omega > byId("weak").omega)
    assert(byId("strong").dsr >= byId("weak").dsr)
    assert(res.cscvPbo >= 0.0 && res.cscvPbo <= 1.0)
    // deterministic end to end
    val res2 = EvalPipeline.run(tradeFrame(), nBootstrap = 200)
    assert(res2.reports.map(_.topsisScore) == res.reports.map(_.topsisScore))
  }

  test("spearman goldens: monotone 1, reversed -1, ties averaged") {
    val a = Array(1.0, 2.0, 3.0, 4.0)
    assert(math.abs(Ranking.spearman(a, Array(10.0, 20.0, 30.0, 40.0)) - 1.0) < 1e-12)
    assert(math.abs(Ranking.spearman(a, Array(4.0, 3.0, 2.0, 1.0)) + 1.0) < 1e-12)
    // numpy golden: pearson of average ranks [1,2.5,2.5,4] vs [1,3,2,4]
    val r = Ranking.spearman(Array(1.0, 2.0, 2.0, 4.0), Array(1.0, 3.0, 2.0, 4.0))
    assert(math.abs(r - 0.9486832980505139) < 1e-12)
  }
}
