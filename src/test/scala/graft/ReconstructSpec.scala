package graft

import org.apache.spark.sql.functions._
import graft.queries.ReconstructQueries

/** q144 — the gen800_reconstruct twin (per-trade log + hedged equity
  * curve of the champion config). The DuckDB oracle pins engine-vs-
  * oracle parity; this spec pins the ARTIFACT's internal contract: the
  * equity curve really is the running sum of the logged trades, the
  * underwater annotations really derive from the curve, and the log is
  * a gapless entry-ordered sequence — the invariants a reference user
  * consuming trades_*.jsonl relies on (gen800_reconstruct.py:253-300).
  */
class ReconstructSpec extends GraftSuite {

  private lazy val rows =
    ReconstructQueries.q144Reconstruct(spark, "/root/testdata/sf0.01")
      .orderBy(col("trade_n")).collect()

  test("q144: trade_n is the gapless 1..n entry order of one config") {
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[String]("config_id")).distinct.length == 1,
      "reconstruction must emit exactly one (champion) config")
    assert(rows.map(_.getAs[Long]("trade_n")).toSeq ==
      (1L to rows.length.toLong).toSeq)
  }

  test("q144: equity is the running sum of return_pct; peak/drawdown/underwater derive from it") {
    var cum = 0.0
    var peak = Double.NegativeInfinity
    rows.foreach { r =>
      cum += r.getAs[Double]("return_pct")
      peak = math.max(peak, cum)
      val eq = r.getAs[Double]("equity")
      val pk = r.getAs[Double]("peak_equity")
      val dd = r.getAs[Double]("drawdown")
      val uw = r.getAs[Int]("underwater")
      assert(math.abs(eq - cum) < 1e-9, s"equity drifted at trade ${r.getAs[Long]("trade_n")}")
      assert(math.abs(pk - peak) < 1e-9, "peak is not the running max")
      assert(math.abs(dd - (pk - eq)) < 1e-9, "drawdown != peak - equity")
      assert(dd >= -1e-12, "negative drawdown")
      assert((uw == 1) == (pk - eq > 1e-12),
        s"underwater flag disagrees with the curve at trade ${r.getAs[Long]("trade_n")}")
    }
  }

  test("q144: every trade is a valid two-segment barrier outcome") {
    rows.foreach { r =>
      val et = r.getAs[String]("exit_type")
      assert(Set("TP", "SL", "TIME")(et), s"unexpected exit_type $et")
      val bars = r.getAs[Long]("duration_bars")
      assert(bars >= 1 && bars <= 15, s"duration_bars $bars outside the grid's max_bars")
      val ret = r.getAs[Double]("return_pct")
      val ep = r.getAs[Double]("entry_price")
      val xp = r.getAs[Double]("exit_price")
      assert(ep > 0 && xp > 0)
      assert(math.abs(ret - (xp - ep) / ep) < 2e-6, "return_pct != price ratio (1e-6 grid)")
      // TP exits: at-or-above the +1% target on the 1e-6 grid
      if (et == "TP") assert(ret >= 0.01 - 2e-6, s"TP exit with return $ret")
      // SL exits: at-or-below entry (gap fills can only worsen the stop)
      if (et == "SL") assert(ret <= 0.0, s"SL exit with positive return $ret")
    }
  }

  test("q144: deterministic — a second invocation is row-identical") {
    val again = ReconstructQueries.q144Reconstruct(spark, "/root/testdata/sf0.01")
      .orderBy(col("trade_n")).collect()
    assert(again.toSeq == rows.toSeq)
  }
}
