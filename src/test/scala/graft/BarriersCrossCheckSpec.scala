package graft

import org.apache.spark.sql.functions._
import graft.eval.BarrierSim
import graft.operators.Barriers
import graft.queries.EventBars

/** Cross-check: the distributed array-expression barrier scan must agree
  * trade-for-trade with the imperative golden model on the real
  * events-derived series (every signal, every combo of a small grid).
  */
class BarriersCrossCheckSpec extends GraftSuite {

  test("DataFrame triple barrier == BarrierSim golden model on sf0.001") {
    val k = 35
    val sig = EventBars.withForwardArrays(EventBars.bars(spark, sf), k)
      .filter(col("rn") % 10 === 0)
      .withColumn("entry_price", try_element_at(col("fwd_opens"), lit(1)))
      .filter(col("entry_price").isNotNull && col("entry_price") > 0)
      .withColumn("tp_pct", lit(0.01))
      .withColumn("sl_pct", lit(0.005))
      .withColumn("max_bars", lit(20))
    val got = Barriers.tripleBarrier(sig)
      .select("event_type", "event_id", "entry_price", "fwd_highs", "fwd_lows",
        "fwd_opens", "fwd_closes", "exit_type", "exit_bar", "exit_price")
      .collect()
    assert(got.length > 50, s"too few trades: ${got.length}")
    got.foreach { r =>
      def arr(i: Int) = r.getSeq[Double](i).toArray
      val want = BarrierSim.tripleBarrier(
        r.getDouble(2), arr(3), arr(4), arr(5), arr(6), 0.01, 0.005, 20)
      assert(want.exitType == r.getString(7),
        s"exit_type mismatch at ${r.getLong(1)}: $want vs ${r.getString(7)}")
      assert(want.exitBar.toLong == r.getLong(8))
      assert(math.abs(want.exitPrice - r.getDouble(9)) < 1e-12)
    }
  }

  test("DataFrame trailing stop == BarrierSim golden model on sf0.001") {
    val k = 35
    val sig = EventBars.withForwardArrays(EventBars.bars(spark, sf), k)
      .filter(col("rn") % 10 === 0)
      .withColumn("entry_price", try_element_at(col("fwd_opens"), lit(1)))
      .filter(col("entry_price").isNotNull && col("entry_price") > 0)
      .withColumn("tp_pct", lit(0.02))
      .withColumn("trail_pct", lit(0.01))
      .withColumn("max_bars", lit(15))
    val got = Barriers.trailingStop(sig)
      .select("event_type", "event_id", "entry_price", "fwd_highs", "fwd_lows",
        "fwd_opens", "fwd_closes", "exit_type", "exit_bar", "exit_price")
      .collect()
    assert(got.length > 50)
    got.foreach { r =>
      def arr(i: Int) = r.getSeq[Double](i).toArray
      val want = BarrierSim.trailingStop(
        r.getDouble(2), arr(3), arr(4), arr(5), arr(6), 0.02, 0.01, 15)
      assert(want.exitType == r.getString(7),
        s"exit_type mismatch at ${r.getLong(1)}: $want vs ${r.getString(7)}")
      assert(want.exitBar.toLong == r.getLong(8))
      assert(math.abs(want.exitPrice - r.getDouble(9)) < 1e-12)
    }
  }
}
