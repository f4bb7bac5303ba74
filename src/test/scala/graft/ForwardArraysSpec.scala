package graft

import org.apache.spark.sql.functions._
import graft.queries.EventBars

/** The banded signals-only forward-array collector must agree row-for-row
  * and element-for-element with the window form restricted to signals.
  */
class ForwardArraysSpec extends GraftSuite {

  test("signalForwardArrays == windowed withForwardArrays on signal rows") {
    val k = 35
    val bars = EventBars.bars(spark, sf)
    val isSignal = col("rn") % 25 === 0

    val windowed = EventBars.withForwardArrays(bars, k)
      .filter(isSignal)
      .filter(size(col("fwd_highs")) > 0)
      .select("event_type", "event_id", "fwd_highs", "fwd_lows", "fwd_opens", "fwd_closes")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getSeq[Double](2), r.getSeq[Double](3), r.getSeq[Double](4), r.getSeq[Double](5)))
      .toMap

    val banded = EventBars.signalForwardArrays(bars, isSignal, k)
      .select("event_type", "event_id", "fwd_highs", "fwd_lows", "fwd_opens", "fwd_closes")
      .collect()

    assert(banded.length == windowed.size,
      s"row count: banded ${banded.length} vs windowed ${windowed.size}")
    banded.foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      val w = windowed(key)
      assert(r.getSeq[Double](2) == w._1, s"fwd_highs mismatch at $key")
      assert(r.getSeq[Double](3) == w._2, s"fwd_lows mismatch at $key")
      assert(r.getSeq[Double](4) == w._3, s"fwd_opens mismatch at $key")
      assert(r.getSeq[Double](5) == w._4, s"fwd_closes mismatch at $key")
    }
  }
}
