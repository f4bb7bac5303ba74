package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Formations
import graft.queries.EventBars

/** The per-series replay kernel must agree row-for-row (and bit-for-bit on
  * every double) with the declarative window-stack form of the formation
  * frame — same division guards, same exclusive-quantile interpolation,
  * same lag/lead null edges.
  */
class FormationsReplaySpec extends GraftSuite {

  private val cols = Seq("event_type", "event_id", "r", "ti",
    "dir_0", "dir_1", "dir_2", "owp",
    "ti_p75", "ti_p90", "ti_p95", "r_p10", "r_p90", "next_dir")

  test("withFormationColumnsReplay == declarative withFormationColumns + lead") {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_us"), col("event_id"))
    val bars = EventBars.bars(spark, sf)

    def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getLong(1))

    val declarative = Formations.withFormationColumns(bars, w)
      .withColumn("next_dir", lead(col("dir_0"), 1).over(w))
      .select(cols.head, cols.tail: _*)
      .collect()
      .map(r => key(r) -> r).toMap

    val replay = Formations.withFormationColumnsReplay(bars)
      .select(cols.head, cols.tail: _*)
      .collect()

    assert(replay.length == declarative.size,
      s"row count: replay ${replay.length} vs declarative ${declarative.size}")
    // at sf0.001 the warmup window covers a meaningful share of each series —
    // make sure the quantile gates actually light up in this fixture
    assert(replay.count(r => !r.isNullAt(10)) > 100, "no populated ti_p95 gates")
    replay.foreach { r =>
      val d = declarative(key(r))
      var i = 2
      while (i < cols.length) {
        assert(r.isNullAt(i) == d.isNullAt(i),
          s"${cols(i)} nullness mismatch at ${key(r)}: replay=$r declarative=$d")
        if (!r.isNullAt(i)) {
          val same = r.get(i) match {
            case x: Double => x == d.getDouble(i) // bit-exact, no tolerance
            case x: Int => x == d.getInt(i)
            case x => x == d.get(i)
          }
          assert(same, s"${cols(i)} mismatch at ${key(r)}: replay=${r.get(i)} declarative=${d.get(i)}")
        }
        i += 1
      }
    }
  }
}
