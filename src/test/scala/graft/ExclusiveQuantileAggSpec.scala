package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions

/** The incremental expanding-quantile aggregate must agree exactly with
  * the collect_list + scalar-expression form (they implement the same
  * PERCENTILE.EXC semantics via different physical plans).
  */
class ExclusiveQuantileAggSpec extends GraftSuite {

  test("agg form == collect_list form over the expanding prior frame") {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val df = Tables.events(spark, sf)
      .withColumn("agg_q",
        GraftFunctions.exclusiveQuantileAgg(col("value"), 0.95)
          .over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("list_q",
        GraftFunctions.quantileExactExclusive(
          collect_list(col("value")).over(w.rowsBetween(Window.unboundedPreceding, -1)),
          0.95))
    val bad = df.filter(
      (col("agg_q").isNull =!= col("list_q").isNull) ||
        abs(col("agg_q") - col("list_q")) > 1e-12).count()
    assert(bad == 0)
    assert(df.filter(col("agg_q").isNotNull).count() > 0)
  }

  test("plain aggregate mode (with shuffle merge path) matches sort-based golden") {
    val got = Tables.events(spark, sf)
      .repartition(7) // force partial buffers + merge()
      .groupBy(col("event_type"))
      .agg(GraftFunctions.exclusiveQuantileAgg(col("value"), 0.25).as("q25"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val local = Tables.events(spark, sf).select("event_type", "value").collect()
      .groupBy(_.getString(0))
    local.foreach { case (k, rows) =>
      val sorted = rows.map(_.getDouble(1)).sorted
      val m = sorted.length
      val h = 0.25 * (m + 1)
      val want =
        if (h < 1) sorted.head
        else if (h >= m) sorted.last
        else {
          val fh = math.floor(h); val i = fh.toInt
          sorted(i - 1) + (h - fh) * (sorted(i) - sorted(i - 1))
        }
      assert(math.abs(got(k) - want) < 1e-12, s"$k: ${got(k)} != $want")
    }
  }
}
