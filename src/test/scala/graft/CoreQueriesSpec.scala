package graft

import org.apache.spark.sql.functions._

class CoreQueriesSpec extends GraftSuite {

  test("every registered query has rows at sf0.001 and a matching oracle key") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    qs.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
    // Every oracle key must point at an existing query.
    SparkEntry.oracleSql.keys.foreach { k =>
      assert(qs.contains(k), s"oracle $k has no query")
    }
  }

  test("entry() smoke") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("q02 conditional aggregates agree with a direct recomputation") {
    val li = Tables.lineitem(spark, sf)
    val got = queries.CoreQueries.q02CondAgg(spark, sf)
      .agg(sum("n")).first().getLong(0)
    assert(got == li.count())
  }

  test("q04 lag/lead round-trip: lead(lag(x)) == x off the edges") {
    val df = queries.CoreQueries.q04WindowLagLead(spark, sf)
    val bad = df.filter(col("rn") > 1 && col("prev_value").isNull).count()
    assert(bad == 0)
  }

  test("q08 topk is deterministically ordered") {
    val a = queries.CoreQueries.q08TopK(spark, sf).collect().map(_.getLong(0)).toSeq
    val b = queries.CoreQueries.q08TopK(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("q01 plan pushes filters into the parquet scan") {
    val plan = queries.CoreQueries.q01FilteredScan(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_quantity"),
      s"no pushed filters in plan:\n$plan")
  }
}
