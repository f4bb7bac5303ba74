package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.Sweep.{BarrierCfg, SweepSpec}

/** End-to-end sweep orchestration: one job covers the whole config grid,
  * results land partitioned by (generation, formation), re-running one
  * generation leaves others intact (crash-resume), telemetry appends.
  */
class SweepSpec extends GraftSuite {

  private val grid = Seq(
    BarrierCfg("sym", 0.0075, 0.0075, 20),
    BarrierCfg("mom", 0.01, 0.005, 30))

  test("sweep writes per-config metrics + telemetry; resume overwrites only its generation") {
    val out = Files.createTempDirectory("graft_sweep").toString
    val g1 = Sweep.run(spark, sf, SweepSpec("g1",
      Seq("2down_ng" -> "(dir_1 = 0 AND dir_0 = 0)",
        "dud" -> "(dir_2 = 0 AND dir_1 = 1 AND dir_0 = 0)"), grid), out)
    assert(g1.count() == 4) // 2 formations × 2 profiles
    val stored = Sweep.results(spark, out)
    assert(stored.count() == 4)
    assert(stored.filter(col("win_rate").isNull).count() == 0)

    // second generation with one formation
    Sweep.run(spark, sf, SweepSpec("g2",
      Seq("2down_ng" -> "(dir_1 = 0 AND dir_0 = 0)"), grid), out)
    assert(Sweep.results(spark, out).count() == 6)

    // re-run g1 (crash-resume): still 6 rows, g2 untouched
    Sweep.run(spark, sf, SweepSpec("g1",
      Seq("2down_ng" -> "(dir_1 = 0 AND dir_0 = 0)",
        "dud" -> "(dir_2 = 0 AND dir_1 = 1 AND dir_0 = 0)"), grid), out)
    val after = Sweep.results(spark, out)
    assert(after.count() == 6)
    assert(after.filter(col("generation") === "g2").count() == 2)

    // telemetry: one JSONL line per run
    val tele = graft.sources.ResultSink.readJsonl(spark, s"$out/telemetry")
    assert(tele.count() == 3)
    assert(tele.filter(col("generation") === "g1").count() == 2)
  }

  test("sweep metrics agree with the oracle-checked q43 on shared configs") {
    val out = Files.createTempDirectory("graft_sweep2").toString
    val mine = Sweep.run(spark, sf, SweepSpec("x",
      Seq("dud" -> "(dir_2 = 0 AND dir_1 = 1 AND dir_0 = 0)"),
      Seq(BarrierCfg("symmetric", 0.0075, 0.0075, 20))), out)
      .select("formation", "barrier_profile", "total_signals", "tp_count")
      .collect().head
    val q43 = queries.SweepQueries.q43FormationBarrierSweep(spark, sf)
      .filter(col("formation") === "dud" && col("barrier_profile") === "symmetric")
      .select("formation", "barrier_profile", "total_signals", "tp_count")
      .collect().head
    assert(mine.getLong(2) == q43.getLong(2) && mine.getLong(3) == q43.getLong(3))
  }
}
