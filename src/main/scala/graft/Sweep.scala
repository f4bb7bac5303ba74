package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Barriers, BarFrame}
import graft.queries.EventBars
import graft.sources.ResultSink

/** Sweep orchestrator (SURVEY.md §7.1.9 / §3.1): the replacement for the
  * reference's generate.sh → pueue → xargs → NDJSON machinery. A sweep is
  * (formations × barrier grid) over one shared, cached signal frame:
  *
  *  - the bars scan + direction windows + signals-only forward arrays are
  *    computed ONCE and cached — the reference re-scans the bars table per
  *    config (66,960× in gen600);
  *  - the config fan-out is columnar (stack + broadcast grid), so adding
  *    configs grows the aggregate, not the number of jobs;
  *  - results land in a partitioned dataset keyed by (generation,
  *    formation); re-running a generation atomically overwrites only its
  *    partitions (crash-resume without line counting / flock);
  *  - telemetry (wall time, config counts) is a JSONL sink next to the
  *    results, one line per run — the NDJSON wrapper's role.
  */
object Sweep {

  final case class BarrierCfg(profile: String, tpPct: Double, slPct: Double, maxBars: Int)

  final case class SweepSpec(
      generation: String,
      formations: Seq[(String, String)], // name -> SQL predicate over dir_0/1/2
      grid: Seq[BarrierCfg],
      forwardBars: Int = 35,
      warmupBars: Int = 100,
      // E30 (scripts/gen800_sweep.py:31-60): regime gates — name -> SQL
      // predicate over the joined Laguerre `regime` label (0 bearish /
      // 1 neutral / 2 bullish). The default single any-gate keeps the
      // ungated sweep shape (and skips the Laguerre join entirely).
      regimeGates: Seq[(String, String)] = Seq("any_regime" -> "true"),
      laguerre: operators.Laguerre.Config = operators.Laguerre.Config())

  /** Run a sweep and write results + telemetry under `outDir`. Returns the
    * per-(formation, regime_gate, profile) metrics frame. */
  def run(spark: SparkSession, sfDir: String, spec: SweepSpec, outDir: String): DataFrame = {
    import spark.implicits._
    val t0 = System.nanoTime()
    val w = BarFrame.series(Seq(col("event_type")), col("ts_us"), col("event_id"))
    val bars = EventBars.bars(spark, sfDir)
    // gate dimension: join per-bar Laguerre regime labels only when a gate
    // actually reads them (any_regime-only sweeps pay nothing)
    val needRegimes = spec.regimeGates.exists(_._2.trim != "true")
    val withRegime =
      if (!needRegimes) bars.withColumn("regime", lit(1))
      else operators.Laguerre.attachRegimes(bars, spec.laguerre).drop("rsi")
    val flagged = withRegime
      .withColumn("dir_0", BarFrame.direction(col("open"), col("close")))
      .withColumn("dir_1", lag(col("dir_0"), 1).over(w))
      .withColumn("dir_2", lag(col("dir_0"), 2).over(w))
    val anySignal = col("rn") > spec.warmupBars &&
      spec.formations.map { case (_, p) => expr(p) }.reduce(_ || _)
    val sig = EventBars.signalForwardArrays(flagged, anySignal, spec.forwardBars)
      .withColumn("entry_price", try_element_at(col("fwd_opens"), lit(1)))
      .filter(col("entry_price").isNotNull && col("entry_price") > 0)
      // explicit fan-out partitioning: the signal frame is SMALL post-join,
      // so AQE coalesces it to one or two partitions — and then the
      // grid × signal explosion below (10⁴× rows for a 30k-config grid)
      // inherits that parallelism: observed as 1 of 32 cores busy for
      // 10 minutes at the 30k-config rehearsal. An explicit numPartitions
      // repartition is AQE-stable (REPARTITION_BY_NUM is never coalesced)
      // and pins the barrier-scan fan-out to the executor count.
      .repartition(spark.sparkContext.defaultParallelism)
      .cache() // the shared frame every config reads

    val stackExpr = spec.formations.map { case (name, p) =>
      s"'$name', CASE WHEN $p THEN 1 ELSE 0 END"
    }.mkString(s"stack(${spec.formations.size}, ", ", ", ") as (formation, flag)")
    val gateStack = spec.regimeGates.map { case (name, p) =>
      s"'$name', CASE WHEN $p THEN 1 ELSE 0 END"
    }.mkString(s"stack(${spec.regimeGates.size}, ", ", ", ") as (regime_gate, gate_flag)")
    val gridDf = spec.grid.map(g => (g.profile, g.tpPct, g.slPct, g.maxBars))
      .toDF("barrier_profile", "tp_pct", "sl_pct", "max_bars")
    // scan BEFORE the formation/gate stacks (the q43 lesson): the barrier
    // outcome is independent of which formation(s)/gate(s) tagged the
    // signal, so the array scan runs once per (signal × barrier config)
    // and the stacks explode narrow outcome rows — a signal firing f
    // formations costs one scan, not f
    val scanned = Barriers.tripleBarrier(sig.crossJoin(broadcast(gridDf)))
      .select(col("dir_0"), col("dir_1"), col("dir_2"), col("regime"),
        col("barrier_profile"), col("tp_pct"), col("sl_pct"), col("max_bars"),
        col("entry_price"), col("exit_type"), col("exit_bar"), col("exit_price"))
    val trades = scanned
      .select(col("*"), expr(stackExpr)).filter(col("flag") === 1)
      .select(col("*"), expr(gateStack)).filter(col("gate_flag") === 1)
    val metrics = Barriers
      .metricsAgg(trades, col("formation"), col("regime_gate"), col("barrier_profile"),
        col("tp_pct"), col("sl_pct"), col("max_bars"))
      .withColumn("generation", lit(spec.generation))

    ResultSink.overwritePartitions(metrics, s"$outDir/results",
      Seq("generation", "formation"))
    val wallS = (System.nanoTime() - t0) / 1e9
    val telemetry = Seq((spec.generation, spec.formations.size, spec.grid.size,
      spec.regimeGates.size, wallS, java.time.Instant.now().toString))
      .toDF("generation", "n_formations", "n_barriers", "n_regime_gates",
        "wall_s", "finished_at")
    ResultSink.appendJsonl(telemetry, s"$outDir/telemetry")
    sig.unpersist()
    metrics
  }

  def results(spark: SparkSession, outDir: String): DataFrame =
    ResultSink.read(spark, s"$outDir/results")
}
