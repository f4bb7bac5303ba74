package graft

import org.apache.spark.sql.SparkSession

/** Config-axis scaling rehearsal (dev tool): runs the Sweep orchestrator at
  * three barrier-grid sizes over the same data and prints one JSON line per
  * step. The reference evaluates each config as its own SQL file
  * (gen600: 300,960 files, ~2 days on 4×16-way workers); the claim here is
  * that ONE Spark job's wall-clock is decoupled from the config count —
  * the curve (configs ×720, wall ×·) is the evidence SCALE.md records.
  *
  * Usage: runMain graft.SweepScale <sfDir> <outDir> [big]
  *   `big` appends the gen600-width step (302,400 configs ≈ the
  *   reference's 300,960 sed-generated files) — ~10× the 30k step's
  *   wall, so it is opt-in rather than part of the dev loop.
  */
object SweepScale {

  // every dir-expressible pattern: 8 three-bar + 4 two-bar + 2 one-bar
  private val formations: Seq[(String, String)] = {
    val threeBar = for (a <- 0 to 1; b <- 0 to 1; c <- 0 to 1)
      yield s"p3_$a$b$c" -> s"(dir_2 = $a AND dir_1 = $b AND dir_0 = $c)"
    val twoBar = for (b <- 0 to 1; c <- 0 to 1)
      yield s"p2_$b$c" -> s"(dir_1 = $b AND dir_0 = $c)"
    val oneBar = for (c <- 0 to 1) yield s"p1_$c" -> s"(dir_0 = $c)"
    threeBar ++ twoBar ++ oneBar
  }

  private val gates: Seq[(String, String)] = Seq(
    "any_regime" -> "true",
    "bearish" -> "(regime = 0)",
    "not_bearish" -> "(regime >= 1)")

  private def grid(nTp: Int, nSl: Int, nMb: Int): Seq[Sweep.BarrierCfg] =
    for {
      i <- 0 until nTp; j <- 0 until nSl; m <- 0 until nMb
    } yield Sweep.BarrierCfg(
      profile = s"g${i}_${j}_$m",
      tpPct = 0.002 + 0.001 * i,
      slPct = 0.002 + 0.001 * j,
      maxBars = 5 + 3 * m)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("/tmp/sweep_scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val steps = Seq(
      ("sweep42", 1, 1, 1),      // 14 × 3 × 1   =     42 configs
      ("sweep1k", 4, 3, 2),      // 14 × 3 × 24  =  1,008 (gen520's n)
      ("sweep30k", 10, 9, 8)) ++ // 14 × 3 × 720 = 30,240
      // gen600 width: 14 × 3 × 7,200 = 302,400 ≈ the reference's 300,960
      // (scripts/gen600/generate.sh:107-176)
      (if (args.contains("big")) Seq(("sweep300k", 20, 18, 20)) else Seq.empty)
    if (!args.contains("gen800only")) steps.foreach { case (gen, nTp, nSl, nMb) =>
      val g = grid(nTp, nSl, nMb)
      val spec = Sweep.SweepSpec(gen, formations, g, regimeGates = gates)
      val t0 = System.nanoTime()
      val out = Sweep.run(spark, sfDir, spec, outDir)
      val n = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val nCfg = formations.size * gates.size * g.size
      println(f"""{"step":"$gen","n_configs":$nCfg,"result_rows":$n,"wall_s":$wall%.1f}""")
    }
    // gen800 width (scripts/gen800_sweep.py:6): 288 Laguerre configs ×
    // (5 patterns × 3 gates × 20 barriers) = 86,400 configs. The Laguerre
    // axis costs its 12 DISTINCT recursions once per series
    // (Laguerre.attachRsis); thresholds and gates fan out columnar after
    // the barrier scan, so the scan never multiplies by the 288.
    if (args.contains("gen800") || args.contains("gen800only")) {
      val lagGrid = for {
        ap <- Seq(14, 32, 64, 100)
        lu <- Seq(0.60, 0.65, 0.70, 0.75, 0.80, 0.85)
        ld <- Seq(0.10, 0.15, 0.25, 0.40)
        ao <- Seq(0.50, 0.75, 1.00)
      } yield Sweep.LagCfg(s"ap${ap}_lu${lu}_ld${ld}_ao$ao", ap, ao, lu, ld)
      // the reference's 5 patterns (gen800_sweep.py PATTERNS), dir-grid form
      val five = Seq(
        "p3_000" -> "(dir_2 = 0 AND dir_1 = 0 AND dir_0 = 0)", // 3down
        "p3_100" -> "(dir_2 = 1 AND dir_1 = 0 AND dir_0 = 0)", // udd
        "p3_010" -> "(dir_2 = 0 AND dir_1 = 1 AND dir_0 = 0)", // dud
        "p2_00" -> "(dir_1 = 0 AND dir_0 = 0)",                // 2down
        "p1_0" -> "(dir_0 = 0)")                               // wl1d slot
      val gates800 = Seq(
        "bullish_only" -> "(regime = 2)",
        "not_bearish" -> "(regime >= 1)",
        "any_regime" -> "true")
      val g = grid(5, 2, 2) // 20 barrier profiles
      val spec = Sweep.SweepSpec("gen800", five, g,
        regimeGates = gates800, laguerreGrid = lagGrid)
      val t0 = System.nanoTime()
      val out = Sweep.run(spark, sfDir, spec, outDir)
      val n = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val nCfg = five.size * gates800.size * g.size * lagGrid.size
      println(f"""{"step":"gen800","n_configs":$nCfg,"n_laguerre":${lagGrid.size},""" +
        f""""result_rows":$n,"wall_s":$wall%.1f}""")
    }
    spark.stop()
  }
}
