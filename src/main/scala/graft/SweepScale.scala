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
    steps.foreach { case (gen, nTp, nSl, nMb) =>
      val g = grid(nTp, nSl, nMb)
      val spec = Sweep.SweepSpec(gen, formations, g, regimeGates = gates)
      val t0 = System.nanoTime()
      val out = Sweep.run(spark, sfDir, spec, outDir)
      val n = out.count()
      val wall = (System.nanoTime() - t0) / 1e9
      val nCfg = formations.size * gates.size * g.size
      println(f"""{"step":"$gen","n_configs":$nCfg,"result_rows":$n,"wall_s":$wall%.1f}""")
    }
    spark.stop()
  }
}
