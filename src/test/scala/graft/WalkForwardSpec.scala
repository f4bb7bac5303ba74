package graft

import org.apache.spark.sql.functions._
import graft.eval.{Folds, Stats, WalkForward}

/** Stage 1–4 walk-forward orchestrator (E17+E18+E21+E23+E25 composed):
  * per-(barrier, fold) OOS metrics on executors, Vorob'ev stability over
  * the multi-fold (omega, rachev, total_return) fronts, CPCV PBO
  * screening, GT-composite ranking.
  */
class WalkForwardSpec extends GraftSuite {
  import spark.implicits._

  // 3000 signals → 10 WFO folds (test size 200, rolling train 1000);
  // noise is 2x the drift so every fold sees both gains and losses
  // (a loss-free fold would make omega infinite and the negated
  // hypervolume NaN)
  private val nSignals = 3000
  private val rng = new scala.util.Random(19)
  // five barriers with clearly separated profiles; every barrier trades
  // every signal (dense), so fold metrics are deterministic given the seed
  private val profiles: Seq[(String, () => Double)] = Seq(
    "good" -> (() => 0.005 + rng.nextGaussian() * 0.01),
    "good2" -> (() => 0.004 + rng.nextGaussian() * 0.01),
    "mid" -> (() => 0.001 + rng.nextGaussian() * 0.01),
    "mid2" -> (() => 0.0005 + rng.nextGaussian() * 0.01),
    "bad" -> (() => -0.005 + rng.nextGaussian() * 0.01))
  private val returnsByBid: Map[String, Array[Double]] =
    profiles.map { case (bid, gen) => bid -> Array.fill(nSignals)(gen()) }.toMap

  private lazy val trades = returnsByBid.toSeq.flatMap { case (bid, rs) =>
    rs.zipWithIndex.map { case (r, i) => (bid, i, r) }
  }.toDF("barrier_id", "signal_idx", "return_pct")

  private lazy val report = WalkForward.run(trades, nSignals, screenTopK = 3)

  test("fold rows: one per (barrier, fold), metrics match a local replay") {
    val folds = Folds.buildWfoFolds(nSignals)
    assert(folds.length >= 2)
    assert(report.foldRows.length === profiles.length * folds.length)
    // cross-check an arbitrary row against driver-side foldMetrics
    val (_, test1) = folds(1)
    val want = Folds.foldMetrics(test1.map(returnsByBid("good")))
    val got = report.foldRows.find(r => r.barrierId == "good" && r.foldId == 1).get
    assert(got.nTrades === want.nTrades)
    assert(math.abs(got.omega - want.omega) < 1e-12)
    assert(math.abs(got.totalReturn - want.totalReturn) < 1e-12)
    assert(math.abs(got.maxDrawdown - want.maxDrawdown) < 1e-12)
  }

  test("q56's SQL fold assignment equals Folds.buildWfoFolds index-for-index") {
    val perSeries = queries.EventBars.bars(spark, sf)
      .filter(col("open") =!= 0.0)
      .withColumn("r", (col("close") - col("open")) / col("open"))
      .select(col("event_type"), col("ts_us"), col("event_id"), col("r"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
        .map(_.getAs[Double]("r")).toArray).toMap
    val got = queries.EvalQueries.q56WfoFoldMetrics(spark, sf).collect()
      .groupBy(_.getAs[String]("event_type"))
    perSeries.foreach { case (et, rs) =>
      val folds = Folds.buildWfoFolds(rs.length)
      val rows = got.getOrElse(et, Array.empty).sortBy(_.getAs[Long]("fold"))
      assert(rows.length == folds.length, s"$et fold count")
      folds.zip(rows).foreach { case ((_, test), row) =>
        assert(row.getAs[Long]("n_test") == test.length)
        val r = test.map(rs)
        val wins = r.map(math.max(_, 0.0)).sum
        val losses = r.map(x => math.max(-x, 0.0)).sum
        val pf = if (losses == 0.0) { if (wins > 0.0) 10.0 else Double.NaN }
          else math.min(wins / losses, 10.0)
        assert(math.abs(row.getAs[Double]("win_rate") -
          r.count(_ > 0).toDouble / r.length) < 1e-4 + 1e-12)
        if (!pf.isNaN)
          assert(math.abs(row.getAs[Double]("pf") - pf) < 1e-4 + 1e-12)
        assert(math.abs(row.getAs[Double]("total_ret") - r.sum) < 1e-6 + 1e-12)
      }
    }
  }

  test("q58's SQL CPCV folds equal Folds.buildCpcvFolds combo-for-combo") {
    val perSeries = queries.EventBars.bars(spark, sf)
      .filter(col("open") =!= 0.0)
      .withColumn("r", (col("close") - col("open")) / col("open"))
      .select(col("event_type"), col("ts_us"), col("event_id"), col("r"))
      .collect()
      .groupBy(_.getAs[String]("event_type"))
      .view.mapValues(_.sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
        .map(_.getAs[Double]("r")).toArray).toMap
    val got = queries.EvalQueries.q58CpcvFoldMetrics(spark, sf).collect()
      .groupBy(_.getAs[String]("event_type"))
    perSeries.foreach { case (et, rs) =>
      val folds = Folds.buildCpcvFolds(rs.length)
      val rows = got.getOrElse(et, Array.empty).sortBy(_.getAs[Int]("combo_id"))
      assert(rows.length == folds.length, s"$et combo count")
      folds.zip(rows).foreach { case ((train, test), row) =>
        assert(row.getAs[Long]("n_test") == test.length)
        assert(row.getAs[Long]("n_train") == train.length,
          s"$et combo ${row.getAs[Int]("combo_id")} train size")
        val r = test.map(rs)
        assert(math.abs(row.getAs[Double]("test_total_ret") - r.sum) < 1e-6 + 1e-12)
        val wins = r.map(math.max(_, 0.0)).sum
        val losses = r.map(x => math.max(-x, 0.0)).sum
        if (losses > 0.0)
          assert(math.abs(row.getAs[Double]("test_pf") -
            math.min(wins / losses, 10.0)) < 1e-4 + 1e-12)
      }
    }
  }

  test("q59's SQL CSCV equals Resampling.cscv split-for-split") {
    import graft.eval.Resampling
    val rows = queries.EventBars.bars(spark, sf)
      .filter(col("open") =!= 0.0)
      .withColumn("r", (col("close") - col("open")) / col("open"))
      .select(col("event_type"), col("ts_us"), col("r"))
      .collect()
    val tsMin = rows.map(_.getAs[Long]("ts_us")).min
    val tsMax = rows.map(_.getAs[Long]("ts_us")).max
    val configs = rows.map(_.getAs[String]("event_type")).distinct.sorted
    val blockReturns = configs.map { et =>
      val rs = rows.filter(_.getAs[String]("event_type") == et)
      Resampling.assignBlocks(rs.map(_.getAs[Double]("r")),
        rs.map(_.getAs[Long]("ts_us")), tsMin, tsMax, 8)
    }
    val want = Resampling.cscv(blockReturns, Resampling.sharpeRanker)
    val got = queries.EvalQueries.q59CscvPbo(spark, sf).collect()
      .sortBy(_.getAs[Int]("split_id"))
    assert(got.length == want.oosRanks.length)
    got.zipWithIndex.foreach { case (row, s) =>
      assert(row.getAs[String]("winner") == configs(want.isWinnerPerSplit(s)),
        s"split $s winner")
      assert(math.abs(row.getAs[Double]("oos_rank") - want.oosRanks(s)) < 1e-4,
        s"split $s rank")
    }
    val pbo = got.count(_.getAs[Boolean]("below_median")).toDouble / got.length
    assert(math.abs(pbo - want.pbo) < 1e-12)
  }

  test("Vorob'ev stability is computed over the multi-fold fronts") {
    val v = report.vorob.getOrElse(fail(s"skipped: ${report.vorobSkipReason}"))
    assert(v.threshold > 0.0 && v.threshold <= 100.0)
    assert(v.deviation >= 0.0)
    val folds = Folds.buildWfoFolds(nSignals)
    assert(v.hvPerFold.length === folds.length)
    // avgHyp is by definition the mean of the per-fold hypervolumes
    assert(math.abs(v.avgHyp - v.hvPerFold.sum / v.hvPerFold.length) < 1e-9)
    assert(v.hvCv >= 0.0)
  }

  test("stage 1 screening keeps the top-K by median OOS omega") {
    assert(report.topBarriers.length === 3)
    val ids = report.topBarriers.map(_.barrierId).toSet
    assert(ids.contains("good") && ids.contains("good2"))
    assert(!ids.contains("bad"))
    // strong-drift barrier beats omega 1 in most folds
    val good = report.topBarriers.find(_.barrierId == "good").get
    assert(good.consistency >= 0.8)
    assert(good.avgOosOmega > 1.0)
  }

  test("stage 2-4: PBO in range, survivors carry a reproducible GT score") {
    report.topBarriers.foreach { r =>
      if (r.pbo >= 0.0) assert(r.pbo <= 1.0)
      assert(r.survived === report.finalBarrierIds.contains(r.barrierId))
      assert(r.gtComposite.isDefined === r.survived)
    }
    // GT ranking sorted descending among survivors
    val gts = report.topBarriers.flatMap(_.gtComposite)
    assert(gts === gts.sorted.reverse)
    // replay GT for one survivor from the fold rows (population moments,
    // n_trials = survivor count, median omega / maxDD)
    for (bid <- report.finalBarrierIds.headOption) {
      val rs = report.foldRows.filter(_.barrierId == bid)
      val arr = rs.map(_.avgReturn).toArray
      val sd = Stats.stdPop(arr)
      val sr = if (sd > 1e-12) Stats.mean(arr) / sd else 0.0
      val se = Stats.srStandardError(sr, arr.length,
        WalkForward.skewPop(arr), WalkForward.kurtRawPop(arr))
      val srStar = Stats.expectedMaxSr(math.max(report.finalBarrierIds.length, 2), 1.0)
      val dsr = Stats.psr(sr, srStar, se)
      val omegaMed = Folds.median(rs.map(_.omega).sorted.toArray)
      val mddMed = Folds.median(rs.map(_.maxDrawdown).sorted.toArray)
      val pbo = report.topBarriers.find(_.barrierId == bid).get.pbo
      val want = Folds.gtComposite(omegaMed, dsr, pbo, mddMed)
      val got = report.topBarriers.find(_.barrierId == bid).get.gtComposite.get
      assert(math.abs(got - want) < 1e-12, s"$bid: $got vs $want")
    }
  }

  test("a skipped stage-2 PBO is reported as pboSkipReason, not as " +
    "'every barrier measured overfit'") {
    import spark.implicits._
    // two barriers only → stage 2 cannot run (needs ≥3 screened); the
    // reference's empty pbo_scores reject everything, which is correct,
    // but the report must say WHY (r13 review — the vorobSkipReason
    // contract applied to the PBO gate)
    val rnd = new scala.util.Random(3)
    val small = Seq("a", "b").flatMap { bid =>
      (0 until 1200).map(i => (bid, i, 0.001 + rnd.nextGaussian() * 0.01))
    }.toDF("barrier_id", "signal_idx", "return_pct")
    val rep = WalkForward.run(small, nSignals = 1200, screenTopK = 3)
    assert(rep.pboSkipReason.contains("too_few_screened_barriers"), rep.pboSkipReason)
    assert(rep.finalBarrierIds.isEmpty)
    assert(rep.topBarriers.forall(_.pbo == -1.0))
    // the full fixture (3+ barriers) runs stage 2 and reports no skip
    assert(report.pboSkipReason.isEmpty)
  }
}
