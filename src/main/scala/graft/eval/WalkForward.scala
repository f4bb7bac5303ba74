package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The walk-forward stage 1–4 orchestrator (eval/walk_forward.py:714-987,
  * scripts/walk_forward_barriers.py:180-380): per-(barrier, fold) OOS
  * metrics → Vorob'ev fold-stability (E23) → CPCV + PBO screening (E18,
  * E21) → GT-composite ranking (E25) for the final survivors.
  *
  * Scale split, mirroring [[EvalPipeline]]: fold *construction* is
  * deterministic bar-index math (driver), fold *evaluation* is one
  * groupBy(barrier_id) shuffle with all per-fold metrics computed inside
  * the map — the driver only ever sees O(nBarriers × nFolds) metric rows.
  * The Vorob'ev / PBO / GT stages are driver-side over those rows, same
  * as the reference's numpy stage 4.
  */
object WalkForward {

  /** One (barrier, WFO fold) OOS evaluation — the columns stage 4 needs. */
  final case class FoldRow(barrierId: String, foldId: Int, nTrades: Int,
      omega: Double, rachev: Double, totalReturn: Double, avgReturn: Double,
      profitFactor: Double, maxDrawdown: Double)

  /** E23 fold-stability over the (omega, rachev, total_return) front —
    * distributional metrics only, ≤3D (walk_forward.py:714-725); negated
    * to minimization with a zero reference, as moocore expects. */
  final case class VorobStability(threshold: Double, deviation: Double,
      avgHyp: Double, hvPerFold: Array[Double], hvCv: Double,
      unstable: Boolean)

  final case class BarrierReport(barrierId: String, consistency: Double,
      avgOosOmega: Double, avgOosRachev: Double, avgOosPf: Double,
      omegaCv: Double, medianMaxDrawdown: Double, foldSharpe: Double,
      pbo: Double, pboPass: Boolean, survived: Boolean,
      gtComposite: Option[Double])

  final case class Stage4Report(foldRows: Seq[FoldRow],
      vorob: Option[VorobStability], vorobSkipReason: Option[String],
      topBarriers: Seq[BarrierReport], finalBarrierIds: Seq[String],
      // Some(reason) when stage 2 never ran (too few screened barriers /
      // signals): every barrier then fails the PBO gate BY CONSTRUCTION,
      // which is the reference's own behavior (empty pbo_scores → no
      // survivors) but was indistinguishable from "all barriers measured
      // overfit" in the report (r13 review) — the same diagnosability
      // contract vorobSkipReason already provides
      pboSkipReason: Option[String] = None)

  /** Full stage 1–4 run.
    *
    * @param trades (barrier_id, signal_idx, return_pct) — one row per
    *   executed trade; signals with no trade for a barrier are absent
    *   (NaN in the reference's dense matrix).
    * @param nSignals total signal count (dense index space [0, nSignals))
    * @param bootstrapRejected stage-3 verdicts (E22 bootstrap CI gate) —
    *   supplied by the caller because the reference screens with
    *   per-barrier omega CIs computed upstream; defaults to none rejected.
    */
  def run(trades: DataFrame, nSignals: Int, screenTopK: Int = 25,
      purgeBars: Int = 100,
      bootstrapRejected: Map[String, Boolean] = Map.empty): Stage4Report = {
    val spark = trades.sparkSession
    import spark.implicits._

    val folds = Folds.buildWfoFolds(nSignals, purgeBars = purgeBars)

    // one shuffle: per-barrier dense return vector assembled and evaluated
    // on the executors, emitting only the per-fold metric rows
    val foldRows: Seq[FoldRow] = trades
      .groupBy(col("barrier_id"))
      .agg(collect_list(struct(col("signal_idx").cast("int"),
        col("return_pct").cast("double"))).as("trs"))
      .as[(String, Seq[(Int, Double)])]
      .flatMap { case (bid, trs) =>
        val dense = Array.fill(nSignals)(Double.NaN)
        trs.foreach { case (i, r) => if (i >= 0 && i < nSignals) dense(i) = r }
        folds.zipWithIndex.map { case ((_, test), foldId) =>
          val r = test.map(dense).filterNot(_.isNaN)
          val m = Folds.foldMetrics(r)
          FoldRow(bid, foldId, m.nTrades, m.omega, m.rachev, m.totalReturn,
            m.avgReturn, m.profitFactor, m.maxDrawdown)
        }
      }
      .collect().toSeq.sortBy(r => (r.barrierId, r.foldId))

    // --- Stage 1: top-K by median OOS omega
    val omegasByBid = foldRows.groupBy(_.barrierId)
      .map { case (bid, rs) =>
        bid -> Folds.median(rs.map(_.omega).sorted.toArray)
      }
    val topBids = omegasByBid.toSeq.sortBy { case (bid, o) => (-o, bid) }
      .take(screenTopK).map(_._1)

    // --- Vorob'ev stability (walk_forward.py:775-905): benefit metrics
    // negated, ref = zeros; skip marker instead of a bare None.
    // Computed over the SCREENED candidates' fold fronts — identical to
    // the all-candidates form whenever nBarriers ≤ screenTopK (every
    // spec/golden case), and the bound that keeps the driver-side EAF
    // grid independent of the barrier-axis width at rehearsal scale.
    val topSet = topBids.toSet
    val vorobRows = foldRows.filter(r => topSet(r.barrierId))
    val (vorob, vorobSkip) =
      if (vorobRows.length < 3) (None, Some("insufficient_data"))
      else {
        val byFold = vorobRows.groupBy(_.foldId).toSeq.sortBy(_._1)
        val fronts = byFold.map(_._2.map(r =>
          Array(-r.omega, -r.rachev, -r.totalReturn)).toArray).toArray
        val ref = Array(0.0, 0.0, 0.0)
        val vt = Pareto.vorobT(fronts, ref)
        val vd = Pareto.vorobDev(fronts, vt.expectation, ref)
        val fs = Pareto.foldStability(fronts, ref)
        val hvCv = if (fs.meanHv > 1e-12) fs.stdHv / fs.meanHv
          else Double.PositiveInfinity
        (Some(VorobStability(vt.threshold, vd, vt.avgHyp, fs.perFold, hvCv,
          unstable = vd > 10.0)), None)
      }

    // --- Stage 2: CPCV + nested selection + PBO over the screened set
    // (cpcv_n_folds = max(6, min(12, n/200)), walk_forward_barriers.py:301)
    val pboSkip: Option[String] =
      if (topBids.length < 3) Some("too_few_screened_barriers")
      else if (nSignals < 100) Some("too_few_signals")
      else None
    val pboScores: Map[String, Double] =
      if (pboSkip.isEmpty) {
        val cpcvNFolds = math.max(6, math.min(12, nSignals / 200))
        // per-barrier dense vectors for the screened set only — bounded
        // collect, O(topK × nSignals)
        val screened = trades
          .filter(col("barrier_id").isInCollection(topBids))
          .groupBy(col("barrier_id"))
          .agg(collect_list(struct(col("signal_idx").cast("int"),
            col("return_pct").cast("double"))).as("trs"))
          .as[(String, Seq[(Int, Double)])]
          .collect()
          .map { case (bid, trs) =>
            val dense = Array.fill(nSignals)(Double.NaN)
            trs.foreach { case (i, r) => if (i >= 0 && i < nSignals) dense(i) = r }
            bid -> dense
          }.toMap
        val nested = Folds.nestedCpcv(screened, nSignals,
          nFolds = cpcvNFolds, purgeBars = purgeBars)
        val foldOmegas = nested.flatMap { case (_, sel) =>
          sel.map { case (bid, m) => bid -> m.omega }
        }.groupBy(_._1).map { case (bid, xs) => bid -> xs.map(_._2) }
        Folds.pboFromCpcv(foldOmegas)
      } else Map.empty

    // --- Stage 3 verdicts + final survivors
    val finalBids = topBids.filter { bid =>
      pboScores.get(bid).exists(_ < 0.50) && !bootstrapRejected.getOrElse(bid, false)
    }

    // --- Stage 4: GT-composite from OOS fold-level avg returns
    // (walk_forward_barriers.py:296-334): DSR with n_trials = survivors,
    // population moments (scipy biased defaults), median omega / maxDD
    val nSurvivors = math.max(finalBids.length, 2)
    val gtScores: Map[String, Double] = finalBids.map { bid =>
      val rs = foldRows.filter(_.barrierId == bid)
      val arr = rs.map(_.avgReturn).toArray
      val gt =
        if (arr.length < 3) 0.0
        else {
          val sd = Stats.stdPop(arr)
          val sr = if (sd > 1e-12) Stats.mean(arr) / sd else 0.0
          val se = Stats.srStandardError(sr, arr.length,
            skewPop(arr), kurtRawPop(arr))
          val srStar = Stats.expectedMaxSr(nSurvivors, 1.0)
          val dsr = Stats.psr(sr, srStar, se)
          val omegaMed = Folds.median(rs.map(_.omega).sorted.toArray)
          val mddMed = Folds.median(rs.map(_.maxDrawdown).sorted.toArray)
          Folds.gtComposite(omegaMed, dsr, pboScores.getOrElse(bid, 0.5), mddMed)
        }
      bid -> gt
    }.toMap

    // --- top-barrier annotations (walk_forward_barriers.py:336-369)
    val reports = topBids.map { bid =>
      val rs = foldRows.filter(_.barrierId == bid)
      val n = rs.length
      val omegas = rs.map(_.omega)
      val omegaMean = if (n > 0) omegas.sum / n else 0.0
      val omegaCv =
        if (omegaMean > 1e-12) {
          val sd = Stats.stdPop(omegas.toArray)
          sd / omegaMean
        } else Double.PositiveInfinity
      val avgRets = rs.map(_.avgReturn).toArray
      val sdR = Stats.stdPop(avgRets)
      val foldSharpe =
        if (n > 1 && sdR > 1e-12) Stats.mean(avgRets) / sdR else 0.0
      BarrierReport(bid,
        consistency = if (n > 0) omegas.count(_ > 1.0).toDouble / n else 0.0,
        avgOosOmega = omegaMean,
        avgOosRachev = if (n > 0) rs.map(_.rachev).sum / n else 0.0,
        avgOosPf = if (n > 0) rs.map(_.profitFactor).filterNot(_.isNaN) match {
          case Seq() => 0.0
          case ps => ps.sum / ps.length
        } else 0.0,
        omegaCv = omegaCv,
        medianMaxDrawdown =
          if (n > 0) Folds.median(rs.map(_.maxDrawdown).sorted.toArray) else 0.0,
        foldSharpe = foldSharpe,
        pbo = pboScores.getOrElse(bid, -1.0),
        pboPass = pboScores.get(bid).exists(_ < 0.50),
        survived = finalBids.contains(bid),
        gtComposite = gtScores.get(bid))
    }.sortBy(r => (-r.gtComposite.getOrElse(-1.0), r.barrierId))

    Stage4Report(foldRows, vorob, vorobSkip, reports, finalBids, pboSkip)
  }

  /** Population (biased) skewness — scipy.stats.skew default. */
  def skewPop(xs: Array[Double]): Double = {
    val m = Stats.mean(xs)
    val n = xs.length
    val m2 = xs.map(x => (x - m) * (x - m)).sum / n
    val m3 = xs.map(x => math.pow(x - m, 3)).sum / n
    if (m2 <= 0) 0.0 else m3 / math.pow(m2, 1.5)
  }

  /** Population raw (non-excess) kurtosis — scipy kurtosis(fisher=False). */
  def kurtRawPop(xs: Array[Double]): Double = {
    val m = Stats.mean(xs)
    val n = xs.length
    val m2 = xs.map(x => (x - m) * (x - m)).sum / n
    val m4 = xs.map(x => math.pow(x - m, 4)).sum / n
    if (m2 <= 0) 3.0 else m4 / (m2 * m2)
  }
}
