package graft.eval

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** The full statistical-validation pipeline (SURVEY.md §3.2: the
  * `mise run eval:full` DAG) as one composable call: per-config trade
  * returns → per-config metrics (computed ON THE EXECUTORS inside the
  * per-config map stage) → cross-config procedures (CSCV/PBO from
  * per-block sufficient stats, Romano-Wolf on a bounded candidate set,
  * e-BH — driver-side on O(nConfigs) scalars) → composite ranking
  * (TOPSIS + tiers).
  *
  * Input trades frame: (config_id: String, ts_us: Long, return_pct:
  * Double). Scale split (the 10⁴–10⁵-config sweep target):
  *  - one shuffle groups trades by config; every per-config metric
  *    (Sharpe moments, Omega, Rachev, CDaR, PSR, e-values, KDE
  *    regularity, rolling per-trade OU) is computed inside that map —
  *    the driver never sees a per-trade array for these;
  *  - CSCV needs only per-(config, block) (n, Σr, Σr²), O(nConfigs·S);
  *  - Romano-Wolf genuinely needs return vectors (max-t bootstrap) but
  *    only for the candidate set — the driver collects the top
  *    `rwMaxConfigs` configs by Sharpe, mirroring the reference's
  *    screen-then-test order;
  *  - DSR needs nTrials + varSr, both cross-config scalars → driver.
  */
object EvalPipeline {

  final case class ConfigReport(
      configId: String, nTrades: Int, sharpe: Double, omega: Double,
      rachev: Option[Double], cdar: Option[Double], psr: Double, dsr: Double,
      minBtl: Double, finalEvalue: Double, grow: Double,
      regularityCoverage: Option[Double], kelly: Double,
      tamrs: Option[Double], screenTier: Int, topsisScore: Double)

  final case class PipelineResult(
      reports: Seq[ConfigReport],
      cscvPbo: Double,
      romanoWolfRejected: Set[String],
      ebhDiscoveries: Int)

  /** Everything the driver needs per config — O(1) per config (the
    * nBlocks-length block-moment arrays are the largest field). */
  final case class ConfigStats(
      configId: String, n: Int, sharpe: Double, skew: Double, kurt: Double,
      omega: Double, rachev: Option[Double], cdar: Option[Double],
      psr: Double, finalEvalue: Double, grow: Double,
      regularityCoverage: Option[Double], regularityCv: Option[Double],
      kelly: Double, ouRatio: Option[Double],
      blockN: Array[Long], blockSum: Array[Double], blockSumSq: Array[Double])

  /** Distributed per-config stage: one shuffle (groupBy config), then all
    * per-config math runs in the map over the grouped arrays. Public so
    * the plan is testable: the returned Dataset's plan must contain the
    * aggregate, and its row count is nConfigs — collecting it is the
    * ONLY driver materialization the pipeline does (besides the bounded
    * Romano-Wolf candidate collect).
    *
    * `ouBars`: optional (ts_us, close) bar series for E7 per-trade
    * rolling OU calibration (eval/ou_barriers.py:66-101); broadcast to
    * executors, per-config ratio = median of per-trade ratios.
    */
  def perConfigStats(trades: DataFrame,
      nBlocks: Int, tsMin: Long, tsMax: Long,
      ouBars: Option[DataFrame] = None, empiricalTpFrac: Double = 0.025,
      ouLookback: Int = 1000): Dataset[ConfigStats] = {
    val spark = trades.sparkSession
    import spark.implicits._
    // The bar series is collected + broadcast: ~16 MB per 10⁶ bars, fine
    // for the reference's single-symbol series. A corpus-scale bar table
    // (10⁹+ rows) would need a range-join of trades to bar windows
    // instead — the broadcast keeps per-trade calibration O(lookback)
    // with zero shuffle, which is the right trade at this shape.
    val barsBc = ouBars.map { b =>
      val arr = b.select(col("ts_us").cast("long"), col("close").cast("double"))
        .orderBy(col("ts_us")).collect()
        .map(r => (r.getLong(0), r.getDouble(1)))
      spark.sparkContext.broadcast((arr.map(_._1), arr.map(_._2)))
    }
    Extraction.returnsArrays(trades, col("config_id"))
      .select(col("config_id"), col("returns"), col("close_times_us"))
      .as[(String, Seq[Double], Seq[Long])]
      .map { case (cid, retsSeq, tsSeq) =>
        val rets = retsSeq.toArray
        val ts = tsSeq.toArray
        val n = rets.length
        val sr =
          if (n > 1 && Stats.stdSamp(rets) > 0) Stats.mean(rets) / Stats.stdSamp(rets)
          else 0.0
        val skew = if (n > 2) Stats.skewSamp(rets) else 0.0
        val kurt = if (n > 3) Stats.kurtRawSamp(rets) else 3.0
        val se = Stats.srStandardError(sr, n, skew, kurt)
        val winRate = rets.count(_ > 0).toDouble / math.max(1, n)
        val avgWin = { val w = rets.filter(_ > 0); if (w.nonEmpty) w.sum / w.length else 0.0 }
        val avgLoss = { val l = rets.filter(_ < 0); if (l.nonEmpty) l.sum / l.length else 0.0 }
        val kelly =
          if (avgLoss == 0.0 || avgWin == 0.0) 0.0
          else Stats.kellyFraction(winRate, avgWin / math.abs(avgLoss))
        val ev = Stats.evalues(rets, kelly)
        val reg = Regularity.compute(ts.map(_ / 1000L))
        // E7: per-trade rolling OU ratios against the broadcast bar series;
        // per-config ratio = median of the defined per-trade ratios
        // (ou_barriers.py:176-180)
        val ouRatio = barsBc.flatMap { bc =>
          val (barTs, barCloses) = bc.value
          val ratios = Stats.rollingOuRatios(barTs, barCloses, ts,
            empiricalTpFrac, ouLookback).flatten
          if (ratios.isEmpty) None
          else {
            val s = ratios.sorted
            Some(if (s.length % 2 == 1) s(s.length / 2)
            else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0)
          }
        }
        // CSCV block sufficient stats (same binning as Resampling.assignBlocks)
        val bn = new Array[Long](nBlocks)
        val bs = new Array[Double](nBlocks)
        val bq = new Array[Double](nBlocks)
        if (tsMax > tsMin) {
          val blockSize = (tsMax - tsMin).toDouble / nBlocks
          var i = 0
          while (i < n) {
            val b = math.min(((ts(i) - tsMin) / blockSize).toInt, nBlocks - 1)
            bn(b) += 1L; bs(b) += rets(i); bq(b) += rets(i) * rets(i)
            i += 1
          }
        }
        ConfigStats(cid, n, sr, skew, kurt,
          Stats.omega(rets), Stats.rachev(rets), Stats.cdar(rets),
          Stats.psr(sr, 0.0, se),
          ev.finalEvalue, ev.grow,
          reg.map(_.temporalCoverage), reg.flatMap(_.kdePeakCv),
          kelly, ouRatio, bn, bs, bq)
      }
  }

  /** @param varSrEmpirical reference parity is varSr = 1.0 (eval/dsr.py:62);
    *   the cross-config empirical Sharpe variance is an opt-in refinement.
    * @param ouBars optional (ts_us, close) bar series: enables E7 rolling
    *   per-trade OU calibration; otherwise the scalar `ouRatio` is used.
    * @param rwMaxConfigs Romano-Wolf candidate-set bound: when more
    *   configs than this survive the n≥10 floor, only the strongest (by
    *   Sharpe) are tested — the max-t bootstrap needs their full return
    *   vectors on the driver, so the collect must stay bounded.
    * @param ouDistributed when true the per-trade OU ratios come from
    *   [[OuRangeJoin]] (chunked range join — the bar table is never
    *   collected or broadcast) instead of the broadcast-series path;
    *   identical ratios, different scale envelope. Use for bar tables
    *   too large to broadcast (≳10⁷ rows).
    */
  def run(trades: DataFrame, slEmp: Double = 0.0125, ouRatio: Double = 1.0,
      nBlocks: Int = 8, nBootstrap: Int = 500,
      varSrEmpirical: Boolean = false, rwMaxConfigs: Int = 256,
      ouBars: Option[DataFrame] = None, empiricalTpFrac: Double = 0.025,
      ouLookback: Int = 1000, ouDistributed: Boolean = false): PipelineResult = {
    // cross-config time range for CSCV block binning (one tiny agg job)
    val range = trades.agg(min(col("ts_us")), max(col("ts_us"))).collect().head
    val (tsMin, tsMax) =
      if (range.isNullAt(0)) (0L, 0L) else (range.getLong(0), range.getLong(1))

    // distributed OU path: per-config medians from the chunked range join,
    // merged into the collected stats (O(nConfigs) rows); the broadcast
    // path stays inside perConfigStats
    val ouOverride: Map[String, Double] =
      if (ouDistributed && ouBars.isDefined)
        OuRangeJoin.perConfigMedians(ouBars.get, trades, empiricalTpFrac, ouLookback)
          .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      else Map.empty

    val stats = perConfigStats(trades, nBlocks, tsMin, tsMax,
      if (ouDistributed) None else ouBars, empiricalTpFrac, ouLookback)
      .collect()
      .sortBy(_.configId)
      .map(s =>
        if (ouDistributed) s.copy(ouRatio = ouOverride.get(s.configId)) else s)

    val nTrials = math.max(stats.length, 2)
    val varSr =
      if (!varSrEmpirical) 1.0 // eval/dsr.py:62 pins var_sr = 1.0
      else {
        val sharpes = stats.map(_.sharpe)
        val m = sharpes.sum / sharpes.length
        val v = sharpes.map(s => (s - m) * (s - m)).sum / math.max(1, sharpes.length - 1)
        math.max(v, 1e-12)
      }

    val reports = stats.map { s =>
      val slCdarRatio = s.cdar.map(c => if (c > 0) math.min(1.0, slEmp / c) else 1.0)
      val effOu = s.ouRatio.orElse(Some(ouRatio))
      ConfigReport(
        s.configId, s.n, s.sharpe, s.omega, s.rachev, s.cdar, s.psr,
        Stats.dsr(s.sharpe, s.n, s.skew, s.kurt, nTrials, varSr),
        Stats.minBtl(s.sharpe, nTrials, s.skew, s.kurt),
        s.finalEvalue, s.grow,
        s.regularityCoverage, s.kelly,
        Stats.tamrs(s.rachev, slCdarRatio, effOu),
        0, 0.0) // tier + topsis filled below
    }

    // CSCV from block sufficient stats — O(nConfigs × nBlocks) input
    val cscvPbo =
      if (tsMax <= tsMin || stats.length < 2) 0.0
      else Resampling.cscvFromBlockMoments(stats.map { s =>
        Array.tabulate(nBlocks)(b =>
          Resampling.BlockMoments(s.blockN(b), s.blockSum(b), s.blockSumSq(b)))
      }).pbo

    // Romano-Wolf on the bounded candidate set (full vectors required)
    val usable = stats.filter(_.n >= 10)
    val candidates =
      (if (usable.length <= rwMaxConfigs) usable
       else usable.sortBy(-_.sharpe).take(rwMaxConfigs).sortBy(_.configId))
        .map(_.configId)
    val rejected =
      if (candidates.isEmpty) Set.empty[String]
      else {
        val candSet = candidates.toSet
        val vectors = Extraction.returnsArrays(
          trades.filter(col("config_id").isInCollection(candSet)), col("config_id"))
          .select(col("config_id"), col("returns"))
          .collect()
          .map(r => (r.getString(0), r.getSeq[Double](1).toArray))
          .sortBy(_._1)
        val rw = Resampling.romanoWolf(vectors.map(_._2), nBootstrap = nBootstrap)
        val usableIds = vectors.filter(_._2.length >= 10).map(_._1)
        rw.rejected.map(usableIds).toSet
      }
    val ebhK = Resampling.ebh(reports.map(_.finalEvalue))

    // composite ranking: TOPSIS over (omega↑, rachev↑, cdar↓, dsr↑)
    val matrix = reports.map { r =>
      Array(r.omega, r.rachev.getOrElse(0.0), r.cdar.getOrElse(0.0), r.dsr)
    }
    val topsis =
      if (reports.length >= 2)
        Ranking.topsis(matrix, Array(0.35, 0.25, 0.2, 0.2), Array(1, 1, -1, 1))
      else Array.fill(reports.length)(0.5)
    val finalReports = reports.zipWithIndex.map { case (r, i) =>
      val s = stats(i)
      val tier = Ranking.screenTier(Ranking.ScreenInput(
        r.tamrs, r.rachev, s.ouRatio.orElse(Some(ouRatio)),
        s.regularityCv, r.regularityCoverage))
      r.copy(screenTier = tier, topsisScore = topsis(i))
    }
    PipelineResult(finalReports.toSeq, cscvPbo, rejected, ebhK)
  }
}
