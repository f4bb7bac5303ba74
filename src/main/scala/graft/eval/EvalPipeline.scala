package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full statistical-validation pipeline (SURVEY.md §3.2: the
  * `mise run eval:full` DAG) as one composable call: per-config trade
  * returns → per-config metrics (Spark-parallel) → cross-config
  * procedures (CSCV/PBO, Romano-Wolf, e-BH — driver-side on the collected
  * matrix, which is small by construction) → composite ranking (TOPSIS +
  * tiers + percentile ranks).
  *
  * Input trades frame: (config_id: String, ts_us: Long, return_pct:
  * Double). The per-config stage is a mapGroups-style collect per config;
  * everything cross-config operates on ≤ ~10⁵ small records driver-side —
  * the same split the reference uses (its metric modules are
  * single-process numpy over JSONL).
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

  def run(trades: DataFrame, slEmp: Double = 0.0125, ouRatio: Double = 1.0,
      nBlocks: Int = 8, nBootstrap: Int = 500): PipelineResult = {
    // per-config ordered return arrays (one shuffle, then driver-side math
    // on the small per-config records)
    val collected = Extraction.returnsArrays(trades, col("config_id"))
      .select("config_id", "returns", "close_times_us")
      .collect()
      .map { r =>
        (r.getString(0), r.getSeq[Double](1).toArray, r.getSeq[Long](2).toArray)
      }
      .sortBy(_._1)

    val nTrials = math.max(collected.length, 2)
    val sharpes = collected.map { case (_, rets, _) =>
      if (rets.length > 1 && Stats.stdSamp(rets) > 0) Stats.mean(rets) / Stats.stdSamp(rets)
      else 0.0
    }
    val varSr = {
      val m = sharpes.sum / sharpes.length
      val v = sharpes.map(s => (s - m) * (s - m)).sum / math.max(1, sharpes.length - 1)
      math.max(v, 1e-12)
    }

    val reports = collected.zipWithIndex.map { case ((cid, rets, ts), i) =>
      val n = rets.length
      val sr = sharpes(i)
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
      val rachev = Stats.rachev(rets)
      val cdar = Stats.cdar(rets)
      val slCdarRatio = cdar.map(c => if (c > 0) math.min(1.0, slEmp / c) else 1.0)
      val reg = Regularity.compute(ts.map(_ / 1000L))
      ConfigReport(
        cid, n, sr, Stats.omega(rets), rachev, cdar,
        Stats.psr(sr, 0.0, se),
        Stats.dsr(sr, n, skew, kurt, nTrials, varSr),
        Stats.minBtl(sr, nTrials, skew, kurt),
        ev.finalEvalue, ev.grow,
        reg.map(_.temporalCoverage), kelly,
        Stats.tamrs(rachev, slCdarRatio, Some(ouRatio)),
        0, 0.0) // tier + topsis filled below
    }

    // cross-config: CSCV over time blocks
    val allTs = collected.flatMap(_._3)
    val cscvPbo =
      if (allTs.isEmpty || collected.length < 2) 0.0
      else {
        val tsMin = allTs.min; val tsMax = allTs.max
        if (tsMax <= tsMin) 0.0
        else Resampling.cscv(
          collected.map { case (_, rets, ts) =>
            Resampling.assignBlocks(rets, ts, tsMin, tsMax, nBlocks)
          },
          Resampling.sharpeRanker).pbo
      }

    val rw = Resampling.romanoWolf(collected.map(_._2), nBootstrap = nBootstrap)
    val usableIds = collected.filter(_._2.length >= 10).map(_._1)
    val rejected = rw.rejected.map(usableIds).toSet
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
      val tier = Ranking.screenTier(Ranking.ScreenInput(
        r.tamrs, r.rachev, Some(ouRatio), None, r.regularityCoverage))
      r.copy(screenTier = tier, topsisScore = topsis(i))
    }
    PipelineResult(finalReports.toSeq, cscvPbo, rejected, ebhK)
  }
}
