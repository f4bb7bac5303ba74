package graft

import org.apache.spark.sql.functions._
import graft.eval.Ranking
import graft.queries.McdmQueries

/** The gen720 MCDM pack (q131-q136), gen800 stagnation ranking (q137)
  * and rank-objective layer (q138): hand-computed golden fixtures for
  * the eval/Ranking library additions (the E16/E26 discipline), plus
  * query-vs-library parity on the engine's own outputs. The DuckDB
  * oracle pins engine-vs-engine parity; this spec pins the METHOD
  * semantics against fixtures small enough to verify by hand.
  */
class McdmSpec extends GraftSuite {

  // ---------------------------------------------------------------------------
  // Kendall tau-b goldens (scipy.stats.kendalltau semantics)

  test("kendallTau: identity, reversal, the classic 8C-2D case, and ties") {
    assert(Ranking.kendallTau(Array(1, 2, 3, 4), Array(1, 2, 3, 4)) == 1.0)
    assert(Ranking.kendallTau(Array(1, 2, 3, 4), Array(4, 3, 2, 1)) == -1.0)
    // hand count: C=8, D=2 over 10 pairs -> (8-2)/10 = 0.6
    assert(math.abs(Ranking.kendallTau(
      Array(1, 2, 3, 4, 5), Array(1, 3, 2, 5, 4)) - 0.6) < 1e-12)
    // tie in a: n0=6, n1=1, C=5, D=0 -> 5/sqrt(5*6) (scipy: 0.9128709291…)
    assert(math.abs(Ranking.kendallTau(Array(1, 2, 2, 3), Array(1, 2, 3, 4))
      - 5.0 / math.sqrt(30.0)) < 1e-12)
    // constant side -> NaN
    assert(Ranking.kendallTau(Array(1, 1, 1), Array(1, 2, 3)).isNaN)
  }

  // ---------------------------------------------------------------------------
  // Entropy-weight goldens (gen720:213-240)

  test("entropyWeights: flat columns get ~0 weight, all-flat splits equally") {
    // col 0 constant (zero divergence), col 1 fully discriminating
    val w = Ranking.entropyWeights(Array(
      Array(5.0, 0.0), Array(5.0, 0.5), Array(5.0, 1.0)))
    assert(math.abs(w.sum - 1.0) < 1e-12)
    assert(w(0) < 1e-6 && w(1) > 1.0 - 1e-6, w.mkString(","))
    // both columns flat -> total divergence 0 -> equal weights exactly
    val eq = Ranking.entropyWeights(Array(Array(1.0, 2.0), Array(1.0, 2.0)))
    assert(eq.toSeq == Seq(0.5, 0.5))
    // n=2 with both columns discriminating: divergences equal -> 0.5/0.5
    val two = Ranking.entropyWeights(Array(Array(0.0, 0.0), Array(1.0, 2.0)))
    assert(math.abs(two(0) - 0.5) < 1e-6 && math.abs(two(1) - 0.5) < 1e-6)
  }

  // ---------------------------------------------------------------------------
  // PROMETHEE-II goldens (gen720:295-328)

  test("prometheeII: hand-computed net flows on 1- and 2-criterion fixtures") {
    // one benefit criterion, values (0,1,2), q=0, p=range/4=0.5: every
    // upward difference saturates the linear preference -> net (-1, 0, 1)
    val net1 = Ranking.prometheeII(
      Array(Array(0.0), Array(1.0), Array(2.0)),
      Array(1), Array(0.0), Array(0.5))
    assert(net1.zip(Seq(-1.0, 0.0, 1.0)).forall { case (a, e) =>
      math.abs(a - e) < 1e-12 }, net1.mkString(","))
    // benefit + cost: alt 1 dominates (higher benefit, lower cost) -> +1/-1
    val net2 = Ranking.prometheeII(
      Array(Array(1.0, 5.0), Array(2.0, 3.0)),
      Array(1, -1), Array(0.0, 0.0), Array(0.25, 0.5))
    assert(math.abs(net2(0) + 1.0) < 1e-12 && math.abs(net2(1) - 1.0) < 1e-12)
  }

  // ---------------------------------------------------------------------------
  // Rank-objective goldens (rank_optimize.py:39-88) on a 3-config,
  // 2-metric fixture with hand-computed percentile ranks

  private val fixtureData: Map[String, Map[String, Option[Double]]] = Map(
    "a" -> Map("c1" -> Some(10.0), "c2" -> Some(20.0), "c3" -> Some(30.0)),
    "b" -> Map("c1" -> Some(3.0), "c2" -> Some(2.0), "c3" -> Some(1.0)))
  private val fixtureHib = Map("a" -> true, "b" -> true)

  test("objective functions reproduce hand-computed values on the fixture") {
    val cutoffs = Map("a" -> 50, "b" -> 100)
    val res = Ranking.survivorAnalysis(fixtureData, fixtureHib, cutoffs)
    // pct ranks a: 33.3333/66.6667/100; b: 100/66.6667/33.3333
    // a-cutoff 50 keeps pct>=50 -> {c2,c3}; b keeps all -> intersection 2
    assert(res.nIntersection == 2 && res.survivors == Seq("c2", "c3"))
    assert(math.abs(res.avgPercentile - 66.6667) < 1e-9)
    assert(res.nBindingMetrics == 1) // relaxing a grows 2 -> 3; b already 100
    assert(math.abs(Ranking.objMaxSurvivorsMinCutoff(res, cutoffs) - 2.0 / 75)
      < 1e-12)
    assert(math.abs(Ranking.objQualityAtTargetN(res, targetN = 10)
      - 66.6667 * 0.2) < 1e-9)
    assert(Ranking.objTightestNonempty(res, cutoffs) == 50.0)
    assert(Ranking.objDiversityReward(res, cutoffs) == 2.0)
    assert(Ranking.objParetoTriple(res, cutoffs) == ((2.0, 66.6667, 75.0)))
    // empty intersection zeroes every objective
    val none = Ranking.survivorAnalysis(fixtureData, fixtureHib,
      Map("a" -> 20, "b" -> 20)) // top-20% of each disagree -> empty
    assert(none.nIntersection == 0)
    assert(Ranking.objMaxSurvivorsMinCutoff(none, Map("a" -> 20, "b" -> 20)) == 0.0)
    assert(Ranking.objTightestNonempty(none, Map("a" -> 20, "b" -> 20)) == 0.0)
    assert(Ranking.objDiversityReward(none, Map("a" -> 20, "b" -> 20)) == 0.0)
  }

  test("searchCutoffs finds the known optimum deterministically") {
    // single metric: tightest_nonempty is maximized at the tightest grid
    // cutoff that keeps >=1 survivor — cutoff 5 keeps the top config
    val data = Map("a" -> Map(
      "c1" -> Some(1.0), "c2" -> Some(2.0), "c3" -> Some(3.0), "c4" -> Some(4.0)))
    val (cut, best) = Ranking.searchCutoffs(
      data, Map("a" -> true), (r, c) => Ranking.objTightestNonempty(r, c))
    assert(cut == Map("a" -> 5) && best == 95.0)
    // rerun is bit-identical (no RNG anywhere)
    assert(Ranking.searchCutoffs(
      data, Map("a" -> true), (r, c) => Ranking.objTightestNonempty(r, c))
      == ((cut, best)))
  }

  test("library invariants hold on randomized matrices (seeded)") {
    val rnd = new scala.util.Random(42L)
    for (trial <- 1 to 25) {
      val n = 2 + rnd.nextInt(30)
      val m = 1 + rnd.nextInt(6)
      val matrix = Array.fill(n, m)(math.rint(rnd.nextGaussian() * 1e4) / 1e4)
      val types = Array.fill(m)(if (rnd.nextBoolean()) 1 else -1)
      // entropy weights: a probability vector
      val w = Ranking.entropyWeights(matrix)
      assert(math.abs(w.sum - 1.0) < 1e-9 && w.forall(_ >= -1e-12),
        s"trial $trial: ${w.mkString(",")}")
      // TOPSIS closeness: bounded to [0, 1]
      val t = Ranking.topsis(matrix, w, types)
      assert(t.forall(v => v >= -1e-12 && v <= 1.0 + 1e-12), s"trial $trial")
      // PROMETHEE-II: net flows sum to zero (outgoing ≡ incoming in total)
      val ranges = (0 until m).map(j =>
        matrix.map(_(j)).max - matrix.map(_(j)).min).toArray
      val p = ranges.map(r => if (r / 4.0 == 0.0) 1.0 else r / 4.0)
      val net = Ranking.prometheeII(matrix, types, Array.fill(m)(0.0), p)
      assert(math.abs(net.sum) < 1e-9, s"trial $trial: Σnet = ${net.sum}")
      // Kendall tau: symmetric in its arguments, antisymmetric under
      // negation of one side
      val a = Array.fill(n)(rnd.nextDouble())
      val b = Array.fill(n)(rnd.nextDouble())
      val tab = Ranking.kendallTau(a, b)
      assert(math.abs(tab - Ranking.kendallTau(b, a)) < 1e-12)
      assert(math.abs(tab + Ranking.kendallTau(a, b.map(-_))) < 1e-12)
    }
  }

  // ---------------------------------------------------------------------------
  // Query-vs-library parity (the RankingQueriesSpec discipline): the
  // distributed forms and the golden-pinned imperative ports must agree
  // on the same inputs.

  private lazy val q131Rows =
    McdmQueries.q131EntropyTopsis(spark, sf).orderBy(col("bid")).collect()

  private def medMatrix: Array[Array[Double]] = q131Rows.map(r => Array(
    r.getAs[Double]("med_pf"), r.getAs[Double]("med_sharpe"),
    r.getAs[Double]("med_win_rate"), r.getAs[Double]("med_total_ret"),
    r.getAs[Double]("med_maxdd"), r.getAs[Double]("med_vol")))

  private val metricTypes = Array(1, 1, 1, 1, -1, -1)

  test("q131 closeness matches entropyWeights + topsis on its own medians") {
    val w = Ranking.entropyWeights(medMatrix)
    val expect = Ranking.topsis(medMatrix, w, metricTypes)
    q131Rows.zip(expect).foreach { case (r, e) =>
      assert(math.abs(r.getAs[Double]("score") - e) < 2e-6,
        s"${r.getAs[String]("bid")}: ${r.getAs[Double]("score")} vs $e")
    }
    val byRank = q131Rows.sortBy(_.getAs[Int]("rank"))
    assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to q131Rows.length))
  }

  test("q132 net flows match prometheeII with q=0, p=range/4 on the medians") {
    val m = medMatrix
    val ranges = m.head.indices.map(j =>
      m.map(_(j)).max - m.map(_(j)).min).toArray
    val p = ranges.map(r => if (r / 4.0 == 0.0) 1.0 else r / 4.0)
    val expect = Ranking.prometheeII(m, metricTypes, Array.fill(6)(0.0), p)
    val rows = McdmQueries.q132Promethee(spark, sf).orderBy(col("bid")).collect()
    rows.zip(expect).foreach { case (r, e) =>
      assert(math.abs(r.getAs[Double]("net_flow") - e) < 2e-6,
        s"${r.getAs[String]("bid")}: ${r.getAs[Double]("net_flow")} vs $e")
    }
  }

  test("q136 entropy_topsis census row matches kendallTau/spearman on the " +
    "recomputed rank vectors") {
    // baseline: equal-weight TOPSIS over (pf, sharpe, vol) medians
    val base3 = q131Rows.map(r => Array(r.getAs[Double]("med_pf"),
      r.getAs[Double]("med_sharpe"), r.getAs[Double]("med_vol")))
    val bScore = Ranking.topsis(base3, Array.fill(3)(1.0 / 3), Array(1, 1, -1))
      .map(s => math.rint(s * 1e6) / 1e6) // the 6 dp score contract
    val bids = q131Rows.map(_.getAs[String]("bid"))
    def ranksOf(score: Array[Double]): Map[String, Int] =
      bids.zip(score).sortBy { case (b, s) => (-s, b) }
        .zipWithIndex.map { case ((b, _), i) => b -> (i + 1) }.toMap
    val rb = ranksOf(bScore)
    val rm = q131Rows.map(r =>
      r.getAs[String]("bid") -> r.getAs[Int]("rank")).toMap
    val common = bids.sorted
    val a = common.map(b => rm(b).toDouble).toArray
    val b = common.map(c => rb(c).toDouble).toArray
    val census = McdmQueries.q136RankAgreement(spark, sf)
      .filter(col("method") === "entropy_topsis").collect().head
    assert(math.abs(census.getAs[Double]("kendall_tau")
      - math.rint(Ranking.kendallTau(a, b) * 1e4) / 1e4) < 1e-9)
    assert(math.abs(census.getAs[Double]("spearman_rho")
      - math.rint(Ranking.spearman(a, b) * 1e4) / 1e4) < 1e-9)
    val top10m = common.filter(c => rm(c) <= 10).toSet
    val top10b = common.filter(c => rb(c) <= 10).toSet
    val jac = top10m.intersect(top10b).size.toDouble / top10m.union(top10b).size
    assert(math.abs(census.getAs[Double]("top10_jaccard")
      - math.rint(jac * 1e4) / 1e4) < 1e-9)
  }

  test("q135 bootstrap output is internally consistent") {
    val rows = McdmQueries.q135BootstrapRank(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("freq")
        - math.rint(r.getAs[Long]("top10_count") / 200.0 * 1e6) / 1e6) < 1e-12)
    }
    // every rep contributes at most 10 top-10 rows
    val total = rows.map(_.getAs[Long]("top10_count")).sum
    assert(total > 0 && total <= 200L * 10)
    val byRank = rows.sortBy(_.getAs[Int]("rank"))
    assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length))
    byRank.sliding(2).foreach { case Array(x, y) =>
      assert(x.getAs[Long]("top10_count") >= y.getAs[Long]("top10_count"))
    case _ => }
  }

  test("q134 fractions are valid and the score is their clamped geo-mean") {
    val rows = McdmQueries.q134Universality(spark, sf).collect()
    rows.foreach { r =>
      val s = r.getAs[Double]("symbol_fraction")
      val f = r.getAs[Double]("formation_fraction")
      val t = r.getAs[Double]("threshold_fraction")
      assert(s >= 0 && s <= 1 && f >= 0 && f <= 1 && t >= 0 && t <= 1)
      val geo = math.cbrt(math.max(s, 1e-6) * math.max(f, 1e-6) * math.max(t, 1e-6))
      assert(math.abs(r.getAs[Double]("score") - math.rint(geo * 1e6) / 1e6) < 2e-6)
    }
  }

  test("q137 output satisfies the gen800 gates and sort contract") {
    val rows = McdmQueries.q137StagnationRank(spark, sf)
      .orderBy(col("rank")).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_trades") >= 30)
      assert(r.getAs[Double]("pf") > 1.0 && r.getAs[Double]("omega") > 1.0)
      assert(r.getAs[Double]("underwater_ratio") >= 0.0
        && r.getAs[Double]("underwater_ratio") <= 1.0)
    }
    rows.sliding(2).foreach { case Array(x, y) =>
      val kx = (x.getAs[Double]("underwater_ratio"),
        x.getAs[Long]("max_underwater_bars"))
      val ky = (y.getAs[Double]("underwater_ratio"),
        y.getAs[Long]("max_underwater_bars"))
      assert(kx._1 < ky._1 || (kx._1 == ky._1 && kx._2 <= ky._2),
        s"sort violated: $kx vs $ky")
    case _ => }
  }

  test("q139 matrix: 15 ordered pairs, and the entropy-vs-baseline cell " +
    "equals q136's entropy_topsis row") {
    val rows = McdmQueries.q139RankMatrix(spark, sf).collect()
    assert(rows.length == 15)
    rows.foreach { r =>
      assert(r.getAs[String]("method_a") < r.getAs[String]("method_b"))
      assert(math.abs(r.getAs[Double]("kendall_tau")) <= 1.0)
      assert(math.abs(r.getAs[Double]("spearman_rho")) <= 1.0)
      val j = r.getAs[Double]("top10_jaccard")
      assert(j >= 0.0 && j <= 1.0)
    }
    val cell = rows.find(r => r.getAs[String]("method_a") == "baseline_topsis"
      && r.getAs[String]("method_b") == "entropy_topsis").get
    val census = McdmQueries.q136RankAgreement(spark, sf)
      .filter(col("method") === "entropy_topsis").collect().head
    assert(cell.getAs[Double]("kendall_tau")
      == census.getAs[Double]("kendall_tau"))
    assert(cell.getAs[Double]("spearman_rho")
      == census.getAs[Double]("spearman_rho"))
    assert(cell.getAs[Double]("top10_jaccard")
      == census.getAs[Double]("top10_jaccard"))
  }

  test("q140 front is non-dominated; knees and TOPSIS match the library " +
    "on its own rows") {
    val rows = McdmQueries.q140ParetoFront(spark, sf)
      .orderBy(col("cutoff_pct")).collect()
    assert(rows.nonEmpty)
    val pts = rows.map(r => (r.getAs[Int]("cutoff_pct"),
      r.getAs[Long]("n_survivors"), r.getAs[Double]("avg_quality")))
    for (a <- pts; b <- pts if a != b) {
      val dom = a._2 >= b._2 && a._3 >= b._3 && a._1 <= b._1 &&
        (a._2 > b._2 || a._3 > b._3 || a._1 < b._1)
      assert(!dom, s"front member $b is dominated by $a")
    }
    val matrix = pts.map(p => Array(p._2.toDouble, p._3, p._1.toDouble))
    val scores = Ranking.topsis(matrix, Array.fill(3)(1.0 / 3), Array(1, 1, -1))
    val knees = Ranking.kneeDetect(matrix, Array(1, 1, -1)).toSet
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getAs[Double]("topsis_score") - scores(i)) < 2e-6)
      assert(r.getAs[Int]("is_knee") == (if (knees(i)) 1 else 0))
    }
    val ranks = rows.map(_.getAs[Int]("rank")).sorted
    assert(ranks.toSeq == (1 to rows.length))
  }

  test("q141 honors the graduated filter cascade and the sort contract") {
    // sf0.01: the cascade's absolute trade gates (the reference's 500/100
    // literals) empty out at the 1k-row smoke fixture
    val rows = McdmQueries.q141BestBarriers(spark, "/root/testdata/sf0.01")
      .orderBy(col("rank")).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    val tiers = rows.map(_.getAs[Int]("tier")).distinct
    assert(tiers.length == 1, s"mixed tiers: ${tiers.toSeq}")
    rows.foreach { r =>
      tiers.head match {
        case 1 =>
          assert(r.getAs[Double]("med_pf") > 1.05
            && r.getAs[Double]("xa_consistency") > 0.6
            && r.getAs[Long]("total_trades") > 500)
        case 2 =>
          assert(r.getAs[Double]("med_pf") > 1.0
            && r.getAs[Double]("xa_consistency") > 0.5
            && r.getAs[Long]("total_trades") > 500)
        case _ => assert(r.getAs[Long]("total_trades") > 100)
      }
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("med_sharpe") >= b.getAs[Double]("med_sharpe"))
    case _ => }
  }

  test("q142 viable fraction and gates hold on its own rows") {
    // sf0.01: the n_folds >= 50 gate needs the full 80-cell fold universe
    val rows = McdmQueries.q142TopBarriers(spark, "/root/testdata/sf0.01")
      .orderBy(col("rank")).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_folds") >= 50)
      val v = r.getAs[Double]("viable_pct")
      assert(v >= 0.0 && v <= 1.0)
    }
    rows.sliding(2).foreach { case Array(a, b) =>
      val (va, vb) = (a.getAs[Double]("viable_pct"), b.getAs[Double]("viable_pct"))
      assert(va > vb || (va == vb
        && a.getAs[Double]("pf_cv") <= b.getAs[Double]("pf_cv")))
    case _ => }
  }

  test("q143 pins the reference's denominator asymmetry: consistency over " +
    "ALL assets, mean over tested only") {
    val rows = McdmQueries.q143CrossAssetMetrics(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("xa_consistency"))) {
        val nPos = r.getAs[Long]("xa_n_positive")
        // 5 event types = the full asset axis; consistency divides by it
        assert(math.abs(r.getAs[Double]("xa_consistency")
          - math.rint(nPos / 5.0 * 1e6) / 1e6) < 1e-12)
        val c = r.getAs[Double]("xa_consistency")
        assert(c >= 0.0 && c <= 1.0)
      }
    }
  }

  test("q138 rows match survivorAnalysis + the objective functions on the " +
    "collected metric frame") {
    val m = graft.queries.RankingQueries.cfgMetrics(spark, sf)
      .select(col("cfg"), col("omega"), col("sr"), col("win_rate"), col("maxdd"))
      .collect()
    val metricData: Map[String, Map[String, Option[Double]]] = Map(
      "omega" -> m.map(r => r.getString(0) -> Option(r.getAs[Double]("omega"))).toMap,
      "sr" -> m.map(r => r.getString(0) -> Option(r.getAs[Double]("sr"))).toMap,
      "win_rate" -> m.map(r => r.getString(0) -> Option(r.getAs[Double]("win_rate"))).toMap,
      "maxdd" -> m.map(r => r.getString(0) -> Option(r.getAs[Double]("maxdd"))).toMap)
    val hib = Map("omega" -> true, "sr" -> true, "win_rate" -> true,
      "maxdd" -> false)
    val rows = McdmQueries.q138RankObjectives(spark, sf).collect()
    rows.foreach { r =>
      val c = r.getAs[Int]("cutoff_pct")
      val cutoffs = Map("omega" -> c, "sr" -> c, "win_rate" -> c, "maxdd" -> c)
      val res = Ranking.survivorAnalysis(metricData, hib, cutoffs)
      assert(r.getAs[Long]("n_intersection") == res.nIntersection,
        s"cutoff $c: ${r.getAs[Long]("n_intersection")} vs ${res.nIntersection}")
      assert(math.abs(r.getAs[Double]("avg_percentile") - res.avgPercentile) < 1e-3,
        s"cutoff $c: ${r.getAs[Double]("avg_percentile")} vs ${res.avgPercentile}")
      assert(r.getAs[Int]("n_binding") == res.nBindingMetrics,
        s"cutoff $c binding: ${r.getAs[Int]("n_binding")} vs ${res.nBindingMetrics}")
      assert(math.abs(r.getAs[Double]("obj_survivors_per_cutoff")
        - math.rint(Ranking.objMaxSurvivorsMinCutoff(res, cutoffs) * 1e6) / 1e6)
        < 1e-9)
      assert(math.abs(r.getAs[Double]("obj_tightest_nonempty")
        - Ranking.objTightestNonempty(res, cutoffs)) < 1e-9)
      assert(math.abs(r.getAs[Double]("obj_diversity")
        - math.rint(Ranking.objDiversityReward(res, cutoffs) * 1e6) / 1e6) < 1e-9)
    }
  }
}
