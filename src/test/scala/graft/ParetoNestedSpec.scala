package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.eval.{Folds, Pareto}

class ParetoNestedSpec extends AnyFunSuite {

  test("2D hypervolume: single point and union of overlapping rectangles") {
    val ref = Array(1.0, 1.0)
    assert(math.abs(Pareto.hypervolume(Array(Array(0.5, 0.5)), ref) - 0.25) < 1e-12)
    // two points: (0.2,0.6), (0.6,0.2): union = 0.8*0.4 + 0.4*0.4 = 0.48
    val hv = Pareto.hypervolume(Array(Array(0.2, 0.6), Array(0.6, 0.2)), ref)
    assert(math.abs(hv - 0.48) < 1e-12)
    // dominated point adds nothing
    val hv2 = Pareto.hypervolume(
      Array(Array(0.2, 0.6), Array(0.6, 0.2), Array(0.7, 0.7)), ref)
    assert(math.abs(hv2 - 0.48) < 1e-12)
    // point outside ref contributes nothing
    assert(Pareto.hypervolume(Array(Array(1.5, 0.5)), ref) == 0.0)
  }

  test("3D hypervolume: unit-box goldens") {
    val ref = Array(1.0, 1.0, 1.0)
    assert(math.abs(Pareto.hypervolume(Array(Array(0.0, 0.0, 0.0)), ref) - 1.0) < 1e-12)
    assert(math.abs(Pareto.hypervolume(Array(Array(0.5, 0.5, 0.5)), ref) - 0.125) < 1e-12)
    // two disjoint-ish corners: exact union via inclusion-exclusion:
    // V(A)=0.5*0.5*1=0.25 with A=(0.5,0.5,0), B=(0,0.9,0.5): V(B)=1*0.1*0.5=0.05
    // intersection: max coords (0.5,0.9,0.5) → 0.5*0.1*0.5=0.025 → union 0.275
    val hv = Pareto.hypervolume(
      Array(Array(0.5, 0.5, 0.0), Array(0.0, 0.9, 0.5)), ref)
    assert(math.abs(hv - 0.275) < 1e-12)
  }

  test("pareto front filters dominated points") {
    val pts = Array(Array(0.1, 0.9), Array(0.9, 0.1), Array(0.5, 0.5), Array(0.6, 0.6))
    val front = Pareto.paretoFront(pts).map(_.toSeq).toSet
    assert(front == Set(Seq(0.1, 0.9), Seq(0.9, 0.1), Seq(0.5, 0.5)))
  }

  test("fold stability: identical folds give CV 0") {
    val fold = Array(Array(0.5, 0.5, 0.5))
    val s = Pareto.foldStability(Array(fold, fold, fold), Array(1.0, 1.0, 1.0))
    assert(math.abs(s.meanHv - 0.125) < 1e-12 && s.stdHv == 0.0 && s.cvHv == 0.0)
  }

  test("nested CPCV: selection is outer-test-blind and picks the dominant barrier") {
    val n = 1200
    // barrier "good": +0.01 everywhere; "bad": -0.01; "mid": +0.001
    val returns = Map(
      "good" -> Array.fill(n)(0.01),
      "bad" -> Array.fill(n)(-0.01),
      "mid" -> Array.fill(n)(0.001))
    val res = Folds.nestedCpcv(returns, n, innerK = 2, nFolds = 5, nTestFolds = 1,
      purgeBars = 20, embargoBars = 5, innerPurge = 10)
    assert(res.nonEmpty)
    res.foreach { case (_, selected) =>
      val names = selected.map(_._1)
      assert(names.length == 2)
      assert(names.contains("good"))
      assert(!names.contains("bad"), s"bad barrier selected: $names")
      val goodMetrics = selected.find(_._1 == "good").get._2
      assert(goodMetrics.winRate == 1.0)
    }
  }
}
