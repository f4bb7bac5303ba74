package graft

import graft.eval.BarrierSim

/** Golden-model scenarios pinning the barrier semantics (the Scala
  * analogue of the reference's tests/test_barrier_sim.py scenario suite):
  * TP touch, SL touch, SL-wins-ties (AP-12), gap-down fill (AP-13), TIME
  * exit, INCOMPLETE. Entry = 100.0, forward arrays bar 1..n.
  */
class BarrierSimSpec extends GraftSuite {

  private val entry = 100.0

  // flat bars: no barrier touch
  private def flat(n: Int) = (
    Array.fill(n)(100.5), Array.fill(n)(99.5),
    Array.fill(n)(100.0), Array.fill(n)(100.0))

  test("TIME exit on flat path at close[max_bars]") {
    val (h, l, o, c) = flat(10)
    val out = BarrierSim.tripleBarrier(entry, h, l, o, c, 0.02, 0.02, 10)
    assert(out.exitType == "TIME" && out.exitBar == 10 && out.exitPrice == 100.0)
  }

  test("INCOMPLETE when fewer than max_bars available") {
    val (h, l, o, c) = flat(5)
    val out = BarrierSim.tripleBarrier(entry, h, l, o, c, 0.02, 0.02, 10)
    assert(out.exitType == "INCOMPLETE")
  }

  test("TP limit fill at tp_price on first touching bar") {
    val (h, l, o, c) = flat(10)
    h(3) = 102.5 // bar 4 touches tp = 102
    val out = BarrierSim.tripleBarrier(entry, h, l, o, c, 0.02, 0.02, 10)
    assert(out.exitType == "TP" && out.exitBar == 4 && out.exitPrice == 102.0)
  }

  test("SL fill at sl_price (no gap) on first touching bar") {
    val (h, l, o, c) = flat(10)
    l(2) = 97.5 // bar 3 touches sl = 98; open 100 > 98 → fill at 98
    val out = BarrierSim.tripleBarrier(entry, h, l, o, c, 0.02, 0.02, 10)
    assert(out.exitType == "SL" && out.exitBar == 3 && out.exitPrice == 98.0)
  }

  test("AP-13: gap-down SL fills at open when open < sl_price") {
    val (h, l, o, c) = flat(10)
    o(2) = 95.0; l(2) = 94.0 // bar 3 gaps below sl=98 → fill at open 95
    val out = BarrierSim.tripleBarrier(entry, h, l, o, c, 0.02, 0.02, 10)
    assert(out.exitType == "SL" && out.exitBar == 3 && out.exitPrice == 95.0)
  }

  test("AP-12: SL wins when TP and SL touch the same bar") {
    val (h, l, o, c) = flat(10)
    h(4) = 103.0; l(4) = 97.0 // bar 5 touches both
    val out = BarrierSim.tripleBarrier(entry, h, l, o, c, 0.02, 0.02, 10)
    assert(out.exitType == "SL" && out.exitBar == 5)
  }

  test("earlier TP beats later SL") {
    val (h, l, o, c) = flat(10)
    h(1) = 103.0; l(5) = 97.0
    val out = BarrierSim.tripleBarrier(entry, h, l, o, c, 0.02, 0.02, 10)
    assert(out.exitType == "TP" && out.exitBar == 2)
  }

  test("trailing stop ratchets up with running max") {
    val (h, l, o, c) = flat(10)
    // bar 1 runs to 105 (low stays above the raised stop); the ratcheted
    // trail sl = 105*0.98 = 102.9 then catches bar 2's low of 102, and the
    // open (100) gaps below the stop -> fill at open.
    h(0) = 105.0; l(0) = 103.0
    l(1) = 102.0
    val out = BarrierSim.trailingStop(entry, h, l, o, c, 0.10, 0.02, 10)
    assert(out.exitType == "TRAIL" && out.exitBar == 2)
    assert(math.abs(out.exitPrice - math.min(100.0, 105.0 * 0.98)) < 1e-12)
  }

  test("trailing stop seeded with entry: immediate stop-out on deep low") {
    val (h, l, o, c) = flat(10)
    l(0) = 90.0 // entry*0.98 = 98 > 90 → trail hit bar 1
    val out = BarrierSim.trailingStop(entry, h, l, o, c, 0.10, 0.02, 10)
    assert(out.exitType == "TRAIL" && out.exitBar == 1)
  }
}
