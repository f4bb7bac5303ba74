package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, IntegerType}

/** ATR-adaptive Laguerre RSI + regime classification (SURVEY.md §2.11
  * E27; reference: src/opendeviationbar_patterns/laguerre.py:42-97, which
  * delegates the filter to an external package). This is a from-scratch
  * implementation of the public Ehlers Laguerre RSI recursion with an
  * ATR-scaled adaptive gamma; the reference's parity surface is the
  * recursive *structure* and the regime thresholds (RSI < 0.15 bearish,
  * > 0.85 bullish), pinned by LaguerreSpec.
  *
  * The filter is inherently sequential per series (each L0..L3 state
  * feeds the next bar) — the Spark form is therefore per-key
  * `flatMapGroups` over a sorted buffer: parallel ACROSS series, ordered
  * WITHIN a series (SURVEY §7.3.4). State is 4 doubles; the buffer is one
  * series' bars (bounded by the per-symbol slice, ≤ ~10⁶ rows).
  */
object Laguerre {

  final case class Config(atrPeriod: Int = 32, smoothingPeriod: Int = 5,
      adaptiveOffset: Double = 0.75, levelDown: Double = 0.15, levelUp: Double = 0.85)

  /** Pure recursion over one ordered series. Returns smoothed RSI in [0,1].
    *
    * gamma_t = 1 − alpha_t with alpha_t = (2/(atrPeriod+1)) ·
    * (offset + (1−offset)·ratio_t), where ratio_t normalizes ATR within
    * its trailing [min,max] over atrPeriod bars (0.5 when degenerate) —
    * higher relative volatility ⇒ larger alpha ⇒ faster filter.
    */
  def rsi(highs: Array[Double], lows: Array[Double], closes: Array[Double],
      cfg: Config = Config()): Array[Double] = {
    val n = closes.length
    val out = new Array[Double](n)
    if (n == 0) return out
    // fail FAST on NaN input: one NaN bar permanently poisons the
    // running-sum ATR (trSum -= NaN stays NaN — unlike a windowed mean it
    // never recovers) and the L0..L3 cascade, after which cu+cd is NaN,
    // the >0 guard is false, and every later bar reports a VALID-LOOKING
    // rsi of 0.0 / bearish regime with no error (r13 review). Bars built
    // by EventBars are NaN-free; an external caller's NaN is a data bug
    // this message points at instead of silently mislabeling the series.
    var v = 0
    while (v < n) {
      if (highs(v).isNaN || lows(v).isNaN || closes(v).isNaN)
        throw new IllegalArgumentException(
          s"laguerre rsi: NaN OHLC at bar $v — NaN poisons the recursion " +
            "irrecoverably; clean the series first")
      v += 1
    }
    val tr = new Array[Double](n)
    tr(0) = highs(0) - lows(0)
    var i = 1
    while (i < n) {
      tr(i) = math.max(highs(i), closes(i - 1)) - math.min(lows(i), closes(i - 1))
      i += 1
    }
    // trailing-mean ATR (expanding until atrPeriod bars seen)
    val atr = new Array[Double](n)
    var trSum = 0.0
    i = 0
    while (i < n) {
      trSum += tr(i)
      if (i >= cfg.atrPeriod) trSum -= tr(i - cfg.atrPeriod)
      atr(i) = trSum / math.min(i + 1, cfg.atrPeriod)
      i += 1
    }
    // seed the cascade with the first price: no zero-state transient
    var l0 = closes(0); var l1 = closes(0); var l2 = closes(0); var l3 = closes(0)
    val raw = new Array[Double](n)
    i = 0
    while (i < n) {
      val lo = math.max(0, i - cfg.atrPeriod + 1)
      var mn = Double.PositiveInfinity; var mx = Double.NegativeInfinity
      var j = lo
      while (j <= i) { mn = math.min(mn, atr(j)); mx = math.max(mx, atr(j)); j += 1 }
      val ratio = if (mx > mn) (atr(i) - mn) / (mx - mn) else 0.5
      val alpha = (2.0 / (cfg.atrPeriod + 1)) *
        (cfg.adaptiveOffset + (1.0 - cfg.adaptiveOffset) * ratio)
      val g = 1.0 - alpha
      val p = closes(i)
      val l0p = l0; val l1p = l1; val l2p = l2; val l3p = l3
      l0 = (1 - g) * p + g * l0p
      l1 = -g * l0 + l0p + g * l1p
      l2 = -g * l1 + l1p + g * l2p
      l3 = -g * l2 + l2p + g * l3p
      var cu = 0.0; var cd = 0.0
      if (l0 >= l1) cu += l0 - l1 else cd += l1 - l0
      if (l1 >= l2) cu += l1 - l2 else cd += l2 - l1
      if (l2 >= l3) cu += l2 - l3 else cd += l3 - l2
      raw(i) = if (cu + cd > 0) math.min(1.0, math.max(0.0, cu / (cu + cd))) else 0.0
      i += 1
    }
    // SMA smoothing
    var s = 0.0
    i = 0
    while (i < n) {
      s += raw(i)
      if (i >= cfg.smoothingPeriod) s -= raw(i - cfg.smoothingPeriod)
      // clamp: the running-sum smoother accumulates float residue that can
      // drift a hair past the mathematical [0,1] bounds
      out(i) = math.min(1.0, math.max(0.0, s / math.min(i + 1, cfg.smoothingPeriod)))
      i += 1
    }
    out
  }

  def regime(rsiVal: Double, cfg: Config = Config()): Int =
    if (rsiVal < cfg.levelDown) 0 else if (rsiVal > cfg.levelUp) 2 else 1

  final case class LaguerreRow(event_type: String, ts_us: Long, event_id: Long,
      rsi: Double, regime: Int)

  /** Distributed form: per-series sequential recursion via flatMapGroups
    * (order restored inside each group; no cross-series state). Input must
    * be an EventBars-style frame. */
  /** Join-free regime attachment: carries EVERY input column through the
    * per-series recursion and appends (rsi, regime). The plain
    * [[withRegimes]] + 3-column equi-join shape shuffles the bar frame
    * twice more (once per join side); this pass-through form pays exactly
    * one exchange — the groupByKey that the recursion needs anyway.
    * Input needs (event_type, ts_us, event_id, high, low, close).
    */
  def attachRegimes(bars: DataFrame, cfg: Config = Config()): DataFrame = {
    val schema = bars.schema.add("rsi", DoubleType).add("regime", IntegerType)
    val etIdx = bars.schema.fieldIndex("event_type")
    val tsIdx = bars.schema.fieldIndex("ts_us")
    val eidIdx = bars.schema.fieldIndex("event_id")
    val hIdx = bars.schema.fieldIndex("high")
    val lIdx = bars.schema.fieldIndex("low")
    val cIdx = bars.schema.fieldIndex("close")
    val grouped = bars.groupByKey((r: Row) => r.getString(etIdx))(Encoders.STRING)
    val out = grouped.flatMapGroups { (_: String, it: Iterator[Row]) =>
      val rows = it.toArray.sortBy(r => (r.getLong(tsIdx), r.getLong(eidIdx)))
      val r = rsi(rows.map(_.getDouble(hIdx)), rows.map(_.getDouble(lIdx)),
        rows.map(_.getDouble(cIdx)), cfg)
      rows.iterator.zipWithIndex.map { case (row, i) =>
        Row.fromSeq(row.toSeq :+ r(i) :+ regime(r(i), cfg))
      }
    }(Encoders.row(schema))
    out.toDF()
  }

  /** Multi-recursion attachment for the gen800-width sweep
    * (scripts/gen800_sweep.py:31-60 sweeps a LAGUERRE PARAMETER grid):
    * runs N recursions — the grid's distinct (atrPeriod, adaptiveOffset)
    * pairs; the level thresholds never enter the recursion, so a
    * 288-config grid needs only its 12 distinct recursions here — over
    * ONE buffered pass per series and appends `rsis` (cfg-ordered array).
    * Cost: the same single groupByKey exchange as [[attachRegimes]] plus
    * N sequential O(n) loops per buffered series — parallel ACROSS
    * series×partitions like every other lane of the sweep; thresholds and
    * gates fan out columnar downstream (Sweep.run's laguerreGrid path). */
  def attachRsis(bars: DataFrame, cfgs: Seq[Config]): DataFrame = {
    val schema = bars.schema.add("rsis",
      org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false))
    val etIdx = bars.schema.fieldIndex("event_type")
    val tsIdx = bars.schema.fieldIndex("ts_us")
    val eidIdx = bars.schema.fieldIndex("event_id")
    val hIdx = bars.schema.fieldIndex("high")
    val lIdx = bars.schema.fieldIndex("low")
    val cIdx = bars.schema.fieldIndex("close")
    val grouped = bars.groupByKey((r: Row) => r.getString(etIdx))(Encoders.STRING)
    val out = grouped.flatMapGroups { (_: String, it: Iterator[Row]) =>
      val rows = it.toArray.sortBy(r => (r.getLong(tsIdx), r.getLong(eidIdx)))
      val highs = rows.map(_.getDouble(hIdx))
      val lows = rows.map(_.getDouble(lIdx))
      val closes = rows.map(_.getDouble(cIdx))
      val rs: Array[Array[Double]] =
        cfgs.map(c => rsi(highs, lows, closes, c)).toArray
      rows.iterator.zipWithIndex.map { case (row, i) =>
        Row.fromSeq(row.toSeq :+ rs.map(_(i)).toSeq)
      }
    }(Encoders.row(schema))
    out.toDF()
  }

  def withRegimes(bars: DataFrame, cfg: Config = Config()): Dataset[LaguerreRow] = {
    val spark = bars.sparkSession
    import spark.implicits._
    bars.select(col("event_type"), col("ts_us"), col("event_id"),
      col("high"), col("low"), col("close"))
      .as[(String, Long, Long, Double, Double, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        val sorted = rows.toArray.sortBy(r => (r._2, r._3))
        val r = rsi(sorted.map(_._4), sorted.map(_._5), sorted.map(_._6), cfg)
        sorted.iterator.zipWithIndex.map { case (row, i) =>
          LaguerreRow(key, row._2, row._3, r(i), regime(r(i), cfg))
        }
      }
  }
}
