package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType}
import graft.functions.GraftFunctions

/** Signal-formation registry (SURVEY.md §2.2 P5): the reference's 22
  * gen600 pattern templates as parameterized `Column`-predicate builders
  * over a prepared bar frame. Each formation is a pure predicate — the
  * engine composes it with warmup gates (P3), adaptive quantile thresholds
  * (W6) and the barrier engine downstream.
  *
  * Prepared-frame contract ([[withFormationColumns]]): dir_0/dir_1/dir_2
  * (current + lagged directions), ti (trade-intensity proxy), r (bar
  * return), owp (opposite-wick fraction, P2), rolling exclusive-quantile
  * gates ti_p75/ti_p90/ti_p95/r_p10 computed over the PRIOR lookback
  * window only (no lookahead; sql/gen600_2down_template.sql:69-72).
  *
  * Scale: everything here is a projection over one window pass — the
  * prior-value list is collected once per row and every quantile gate
  * interpolates from that same array (no extra window state per gate).
  */
object Formations {

  /** Attach the formation feature/gate columns to an EventBars-style frame
    * (event_type, ts_us, event_id, rn, open, high, low, close). */
  def withFormationColumns(bars: DataFrame, w: WindowSpec, lookback: Int = 100): DataFrame = {
    val priorTi = collect_list(col("ti")).over(w.rowsBetween(-lookback, -1))
    val priorR = collect_list(col("r")).over(w.rowsBetween(-lookback, -1))
    bars
      // P4 nullIf guard (ref sql/gen200_triple_barrier.sql:286): zero-open
      // bars make r/ti NULL; every registry predicate is NULL-safe (→ false)
      .withColumn("r", (col("close") - col("open")) / nullif(col("open"), lit(0.0)))
      .withColumn("ti", abs(col("r")))
      .withColumn("dir_0", BarFrame.direction(col("open"), col("close")))
      .withColumn("dir_1", lag(col("dir_0"), 1).over(w))
      .withColumn("dir_2", lag(col("dir_0"), 2).over(w))
      // P2: direction-aware opposite wick with nullIf(high-low, 0) guard
      .withColumn("owp",
        when(col("dir_0") === 1, (col("open") - col("low")))
          .otherwise(col("high") - col("open")) /
          nullif(col("high") - col("low"), lit(0.0)))
      // one collect + one sort per gate family: the multi-quantile
      // expression materializes each prior-window list once and every
      // percentile interpolates from the same sorted buffer (vs one window
      // buffer + one sort per gate — 5 frames → 2)
      .withColumn("tiq", GraftFunctions.quantileMultiExclusive(priorTi, Seq(0.75, 0.90, 0.95)))
      .withColumn("rq", GraftFunctions.quantileMultiExclusive(priorR, Seq(0.10, 0.90)))
      .withColumn("ti_p75", col("tiq").getItem(0))
      .withColumn("ti_p90", col("tiq").getItem(1))
      .withColumn("ti_p95", col("tiq").getItem(2))
      .withColumn("r_p10", col("rq").getItem(0))
      .withColumn("r_p90", col("rq").getItem(1))
      .drop("tiq", "rq")
  }

  // sorted-multiset window state shared with SeriesReplay
  private type SortedWindow = graft.functions.SortedWindow

  private val tiQs = Array(0.75, 0.90, 0.95)
  private val rQs = Array(0.10, 0.90)

  /** Replay twin of [[withFormationColumns]] (+ a `next_dir` lead): the same
    * appended columns from one per-series pass instead of a five-stage
    * window stack. Spark's WindowExec replays the whole sliding frame per
    * output row through interpreted aggregate machinery (no retraction), so
    * the declarative rolling-quantile gates materialize AND sort a
    * lookback-length array for every bar — the q41 profile showed that as
    * the dominant cost. Here each series is one sorted in-memory pass with
    * two incrementally-maintained sorted windows; arithmetic (division
    * guards, direction, wick fraction, quantile interpolation) is shared
    * with or identical to the declarative form, asserted row-for-row by
    * FormationsReplaySpec.
    *
    * Partitioning contract matches WindowExec: one exchange on the series
    * key, series processed independently — the 1000-executor layout is the
    * same. Memory: one series' rows are buffered in the task (the
    * reference's longest series is ~1.4M bars ≈ ~100 MB of Rows); the
    * declarative [[withFormationColumns]] remains the fallback where a
    * single series outgrows a task.
    *
    * Input must carry (event_type, ts_us, event_id, open, high, low, close);
    * all input columns pass through.
    */
  def withFormationColumnsReplay(bars: DataFrame, lookback: Int = 100): DataFrame = {
    val schema = bars.schema
      .add("r", DoubleType).add("ti", DoubleType)
      .add("dir_0", IntegerType).add("dir_1", IntegerType).add("dir_2", IntegerType)
      .add("owp", DoubleType)
      .add("ti_p75", DoubleType).add("ti_p90", DoubleType).add("ti_p95", DoubleType)
      .add("r_p10", DoubleType).add("r_p90", DoubleType)
      .add("next_dir", IntegerType)
    val etIdx = bars.schema.fieldIndex("event_type")
    val tsIdx = bars.schema.fieldIndex("ts_us")
    val eidIdx = bars.schema.fieldIndex("event_id")
    val oIdx = bars.schema.fieldIndex("open")
    val hIdx = bars.schema.fieldIndex("high")
    val lIdx = bars.schema.fieldIndex("low")
    val cIdx = bars.schema.fieldIndex("close")
    bars.groupByKey((row: Row) => row.getString(etIdx))(Encoders.STRING)
      .flatMapGroups { (_: String, it: Iterator[Row]) =>
        val rows = it.toArray
        java.util.Arrays.sort(rows, Ordering.by((row: Row) =>
          (row.getLong(tsIdx), row.getLong(eidIdx))))
        val n = rows.length
        val open = new Array[Double](n); val high = new Array[Double](n)
        val low = new Array[Double](n); val close = new Array[Double](n)
        var i = 0
        while (i < n) {
          val row = rows(i)
          // fail READABLY on NULL OHLC: getDouble would NPE inside the
          // task with no hint which bar broke. The declarative twin
          // (withFormationColumns) degrades NULL rows to NULL features;
          // this buffered path's domain is EventBars.bars output, which
          // filters them — an external caller's NULL is a data bug this
          // message points at (r13 review)
          if (row.isNullAt(oIdx) || row.isNullAt(hIdx) ||
              row.isNullAt(lIdx) || row.isNullAt(cIdx))
            throw new IllegalArgumentException(
              s"formation replay: NULL OHLC at bar $i (event_id " +
                s"${row.getLong(eidIdx)}) — filter NULL bars first " +
                "(EventBars.bars does) or use withFormationColumns")
          open(i) = row.getDouble(oIdx); high(i) = row.getDouble(hIdx)
          low(i) = row.getDouble(lIdx); close(i) = row.getDouble(cIdx)
          i += 1
        }
        // nullable per-row features, boxed once (null ⇔ zero-open guard)
        val rArr = new Array[java.lang.Double](n)
        val tiArr = new Array[java.lang.Double](n)
        val dir = new Array[Int](n)
        i = 0
        while (i < n) {
          if (open(i) != 0.0) {
            val rv = (close(i) - open(i)) / open(i)
            rArr(i) = rv; tiArr(i) = math.abs(rv)
          }
          dir(i) = if (close(i) > open(i)) 1 else 0
          i += 1
        }
        val tiWin = new SortedWindow(lookback + 1)
        val rWin = new SortedWindow(lookback + 1)
        Iterator.tabulate(n) { i =>
          val evict = i - lookback - 1
          if (evict >= 0) {
            if (tiArr(evict) != null) tiWin.remove(tiArr(evict))
            if (rArr(evict) != null) rWin.remove(rArr(evict))
          }
          val tq = tiWin.quantiles(tiQs)
          val rq = rWin.quantiles(rQs)
          // insert AFTER evaluating: the frame is prior-only (… -1), row i
          // joins the window only for rows > i
          if (tiArr(i) != null) tiWin.insert(tiArr(i))
          if (rArr(i) != null) rWin.insert(rArr(i))
          val hl = high(i) - low(i)
          val owp: java.lang.Double =
            if (hl == 0.0) null
            else if (dir(i) == 1) (open(i) - low(i)) / hl
            else (high(i) - open(i)) / hl
          def q(a: Array[Double], k: Int): java.lang.Double =
            if (a == null) null else a(k)
          Row.fromSeq(rows(i).toSeq ++ Seq[Any](
            rArr(i), tiArr(i),
            dir(i),
            if (i >= 1) Int.box(dir(i - 1)) else null,
            if (i >= 2) Int.box(dir(i - 2)) else null,
            owp,
            q(tq, 0), q(tq, 1), q(tq, 2), q(rq, 0), q(rq, 1),
            if (i + 1 < n) Int.box(dir(i + 1)) else null))
        }
      }(Encoders.row(schema))
      .toDF()
  }

  /** The registry: name → formation predicate over the prepared frame.
    * Citations are the gen600 template each pattern restates.
    */
  val registry: Seq[(String, Column)] = Seq(
    // 2down: two consecutive down bars + intensity gate (gen600_2down:100-113)
    "2down" -> (col("dir_1") === 0 && col("dir_0") === 0 &&
      col("ti_p95").isNotNull && col("ti") > col("ti_p95")),
    // no-gate variant (gen600_2down_ng_template.sql)
    "2down_ng" -> (col("dir_1") === 0 && col("dir_0") === 0),
    // three consecutive down bars
    "3down" -> (col("dir_2") === 0 && col("dir_1") === 0 && col("dir_0") === 0),
    // down-up-down (gen600_dud_template.sql)
    "dud" -> (col("dir_2") === 0 && col("dir_1") === 1 && col("dir_0") === 0),
    // down-up-up short setup (gen600_duu_s_template.sql)
    "duu_s" -> (col("dir_2") === 0 && col("dir_1") === 1 && col("dir_0") === 1),
    // two up bars, short (gen600_2up_s_template.sql)
    "2up_s" -> (col("dir_1") === 1 && col("dir_0") === 1 &&
      col("ti_p95").isNotNull && col("ti") > col("ti_p95")),
    // no-gate two-up short — the ng twin of 2down_ng
    // (gen600_2up_ng_s_template.sql; completes the 22-template registry)
    "2up_ng_s" -> (col("dir_1") === 1 && col("dir_0") === 1),
    // exhaustion long: down bar with extreme intensity (gen600_exh_l_template.sql)
    "exh_l" -> (col("dir_0") === 0 &&
      col("ti_p75").isNotNull && col("ti") > col("ti_p75")),
    // VWAP-deviation long: return below its prior p10 (gen600_vwap_l_template.sql)
    "vwap_l" -> (col("r_p10").isNotNull && col("r") < col("r_p10")),
    // high-volume down (gen600_hvd_template.sql)
    "hvd" -> (col("dir_0") === 0 &&
      col("ti_p90").isNotNull && col("ti") > col("ti_p90")),
    // wickless down (gen600_wl1d_template.sql: wick_0 < 0.001)
    "wl1d" -> (col("dir_0") === 0 && col("owp").isNotNull && col("owp") < 0.001),
    // two wickless down bars (wl2d variant)
    "wl2d" -> (col("dir_1") === 0 && col("dir_0") === 0 &&
      col("owp").isNotNull && col("owp") < 0.001),
    // exhaustion short: up bar with extreme intensity (exh_s variant)
    "exh_s" -> (col("dir_0") === 1 &&
      col("ti_p75").isNotNull && col("ti") > col("ti_p75")),
    // VWAP-deviation short: return above its prior p90 (vwap_s variant)
    "vwap_s" -> (col("r_p90").isNotNull && col("r") > col("r_p90")),
    // high-volume up (hvu variant)
    "hvu" -> (col("dir_0") === 1 &&
      col("ti_p90").isNotNull && col("ti") > col("ti_p90")),
    // three up bars, short
    "3up_s" -> (col("dir_2") === 1 && col("dir_1") === 1 && col("dir_0") === 1),
    // up-down-up
    "udu_s" -> (col("dir_2") === 1 && col("dir_1") === 0 && col("dir_0") === 1),
    // single reversals
    "u1d" -> (col("dir_1") === 1 && col("dir_0") === 0),
    "d1u" -> (col("dir_1") === 0 && col("dir_0") === 1),
    // gated double-down at the p75 intensity threshold
    "2down_g75" -> (col("dir_1") === 0 && col("dir_0") === 0 &&
      col("ti_p75").isNotNull && col("ti") > col("ti_p75")),
    // double-down with a pronounced opposite wick
    "2down_wick" -> (col("dir_1") === 0 && col("dir_0") === 0 &&
      col("owp").isNotNull && col("owp") > 0.3),
    // gated down-up-down
    "dud_g75" -> (col("dir_2") === 0 && col("dir_1") === 1 && col("dir_0") === 0 &&
      col("ti_p75").isNotNull && col("ti") > col("ti_p75")))

  /** Warmup + entry-validity gate (P3: rn > warmup AND quantile non-null —
    * sql/gen600_2down_template.sql:103-112). */
  def warmupGate(warmupBars: Int): Column = col("rn") > warmupBars
}
