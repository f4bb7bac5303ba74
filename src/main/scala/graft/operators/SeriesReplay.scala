package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructType}
import graft.functions.SortedWindow

/** Streaming per-series replay of ordered-window operators — the A5/W6
  * end-state for the SLIDING (rolling) exclusive quantile, the reference's
  * 177-use workhorse (ref sql/gen600_2down_template.sql:69-72,
  * rolling-1000 policy sql/CLAUDE.md:55).
  *
  * Spark's WindowExec rebuilds bounded-preceding frames per output row
  * through the aggregate machinery (no retraction), so the declarative
  * `quantileExactExclusive(collect_list(x) OVER (ROWS -L..-1))` form
  * materializes AND sorts an L-length array for every row — L×8 bytes per
  * row per column of window buffer, the same memory shape that OOM'd the
  * reference's native engine (38/220 gen600 units, SURVEY §4.2). Here each
  * series is processed as ONE sorted stream with O(L) state per attached
  * column: a ring buffer of the last L values plus an incrementally
  * maintained sorted multiset (insert + evict by binary search and
  * memmove). No per-row array, no per-row sort, and — unlike the
  * Formations replay's collect-to-array form — no whole-series task
  * buffering either: rows stream through `flatMapSortedGroups`, which
  * sort-spills like any Spark sort, so a 100×-rows-per-series cluster run
  * holds only O(maxLead + Σ lookback) per series in memory.
  *
  * Shuffle contract matches WindowExec: one hash exchange on the series
  * key; series are processed independently, so the 1000-executor layout is
  * identical. Quantile arithmetic is [[graft.functions.QuantileMultiExclusive
  * .interpolate]] — the single shared evaluator behind the declarative
  * expression — so the two paths are bit-identical by construction
  * (SeriesReplaySpec pins equality on randomized null-bearing series).
  *
  * Shift columns replay `lag`/`lead` (offset < 0 = lag, > 0 = lead) with a
  * delay line of pending rows; `rowNumberCol` replays `row_number()` over
  * the same (seriesCol, orderCols) window. NULL semantics match the window
  * functions: out-of-bounds shifts are NULL, quantile input NULLs occupy a
  * frame slot but contribute no value, an all-NULL (or warmup) frame yields
  * NULL.
  *
  * Sort keys must be non-null (true for every series axis here: the time +
  * id columns are fixture keys); series keys are matched on their String
  * form.
  */
object SeriesReplay {

  /** Rolling exclusive quantile of the previous `lookback` rows' non-null
    * `in` values, current row excluded (frame ROWS -lookback..-1). */
  final case class RollingQ(in: String, out: String, q: Double, lookback: Int)

  /** Replayed lag (offset < 0) / lead (offset > 0) of column `in`. */
  final case class Shift(in: String, out: String, offset: Int) {
    require(offset != 0, "shift offset must be non-zero")
  }

  def attach(
      df: DataFrame,
      seriesCol: String,
      orderCols: Seq[String],
      quantiles: Seq[RollingQ],
      shifts: Seq[Shift] = Nil,
      rowNumberCol: Option[String] = None): DataFrame = {
    val inSchema = df.schema
    var outSchema: StructType = inSchema
    shifts.foreach { s =>
      outSchema = outSchema.add(s.out, inSchema(s.in).dataType, nullable = true)
    }
    quantiles.foreach { q =>
      outSchema = outSchema.add(q.out, DoubleType, nullable = true)
    }
    rowNumberCol.foreach { rn =>
      outSchema = outSchema.add(rn, IntegerType, nullable = false)
    }

    val keyIdx = inSchema.fieldIndex(seriesCol)
    val shiftIdx = shifts.map(s => inSchema.fieldIndex(s.in)).toArray
    val shiftOff = shifts.map(_.offset).toArray
    val qIdx = quantiles.map(q => inSchema.fieldIndex(q.in)).toArray
    val qArr = quantiles.map(q => Array(q.q)).toArray
    val qLook = quantiles.map(_.lookback).toArray
    val nShift = shifts.length
    val nQ = quantiles.length
    val nRn = if (rowNumberCol.isDefined) 1 else 0
    val maxLead = (0 +: shiftOff.toSeq).max
    val sortExprs = orderCols.map(col)

    df.groupByKey((row: Row) => String.valueOf(row.get(keyIdx)))(Encoders.STRING)
      .flatMapSortedGroups(sortExprs: _*) { (_: String, it: Iterator[Row]) =>
        // per-lag delay lines (value from |offset| rows back)
        val lagRing = shiftOff.map(o => if (o < 0) new Array[Any](-o) else null)
        // per-quantile frame state: ring of the last `lookback` row values
        // (null slots kept so NULL rows still advance the frame) + multiset
        val qRing = qLook.map(l => new Array[java.lang.Double](l))
        val qWin = qLook.map(l => new SortedWindow(l + 1))
        // pending rows awaiting lead resolution; emitted maxLead rows late
        val pending = new java.util.ArrayDeque[(Row, Array[Any])](maxLead + 1)
        var i = 0 // 0-based row counter within the series

        def resolveLeads(row: Row): Unit = {
          // the row arriving now supplies lead(in, o) for the row o back
          var j = 0
          while (j < nShift) {
            val o = shiftOff(j)
            if (o > 0) {
              // pending holds rows [i-size .. i-1]; target index from tail
              val fromTail = o - 1
              if (fromTail < pending.size) {
                var it2 = pending.descendingIterator(); var k = 0
                while (k < fromTail) { it2.next(); k += 1 }
                it2.next()._2(j) = row.get(shiftIdx(j))
              }
            }
            j += 1
          }
        }

        def ingest(row: Row): Array[Any] = {
          val app = new Array[Any](nShift + nQ + nRn)
          var j = 0
          while (j < nShift) {
            val o = shiftOff(j)
            if (o < 0) {
              val d = -o
              val slot = i % d
              if (i >= d) app(j) = lagRing(j)(slot)
              lagRing(j)(slot) = row.get(shiftIdx(j))
            } // leads resolved by later rows
            j += 1
          }
          j = 0
          while (j < nQ) {
            val res = qWin(j).quantiles(qArr(j))
            if (res != null) app(nShift + j) = res(0)
            // advance the frame: evict the value lookback rows back, admit
            // the current row (joins the window only for rows > i)
            val l = qLook(j)
            val slot = i % l
            if (i >= l) {
              val old = qRing(j)(slot)
              if (old != null) qWin(j).remove(old)
            }
            val curRaw =
              if (row.isNullAt(qIdx(j))) null
              else java.lang.Double.valueOf(row.getDouble(qIdx(j)))
            qRing(j)(slot) = curRaw
            if (curRaw != null) qWin(j).insert(curRaw)
            j += 1
          }
          if (nRn == 1) app(nShift + nQ) = i + 1
          app
        }

        new Iterator[Row] {
          override def hasNext: Boolean = it.hasNext || !pending.isEmpty
          override def next(): Row = {
            while (it.hasNext && pending.size <= maxLead) {
              val row = it.next()
              resolveLeads(row)
              pending.addLast((row, ingest(row)))
              i += 1
            }
            val (row, app) = pending.removeFirst()
            Row.fromSeq(row.toSeq ++ app)
          }
        }
      }(Encoders.row(outSchema))
      .toDF()
  }
}
