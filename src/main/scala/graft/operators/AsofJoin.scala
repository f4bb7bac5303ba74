package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of (point-in-time) join — for each left row, the single
  * right row with the greatest right-time ≤ left-time (backward) or the
  * smallest right-time ≥ left-time (forward) within the same key, optionally
  * within a tolerance window. The canonical time-series enrichment operator
  * (pandas `merge_asof`, DuckDB `ASOF JOIN`, kdb `aj`): the reference's
  * per-(symbol, threshold) bar slices make every cross-slice alignment an
  * as-of lookup, and a training-data pipeline uses the same shape to attach
  * the prevailing label/metadata snapshot to each example.
  *
  * PLAN — union-merge, not a range join. A naive formulation
  * (`l JOIN r ON l.k = r.k AND r.t <= l.t` + per-left-row argmax) explodes
  * to O(|L|·|R|) pairs per key before the argmax prunes them; an
  * interval-bucketed range join bounds the blowup but still duplicates
  * right rows per bucket and pays a second aggregation. Here both sides are
  * tagged and UNIONed, hash-partitioned by key, and sorted once on
  * (time, side); a running `last(right_payload, ignoreNulls)` over the
  * unbounded-preceding frame then carries the prevailing right row onto
  * every left row in a single pass. One exchange per side, one sort, zero
  * row amplification — the same physical shape as any window stage, so a
  * 1000-executor layout is the key-hash layout it already has. Spark's
  * UnboundedPreceding window frame processor is incremental (it never
  * rebuilds the frame), so the pass is O(rows), not O(rows × history).
  *
  * Ties: a right row AT the left row's time matches (≤ / ≥ are inclusive),
  * ordered by (time, side) with right-before-left at equal times.
  * CONTRACT: (keys, rightTime) must uniquely key `right` — with duplicate
  * right times "the" prevailing row is ill-defined and any distributed
  * answer is arrival-order-dependent; callers pre-aggregate to the time
  * grain instead (AsofQueries does; AsofJoinSpec enforces the failure).
  *
  * Skew: one hot key serializes into one task, exactly like any
  * partitioned window (the q81 rehearsal); the q85 two-phase mitigation
  * (bucket the time axis, resolve bucket boundaries on the
  * bucket-granular frame) applies verbatim if a key ever rivals a task.
  *
  * Output: every left column, plus each non-key right column as
  * `prefix+name` (the matched right time among them), NULL when no right
  * row qualifies (left-outer semantics; filter `prefix+rightTime IS NOT
  * NULL` for inner).
  */
object AsofJoin {

  sealed trait Direction
  /** Greatest right time ≤ left time. */
  case object Backward extends Direction
  /** Smallest right time ≥ left time. */
  case object Forward extends Direction

  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      direction: Direction = Backward,
      tolerance: Option[Long] = None,
      prefix: String = "asof_"): DataFrame = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key")
    val rPayload = right.columns.filterNot(keys.contains)
    require(rPayload.contains(rightTime), s"rightTime $rightTime must be a non-key right column")

    // both sides projected to (keys…, __t, __side, __rp, __lp); the null
    // side of each struct is typed from the other frame's schema
    val rProj = right.select(
      keys.map(col) :+ col(rightTime).as("__t") :+
        struct(rPayload.map(col): _*).as("__rp"): _*)
    val lProj = left.select(
      keys.map(col) :+ col(leftTime).as("__t") :+
        struct(left.columns.map(col): _*).as("__lp"): _*)
    val rpType = rProj.schema("__rp").dataType
    val lpType = lProj.schema("__lp").dataType
    val unioned =
      rProj.select(keys.map(col) :+ col("__t") :+ lit(0).as("__side") :+
        col("__rp") :+ lit(null).cast(lpType).as("__lp"): _*)
      .unionByName(
        lProj.select(keys.map(col) :+ col("__t") :+ lit(1).as("__side") :+
          lit(null).cast(rpType).as("__rp") :+ col("__lp"): _*))

    // right-before-left at equal times makes ≤/≥ inclusive; Forward is the
    // same merge on the reversed time axis
    val timeOrd = direction match {
      case Backward => col("__t").asc
      case Forward => col("__t").desc
    }
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(timeOrd, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prevailing = last(col("__rp"), ignoreNulls = true).over(w)
    val matchedT = prevailing.getField(rightTime)
    val withinTol: Column = tolerance match {
      case None => lit(true)
      case Some(tol) => direction match {
        case Backward => col("__t") - matchedT <= tol
        case Forward => matchedT - col("__t") <= tol
      }
    }
    val matched = when(prevailing.isNotNull && withinTol, prevailing)
    unioned
      .withColumn("__m", matched)
      .filter(col("__side") === 1)
      .select(left.columns.map(c => col("__lp").getField(c).as(c)) ++
        rPayload.map(c => col("__m").getField(c).as(prefix + c)): _*)
  }
}
