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

  private val InternalCols =
    Seq("__t", "__side", "__rp", "__lp", "__m", "__b", "__in", "__prev",
      "__carry_rp", "__last", "__carry")

  private def requireCleanInputs(
      left: DataFrame, right: DataFrame, keys: Seq[String], rightTime: String,
      prefix: String): Unit = {
    require(keys.nonEmpty, "as-of join requires at least one equi-key")
    require(right.columns.filterNot(keys.contains).contains(rightTime),
      s"rightTime $rightTime must be a non-key right column")
    val clash = (left.columns ++ right.columns).filter(InternalCols.contains)
    require(clash.isEmpty,
      s"inputs must not carry the internal columns ${clash.distinct.mkString(", ")}")
    // the output schema is left.columns ++ prefixed right payload; a left
    // column named like a prefixed right column would emit a duplicate
    // name that only explodes downstream (AMBIGUOUS_REFERENCE far from
    // the join call) — refuse with a diagnostic here instead
    val out = left.columns ++
      right.columns.filterNot(keys.contains).map(prefix + _)
    val dup = out.diff(out.distinct).distinct
    require(dup.isEmpty,
      s"output name collision ${dup.mkString(", ")}: left columns clash " +
        s"with prefixed right payload columns — pick a different prefix")
  }

  def join(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      direction: Direction = Backward,
      tolerance: Option[Long] = None,
      prefix: String = "asof_"): DataFrame = {
    requireCleanInputs(left, right, keys, rightTime, prefix)
    val rPayload = right.columns.filterNot(keys.contains)

    // both sides projected to (keys…, __t, __side, __rp, __lp); the null
    // side of each struct is typed from the other frame's schema
    // NULL right times never match (DuckDB ASOF semantics): without this
    // filter a null-timed row's non-null payload struct would sort first
    // and become the untolerance'd "prevailing" match
    val rProj = right.filter(col(rightTime).isNotNull).select(
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
    // same merge on the reversed time axis. NULL-timed LEFT rows must sort
    // FIRST in both directions so their running frame holds no right rows
    // (→ no match, mirroring the null-right-time filter above): asc's
    // default is already NULLS FIRST, but desc's is NULLS LAST — which
    // would hand a null-timed left row a frame containing EVERY right row
    // and silently match it to the earliest one (r13 review)
    val timeOrd = direction match {
      case Backward => col("__t").asc
      case Forward => col("__t").desc_nulls_first
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

  /** Skew-proof two-phase form — BIT-IDENTICAL output to [[join]] under a
    * different physical plan (the q85 sessionization pattern applied to
    * the as-of merge). [[join]] serializes each key into one task; a hot
    * key (bot/service account) becomes ONE straggler, and AQE splits
    * skewed joins, not skewed window partitions. Here:
    *
    *  1. the merge runs within (key, time bucket) — a hot key spreads
    *     over the buckets it spans;
    *  2. each (key, bucket)'s LAST right row is one aggregate row, and a
    *     running last over the BUCKET-GRANULAR frame (rows = distinct
    *     buckets, not events) yields the carry-in state per bucket;
    *  3. lefts unresolved within their bucket take the carry.
    *
    * Costs one extra exchange over the big frame at unskewed scale
    * (measured ~2× q100's single-exchange time, same trade as q85) and
    * stays flat under hot-key skew where the one-exchange form straggles
    * (SCALE.md round-7 skew rehearsal). Forward direction rides the same
    * code on the negated time axis.
    */
  def joinTwoPhase(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      direction: Direction = Backward,
      tolerance: Option[Long] = None,
      prefix: String = "asof_",
      bucketUs: Long = 6L * 3600 * 1000 * 1000): DataFrame = {
    requireCleanInputs(left, right, keys, rightTime, prefix)
    require(bucketUs > 0, s"bucketUs=$bucketUs (must be positive)")
    // this form's physical plan needs two things [[join]] does not: the
    // time axis folds by MULTIPLICATION (numeric times only — a
    // timestamp column works in join() but not here) and phase 2 takes
    // max(struct(__t, __rp)) (the payload must be ORDERABLE — no map
    // columns). Refuse with a diagnostic instead of an AnalysisException
    // deep inside the plan (r13 review).
    Seq(leftTime -> left, rightTime -> right).foreach { case (c, df) =>
      require(df.schema(c).dataType.isInstanceOf[
          org.apache.spark.sql.types.NumericType],
        s"joinTwoPhase needs a numeric time column; $c is " +
          s"${df.schema(c).dataType.simpleString} — use join(), or cast " +
          "timestamps to epoch numerics first")
    }
    val rPayload = right.columns.filterNot(keys.contains)
    rPayload.foreach { c =>
      require(org.apache.spark.sql.catalyst.expressions.RowOrdering
          .isOrderable(right.schema(c).dataType),
        s"joinTwoPhase's bucket aggregate orders the right payload; " +
          s"column $c (${right.schema(c).dataType.simpleString}) is not " +
          "orderable — drop it from right or use join()")
    }

    // direction folds into a sign flip of the time axis: backward as-of on
    // -t IS forward as-of on t (same inclusive tie rule)
    val sign = direction match { case Backward => 1L; case Forward => -1L }
    // same NULL-right-time exclusion as [[join]] — bit-identity contract
    val rProj = right.filter(col(rightTime).isNotNull).select(
      keys.map(col) :+ (col(rightTime) * sign).as("__t") :+
        struct(rPayload.map(col): _*).as("__rp"): _*)
    val lProj = left.select(
      keys.map(col) :+ (col(leftTime) * sign).as("__t") :+
        struct(left.columns.map(col): _*).as("__lp"): _*)
    val rpType = rProj.schema("__rp").dataType
    val lpType = lProj.schema("__lp").dataType
    // floor division (negative-safe) so bucket order == time order
    def bucketOf(t: Column): Column = RangeJoin.floorDiv(t, bucketUs)
    val unioned =
      rProj.select(keys.map(col) :+ col("__t") :+ lit(0).as("__side") :+
        col("__rp") :+ lit(null).cast(lpType).as("__lp"): _*)
      .unionByName(
        lProj.select(keys.map(col) :+ col("__t") :+ lit(1).as("__side") :+
          lit(null).cast(rpType).as("__rp") :+ col("__lp"): _*))
      .withColumn("__b", bucketOf(col("__t")))

    // phase 1: the same merge, partitioned on (keys, bucket)
    val wIn = Window.partitionBy((keys.map(col) :+ col("__b")): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = last(col("__rp"), ignoreNulls = true).over(wIn)

    // phase 2: per-(key, bucket) last right → running carry on the
    // bucket-granular frame (rows = buckets, immune to event-count skew).
    // The frame must contain every LEFT bucket too — a left in a
    // right-free bucket still needs the carry from earlier buckets — so
    // both sides' buckets union in (left buckets contribute a null last)
    val bucketLast = rProj
      .withColumn("__b", bucketOf(col("__t")))
      .groupBy((keys.map(col) :+ col("__b")): _*)
      .agg(max(struct(col("__t"), col("__rp"))).as("__last"))
    val lastType = bucketLast.schema("__last").dataType
    val allBuckets = bucketLast
      .unionByName(lProj
        .withColumn("__b", bucketOf(col("__t")))
        .select((keys.map(col) :+ col("__b")): _*).distinct()
        .withColumn("__last", lit(null).cast(lastType)))
      .groupBy((keys.map(col) :+ col("__b")): _*)
      .agg(max(col("__last")).as("__last"))
    val wCarry = Window.partitionBy(keys.map(col): _*).orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = allBuckets
      .withColumn("__carry", last(col("__last"), ignoreNulls = true).over(wCarry))
      .select((keys.map(col) :+ col("__b") :+
        col("__carry").getField("__rp").as("__carry_rp")): _*)

    val resolved = unioned
      .withColumn("__in", inBucket)
      .filter(col("__side") === 1)
      .join(carry, keys :+ "__b", "left")
      .withColumn("__prev", coalesce(col("__in"), col("__carry_rp")))
    // __rp carries the ORIGINAL right time; only __t was sign-folded
    val matchedT = col("__prev").getField(rightTime)
    val lT = col("__t") * sign
    val withinTol: Column = tolerance match {
      case None => lit(true)
      case Some(tol) => direction match {
        case Backward => lT - matchedT <= tol
        case Forward => matchedT - lT <= tol
      }
    }
    val matched = when(col("__prev").isNotNull && withinTol, col("__prev"))
    resolved
      .withColumn("__m", matched)
      .select(left.columns.map(c => col("__lp").getField(c).as(c)) ++
        rPayload.map(c => col("__m").getField(c).as(prefix + c)): _*)
  }
}
