package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.{ErfAS, GraftFunctions}

/** SQL-facing eval-layer queries (SURVEY.md §2.11): the reference's
  * per-config statistical metrics restated as oracle-checkable DataFrame
  * aggregations over the events-derived bar-return series (one series per
  * event_type = the config analogue; the real engine fans the same
  * aggregations out over 10⁴–10⁵ configs).
  *
  * Scale notes: every query is one groupBy over a windowed projection —
  * partial aggregation and a single shuffle on the series key. The sorted-
  * array metrics (Rachev, CDaR) collect per-series arrays; at the
  * reference's scale (≤ ~10³ trades per config) those arrays are tiny; the
  * parallelism axis is the number of series, not the series length.
  * Cross-engine float parity: cumulative sums are windowed (sequential,
  * deterministic order both engines) and tail means are sequential folds,
  * so doubles match bit-for-bit before rounding.
  */
object EvalQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Per-bar return series r = (close−open)/open per event_type, with the
    * reference's P4 nullIf divide guard (sql/gen200_triple_barrier.sql:286;
    * 434 uses): zero-open bars exist at larger SFs and Spark 4 ANSI mode
    * turns an unguarded divide into DIVIDE_BY_ZERO. Zero-open rows are
    * dropped (identically in the DuckDB CTE) so every downstream r is
    * defined. */
  private def returns(spark: SparkSession, d: String): DataFrame =
    EventBars.bars(spark, d)
      .filter(col("open") =!= 0.0)
      .withColumn("r", (col("close") - col("open")) / nullif(col("open"), lit(0.0)))

  private val duckReturnsCte: String =
    s"""${EventBars.duckCte},
       |rets AS (
       |  SELECT event_type, ts_us, event_id, rn, close,
       |         (close - open) / nullif(open, 0) AS r
       |  FROM bars WHERE open <> 0)""".stripMargin

  // ---------------------------------------------------------------------------
  // q33 — Omega ratio + win rate (E5, eval/omega.py:28-37; L=0 ≡ profit
  // factor). Pure conditional sums — map-side partial aggregation.
  def q33OmegaWinrate(spark: SparkSession, d: String): DataFrame =
    returns(spark, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // P4: an all-positive series zeroes the loss-side denominator —
        // nullif keeps ANSI mode from throwing and matches DuckDB's NULL
        round(sum(greatest(col("r"), lit(0.0))) /
          nullif(sum(greatest(-col("r"), lit(0.0))), lit(0.0)), 4).as("omega_0"),
        round(sum(greatest(col("r") - 0.001, lit(0.0))) /
          nullif(sum(greatest(lit(0.001) - col("r"), lit(0.0))), lit(0.0)), 4).as("omega_l"),
        round(count_if(col("r") > 0).cast("double") / count(lit(1)), 4).as("win_rate"))
      .orderBy(col("event_type"))

  val q33Sql: String =
    s"""$duckReturnsCte
       |SELECT event_type, count(*) AS n,
       |  round(sum(greatest(r, 0.0)) / nullif(sum(greatest(-r, 0.0)), 0.0), 4) AS omega_0,
       |  round(sum(greatest(r - 0.001, 0.0)) / nullif(sum(greatest(0.001 - r, 0.0)), 0.0), 4) AS omega_l,
       |  round(count(*) FILTER (WHERE r > 0) / count(*)::DOUBLE, 4) AS win_rate
       |FROM rets GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------------
  // q34 — Rachev ratio (E3, eval/rachev.py:19-52): tail k = max(1,⌊n·0.05⌋),
  // CVaR_up/|CVaR_low| from the sorted return array, cap 10, NULL artifact
  // guard. Tail means are sequential folds for bit parity.
  def q34Rachev(spark: SparkSession, d: String): DataFrame =
    returns(spark, d)
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("r"))).as("arr"))
      .withColumn("n", size(col("arr")))
      .filter(col("n") >= 20)
      .withColumn("k", greatest(lit(1), floor(col("n") * 0.05)).cast("int"))
      .withColumn("cvar_up",
        expr("aggregate(slice(arr, n - k + 1, k), 0D, (a, x) -> a + x)") / col("k"))
      .withColumn("cvar_low_abs",
        abs(expr("aggregate(slice(arr, 1, k), 0D, (a, x) -> a + x)") / col("k")))
      .select(col("event_type"), col("n"), col("k"),
        round(when(col("cvar_low_abs") < 1e-12, lit(null))
          .otherwise(least(col("cvar_up") / col("cvar_low_abs"), lit(10.0))), 6)
          .as("rachev"))
      .orderBy(col("event_type"))

  val q34Sql: String =
    s"""$duckReturnsCte,
       |arrs AS (
       |  SELECT event_type, list(r ORDER BY r) AS arr, count(*) AS n
       |  FROM rets GROUP BY event_type),
       |tails AS (
       |  SELECT event_type, n,
       |    greatest(1, CAST(floor(n * 0.05) AS INT)) AS k, arr
       |  FROM arrs WHERE n >= 20),
       |cv AS (
       |  SELECT event_type, n, k,
       |    list_reduce(list_slice(arr, n - k + 1, n), (a, x) -> a + x) / k AS cvar_up,
       |    abs(list_reduce(list_slice(arr, 1, k), (a, x) -> a + x) / k) AS cvar_low_abs
       |  FROM tails)
       |SELECT event_type, CAST(n AS INT) AS n, k,
       |  round(CASE WHEN cvar_low_abs < 1e-12 THEN NULL
       |        ELSE least(cvar_up / cvar_low_abs, 10.0) END, 6) AS rachev
       |FROM cv ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------------
  // q35 — CDaR (E4, eval/cdar.py:20-31): drawdown curve from windowed
  // cumsum/running-max (deterministic order both engines), mean of the
  // worst 5% of drawdowns.
  def q35Cdar(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    returns(spark, d)
      .withColumn("cum", sum(col("r")).over(w))
      .withColumn("run_max", max(col("cum")).over(w))
      .withColumn("dd", col("run_max") - col("cum"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(col("dd")), asc = false).as("dds"))
      .withColumn("n", size(col("dds")))
      .withColumn("k", greatest(lit(1), floor(col("n") * 0.05)).cast("int"))
      .select(col("event_type"), col("n"), col("k"),
        round(expr("aggregate(slice(dds, 1, k), 0D, (a, x) -> a + x)") / col("k"), 6)
          .as("cdar"))
      .orderBy(col("event_type"))
  }

  val q35Sql: String =
    s"""$duckReturnsCte,
       |cums AS (
       |  SELECT event_type, ts_us, event_id,
       |    sum(r) OVER w AS cum
       |  FROM rets
       |  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |dd AS (
       |  SELECT event_type,
       |    max(cum) OVER w2 - cum AS dd
       |  FROM cums
       |  WINDOW w2 AS (PARTITION BY event_type ORDER BY ts_us, event_id
       |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |arrs AS (
       |  SELECT event_type, list(dd ORDER BY dd DESC) AS dds, count(*) AS n
       |  FROM dd GROUP BY event_type)
       |SELECT event_type, CAST(n AS INT) AS n,
       |  greatest(1, CAST(floor(n * 0.05) AS INT)) AS k,
       |  round(list_reduce(list_slice(dds, 1, greatest(1, CAST(floor(n * 0.05) AS INT))),
       |        (a, x) -> a + x) / greatest(1, CAST(floor(n * 0.05) AS INT)), 6) AS cdar
       |FROM arrs ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------------
  // q98/q99 — the SCALE lanes for the two tail-mean evals (q35 CDaR, q34
  // Rachev), same oracles. q34/q35 materialize each series' full sorted
  // return/drawdown array inside one aggregation buffer (collect_list →
  // sort_array → sequential fold) — exact and fine at bench scale, but the
  // buffer is O(series length) on a single row, the same shape that OOMs
  // at 10⁹-bar histories. The lane replaces the array with a per-series
  // WINDOW sort (UnsafeExternalSorter: spillable, parallel across series)
  // + row_number, and turns "mean of the sorted tail slice" into
  // conditional sums over rank — mean(top-k) = Σ r·[rank > n−k] / k,
  // exact under ties because tied boundary values are interchangeable.
  // Only the summation ORDER differs from the fold, which the 6 dp
  // rounding both queries already carry absorbs.
  def q98CdarScaled(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val dds = returns(spark, d)
      .withColumn("cum", sum(col("r")).over(w))
      .withColumn("run_max", max(col("cum")).over(w))
      .withColumn("dd", col("run_max") - col("cum"))
    val counts = dds.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("int").as("n"))
      .withColumn("k", greatest(lit(1), floor(col("n") * 0.05)).cast("int"))
    val wAsc = Window.partitionBy(col("event_type"))
      .orderBy(col("dd").asc, col("ts_us"), col("event_id"))
    dds.withColumn("ra", row_number().over(wAsc))
      .join(broadcast(counts), "event_type")
      .groupBy(col("event_type"))
      .agg(any_value(col("n")).as("n"), any_value(col("k")).as("k"),
        round(sum(when(col("ra") > col("n") - col("k"), col("dd")))
          / any_value(col("k")), 6).as("cdar"))
      .orderBy(col("event_type"))
  }

  def q99RachevScaled(spark: SparkSession, d: String): DataFrame = {
    val rets = returns(spark, d)
    val counts = rets.groupBy(col("event_type"))
      .agg(count(lit(1)).cast("int").as("n"))
      .filter(col("n") >= 20)
      .withColumn("k", greatest(lit(1), floor(col("n") * 0.05)).cast("int"))
    val wAsc = Window.partitionBy(col("event_type"))
      .orderBy(col("r").asc, col("ts_us"), col("event_id"))
    // ONE sort serves both tails: bottom-k is rank ≤ k, top-k is
    // rank > n − k
    rets.withColumn("ra", row_number().over(wAsc))
      .join(broadcast(counts), "event_type")
      .groupBy(col("event_type"))
      .agg(any_value(col("n")).as("n"), any_value(col("k")).as("k"),
        (sum(when(col("ra") > col("n") - col("k"), col("r")))
          / any_value(col("k"))).as("cvar_up"),
        abs(sum(when(col("ra") <= col("k"), col("r")))
          / any_value(col("k"))).as("cvar_low_abs"))
      .select(col("event_type"), col("n"), col("k"),
        round(when(col("cvar_low_abs") < 1e-12, lit(null))
          .otherwise(least(col("cvar_up") / col("cvar_low_abs"), lit(10.0))), 6)
          .as("rachev"))
      .orderBy(col("event_type"))
  }

  // ---------------------------------------------------------------------------
  // q36 — E-values + GROW (E8, eval/evalues.py:26-56) at fixed bet f=0.01:
  // log-space running product with 1e10 cap, max-E rejection at 1/α=20,
  // first-rejection index, mean log growth.
  def q36Evalues(spark: SparkSession, d: String): DataFrame = {
    val f = 0.01
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(col("event_type")).orderBy(col("ts_us"), col("event_id"))
    returns(spark, d)
      .withColumn("lf", log(lit(1.0) + lit(f) * col("r")))
      .withColumn("cum", least(sum(col("lf")).over(w), log(lit(1e10))))
      .withColumn("idx", row_number().over(wAll))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        round(exp(max_by(col("cum"), col("idx"))), 6).as("final_evalue"),
        round(exp(max(col("cum"))), 6).as("max_evalue"),
        round(avg(col("lf")), 8).as("grow"),
        (max(col("cum")) >= log(lit(20.0))).cast("int").as("rejects_null"),
        coalesce(min(when(col("cum") >= log(lit(20.0)), col("idx"))), lit(-1L))
          .as("first_rejection"))
      .orderBy(col("event_type"))
  }

  val q36Sql: String =
    s"""$duckReturnsCte,
       |lf AS (
       |  SELECT event_type, ts_us, event_id,
       |    ln(1.0 + 0.01 * r) AS lf
       |  FROM rets),
       |cums AS (
       |  SELECT event_type, lf,
       |    least(sum(lf) OVER w, ln(1e10)) AS cum,
       |    row_number() OVER (PARTITION BY event_type ORDER BY ts_us, event_id) AS idx
       |  FROM lf
       |  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
       |SELECT event_type, count(*) AS n,
       |  round(exp(max(CASE WHEN idx = (SELECT max(c2.idx) FROM cums c2
       |                                 WHERE c2.event_type = cums.event_type)
       |                THEN cum END)), 6) AS final_evalue,
       |  round(exp(max(cum)), 6) AS max_evalue,
       |  round(avg(lf), 8) AS grow,
       |  CAST(max(cum) >= ln(20.0) AS INT) AS rejects_null,
       |  coalesce(min(CASE WHEN cum >= ln(20.0) THEN idx END), -1) AS first_rejection
       |FROM cums GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------------
  // q37 — OU calibration (E7, eval/ou_barriers.py:28-56) as closed-form OLS
  // from sufficient statistics: b = Sxy/Sxx on (X_t, ΔX), μ = −b,
  // σ² = Var_pop(ΔX) − b²·Var_pop(X) (residual orthogonality),
  // half_life = ln2/μ, TP_OU = σ·√hl / mean price. One aggregation pass —
  // no per-row regression, no second pass for residuals.
  def q37OuCalibration(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_us"), col("event_id"))
    returns(spark, d)
      .withColumn("x", lag(col("close"), 1).over(w))
      .withColumn("y", col("close") - col("x"))
      // No lag-null filter: the OLS moments skip the first row anyway (avg
      // ignores the NULL x/y), but mean_price must cover ALL prices — the
      // reference takes np.mean over the full series (ou_barriers.py:48),
      // and eval/Stats.calibrateOu does the same (the r10 q122 fix,
      // EvalStatsQueries.scala:263; EvalStatsCrossCheckSpec pins q37 ≡
      // calibrateOu so the two cannot drift again). n stays the pair
      // count: count(x) skips the NULL first row.
      .groupBy(col("event_type"))
      .agg(
        count(col("x")).as("n"),
        avg(col("x")).as("xb"), avg(col("y")).as("yb"),
        (avg(col("x") * col("y")) - avg(col("x")) * avg(col("y"))).as("cov_xy"),
        (avg(col("x") * col("x")) - avg(col("x")) * avg(col("x"))).as("var_x"),
        (avg(col("y") * col("y")) - avg(col("y")) * avg(col("y"))).as("var_y"),
        avg(col("close")).as("mean_price"))
      .withColumn("b", col("cov_xy") / nullif(col("var_x"), lit(0.0)))
      .withColumn("mu", -col("b"))
      .withColumn("sigma", sqrt(greatest(col("var_y") - col("b") * col("b") * col("var_x"), lit(0.0))))
      .withColumn("half_life", when(col("mu") > 0, log(lit(2.0)) / col("mu")))
      .withColumn("tp_frac",
        when(col("mu") > 0, col("sigma") * sqrt(col("half_life")) / nullif(col("mean_price"), lit(0.0))))
      .select(col("event_type"), col("n"),
        round(col("mu"), 6).as("mu"),
        round(col("sigma"), 6).as("sigma"),
        round(col("half_life"), 6).as("half_life"),
        round(col("tp_frac"), 8).as("tp_frac"))
      .orderBy(col("event_type"))
  }

  val q37Sql: String =
    s"""$duckReturnsCte,
       |xy AS (
       |  SELECT event_type, close,
       |    lag(close, 1) OVER (PARTITION BY event_type ORDER BY ts_us, event_id) AS x
       |  FROM rets),
       |suff AS (
       |  SELECT event_type, count(x) AS n,
       |    avg(x * (close - x)) - avg(x) * avg(close - x) AS cov_xy,
       |    avg(x * x) - avg(x) * avg(x) AS var_x,
       |    avg((close - x) * (close - x)) - avg(close - x) * avg(close - x) AS var_y,
       |    avg(close) AS mean_price
       |  FROM xy GROUP BY event_type),
       |cal AS (
       |  SELECT event_type, n, -(cov_xy / nullif(var_x, 0.0)) AS mu,
       |    sqrt(greatest(var_y - (cov_xy / nullif(var_x, 0.0)) * (cov_xy / nullif(var_x, 0.0)) * var_x, 0.0)) AS sigma,
       |    mean_price
       |  FROM suff)
       |SELECT event_type, n,
       |  round(mu, 6) AS mu,
       |  round(sigma, 6) AS sigma,
       |  round(CASE WHEN mu > 0 THEN ln(2.0) / mu END, 6) AS half_life,
       |  round(CASE WHEN mu > 0 THEN sigma * sqrt(ln(2.0) / mu) / nullif(mean_price, 0.0) END, 8) AS tp_frac
       |FROM cal ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------------
  // q38 — PSR (E1, eval/dsr.py:35-51): SR from sample moments, s.e. with
  // the skew/kurt correction, Φ via the shared A&S erf approximation so
  // both engines evaluate identical arithmetic (GraftFunctions.erfAS ≡
  // ErfAS.duckSql).
  def q38Psr(spark: SparkSession, d: String): DataFrame = {
    val n = count(lit(1)).cast("double")
    returns(spark, d)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        (avg(col("r")) / nullif(stddev_samp(col("r")), lit(0.0))).as("sr"),
        GraftFunctions.skewSamp(col("r"), n).as("skew"),
        (GraftFunctions.kurtSampExcess(col("r"), n) + lit(3.0)).as("kurt"))
      .withColumn("se",
        sqrt(greatest(lit(1.0) + lit(0.5) * col("sr") * col("sr")
          - col("skew") * col("sr")
          + (col("kurt") - 3.0) / 4.0 * col("sr") * col("sr"), lit(1e-10)) / col("n")))
      .withColumn("psr",
        lit(0.5) * (lit(1.0) + GraftFunctions.erfAS(col("sr") / col("se") / math.sqrt(2.0))))
      .select(col("event_type"), col("n"),
        round(col("sr"), 6).as("sr"),
        round(col("skew"), 6).as("skew"),
        round(col("kurt"), 6).as("kurt"),
        round(col("se"), 6).as("se"),
        round(col("psr"), 6).as("psr"))
      .orderBy(col("event_type"))
  }

  val q38Sql: String = {
    val z = "((sr / se) / sqrt(2.0))"
    s"""$duckReturnsCte,
       |m AS (
       |  SELECT event_type, count(*) AS n,
       |    avg(r) / nullif(stddev_samp(r), 0.0) AS sr,
       |    skewness(r) AS skew,
       |    kurtosis(r) + 3.0 AS kurt
       |  FROM rets GROUP BY event_type),
       |s AS (
       |  SELECT event_type, n, sr, skew, kurt,
       |    sqrt(greatest(1.0 + 0.5 * sr * sr - skew * sr
       |         + (kurt - 3.0) / 4.0 * sr * sr, 1e-10) / n) AS se
       |  FROM m)
       |SELECT event_type, n,
       |  round(sr, 6) AS sr, round(skew, 6) AS skew, round(kurt, 6) AS kurt,
       |  round(se, 6) AS se,
       |  round(0.5 * (1.0 + ${ErfAS.duckSql(z)}), 6) AS psr
       |FROM s ORDER BY event_type""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q42 — time-range rolling window (E29, scripts/gen800_rolling_rdd.py:
  // 38-46: calendar-window return/vol ratio distribution): per series a
  // trailing 1-day RANGE frame on the microsecond axis computes window
  // return, volatility and their ratio; the per-series distribution is
  // then summarized. RANGE frames (not ROWS) are the operator under test.
  def q42RollingRangeWindow(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    // Trailing 1-day RANGE frame on the µs axis. Spark's WindowExec replays
    // the whole frame per output row for sliding frames (no retraction), in
    // interpreted aggregate machinery — ~40 s at sf0.1 (avg frame ≈ 650
    // rows). This per-series two-pointer loop does the IDENTICAL
    // left-to-right replay (same frame set [t−T, t], same Welford
    // recurrence as CentralMomentAgg, so float results match the
    // declarative form) in primitive arrays: same O(n·w) worst case,
    // ~30× cheaper constant, same per-series partitioning as WindowExec.
    val T = 86400000000L
    val winStats = returns(spark, d)
      .select(col("event_type"), col("ts_us"), col("r"))
      .as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (et, it) =>
        val rows = it.toArray.sortBy(_._2)
        val ts = rows.map(_._2)
        val r = rows.map(_._3)
        var lo = 0
        Iterator.tabulate(rows.length) { i =>
          while (ts(lo) < ts(i) - T) lo += 1
          var cnt = 0L; var sum = 0.0; var avg = 0.0; var m2 = 0.0
          var j = lo
          while (j <= i) {
            sum += r(j)
            cnt += 1
            val delta = r(j) - avg
            avg += delta / cnt
            m2 += delta * (r(j) - avg)
            j += 1
          }
          val vol: Option[Double] =
            if (cnt > 1) Some(math.sqrt(m2 / (cnt - 1))) else None
          (et, ts(i), cnt, sum, vol)
        }
      }
      .toDF("event_type", "ts_us", "win_n", "win_ret", "win_vol")
    winStats
      .withColumn("ratio",
        when(col("win_vol") > 0, least(col("win_ret") / col("win_vol"), lit(50.0))))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        min(col("win_n")).as("min_win_n"),
        max(col("win_n")).as("max_win_n"),
        round(avg(col("ratio")), 4).as("avg_ratio"),
        round(min(col("ratio")), 4).as("worst_ratio"),
        round(max(col("ratio")), 4).as("best_ratio"))
      .orderBy(col("event_type"))
  }

  val q42Sql: String =
    s"""$duckReturnsCte,
       |win AS (
       |  SELECT event_type,
       |    count(*) OVER w AS win_n,
       |    sum(r) OVER w AS win_ret,
       |    stddev_samp(r) OVER w AS win_vol
       |  FROM rets
       |  WINDOW w AS (PARTITION BY event_type ORDER BY ts_us
       |               RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)),
       |rat AS (
       |  SELECT event_type, win_n,
       |    CASE WHEN win_vol > 0 THEN least(win_ret / win_vol, 50.0) END AS ratio
       |  FROM win)
       |SELECT event_type, count(*) AS n,
       |  min(win_n) AS min_win_n, max(win_n) AS max_win_n,
       |  round(avg(ratio), 4) AS avg_ratio,
       |  round(min(ratio), 4) AS worst_ratio,
       |  round(max(ratio), 4) AS best_ratio
       |FROM rat GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------------------
  // q56 — WFO fold construction + per-fold OOS metrics (E17+E20,
  // eval/walk_forward.py:45-102,105-201) as ONE oracle-checkable query.
  // Fold arithmetic is pure integer math on the per-series signal index
  // (bar-index space, never timestamps — the reference's pinned rule), so
  // it inlines as window expressions: nSplits = max(5, n/200), testSize =
  // max(1, n/nSplits), trainSize = min(5·testSize, max(testSize,
  // n−purge−testSize)), test fold k spans [trainSize+purge+k·testSize,
  // +testSize), kept only when it fits and its (rolling, purged) train
  // window holds ≥ 2·testSize rows. Identical formulas in the DuckDB
  // oracle; FoldsSpec separately pins buildWfoFolds to the same indices,
  // so the distributed query, the eval layer, and the oracle agree.
  // Per-fold PF follows the reference's E20 rule: losses=0 → 10.0 when
  // wins>0 else NULL; otherwise capped at 10.
  def q56WfoFoldMetrics(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_us"), col("event_id"))
    val wAll = Window.partitionBy(col("event_type"))
    val wins = sum(greatest(col("r"), lit(0.0)))
    val losses = sum(greatest(-col("r"), lit(0.0)))
    returns(spark, d)
      .withColumn("idx", row_number().over(w).cast("long") - 1)
      .withColumn("n", count(lit(1)).over(wAll))
      .withColumn("test_size",
        greatest(lit(1L), expr("n div greatest(5, n div 200)")))
      .withColumn("train_size",
        least(col("test_size") * 5,
          greatest(col("test_size"), col("n") - 100 - col("test_size"))))
      .filter(col("idx") >= col("train_size") + 100)
      .withColumn("fold", expr("(idx - train_size - 100) div test_size"))
      .withColumn("fold_start", col("train_size") + 100 + col("fold") * col("test_size"))
      .filter(col("fold_start") + col("test_size") <= col("n") &&
        least(col("fold_start") - 100, col("train_size")) >= col("test_size") * 3)
      .groupBy(col("event_type"), col("fold"))
      .agg(
        count(lit(1)).as("n_test"),
        round(count_if(col("r") > 0).cast("double") / count(lit(1)), 4).as("win_rate"),
        round(when(losses === 0.0, when(wins > 0.0, lit(10.0)).otherwise(lit(null)))
          .otherwise(least(wins / losses, lit(10.0))), 4).as("pf"),
        round(sum(col("r")), 6).as("total_ret"))
      .orderBy(col("event_type"), col("fold"))
  }

  val q56Sql: String =
    s"""$duckReturnsCte,
       |ix AS (
       |  SELECT event_type, r,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY ts_us, event_id) - 1 AS idx,
       |    count(*) OVER (PARTITION BY event_type) AS n
       |  FROM rets),
       |sz AS (
       |  SELECT *, greatest(1, n // greatest(5, n // 200)) AS test_size,
       |    least(greatest(1, n // greatest(5, n // 200)) * 5,
       |      greatest(greatest(1, n // greatest(5, n // 200)),
       |        n - 100 - greatest(1, n // greatest(5, n // 200)))) AS train_size
       |  FROM ix),
       |f AS (
       |  SELECT *, (idx - train_size - 100) // test_size AS fold,
       |    train_size + 100 + ((idx - train_size - 100) // test_size) * test_size
       |      AS fold_start
       |  FROM sz WHERE idx >= train_size + 100),
       |kept AS (
       |  SELECT * FROM f
       |  WHERE fold_start + test_size <= n
       |    AND least(fold_start - 100, train_size) >= test_size * 3)
       |SELECT event_type, fold, count(*) AS n_test,
       |  round(count(*) FILTER (WHERE r > 0) / count(*)::DOUBLE, 4) AS win_rate,
       |  round(CASE WHEN sum(greatest(-r, 0.0)) = 0.0
       |    THEN CASE WHEN sum(greatest(r, 0.0)) > 0.0 THEN 10.0 END
       |    ELSE least(sum(greatest(r, 0.0)) / sum(greatest(-r, 0.0)), 10.0)
       |  END, 4) AS pf,
       |  round(sum(r), 6) AS total_ret
       |FROM kept GROUP BY event_type, fold ORDER BY event_type, fold""".stripMargin

  // ---------------------------------------------------------------------------
  // q58 — combinatorial purged CV (E18, eval/walk_forward.py:331-380) as an
  // oracle-checkable query: [0,n) split into 10 contiguous groups with
  // floored bounds b_g = g·n/10; all C(10,2)=45 test-pair combos; train =
  // everything outside the two test blocks minus a 100-bar purge before and
  // a 10-bar embargo after each. Group membership inverts the floored
  // bounds in closed form — g = (10·idx+9) div n — so the whole fold
  // structure is row-local arithmetic against a 45-row broadcast combo
  // table: one fact pass, fan-out 45, one groupBy. Per-combo IS/OOS
  // metrics use the E20 PF rule; FoldsSpec-style parity with
  // buildCpcvFolds is pinned index-for-index in WalkForwardSpec.
  // Scale note: the 45× row fan-out is fine at the eval layer's size; for
  // a fact-scale input the additive form is a ~30-segment sufficient-stats
  // pass with combo assembly over segment sums — implemented for CSCV in
  // eval/Resampling (per-block sufficient stats), the same trick applies.
  private val cpcvCombos: Seq[(Int, Int, Int)] = (for {
    a <- 0 until 10; b <- (a + 1) until 10
  } yield (a, b)).zipWithIndex.map { case ((a, b), i) => (i, a, b) }

  def q58CpcvFoldMetrics(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts_us"), col("event_id"))
    val wAll = Window.partitionBy(col("event_type"))
    val combos = cpcvCombos.toDF("combo_id", "ga", "gb")
    def blockExcl(g: String): Column =
      expr(s"idx >= greatest($g * n div 10 - 100, 0) AND " +
        s"idx < least(($g + 1) * n div 10 + 10, n)")
    def pf(inSet: Column): Column = {
      val wins = sum(when(inSet, greatest(col("r"), lit(0.0))).otherwise(0.0))
      val losses = sum(when(inSet, greatest(-col("r"), lit(0.0))).otherwise(0.0))
      when(losses === 0.0, when(wins > 0.0, lit(10.0)).otherwise(lit(null)))
        .otherwise(least(wins / losses, lit(10.0)))
    }
    returns(spark, d)
      .withColumn("idx", row_number().over(w).cast("long") - 1)
      .withColumn("n", count(lit(1)).over(wAll))
      .crossJoin(broadcast(combos))
      .withColumn("g", expr("(10 * idx + 9) div n"))
      .withColumn("is_test", col("g") === col("ga") || col("g") === col("gb"))
      .withColumn("is_train", !(blockExcl("ga") || blockExcl("gb")))
      .groupBy(col("event_type"), col("combo_id"))
      .agg(
        count_if(col("is_test")).as("n_test"),
        count_if(col("is_train")).as("n_train"),
        round(count_if(col("is_test") && col("r") > 0).cast("double") /
          nullif(count_if(col("is_test")).cast("double"), lit(0.0)), 4)
          .as("test_win_rate"),
        round(pf(col("is_test")), 4).as("test_pf"),
        round(pf(col("is_train")), 4).as("train_pf"),
        round(sum(when(col("is_test"), col("r")).otherwise(0.0)), 6)
          .as("test_total_ret"))
      .orderBy(col("event_type"), col("combo_id"))
  }

  val q58Sql: String = {
    val comboValues = cpcvCombos.map { case (i, a, b) => s"($i, $a, $b)" }.mkString(", ")
    def blockExclSql(g: String): String =
      s"(idx >= greatest($g * n // 10 - 100, 0) AND idx < least(($g + 1) * n // 10 + 10, n))"
    def pfSql(set: String): String = {
      val wins = s"sum(CASE WHEN $set THEN greatest(r, 0.0) ELSE 0.0 END)"
      val losses = s"sum(CASE WHEN $set THEN greatest(-r, 0.0) ELSE 0.0 END)"
      s"""CASE WHEN $losses = 0.0
         |    THEN CASE WHEN $wins > 0.0 THEN 10.0 END
         |    ELSE least($wins / $losses, 10.0) END""".stripMargin
    }
    s"""$duckReturnsCte,
       |ix AS (
       |  SELECT event_type, r,
       |    row_number() OVER (PARTITION BY event_type
       |      ORDER BY ts_us, event_id) - 1 AS idx,
       |    count(*) OVER (PARTITION BY event_type) AS n
       |  FROM rets),
       |combos(combo_id, ga, gb) AS (VALUES $comboValues),
       |x AS (
       |  SELECT event_type, combo_id, r,
       |    ((10 * idx + 9) // n = ga OR (10 * idx + 9) // n = gb) AS is_test,
       |    NOT (${blockExclSql("ga")} OR ${blockExclSql("gb")}) AS is_train
       |  FROM ix CROSS JOIN combos)
       |SELECT event_type, combo_id,
       |  count(*) FILTER (WHERE is_test) AS n_test,
       |  count(*) FILTER (WHERE is_train) AS n_train,
       |  round(count(*) FILTER (WHERE is_test AND r > 0)
       |    / nullif(count(*) FILTER (WHERE is_test), 0)::DOUBLE, 4)
       |    AS test_win_rate,
       |  round(${pfSql("is_test")}, 4) AS test_pf,
       |  round(${pfSql("is_train")}, 4) AS train_pf,
       |  round(sum(CASE WHEN is_test THEN r ELSE 0.0 END), 6) AS test_total_ret
       |FROM x GROUP BY event_type, combo_id
       |ORDER BY event_type, combo_id""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q59 — CSCV / PBO (E12, eval/cscv.py:75-210) in its AT-SCALE form, as an
  // oracle query: one pass over the fact rows produces per-(config, block)
  // sufficient statistics (n, Σr, Σr²) — 8 equal-width time blocks over the
  // global ts range — and everything after is O(configs × blocks × splits):
  // a 70-row C(8,4) TRAIN-bitmask table joins the 40-row stats frame, the
  // pooled-Sharpe ranker is computed from summed moments (identical to
  // pooling the arrays; Resampling.cscvFromBlockMoments is the Scala twin,
  // pinned against it in WalkForwardSpec), the IS winner per split is the
  // max-Sharpe config (ties → first in event_type order, matching the
  // Scala maxBy over the sorted config array), and its OOS rank is the
  // fraction of configs it beats out-of-sample. PBO = fraction of splits
  // with rank < 0.5 (aggregated in the spec; rows here are per split).
  private val cscvSplits: Seq[(Int, Int)] =
    (0 until 8).combinations(4).toSeq.zipWithIndex.map { case (train, i) =>
      (i, train.map(1 << _).sum)
    }

  def q59CscvPbo(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val splits = cscvSplits.toDF("split_id", "mask")
    val rets = returns(spark, d)
    val bounds = rets.agg(min(col("ts_us")).as("t0"), max(col("ts_us")).as("t1"))
    val stats = rets
      .crossJoin(broadcast(bounds))
      .withColumn("b", least(
        floor((col("ts_us") - col("t0")) / ((col("t1") - col("t0")) / 8.0)).cast("int"),
        lit(7)))
      .groupBy(col("event_type"), col("b"))
      .agg(count(lit(1)).as("n"), sum(col("r")).as("s"), sum(col("r") * col("r")).as("ss"))
    val mean = col("s") / col("n")
    val v = (col("ss") - col("n") * mean * mean) / (col("n") - 1)
    val side = stats
      .crossJoin(broadcast(splits))
      .withColumn("is_train", expr("(mask >> b) & 1") === 1)
      .groupBy(col("event_type"), col("split_id"), col("is_train"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"), sum(col("ss")).as("ss"))
      .withColumn("sharpe",
        when(col("n") < 2, 0.0)
          .otherwise(when(v <= 0 || isnan(v), 0.0).otherwise(mean / sqrt(v))))
    // IS/OOS pivot, then winner AND rank from ONE window pass over one
    // frame evaluation — a self-join here (winner row re-joined to all
    // configs) would re-evaluate the aggregate subtree per reference, and
    // a parallel sum's order can differ between evaluations, making the
    // winner's own OOS value compare unequal to itself in the last ulp
    // (observed: DuckDB flipped ranks by 1/nConfigs run-to-run)
    val both = side.filter(col("is_train")).select(col("event_type"),
      col("split_id"), col("sharpe").as("is_sharpe"))
      .join(side.filter(!col("is_train")).select(col("event_type"),
        col("split_id"), col("sharpe").as("oos_sharpe")),
        Seq("event_type", "split_id"))
    val wWin = Window.partitionBy(col("split_id"))
      .orderBy(col("is_sharpe").desc, col("event_type"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    both
      .withColumn("winner", first(col("event_type")).over(wWin))
      .withColumn("w_is", first(col("is_sharpe")).over(wWin))
      .withColumn("w_oos", first(col("oos_sharpe")).over(wWin))
      .groupBy(col("split_id"))
      .agg(
        first(col("winner")).as("winner"),
        round(first(col("w_is")), 6).as("is_sharpe"),
        round(first(col("w_oos")), 6).as("oos_sharpe"),
        round(count_if(col("oos_sharpe") <= col("w_oos")).cast("double") /
          count(lit(1)), 4).as("oos_rank"),
        (count_if(col("oos_sharpe") <= col("w_oos")).cast("double") /
          count(lit(1)) < 0.5).as("below_median"))
      .orderBy(col("split_id"))
  }

  val q59Sql: String = {
    val splitValues = cscvSplits.map { case (i, m) => s"($i, $m)" }.mkString(", ")
    s"""$duckReturnsCte,
       |bounds AS (SELECT min(ts_us) AS t0, max(ts_us) AS t1 FROM rets),
       |blk AS (
       |  SELECT event_type, r,
       |    least(CAST(floor((ts_us - t0) / ((t1 - t0) / 8.0)) AS INT), 7) AS b
       |  FROM rets CROSS JOIN bounds),
       |stats AS (
       |  SELECT event_type, b, count(*) AS n, sum(r) AS s, sum(r*r) AS ss
       |  FROM blk GROUP BY event_type, b),
       |splits(split_id, mask) AS (VALUES $splitValues),
       |side AS (
       |  SELECT event_type, split_id, ((mask >> b) & 1) = 1 AS is_train,
       |    sum(n) AS n, sum(s) AS s, sum(ss) AS ss
       |  FROM stats CROSS JOIN splits
       |  GROUP BY event_type, split_id, ((mask >> b) & 1) = 1),
       |sh AS (
       |  SELECT event_type, split_id, is_train,
       |    CASE WHEN n < 2 THEN 0.0
       |      WHEN (ss - n*(s/n)*(s/n))/(n-1) <= 0
       |        OR isnan((ss - n*(s/n)*(s/n))/(n-1)) THEN 0.0
       |      ELSE (s/n) / sqrt((ss - n*(s/n)*(s/n))/(n-1)) END AS sharpe
       |  FROM side),
       |pair AS MATERIALIZED (
       |  SELECT i.event_type, i.split_id, i.sharpe AS is_sharpe,
       |    o.sharpe AS oos_sharpe
       |  FROM sh i JOIN sh o ON i.event_type = o.event_type
       |    AND i.split_id = o.split_id AND i.is_train AND NOT o.is_train),
       |wn AS (
       |  SELECT *,
       |    first_value(event_type) OVER ww AS winner,
       |    first_value(is_sharpe) OVER ww AS w_is,
       |    first_value(oos_sharpe) OVER ww AS w_oos
       |  FROM pair
       |  WINDOW ww AS (PARTITION BY split_id
       |    ORDER BY is_sharpe DESC, event_type
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING))
       |SELECT split_id, any_value(winner) AS winner,
       |  round(any_value(w_is), 6) AS is_sharpe,
       |  round(any_value(w_oos), 6) AS oos_sharpe,
       |  round(count(*) FILTER (WHERE oos_sharpe <= w_oos)::DOUBLE
       |    / count(*), 4) AS oos_rank,
       |  count(*) FILTER (WHERE oos_sharpe <= w_oos)::DOUBLE
       |    / count(*) < 0.5 AS below_median
       |FROM wn GROUP BY split_id ORDER BY split_id""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q42_rolling_range_window" -> (q42RollingRangeWindow _),
    "q56_wfo_fold_metrics" -> (q56WfoFoldMetrics _),
    "q58_cpcv_fold_metrics" -> (q58CpcvFoldMetrics _),
    "q59_cscv_pbo" -> (q59CscvPbo _),
    "q33_omega_winrate" -> (q33OmegaWinrate _),
    "q34_rachev" -> (q34Rachev _),
    "q35_cdar" -> (q35Cdar _),
    "q36_evalues" -> (q36Evalues _),
    "q37_ou_calibration" -> (q37OuCalibration _),
    "q38_psr" -> (q38Psr _),
    "q98_cdar_scaled" -> (q98CdarScaled _),
    "q99_rachev_scaled" -> (q99RachevScaled _))

  val oracles: Map[String, String] = Map(
    "q42_rolling_range_window" -> q42Sql,
    "q56_wfo_fold_metrics" -> q56Sql,
    "q58_cpcv_fold_metrics" -> q58Sql,
    "q59_cscv_pbo" -> q59Sql,
    "q33_omega_winrate" -> q33Sql,
    "q34_rachev" -> q34Sql,
    "q35_cdar" -> q35Sql,
    "q36_evalues" -> q36Sql,
    "q37_ou_calibration" -> q37Sql,
    "q38_psr" -> q38Sql,
    // the scale lanes answer the same question through a different plan —
    // their oracles are q35's / q34's SQL verbatim
    "q98_cdar_scaled" -> q35Sql,
    "q99_rachev_scaled" -> q34Sql)
}
