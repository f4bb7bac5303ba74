package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.GraftFunctions

/** The five eval stats that were ScalaTest-golden-only through r8, now
  * oracle-checked on the hard signal (r8 verdict "Next round" #2): E9
  * Cornish-Fisher VaR/ES (eval/cornish_fisher.py:16-60), E2 MinBTL
  * (eval/minbtl.py:21-35), E6 TAMRS (eval/tamrs.py:19-27), E14 tier
  * screening (eval/screening.py:146-210 via the 5-metric tier ladder),
  * and E15 percentile-rank cutoff intersection (eval/ranking.py:138-331).
  *
  * All run on RankingQueries' 50-config grid (event_type × user_id % 10)
  * — the same config axis the reference's eval stack fans over.
  *
  * Scale shape: one groupBy pass over the fact data builds the per-config
  * moment/metric frame; everything after is column algebra or windowing
  * over the O(nConfigs) frame (broadcast-joined where it meets fact-sized
  * frames). At 100 TB the fact scan dominates; the eval layer stays
  * O(configs).
  *
  * Cross-engine float discipline: moments are rounded at the source (10 dp
  * for mean/std where downstream math must stay precise, 6 dp for
  * skew/kurt per the q38 contract), constants that scipy would compute
  * (Φ⁻¹(α), ln N, √2π) are evaluated once at authoring time and pinned as
  * identical literals in BOTH engines, and every output column is rounded
  * with the reference's own precision — so both engines run identical
  * scalar expression trees over identical doubles.
  */
object EvalStatsQueries {

  type Q = (SparkSession, String) => DataFrame

  // Reference constants (config.py:28,39-40): N_TRIALS=1008 and the derived
  // empirical barrier fractions TP_EMP = TP_MULT·BAR_RANGE = 5.0 × 0.005
  // = 0.025, SL_EMP = SL_MULT·BAR_RANGE = 2.5 × 0.005 = 0.0125.
  private val NTrials = 1008
  private val SlEmp = 0.0125
  private val TpEmp = 0.025
  private val LnNTrials = math.log(NTrials.toDouble) // pinned literal both engines
  // scipy.stats.norm.ppf evaluated at authoring time — query constants
  // (the alphas are fixed), so the quantiles are too; no inverse-CDF
  // implementation drift can leak in (the q68 Z1/Z2 discipline).
  private val Z01 = -2.3263478740408408
  private val Z05 = -1.6448536269514722
  private val SqrtTwoPi = 2.5066282746310002

  // ---------------------------------------------------------------------------
  // Shared per-config moment frame: n, mean, std (10 dp — CF/MinBTL math
  // multiplies these by O(1) factors, so 10 dp keeps ~6 significant digits
  // on r ≈ 1e-3 returns), sample skew / Pearson kurt (6 dp, the q38
  // DuckDB-parity contract).
  private def cfgMoments(spark: SparkSession, d: String): DataFrame = {
    val n = count(lit(1)).cast("double")
    RankingQueries.cfgReturns(spark, d)
      .groupBy(col("cfg"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("r")), 10).as("mean"),
        round(stddev_samp(col("r")), 10).as("std"),
        round(GraftFunctions.skewSamp(col("r"), n), 6).as("skew"),
        round(GraftFunctions.kurtSampExcess(col("r"), n) + lit(3.0), 6).as("kurt"))
  }

  private val duckCfgMoments: String =
    s"""${RankingQueries.duckCfgRets},
       |mom AS (
       |  SELECT cfg, count(*) AS n,
       |    round(avg(r), 10) AS mean,
       |    round(stddev_samp(r), 10) AS std,
       |    round(skewness(r), 6) AS skew,
       |    round(kurtosis(r) + 3.0, 6) AS kurt
       |  FROM rets GROUP BY cfg)""".stripMargin

  // ---------------------------------------------------------------------------
  // q120 — Cornish-Fisher VaR / ES (E9, eval/cornish_fisher.py:18-55):
  // z_CF = z + (z²−1)S/6 + (z³−3z)(K−3)/24 − (2z³−5z)S²/36, VaR = μ+z_CF·σ,
  // ES ≈ μ − σ·φ(z_CF)/α, plus the Gaussian baselines and the reference's
  // two derived ratios. The z powers are authoring-time literals.
  private def zCf(z: Double, skew: Column, kurt: Column): Column =
    lit(z) + lit((z * z - 1.0) / 6.0) * skew +
      lit((z * z * z - 3.0 * z) / 24.0) * (kurt - lit(3.0)) -
      lit((2.0 * z * z * z - 5.0 * z) / 36.0) * skew * skew

  private def zCfSql(z: Double): String =
    s"($z + ${(z * z - 1.0) / 6.0} * skew" +
      s" + ${(z * z * z - 3.0 * z) / 24.0} * (kurt - 3.0)" +
      s" - ${(2.0 * z * z * z - 5.0 * z) / 36.0} * skew * skew)"

  def q120CornishFisher(spark: SparkSession, d: String): DataFrame = {
    def phi(x: Column): Column = exp(-(x * x) / lit(2.0)) / lit(SqrtTwoPi)
    val valid = col("n") >= 3 && col("std").isNotNull && col("std") > 0.0
    cfgMoments(spark, d)
      .withColumn("z01", zCf(Z01, col("skew"), col("kurt")))
      .withColumn("z05", zCf(Z05, col("skew"), col("kurt")))
      .withColumn("cf_var_01",
        round(when(valid, col("mean") + col("z01") * col("std")), 8))
      .withColumn("cf_var_05",
        round(when(valid, col("mean") + col("z05") * col("std")), 8))
      .withColumn("cf_es_01",
        round(when(valid, col("mean") - col("std") * phi(col("z01")) / lit(0.01)), 8))
      .withColumn("cf_es_05",
        round(when(valid, col("mean") - col("std") * phi(col("z05")) / lit(0.05)), 8))
      .withColumn("gaussian_var_05",
        round(when(valid, col("mean") + lit(Z05) * col("std")), 8))
      .withColumn("gaussian_es_05",
        round(when(valid, col("mean") - col("std") * phi(lit(Z05)) / lit(0.05)), 8))
      // both ratios divide the ROUNDED 8 dp columns — identically in the
      // oracle — so the quotient inputs are bit-equal across engines
      .withColumn("tail_risk_ratio",
        round(col("cf_es_05") / nullif(col("gaussian_es_05"), lit(0.0)), 4))
      .withColumn("mean_over_cf_es_05",
        round(col("mean") / nullif(abs(col("cf_es_05")), lit(0.0)), 6))
      .select(col("cfg"), col("n").as("n_trades"),
        col("cf_var_01"), col("cf_var_05"), col("cf_es_01"), col("cf_es_05"),
        col("gaussian_var_05"), col("gaussian_es_05"),
        col("tail_risk_ratio"), col("mean_over_cf_es_05"))
      .orderBy(col("cfg"))
  }

  val q120Sql: String =
    s"""WITH $duckCfgMoments,
       |z AS (
       |  SELECT cfg, n, mean, std, skew, kurt,
       |    (n >= 3 AND std IS NOT NULL AND std > 0) AS valid,
       |    ${zCfSql(Z01)} AS z01,
       |    ${zCfSql(Z05)} AS z05
       |  FROM mom),
       |o AS (
       |  SELECT cfg, n AS n_trades, mean,
       |    round(CASE WHEN valid THEN mean + z01 * std END, 8) AS cf_var_01,
       |    round(CASE WHEN valid THEN mean + z05 * std END, 8) AS cf_var_05,
       |    round(CASE WHEN valid THEN mean - std * exp(-(z01 * z01) / 2.0) / $SqrtTwoPi / 0.01 END, 8) AS cf_es_01,
       |    round(CASE WHEN valid THEN mean - std * exp(-(z05 * z05) / 2.0) / $SqrtTwoPi / 0.05 END, 8) AS cf_es_05,
       |    round(CASE WHEN valid THEN mean + $Z05 * std END, 8) AS gaussian_var_05,
       |    round(CASE WHEN valid THEN mean - std * exp(-($Z05 * $Z05) / 2.0) / $SqrtTwoPi / 0.05 END, 8) AS gaussian_es_05
       |  FROM z)
       |SELECT cfg, n_trades, cf_var_01, cf_var_05, cf_es_01, cf_es_05,
       |  gaussian_var_05, gaussian_es_05,
       |  round(cf_es_05 / nullif(gaussian_es_05, 0.0), 4) AS tail_risk_ratio,
       |  round(mean / nullif(abs(cf_es_05), 0.0), 6) AS mean_over_cf_es_05
       |FROM o ORDER BY cfg""".stripMargin

  // ---------------------------------------------------------------------------
  // q121 — MinBTL gate (E2, eval/minbtl.py:21-35, Bailey & López de Prado
  // 2014): MinBTL = (2·ln N / SR²) · max(0.1, 1 − S·SR/3 + (K−1)/4·SR²),
  // ∞ (→ NULL) when |SR| < 1e-8; passes_gate = n ≥ MinBTL; headroom =
  // n / MinBTL. N = the reference's 1008-trial grid.
  def q121MinBtl(spark: SparkSession, d: String): DataFrame =
    cfgMoments(spark, d)
      .withColumn("sr",
        when(col("n") < 3, lit(null).cast("double"))
          .when(col("std").isNull || col("std") <= 0.0, lit(0.0))
          .otherwise(col("mean") / col("std")))
      .withColumn("min_btl",
        when(abs(col("sr")) >= 1e-8,
          lit(2.0 * LnNTrials) / (col("sr") * col("sr")) *
            greatest(lit(1.0) - col("skew") * col("sr") / 3.0 +
              (col("kurt") - 1.0) / 4.0 * col("sr") * col("sr"), lit(0.1))))
      .select(col("cfg"), col("n").as("n_trades"),
        round(col("sr"), 6).as("observed_sr"),
        round(col("min_btl"), 1).as("min_btl_required"),
        (col("min_btl").isNotNull && col("n") >= col("min_btl")).cast("int")
          .as("passes_gate"),
        round(coalesce(
          when(col("min_btl") > 0, col("n") / col("min_btl")), lit(0.0)), 4)
          .as("headroom_ratio"),
        round(col("skew"), 4).as("skew"),
        round(col("kurt"), 4).as("kurtosis"))
      .orderBy(col("cfg"))

  val q121Sql: String =
    s"""WITH $duckCfgMoments,
       |s AS (
       |  SELECT cfg, n, skew, kurt,
       |    CASE WHEN n < 3 THEN NULL
       |         WHEN std IS NULL OR std <= 0 THEN 0.0
       |         ELSE mean / std END AS sr
       |  FROM mom),
       |b AS (
       |  SELECT cfg, n, skew, kurt, sr,
       |    CASE WHEN abs(sr) >= 1e-8
       |      THEN ${2.0 * LnNTrials} / (sr * sr) *
       |        greatest(1.0 - skew * sr / 3.0 + (kurt - 1.0) / 4.0 * sr * sr, 0.1)
       |    END AS min_btl
       |  FROM s)
       |SELECT cfg, n AS n_trades,
       |  round(sr, 6) AS observed_sr,
       |  round(min_btl, 1) AS min_btl_required,
       |  CAST(min_btl IS NOT NULL AND n >= min_btl AS INT) AS passes_gate,
       |  round(coalesce(CASE WHEN min_btl > 0 THEN n / min_btl END, 0.0), 4) AS headroom_ratio,
       |  round(skew, 4) AS skew,
       |  round(kurt, 4) AS kurtosis
       |FROM b ORDER BY cfg""".stripMargin

  // ---------------------------------------------------------------------------
  // q122 — TAMRS composite (E6, eval/tamrs.py:19-27): rachev ·
  // min(1, |SL_emp|/CDaR) · min(1, TP_emp/TP_OU), NULL if any component
  // is. The three component frames are the per-config forms of q34/q35/q37
  // (rachev and CDaR in their q98/q99 window-rank scale form — no
  // per-group array buffers), joined on the config key; the reference does
  // the same join over three jsonl files (tamrs.py:38-76).

  /** Rachev per cfg, q99's one-sort rank form, n ≥ 20 gate, cap 10, 6 dp. */
  private def rachevByCfg(spark: SparkSession, d: String): DataFrame = {
    val rets = RankingQueries.cfgReturns(spark, d)
    val counts = rets.groupBy(col("cfg"))
      .agg(count(lit(1)).cast("int").as("n"))
      .filter(col("n") >= 20)
      .withColumn("k", greatest(lit(1), floor(col("n") * 0.05)).cast("int"))
    val wAsc = Window.partitionBy(col("cfg"))
      .orderBy(col("r").asc, col("ts_us"), col("event_id"))
    rets.withColumn("ra", row_number().over(wAsc))
      .join(broadcast(counts), "cfg")
      .groupBy(col("cfg"))
      .agg(any_value(col("n")).as("n_trades"),
        (sum(when(col("ra") > col("n") - col("k"), col("r")))
          / any_value(col("k"))).as("cvar_up"),
        abs(sum(when(col("ra") <= col("k"), col("r")))
          / any_value(col("k"))).as("cvar_low_abs"))
      .select(col("cfg"), col("n_trades"),
        round(when(col("cvar_low_abs") < 1e-12, lit(null))
          .otherwise(least(col("cvar_up") / col("cvar_low_abs"), lit(10.0))), 6)
          .as("rachev_ratio"))
  }

  /** CDaR per cfg (q98's rank form), then min(1, SL_emp/CDaR), 1.0 when
    * CDaR ≤ 1e-12 (cdar.py:55). */
  private def slCdarByCfg(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("cfg")).orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val dds = RankingQueries.cfgReturns(spark, d)
      .withColumn("cum", sum(col("r")).over(w))
      .withColumn("run_max", max(col("cum")).over(w))
      .withColumn("dd", col("run_max") - col("cum"))
    val counts = dds.groupBy(col("cfg"))
      .agg(count(lit(1)).cast("int").as("n"))
      .withColumn("k", greatest(lit(1), floor(col("n") * 0.05)).cast("int"))
    val wAsc = Window.partitionBy(col("cfg"))
      .orderBy(col("dd").asc, col("ts_us"), col("event_id"))
    dds.withColumn("ra", row_number().over(wAsc))
      .join(broadcast(counts), "cfg")
      .groupBy(col("cfg"))
      .agg(round(sum(when(col("ra") > col("n") - col("k"), col("dd")))
        / any_value(col("k")), 6).as("cdar"))
      .select(col("cfg"), col("cdar"),
        round(when(col("cdar") > 1e-12, least(lit(1.0), lit(SlEmp) / col("cdar")))
          .otherwise(lit(1.0)), 6).as("sl_cdar_ratio"))
  }

  /** OU barrier ratio per cfg: q37's sufficient-stats OLS on the raw value
    * series, TP_OU = σ·√hl / mean value, ratio = min(1, TP_emp/TP_OU)
    * (ou_barriers.py:59-64), NULL when not mean-reverting. */
  private def ouByCfg(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val base = ev.select(
      concat(col("event_type"), lit("#"), (col("user_id") % 10).cast("string")).as("cfg"),
      Tables.tsUs(ev).as("ts_us"), col("event_id"), col("value"))
    val w = Window.partitionBy(col("cfg")).orderBy(col("ts_us"), col("event_id"))
    // No lag-null filter: the OLS moments skip the first row anyway (avg
    // ignores the NULL x/y), but mean_price must cover ALL prices — the
    // reference takes np.mean over the full series (ou_barriers.py:48),
    // and eval/Stats.calibrateOu does the same.
    base.withColumn("x", lag(col("value"), 1).over(w))
      .withColumn("y", col("value") - col("x"))
      .groupBy(col("cfg"))
      .agg(
        (avg(col("x") * col("y")) - avg(col("x")) * avg(col("y"))).as("cov_xy"),
        (avg(col("x") * col("x")) - avg(col("x")) * avg(col("x"))).as("var_x"),
        (avg(col("y") * col("y")) - avg(col("y")) * avg(col("y"))).as("var_y"),
        avg(col("value")).as("mean_price"))
      .withColumn("b", col("cov_xy") / nullif(col("var_x"), lit(0.0)))
      .withColumn("mu", -col("b"))
      .withColumn("sigma",
        sqrt(greatest(col("var_y") - col("b") * col("b") * col("var_x"), lit(0.0))))
      .withColumn("tp_frac",
        round(when(col("mu") > 0,
          col("sigma") * sqrt(log(lit(2.0)) / col("mu"))
            / nullif(col("mean_price"), lit(0.0))), 8))
      .select(col("cfg"),
        round(when(col("tp_frac") > 0, least(lit(1.0), lit(TpEmp) / col("tp_frac"))), 6)
          .as("ou_barrier_ratio"))
  }

  /** The joined TAMRS frame (raw builder — EvalStaging stages its output;
    * q122/q123 read the staged copy so the chain builds once per corpus). */
  private[graft] def tamrsFrameRaw(spark: SparkSession, d: String): DataFrame =
    rachevByCfg(spark, d)
      .join(slCdarByCfg(spark, d), Seq("cfg"), "left")
      .join(ouByCfg(spark, d), Seq("cfg"), "left")
      .withColumn("tamrs",
        round(col("rachev_ratio") * col("sl_cdar_ratio") * col("ou_barrier_ratio"), 6))

  private def tamrsFrame(spark: SparkSession, d: String): DataFrame =
    EvalStaging.tamrs(spark, d)

  def q122Tamrs(spark: SparkSession, d: String): DataFrame =
    tamrsFrame(spark, d)
      .select(col("cfg"), col("n_trades"), col("tamrs"),
        col("rachev_ratio"), col("sl_cdar_ratio"), col("ou_barrier_ratio"))
      .orderBy(col("cfg"))

  /** CTE chain shared by the q122 and q123 oracles: rachev + sl_cdar + ou
    * + the joined tamrs frame, all on the cfg axis. */
  private val duckTamrsCte: String =
    s"""${RankingQueries.duckCfgRets},
       |rcounts AS (
       |  SELECT cfg, count(*) AS n,
       |    greatest(1, CAST(floor(count(*) * 0.05) AS INT)) AS k
       |  FROM rets GROUP BY cfg HAVING count(*) >= 20),
       |rranked AS (
       |  SELECT r.cfg, r.r, c.n, c.k,
       |    row_number() OVER (PARTITION BY r.cfg ORDER BY r.r, r.ts_us, r.event_id) AS ra
       |  FROM rets r JOIN rcounts c USING (cfg)),
       |rachev AS (
       |  SELECT cfg, any_value(n) AS n_trades,
       |    round(CASE WHEN abs(sum(CASE WHEN ra <= k THEN r END) / any_value(k)) < 1e-12
       |      THEN NULL
       |      ELSE least((sum(CASE WHEN ra > n - k THEN r END) / any_value(k))
       |        / abs(sum(CASE WHEN ra <= k THEN r END) / any_value(k)), 10.0) END, 6)
       |      AS rachev_ratio
       |  FROM rranked GROUP BY cfg),
       |cums0 AS (
       |  SELECT cfg, ts_us, event_id,
       |    sum(r) OVER (PARTITION BY cfg ORDER BY ts_us, event_id
       |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM rets),
       |cums AS (
       |  SELECT cfg, ts_us, event_id,
       |    max(cum) OVER (PARTITION BY cfg ORDER BY ts_us, event_id
       |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cum AS dd
       |  FROM cums0),
       |dcounts AS (
       |  SELECT cfg, count(*) AS n,
       |    greatest(1, CAST(floor(count(*) * 0.05) AS INT)) AS k
       |  FROM cums GROUP BY cfg),
       |dranked AS (
       |  SELECT d.cfg, d.dd, c.n, c.k,
       |    row_number() OVER (PARTITION BY d.cfg ORDER BY d.dd, d.ts_us, d.event_id) AS ra
       |  FROM cums d JOIN dcounts c USING (cfg)),
       |slcdar AS (
       |  SELECT cfg, cdar,
       |    round(CASE WHEN cdar > 1e-12 THEN least(1.0, $SlEmp / cdar) ELSE 1.0 END, 6)
       |      AS sl_cdar_ratio
       |  FROM (
       |    SELECT cfg,
       |      round(sum(CASE WHEN ra > n - k THEN dd END) / any_value(k), 6) AS cdar
       |    FROM dranked GROUP BY cfg)),
       |oux AS (
       |  SELECT cfg, value,
       |    lag(value) OVER (PARTITION BY cfg ORDER BY ts_us, event_id) AS x
       |  FROM (SELECT event_type || '#' || bucket::VARCHAR AS cfg, ts_us, event_id, value
       |        FROM ev)),
       |ousuff AS (
       |  SELECT cfg,
       |    avg(x * (value - x)) - avg(x) * avg(value - x) AS cov_xy,
       |    avg(x * x) - avg(x) * avg(x) AS var_x,
       |    avg((value - x) * (value - x)) - avg(value - x) * avg(value - x) AS var_y,
       |    avg(value) AS mean_price
       |  FROM oux GROUP BY cfg),
       |oucal AS (
       |  SELECT cfg,
       |    round(CASE WHEN tp_frac > 0 THEN least(1.0, $TpEmp / tp_frac) END, 6)
       |      AS ou_barrier_ratio
       |  FROM (
       |    SELECT cfg,
       |      round(CASE WHEN -(cov_xy / nullif(var_x, 0.0)) > 0
       |        THEN sqrt(greatest(var_y - (cov_xy / nullif(var_x, 0.0))
       |               * (cov_xy / nullif(var_x, 0.0)) * var_x, 0.0))
       |          * sqrt(ln(2.0) / (-(cov_xy / nullif(var_x, 0.0))))
       |          / nullif(mean_price, 0.0)
       |      END, 8) AS tp_frac
       |    FROM ousuff)),
       |tamrs AS (
       |  SELECT r.cfg, r.n_trades,
       |    round(r.rachev_ratio * s.sl_cdar_ratio * o.ou_barrier_ratio, 6) AS tamrs,
       |    r.rachev_ratio, s.sl_cdar_ratio, o.ou_barrier_ratio
       |  FROM rachev r
       |  LEFT JOIN slcdar s USING (cfg)
       |  LEFT JOIN oucal o USING (cfg))""".stripMargin

  val q122Sql: String =
    s"""WITH $duckTamrsCte
       |SELECT cfg, n_trades, tamrs, rachev_ratio, sl_cdar_ratio, ou_barrier_ratio
       |FROM tamrs ORDER BY cfg""".stripMargin

  // ---------------------------------------------------------------------------
  // q123 — tier screening (E14, eval/screening.py:146-175 via the repo's
  // 5-metric ladder, thresholds config.py:43-70): graduated gates over
  // TAMRS / Rachev / OU ratio / KDE regularity CV / temporal coverage;
  // tier = highest consecutive tier passed (0..3); a NULL metric fails any
  // gate stricter than "no gate" (Ranking.screenTier, pinned by
  // RankingSpec's golden). Regularity comes from q72's KDE lane.
  private val TamrsMin = Seq(0.0, 0.05, 0.15)
  private val RachevMin = Seq(0.0, 0.30, 0.50)
  private val OuMin = Seq(0.0, 0.30, 0.50)
  private val RegCvMax = Seq(999.0, 0.80, 0.50)
  private val CoverageMin = Seq(0.0, 0.50, 0.70)

  def q123TierScreening(spark: SparkSession, d: String): DataFrame = {
    val reg = EvalStaging.regularity(spark, d)
      .select(col("cfg"), col("kde_peak_cv"), col("coverage"))
    def geOk(c: Column, thr: Double): Column =
      if (thr <= 0.0) lit(true) else coalesce(c >= thr, lit(false))
    def leOk(c: Column, thr: Double): Column =
      if (thr >= 999.0) lit(true) else coalesce(c <= thr, lit(false))
    def tierOk(t: Int): Column =
      geOk(col("tamrs"), TamrsMin(t)) && geOk(col("rachev_ratio"), RachevMin(t)) &&
        geOk(col("ou_barrier_ratio"), OuMin(t)) && leOk(col("kde_peak_cv"), RegCvMax(t)) &&
        geOk(col("coverage"), CoverageMin(t))
    tamrsFrame(spark, d)
      .join(reg, Seq("cfg"), "left")
      .withColumn("tier",
        when(!tierOk(0), lit(0)).when(!tierOk(1), lit(1))
          .when(!tierOk(2), lit(2)).otherwise(lit(3)))
      .select(col("cfg"), col("tamrs"), col("rachev_ratio"),
        col("ou_barrier_ratio"), col("kde_peak_cv"), col("coverage"), col("tier"))
      .orderBy(col("cfg"))
  }

  val q123Sql: String = {
    def geOk(e: String, thr: Double): String =
      if (thr <= 0.0) "TRUE" else s"coalesce($e >= $thr, FALSE)"
    def leOk(e: String, thr: Double): String =
      if (thr >= 999.0) "TRUE" else s"coalesce($e <= $thr, FALSE)"
    def tierOk(t: Int): String =
      s"(${geOk("tamrs", TamrsMin(t))} AND ${geOk("rachev_ratio", RachevMin(t))}" +
        s" AND ${geOk("ou_barrier_ratio", OuMin(t))} AND ${leOk("kde_peak_cv", RegCvMax(t))}" +
        s" AND ${geOk("coverage", CoverageMin(t))})"
    s"""WITH $duckTamrsCte,
       |reg AS (
       |  SELECT cfg, kde_peak_cv, coverage
       |  FROM (${RankingQueries.q72Sql.replace("\n", "\n  ")}) q72),
       |j AS (
       |  SELECT t.*, reg.kde_peak_cv, reg.coverage
       |  FROM tamrs t LEFT JOIN reg USING (cfg))
       |SELECT cfg, tamrs, rachev_ratio, ou_barrier_ratio, kde_peak_cv, coverage,
       |  CASE WHEN NOT ${tierOk(0)} THEN 0
       |       WHEN NOT ${tierOk(1)} THEN 1
       |       WHEN NOT ${tierOk(2)} THEN 2
       |       ELSE 3 END AS tier
       |FROM j ORDER BY cfg""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q124 — percentile-rank cutoff tightening (E15, eval/ranking.py:138-237):
  // per-metric percentile ranks (scipy rankdata method='average' ties,
  // lower-is-better flipped so 100 = best, 4 dp), top-X% cutoffs at the
  // reference's tightening levels [100, 80, 60, 40, 20, 10, 5], survivor
  // intersection across ALL metrics (pct ≥ 100 − cutoff ⇔ min over metrics
  // of pct clears the threshold), plus the lexicographically first
  // survivor. Metrics: omega / sr / win_rate (higher better) and maxdd
  // (the lower-is-better flip case) from the shared 6 dp metric frame.
  //
  // The rank windows are partitionless BY CONSTRUCTION: they run over the
  // O(nConfigs) metric frame (50 rows here; the reference's widest grid is
  // 10⁴ configs), never over fact data.
  private val CutoffLevels = Seq(100, 80, 60, 40, 20, 10, 5)

  def q124RankCutoffs(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val m = RankingQueries.cfgMetrics(spark, d)
    val nAll = m.select(count(lit(1)).cast("double").as("n_cfg"))
    def pct(v: Column, higherIsBetter: Boolean): Column = {
      val key = if (higherIsBetter) v.asc else v.desc
      val avgRank = rank().over(Window.orderBy(key)).cast("double") +
        (count(lit(1)).over(Window.partitionBy(v)).cast("double") - 1.0) / 2.0
      round(avgRank / col("n_cfg") * 100.0, 4)
    }
    val ranked = m.crossJoin(broadcast(nAll))
      .withColumn("p_omega", pct(col("omega"), higherIsBetter = true))
      .withColumn("p_sr", pct(col("sr"), higherIsBetter = true))
      .withColumn("p_win", pct(col("win_rate"), higherIsBetter = true))
      .withColumn("p_maxdd", pct(col("maxdd"), higherIsBetter = false))
      .withColumn("min_pct",
        least(col("p_omega"), col("p_sr"), col("p_win"), col("p_maxdd")))
      .select(col("cfg"), col("min_pct"))
    CutoffLevels.toDF("cutoff_pct")
      .crossJoin(ranked)
      .groupBy(col("cutoff_pct"))
      .agg(
        count(when(col("min_pct") >= lit(100.0) - col("cutoff_pct"), lit(1)))
          .as("n_intersection"),
        coalesce(min(when(col("min_pct") >= lit(100.0) - col("cutoff_pct"), col("cfg"))),
          lit("-")).as("example_survivor"))
      .orderBy(col("cutoff_pct").desc)
  }

  val q124Sql: String =
    s"""WITH ${RankingQueries.duckCfgMetrics},
       |nn AS (SELECT count(*)::DOUBLE AS n_cfg FROM m),
       |ranked AS (
       |  SELECT cfg,
       |    least(
       |      round((rank() OVER (ORDER BY omega ASC)
       |        + (count(*) OVER (PARTITION BY omega) - 1) / 2.0) / n_cfg * 100.0, 4),
       |      round((rank() OVER (ORDER BY sr ASC)
       |        + (count(*) OVER (PARTITION BY sr) - 1) / 2.0) / n_cfg * 100.0, 4),
       |      round((rank() OVER (ORDER BY win_rate ASC)
       |        + (count(*) OVER (PARTITION BY win_rate) - 1) / 2.0) / n_cfg * 100.0, 4),
       |      round((rank() OVER (ORDER BY maxdd DESC)
       |        + (count(*) OVER (PARTITION BY maxdd) - 1) / 2.0) / n_cfg * 100.0, 4))
       |      AS min_pct
       |  FROM m, nn),
       |cuts AS (SELECT unnest([${CutoffLevels.mkString(", ")}]) AS cutoff_pct)
       |SELECT c.cutoff_pct,
       |  count(*) FILTER (WHERE r.min_pct >= 100.0 - c.cutoff_pct) AS n_intersection,
       |  coalesce(min(r.cfg) FILTER (WHERE r.min_pct >= 100.0 - c.cutoff_pct), '-')
       |    AS example_survivor
       |FROM cuts c CROSS JOIN ranked r
       |GROUP BY c.cutoff_pct ORDER BY c.cutoff_pct DESC""".stripMargin

  val all: Map[String, Q] = Map(
    "q120_cornish_fisher" -> (q120CornishFisher _),
    "q121_minbtl" -> (q121MinBtl _),
    "q122_tamrs" -> (q122Tamrs _),
    "q123_tier_screening" -> (q123TierScreening _),
    "q124_rank_cutoffs" -> (q124RankCutoffs _))

  val oracles: Map[String, String] = Map(
    "q120_cornish_fisher" -> q120Sql,
    "q121_minbtl" -> q121Sql,
    "q122_tamrs" -> q122Sql,
    "q123_tier_screening" -> q123Sql,
    "q124_rank_cutoffs" -> q124Sql)
}
