package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR through a noop sink and emits ONE JSON line.
  * Failures are loud: a failed query records -1 (not its time-to-crash),
  * its error lands in "errors", "failures" counts them, and the process
  * exits nonzero — a bench that cannot fail is not a bench.
  */
object Bench {
  // JSON emission via the shared escaper (JsonOut) — the local copy
  // stripped only \n\r\t and let other control chars (ANSI ESC, \f)
  // corrupt BENCH_LAST.json exactly when a failure needed diagnosing
  private def jsonEscape(s: String): String = {
    val q = JsonOut.jerr(s)
    q.substring(1, q.length - 1) // callers embed inside their own quotes
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // dev-loop extra: optional comma-separated query filter (same contract
    // as Verify; the driver passes no args, so its runs are unaffected)
    val only: Option[Set[String]] = args.headOption.map(_.split(',').toSet)
    only.foreach { names =>
      val unknown = names -- SparkEntry.queries.keySet
      if (unknown.nonEmpty) {
        System.err.println(s"[bench] unknown query names: ${unknown.mkString(",")}")
        sys.exit(2)
      }
    }
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // dev knob for A/B-ing AQE's stage-materialization latency on the
      // bench surface (the driver sets neither env, so its runs keep the
      // default); scale-dependent, so the DEFAULT stays AQE on
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: pay JVM/codegen/scheduler startup once, not inside
    // whichever query happens to run first
    spark.range(1L << 20).selectExpr("sum(id) AS s")
      .write.format("noop").mode("overwrite").save()
    // The four staging chains — dedup (exact-dedup → MinHash → LSH →
    // verify, shared by q49/q61/q79/q87/q89), eval (q72's KDE lane + the
    // tamrs chain), mcdm (gen720 fold frame + 200-rep bootstrap medians,
    // read by q131-q136/q139/q141/q142) and gate (the written flat/routed/
    // append-base indexes the q126/q127/q129/q130 twins consume) — are
    // measured as their OWN rows so consumers report plan cost, not
    // build-order accounting (r13/r15). r16: the chains are mutually
    // INDEPENDENT (different sources, different staged outputs, memoized
    // under different keys) and each is stage-latency-bound, not CPU-bound
    // (dozens of small sequential stages over ≤10⁵-row frames at bench
    // SF), so they now run CONCURRENTLY on the shared scheduler — the
    // overlap a production cluster would get from submitting independent
    // staging pipelines together. Each row still reports its own build's
    // wall-clock (slightly inflated by contention vs a solo run);
    // q_staging_wall reports the overlapped region's total, which is what
    // the session actually paid. Thread-safe by construction:
    // StagingRoots.memoizedBuild serializes per-key joins and
    // releasingBuildCaches refcounts concurrent sibling frames.
    val stagingBuilds: Seq[(String, () => Unit)] = {
      val dedup =
        if (only.forall(_.exists(Set("q49_dedup_pipeline",
            "q61_dup_components", "q79_split_leakage",
            "q87_components_star", "q89_cluster_rep"))))
          Seq("q_staging_dedup" -> (() =>
            { graft.queries.DedupQueries.Staging.scoredAndCounts(spark, sfDir); () }))
        else Seq.empty
      val eval =
        if (only.forall(_.exists(Set("q72_signal_regularity",
            "q122_tamrs", "q123_tier_screening"))))
          Seq("q_staging_eval" -> (() => graft.queries.EvalStaging.build(spark, sfDir)))
        else Seq.empty
      val mcdm =
        if (only.forall(_.exists(Set("q131_entropy_topsis", "q132_promethee",
            "q133_stability_rank", "q134_universality", "q135_bootstrap_rank",
            "q136_rank_agreement", "q139_rank_matrix", "q141_best_barriers",
            "q142_top_barriers"))))
          Seq("q_staging_mcdm" -> (() => graft.queries.McdmStaging.build(spark, sfDir)))
        else Seq.empty
      val gate = {
        val needFlat = only.forall(_.contains("q126_semantic_gate_census"))
        val needRouted = only.forall(_.exists(Set(
          "q127_semantic_gate_routed", "q129_semantic_gate_staged")))
        val needAppendBase =
          only.forall(_.contains("q130_semantic_index_append"))
        if (needFlat || needRouted || needAppendBase)
          Seq("q_staging_gate" -> (() => graft.queries.GateStaging.build(spark, sfDir,
            flat = needFlat, routed = needRouted, appendBase = needAppendBase)))
        else Seq.empty
      }
      dedup ++ eval ++ mcdm ++ gate
    }
    val allStaging: Seq[(String, Double, Option[String])] =
      if (stagingBuilds.isEmpty) Seq.empty
      else {
        import scala.concurrent.{Await, Future, ExecutionContext}
        import scala.concurrent.duration.Duration
        val pool = java.util.concurrent.Executors.newFixedThreadPool(stagingBuilds.size)
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
        val w0 = System.nanoTime()
        val rows = try {
          stagingBuilds.map { case (name, build) =>
            Future {
              val t0 = System.nanoTime()
              val err =
                try { build(); None }
                catch { case scala.util.control.NonFatal(e) => Some(jsonEscape(e.toString)) }
              (name, (System.nanoTime() - t0) / 1e9, err)
            }
          }.map(Await.result(_, Duration.Inf))
        } finally pool.shutdown()
        rows :+ (("q_staging_wall", (System.nanoTime() - w0) / 1e9,
          None: Option[String]))
      }
    def once(name: String,
        fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String]) = {
      // §1.5: label every job with its query so the event log / UI can
      // attribute stages (profiling only; no timing effect)
      spark.sparkContext.setJobDescription(name)
      // isolate queries: a predecessor's cached frames are not this query's
      // head start (CacheManager matches canonicalized plans ACROSS queries,
      // so two queries persisting the same bar frame would otherwise share
      // one materialization and skew the per-query numbers), and a
      // predecessor's garbage is not this query's cost
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      // noop sink: forces full evaluation of every output column (a bare
      // count() lets Catalyst prune projections and undercounts the work).
      // NonFatal only: an OutOfMemoryError/LinkageError leaves the JVM in
      // an undefined state — continuing would record garbage timings for
      // every later query as if they were real (r13 review)
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case scala.util.control.NonFatal(e) => Some(jsonEscape(e.toString)) }
        finally spark.sparkContext.setJobDescription(null)
      ((System.nanoTime() - t0) / 1e9, err)
    }
    val results = allStaging ++ SparkEntry.queries.toSeq
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .map { case (name, fn) =>
        val (t1, err1) = once(name, fn)
        // best-of-2 for everything non-trivial: a long 115-query session
        // accumulates GC/JIT crowding that read as phantom 1.5–2×
        // regressions in r7 — a second isolated run separates a real plan
        // regression from session noise (measured: the r7 common-set
        // "1.17× regression" became 0.87× under best-of-2)
        if (err1.isEmpty && t1 >= 1.0) {
          val (t2, err2) = once(name, fn)
          // a second-run failure COUNTS: dropping err2 reported a flaky
          // query as a clean pass with t1 — "a bench that cannot fail is
          // not a bench" applies to the rerun too (r13 review)
          (name, if (err2.isEmpty) math.min(t1, t2) else t1, err2)
        } else (name, t1, err1)
      }
    // 3-decimal seconds: ms precision is all the comparison needs, and the
    // shorter line keeps the whole record inside the round driver's bounded
    // log-tail capture (r5/r6 both lost the line's head to truncation)
    def r3(v: Double): String = BigDecimal(v)
      .setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v, err) =>
      s"\"$k\":" + (if (err.isEmpty) r3(v) else "-1.0")
    }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"\"$k\":\"$e\"" }
      .mkString("{", ",", "}")
    val nFail = results.count(_._3.nonEmpty)
    // total: query rows + the staging region's WALL row. The per-build
    // staging rows ran CONCURRENTLY (r16) — summing them would count the
    // same elapsed seconds up to 4×; q_staging_wall is what the session
    // actually paid for the whole staging region. (When staging is empty
    // — a filtered run with no staged consumers — nothing changes.)
    val stagingBuildNames = stagingBuilds.map(_._1).toSet
    val total = results.collect {
      case (k, v, None) if !stagingBuildNames.contains(k) => v
    }.sum
    val sfj = jsonEscape(sfDir)
    val line =
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"sf":"$sfj","failures":$nFail,"errors":$errs}"""
    // full record goes to the FILE ONLY: the round driver captures a
    // bounded log TAIL, which truncated this (long) line mid-JSON in
    // r5–r7 whenever it preceded the compact line on stdout
    java.nio.file.Files.write(
      java.nio.file.Paths.get("BENCH_LAST.json"),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
    // stdout gets the compact total-only line ALONE: short enough that no
    // tail window can cut it, so a parser that reads the last metric line
    // always gets a complete record (per-query map lives in BENCH_LAST.json)
    // n_queries counts REAL queries; the synthetic staging row is labeled
    // separately so cross-round totals stay comparable (r8 ADVICE)
    // the overlapped region's elapsed time (the wall row), not the sum of
    // the concurrent per-build rows
    val stagingSec = allStaging.collect {
      case ("q_staging_wall", v, None) => v }.sum
    println(
      s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":{},"sf":"$sfj","failures":$nFail,"n_queries":${results.length - allStaging.length},"staging_sec":${r3(stagingSec)},"full_record":"BENCH_LAST.json"}""")
    if (nFail > 0) sys.exit(1)
  }
}
