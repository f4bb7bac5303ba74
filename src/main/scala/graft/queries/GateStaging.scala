package graft.queries

import org.apache.spark.sql.SparkSession

/** Staged gate indexes (the EvalStaging discipline on the gate axis): the
  * semantic-gate batch twins consume a WRITTEN index — the production
  * contract (a streaming gate reads the `gateindex`/`gateindexr` parquet a
  * one-time build job wrote; it never rebuilds the corpus clustering per
  * micro-batch; SemScale's `gate` mode measures exactly this read path at
  * 2M vectors) — built once per (JVM, corpus) and read back by every
  * consumer. Before r13 each twin rebuilt its index inline per run (the
  * r12 verdict's INFO #2: 4.4–5.3 s/row of build cost misread as gate
  * cost); now Bench reports the two builds as their own `q_staging_gate`
  * row and q126/q127/q129 report gate cost. The layouts are the SemScale
  * writers' verbatim ([[SimilarityQueries.writeGateIndexFlat]] /
  * [[SimilarityQueries.writeGateIndexRouted]] — one definition), so the
  * dev-tool, bench and production lanes can never drift; staging changes
  * where the tables are read from, never what they are (centroids are
  * exact longs, member vectors round-trip parquet bit-exactly — the
  * DuckDB oracles replay the full clustering from the corpus and still
  * hash-match).
  */
private[graft] object GateStaging {
  private lazy val root = StagingRoots.tempRootWithCleanup("graft_gate_staging")
  private val done = StagingRoots.memo[String]()

  private def staged(kind: String, d: String)(build: String => Unit): String = {
    val key = s"${kind}_${StagingRoots.pathKey(d)}"
    StagingRoots.memoizedBuild(done, key) {
      val path = root.resolve(key).toString
      val t0 = System.nanoTime()
      build(path)
      println(f"[staging_gate] $kind built in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      path
    }
  }

  // release the corpus caches semanticStreamIndex/Routed persist for
  // their seeding passes once the index is written (shared helper —
  // see StagingRoots.releasingBuildCaches for the contract)
  private def unpersistBuildCaches[A](spark: SparkSession)(body: => A): A =
    StagingRoots.releasingBuildCaches(spark)(body)

  /** The flat (q113-cell) index dir for `d`, built+written on first use. */
  def flatDir(spark: SparkSession, d: String): String =
    staged("flat", d) { path =>
      unpersistBuildCaches(spark) {
        val (cents, members) = SimilarityQueries.semanticStreamIndex(spark, d)
        SimilarityQueries.writeGateIndexFlat(spark, path, cents, members)
      }
    }

  /** The routed (q116-cell) index dir for `d`, built+written on first use.
    * Shared by the broadcast-routed (q127) and staged (q129) heads — the
    * two heads READ the same written tables differently. */
  def routedDir(spark: SparkSession, d: String): String =
    staged("routed", d) { path =>
      unpersistBuildCaches(spark) {
        val (tabs, members) = SimilarityQueries.semanticStreamIndexRouted(spark, d)
        SimilarityQueries.writeGateIndexRouted(spark, path, tabs, members)
      }
    }

  // ---------------------------------------------------------------------
  // Memoized ROUTING-TABLE reads (r16, guide §5 "no blocking driver jobs
  // in query paths"): the broadcast heads' routing state (flat centroid
  // table / RoutedTables) is collected from the staged parquet — two
  // orderBy+collect driver jobs per CONSTRUCTION of q126/q127, i.e. twice
  // per bench row under best-of-2, for tables that are immutable for the
  // life of the staged dir. A production streaming gate loads its routing
  // tables ONCE per gate lifetime and holds them resident across
  // micro-batches (semanticAdmitLoop already hoists them outside the
  // stream for exactly this reason — StreamingOps.scala "frozen routing
  // tables" contract); re-collecting per constructed batch query was
  // startup accounting, not gate cost. Memoized per (JVM, corpus) — pure
  // immutable driver objects (no DataFrame, so Bench's per-rep
  // clearCache() cannot invalidate anything), keyed next to the staged
  // dirs they were read from. The QUERY still computes its result from
  // the parquet corpus every run; only the index-table load is amortized,
  // the same line the r13 staging split drew for the index BUILD.
  private val flatCentsMemo = StagingRoots.memo[Seq[Seq[Long]]]()
  private val routedTabsMemo = StagingRoots.memo[SimilarityQueries.RoutedTables]()

  /** The flat gate's centroid table, collected once per (JVM, corpus). */
  def flatCents(spark: SparkSession, d: String): Seq[Seq[Long]] = {
    val idx = flatDir(spark, d)
    StagingRoots.memoizedBuild(flatCentsMemo,
      s"flatcents_${StagingRoots.pathKey(d)}") {
      SimilarityQueries.readFlatCents(spark, idx)
    }
  }

  /** The routed gate's RoutedTables, collected once per (JVM, corpus). */
  def routedTables(spark: SparkSession, d: String): SimilarityQueries.RoutedTables = {
    val idx = routedDir(spark, d)
    StagingRoots.memoizedBuild(routedTabsMemo,
      s"routedtabs_${StagingRoots.pathKey(d)}") {
      SimilarityQueries.readRoutedTables(spark, idx)
    }
  }

  /** PRISTINE staged index over the q130 BASE slice (vec_id % 4 != 0 of
    * `embeddings`), memoized per (JVM, corpus). Never mutated — the
    * append lifecycle copies it into a fresh workdir per invocation. */
  private def appendBasePristineDir(spark: SparkSession, d: String): String =
    staged("appendbase", d) { path =>
      unpersistBuildCaches(spark) {
        import org.apache.spark.sql.functions.col
        val (coarse, fineRouted, members) = SimilarityQueries
          .semanticStreamIndexStagedFrom(
            graft.Tables.embeddings(spark, d)
              .filter(col("vec_id") % 4 =!= 0)
              .select(col("vec_id"), col("embedding")))
        SimilarityQueries.writeGateIndexStaged(spark, path, coarse, fineRouted, members)
        ()
      }
    }

  /** A FRESH mutable copy of the pristine q130 base index — one per call,
    * because [[SimilarityQueries.semanticIndexAppend]]/compact mutate the
    * dir in place and a re-run (Bench after Verify, a second Bench pass)
    * must start from the same pristine state, not from the previous run's
    * appended generations. The copy lives under the staging root, swept
    * on JVM exit — AND the caller's PREVIOUS workdir is deleted on its
    * next call (per-thread: every caller fully materializes one
    * lifecycle before requesting the next, so the predecessor is dead by
    * then; cross-thread callers never share a slot), so a long sf0.1
    * session of repeated q130 runs holds at most one live copy per
    * thread instead of accumulating full index copies until JVM exit
    * (r14 advice). */
  private val prevWorkdir = new ThreadLocal[java.nio.file.Path]
  def appendWorkdir(spark: SparkSession, d: String): String = {
    val pristine = appendBasePristineDir(spark, d)
    Option(prevWorkdir.get()).foreach(StagingRoots.deleteRecursively)
    val work = java.nio.file.Files.createTempDirectory(root, "appendwork_")
    StagingRoots.copyRecursively(java.nio.file.Paths.get(pristine), work)
    prevWorkdir.set(work)
    work.toString
  }

  /** Pre-build the selected layouts (the Bench `q_staging_gate` hook) —
    * a filtered bench run that selects only q126 stages only the flat
    * index; q127/q129-only runs stage only the routed one (r13 review);
    * q130 stages the pristine append-lifecycle BASE index (r14: its
    * build otherwise lands inside q130's first timed run — the exact
    * build-cost-in-gate-rows accounting r13 fixed for the twins).
    *
    * The selected builds run CONCURRENTLY (r16, the EvalStaging.build
    * discipline): the three indexes are independent — different source
    * slices, different output dirs, memoized under different keys — and
    * each build is a chain of small sequential stages (seed/assign/write
    * over a 500–4k-vector corpus at bench SF), i.e. stage-latency-bound,
    * not CPU-bound. Safe because memoizedBuild already serializes
    * per-key cross-thread joins and releasingBuildCaches refcounts
    * concurrent sibling frames (the last exiter sweeps). */
  def build(spark: SparkSession, d: String,
      flat: Boolean = true, routed: Boolean = true,
      appendBase: Boolean = false): Unit = {
    val builds: Seq[() => Unit] = Seq(
      (flat, () => { flatDir(spark, d); () }),
      (routed, () => { routedDir(spark, d); () }),
      (appendBase, () => { appendBasePristineDir(spark, d); () })
    ).collect { case (true, b) => b }
    if (builds.sizeIs <= 1) builds.foreach(_.apply())
    else {
      import scala.concurrent.{Await, Future, ExecutionContext}
      import scala.concurrent.duration.Duration
      import scala.util.Try
      val pool = java.util.concurrent.Executors.newFixedThreadPool(builds.size)
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
      try {
        // await ALL builds before teardown, then rethrow the first
        // failure (the EvalStaging.build r12-ADVICE pattern)
        builds.map(b => Future(b())).map(f => Try(Await.result(f, Duration.Inf)))
          .foreach(_.get)
      } finally pool.shutdown()
    }
  }
}
