package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Semantic-dedup-lane scaling rehearsal (dev tool, the EvalScale/
  * GraphScale pattern): measures the staged routed-assignment stack (q125)
  * and the exact-first lanes (q117/q118) at the regime they were built
  * for — K ≥ 10⁵ centroids and 2M-vector corpora — recording wall clock
  * AND peak JVM heap, because the staged lane's entire reason to exist is
  * the claim that driver state stays O(√K) while the kernel lanes
  * (q116/q118) carry O(K) driver collects. In local mode the driver and
  * executors share one heap, so "peak heap" here upper-bounds the driver
  * requirement (the r8 array-keyed lane needed SPARK_DRIVER_MEM=32g at
  * 1000×; the digest-keyed collapse + staged lane are supposed to fit the
  * 8g dev default — this runner is what proves or refutes that).
  *
  * Modes (one JVM per measurement so heap peaks don't bleed across runs):
  *   staged <dir> [targetCell]  — the q125 stack via stagedStackRehearsal
  *                                (targetCell=16 on a 2M-vector corpus →
  *                                K = 125,000); wall + peak heap + census
  *                                shape (cells, worst cell, pairs).
  *   census <dir> [targetCell]  — coarseCellCensus: the fine-centroids-
  *                                per-coarse-cell distribution that decides
  *                                routed task balance (a coarse cell with m
  *                                fine centroids costs every vector routed
  *                                there O(m) kernel work).
  *   blobfix <src> <dst> [pct]  — write an adversarial seed-geometry
  *                                variant of <src>'s embeddings: pct% of
  *                                vectors become ONE near-identical blob
  *                                (distinct vectors — exact-first cannot
  *                                collapse them) carried by the vec_ids
  *                                with the LARGEST md5 ranks, which are
  *                                provably never seeds (the
  *                                SemDedupScaledSpec seedless-blob
  *                                technique at fixture scale). The blob
  *                                draws zero seeds, so all its members
  *                                route to one fine cell: the mega-cell /
  *                                hot-route event the capped census and
  *                                the staged join's skew story must absorb.
  *   dedup <dir>                — q117 then q118 timed with peak heap (the
  *                                1000×+dupvec re-run after the digest-keyed
  *                                exact collapse; r8 measured 180.6/85.2 s
  *                                but needed 32g — has the requirement
  *                                dropped to the 8g default?).
  *
  * Prints one JSON line per measurement; SCALE.md records the numbers.
  */
object SemScale {

  /** Peak-heap via a 100 ms sampler of the SIMULTANEOUS heap used
    * (MemoryMXBean). Summing per-pool peak marks overcounts — G1 pool
    * peaks happen at different instants and their sum can exceed Xmx —
    * so the sampled concurrent max is the honest number; completion
    * inside Xmx is the binding proof either way. */
  @volatile private var peakHeap: Long = 0L
  private def startHeapSampler(): Unit = {
    peakHeap = 0L
    val bean = java.lang.management.ManagementFactory.getMemoryMXBean
    val t = new Thread(() => {
      while (true) {
        val used = bean.getHeapMemoryUsage.getUsed
        if (used > peakHeap) peakHeap = used
        Thread.sleep(100)
      }
    })
    t.setDaemon(true)
    t.start()
  }
  private def heapPeakMb(): Long = peakHeap / (1024 * 1024)
  private def resetHeapPeaks(): Unit = peakHeap = 0L

  private def time[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  private def xmxMb(): Long =
    Runtime.getRuntime.maxMemory() / (1024 * 1024)

  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("staged")
    startHeapSampler()
    mode match {
      case "staged" =>
        val d = args(1)
        val targetCell = args.lift(2).map(_.toInt).getOrElse(16)
        val spark = session()
        val n = Tables.embeddings(spark, d).count()
        resetHeapPeaks()
        val (summary, wall) = time {
          val res = queries.SimilarityQueries
            .stagedStackRehearsal(spark, d, targetCell)
          res.agg(
            count(lit(1)).as("n_cells"),
            max(col("n_members")).as("max_cell"),
            sum(col("n_pairs")).as("n_pairs"),
            sum(col("n_sem_removed")).as("n_sem_removed"),
            any_value(col("n_total")).as("n_total"),
            any_value(col("n_reps")).as("n_reps")).head()
        }
        val k = math.ceil(summary.getAs[Long]("n_reps") / targetCell.toDouble).toLong
        println(s"""{"mode":"staged","dir":"$d","n_vectors":$n,""" +
          s""""target_cell":$targetCell,"k":$k,""" +
          s""""n_reps":${summary.getAs[Long]("n_reps")},""" +
          s""""n_cells":${summary.getAs[Long]("n_cells")},""" +
          s""""max_cell":${summary.getAs[Long]("max_cell")},""" +
          s""""n_pairs":${summary.getAs[Long]("n_pairs")},""" +
          s""""n_sem_removed":${summary.getAs[Long]("n_sem_removed")},""" +
          f""""wall_sec":$wall%.1f,"peak_heap_mb":${heapPeakMb()},""" +
          s""""xmx_mb":${xmxMb()}}""")

      case "census" =>
        val d = args(1)
        val targetCell = args.lift(2).map(_.toInt).getOrElse(64)
        val spark = session()
        resetHeapPeaks()
        val (rows, wall) = time {
          queries.SimilarityQueries.coarseCellCensus(spark, d, targetCell)
            .collect()
        }
        val sizes = rows.map(_.getAs[Long]("n_fine")).sorted
        val nFine = sizes.sum
        val k1 = rows.length
        def pct(p: Double): Long = sizes((p * (sizes.length - 1)).round.toInt)
        val top = rows.take(5).map(r =>
          s"[${r.getAs[Int]("fr")},${r.getAs[Long]("n_fine")}]").mkString(",")
        println(s"""{"mode":"census","dir":"$d","target_cell":$targetCell,""" +
          s""""k":$nFine,"k1_nonempty":$k1,""" +
          s""""mean_fine":${nFine / math.max(k1, 1)},""" +
          s""""p50":${pct(0.5)},"p99":${pct(0.99)},"max":${sizes.last},""" +
          s""""top5":[$top],""" +
          f""""wall_sec":$wall%.1f,"peak_heap_mb":${heapPeakMb()}}""")

      case "blobfix" =>
        val src = args(1)
        val dst = args(2)
        val blobPct = args.lift(3).map(_.toInt).getOrElse(5)
        val spark = session()
        val emb = Tables.embeddings(spark, src)
        val n = emb.count()
        val blobN = n * blobPct / 100
        // limit(0).agg(min) yields a null aggregate → NPE at getLong; fail
        // with a usable message instead (r11 ADVICE)
        require(blobN >= 1,
          s"blobfix: pct=$blobPct of n=$n rounds to blobN=$blobN (< 1) — " +
            "corpus too small or pct too low to plant a blob")
        // the blobN LARGEST md5 ranks can never be among the k smallest
        // (k ≪ n − blobN): a provably seedless blob
        val ranked = emb.withColumn("hk",
          functions.GraftFunctions.md5PrefixInt(col("vec_id").cast("string")))
        val cut = ranked.select(col("hk")).orderBy(col("hk").desc)
          .limit(blobN.toInt).agg(min(col("hk"))).head().getLong(0)
        val out = ranked.withColumn("embedding",
            when(col("hk") >= cut,
              expr("transform(embedding, (x, i) -> CAST(0.25 + 0.0001 * sin(vec_id * 13.7D + i) AS FLOAT))"))
              .otherwise(col("embedding")))
          .drop("hk")
        out.coalesce(8).write.mode("overwrite").parquet(s"$dst/embeddings.parquet")
        val planted = ranked.filter(col("hk") >= cut).count()
        println(s"""{"mode":"blobfix","src":"$src","dst":"$dst",""" +
          s""""n_vectors":$n,"blob_planted":$planted}""")

      case "dedup" =>
        val d = args(1)
        // optional filter (fresh-JVM single-query measurement: running
        // q118 after q117 in one JVM hands it JIT + page-cache warmup)
        val only = args.lift(2).map(_.split(',').toSet)
        val spark = session()
        val n = Tables.embeddings(spark, d).count()
        for ((name, q) <- Seq(
            "q117" -> queries.SimilarityQueries.q117SemanticDedupExactFirst _,
            "q118" -> queries.SimilarityQueries.q118SemanticDedupStack _)
            if only.forall(_.contains(name))) {
          resetHeapPeaks()
          val (rows, wall) = time(q(spark, d).count())
          println(s"""{"mode":"dedup","query":"$name","dir":"$d",""" +
            s""""n_vectors":$n,"rows":$rows,""" +
            f""""wall_sec":$wall%.1f,"peak_heap_mb":${heapPeakMb()},""" +
            s""""xmx_mb":${xmxMb()}}""")
          spark.sharedState.cacheManager.clearCache()
        }

      case other =>
        System.err.println(s"unknown mode: $other (staged|census|blobfix|dedup)")
        sys.exit(2)
    }
  }
}
