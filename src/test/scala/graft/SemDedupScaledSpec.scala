package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** q113 (SemDeDup at production K) and q116 (routed / two-level) goldens:
  *
  *  1. the K rule itself (⌈N/64⌉) pinned at the scales SCALE.md measures;
  *  2. at the fixture scale (500 vectors → K=8, the same seed count and
  *     seed rule as q63) the scaled lane must equal q63 row-for-row —
  *     the broadcast-kernel argmin is a different PHYSICAL plan than q63's
  *     literal-expression argmin, so this is a real cross-plan equality;
  *  3. a crafted 2000-vector corpus (K=32, planted near-dup pairs) whose
  *     whole pipeline — md5-rank seeds, two integer-exact Lloyd passes,
  *     within-cluster cosine census — is replayed in plain Scala with no
  *     shared code and compared row-for-row, for BOTH the flat (q113)
  *     and the routed (q116, k₁=⌈√K⌉=6 coarse cells) assignment.
  */
class SemDedupScaledSpec extends GraftSuite {

  test("scaledK: ceil(N/64) at the measured scales") {
    assert(SimilarityQueries.scaledK(500) == 8) // sf0.01 fixture: coincides with q63's K
    assert(SimilarityQueries.scaledK(2000) == 32) // sf0.1
    assert(SimilarityQueries.scaledK(20000) == 313) // 10x embeddings
    assert(SimilarityQueries.scaledK(200000) == 3125) // 100x embeddings
    assert(SimilarityQueries.scaledK(2000000) == 31250) // 1000x embeddings
    assert(SimilarityQueries.scaledK(1) == 1)
  }

  test("q113 == q63 row-for-row at the fixture scale (K coincides at 8)") {
    val a = SimilarityQueries.q63SemanticDedup(spark, sf)
      .collect().map(_.toSeq).sortBy(_.toString)
    val b = SimilarityQueries.q113SemanticDedupScaled(spark, sf)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(a.length == b.length && a.nonEmpty)
    a.zip(b).foreach { case (x, y) => assert(x == y, s"$x != $y") }
  }

  private def md5Int(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  // Spark round(col, n) on DoubleType: BigDecimal(valueOf(d)) HALF_UP
  private def r(v: Double, s: Int): Double =
    java.math.BigDecimal.valueOf(v).setScale(s, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  // ---- shared crafted corpus + plain-Scala replay machinery ----
  private val dim = 64
  private val n = 2000
  private val k = 32 // ceil(2000/64)

  private lazy val vecs: Array[Array[Float]] = {
    val rnd = new scala.util.Random(4242L)
    val centers = Array.fill(32, dim)(rnd.nextDouble() * 2 - 1)
    val out: Array[Array[Float]] = new Array(n)
    (0 until n).foreach { i =>
      out(i) =
        if (i % 10 == 9) // planted near-dup of the previous vector
          out(i - 1).map(x => x + 0.001f * (rnd.nextFloat() * 2 - 1))
        else {
          val c = centers(i % 32)
          Array.tabulate(dim)(j => (c(j) + 0.05 * (rnd.nextDouble() * 2 - 1)).toFloat)
        }
    }
    out
  }

  private lazy val corpusDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("q113corpus").toString
    (0 until n).map(i => (i.toLong, s"l${i % 3}", vecs(i).toSeq))
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  // e as promoted doubles; left-fold dot, exactly DotFold's order
  private lazy val e: Array[Array[Double]] = vecs.map(_.map(_.toDouble))
  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var acc = 0.0; var i = 0
    while (i < a.length) { acc += a(i) * b(i); i += 1 }
    acc
  }
  private lazy val nrm: Array[Double] = e.map(v => math.sqrt(dot(v, v)))
  private lazy val mud: Array[Array[Double]] = e.map(_.map(x => r(x * 1e6, 0)))
  private lazy val seeds: Array[Array[Double]] =
    (0 until n).sortBy(i => (md5Int(i.toString), i)).take(k).map(mud(_)).toArray

  private def sq(a: Array[Double], b: Array[Double]): Double =
    dot(a, a) - 2.0 * dot(a, b) + dot(b, b) // all integer-valued doubles

  /** One Lloyd update in the engines' exact integer arithmetic. */
  private def lloyd(c1: Array[Int]): Array[Array[Double]] =
    (0 until k).map { c =>
      val members = (0 until n).filter(c1(_) == c)
      if (members.isEmpty) seeds(c)
      else Array.tabulate(dim) { j =>
        val s = members.map(i => mud(i)(j).toLong).sum
        r(s / members.size.toDouble, 0)
      }
    }.toArray

  private case class Row(cid: Int, nMembers: Long, nMoved: Long, nPairs: Long,
      nNeardup: Long, nRemoved: Long, maxCos: Double)

  private def census(c1: Array[Int], cid: Array[Int]): Seq[Row] =
    (0 until k).flatMap { c =>
      val m = (0 until n).filter(cid(_) == c)
      if (m.isEmpty) None
      else {
        var nPairs = 0L; var nNd = 0L; var maxC = Double.NegativeInfinity
        val removed = scala.collection.mutable.Set.empty[Int]
        for (ai <- m.indices; bi <- (ai + 1) until m.size) {
          val i = m(ai); val j = m(bi)
          val cos = r(dot(e(i), e(j)) / (nrm(i) * nrm(j)), 6)
          nPairs += 1
          if (cos >= 0.9) { nNd += 1; removed += math.max(i, j) }
          if (cos > maxC) maxC = cos
        }
        val mc = if (nPairs == 0) 0.0 else r(maxC, 4) + 0.0
        Some(Row(c, m.size.toLong, m.count(i => c1(i) != cid(i)).toLong,
          nPairs, nNd, removed.size.toLong, mc))
      }
    }

  private def checkAgainst(want: Seq[Row],
      df: org.apache.spark.sql.DataFrame): Unit = {
    val got = df.collect()
      .map(row => Row(row.getAs[Int]("cid"), row.getAs[Long]("n_members"),
        row.getAs[Long]("n_moved"), row.getAs[Long]("n_pairs"),
        row.getAs[Long]("n_neardup_pairs"), row.getAs[Long]("n_sem_removed"),
        row.getAs[Double]("max_cos")))
      .sortBy(_.cid)
    assert(got.length == want.size, s"${got.length} rows vs ${want.size}")
    got.zip(want.sortBy(_.cid)).foreach { case (g, w) =>
      assert(g == w, s"cluster ${w.cid}: got $g want $w")
    }
  }

  test("crafted 2000-vector corpus (K=32): full plain-Scala FLAT replay (q113)") {
    def assign(cents: Array[Array[Double]]): Array[Int] =
      (0 until n).map { i =>
        var best = 0; var bd = sq(mud(i), cents(0))
        (1 until cents.length).foreach { c =>
          val d = sq(mud(i), cents(c))
          if (d < bd) { bd = d; best = c } // ties keep the smaller cid
        }
        best
      }.toArray
    val c1 = assign(seeds)
    val cid = assign(lloyd(c1))
    val want = census(c1, cid)
    assert(want.map(_.nNeardup).sum > 50,
      "fixture must plant a meaningful number of near-dup pairs")
    assert(want.size > 16, "crafted corpus should populate many of the 32 cells")
    checkAgainst(want, SimilarityQueries.q113SemanticDedupScaled(spark, corpusDir))
  }

  test("crafted 2000-vector corpus (K=32, k1=6): full plain-Scala ROUTED replay (q116)") {
    val k1 = math.ceil(math.sqrt(k.toDouble)).toInt // 6
    // coarse = the first k1 fine SEEDS, fixed across both passes
    def routeOf(c: Array[Double]): Int = {
      var best = 0; var bd = sq(c, seeds(0))
      (1 until k1).foreach { j =>
        val d = sq(c, seeds(j))
        if (d < bd) { bd = d; best = j }
      }
      best
    }
    def assignRouted(cents: Array[Array[Double]]): Array[Int] = {
      val f2c = cents.map(routeOf)
      val nonEmpty = f2c.distinct.sorted
      (0 until n).map { i =>
        // vector coarse: argmin over NON-EMPTY coarse cells, ties → smaller
        var bc = nonEmpty(0); var bd = sq(mud(i), seeds(nonEmpty(0)))
        nonEmpty.drop(1).foreach { cc =>
          val d = sq(mud(i), seeds(cc))
          if (d < bd) { bd = d; bc = cc }
        }
        // fine: argmin restricted to the routed cell, ties → smaller cid
        var best = -1; var bf = Double.MaxValue
        cents.indices.foreach { c =>
          if (f2c(c) == bc) {
            val d = sq(mud(i), cents(c))
            if (d < bf) { bf = d; best = c }
          }
        }
        best
      }.toArray
    }
    val c1 = assignRouted(seeds)
    val cid = assignRouted(lloyd(c1))
    val want = census(c1, cid)
    assert(want.map(_.nNeardup).sum > 50, "routed clustering must keep the planted near-dups")
    // the routing is a real approximation: it must differ somewhere from
    // the flat assignment on this corpus, or the test proves nothing
    checkAgainst(want, SimilarityQueries.q116SemanticDedupRouted(spark, corpusDir))
  }

  test("q117 exact-first: planted exact duplicates collapse, and the census " +
    "over reps equals q113 on the duplicate-free corpus") {
    import spark.implicits._
    // corpus2 = the crafted corpus + 400 EXACT copies of existing vectors
    // (new vec_ids 2000..2399 duplicating vecs(i % 50) bit-for-bit)
    val dir2 = java.nio.file.Files.createTempDirectory("q117corpus").toString
    val rows = (0 until n).map(i => (i.toLong, s"l${i % 3}", vecs(i).toSeq)) ++
      (0 until 400).map(j => ((n + j).toLong, s"l${j % 3}", vecs(j % 50).toSeq))
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir2/embeddings.parquet")

    val got = SimilarityQueries.q117SemanticDedupExactFirst(spark, dir2).collect()
    // scalars on every row: 2400 total, 2000 reps, 400 exact-removed
    got.foreach { r =>
      assert(r.getAs[Long]("n_total") == 2400L)
      assert(r.getAs[Long]("n_reps") == 2000L, s"reps: $r")
      assert(r.getAs[Long]("n_exact_removed") == 400L)
    }
    // the reps ARE the original 2000 vectors with their original ids (each
    // duplicate's min vec_id is the original), so the per-cluster census
    // must equal q113 on the duplicate-free corpus row-for-row
    val want = SimilarityQueries.q113SemanticDedupScaled(spark, corpusDir)
      .collect().map(_.toSeq).sortBy(_.toString)
    val gotCensus = got
      .map(r => Seq[Any](r.getAs[Int]("cid"), r.getAs[Long]("n_members"),
        r.getAs[Long]("n_moved"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_neardup_pairs"), r.getAs[Long]("n_sem_removed"),
        r.getAs[Double]("max_cos")))
      .sortBy(_.toString)
    assert(gotCensus.length == want.length && gotCensus.nonEmpty)
    gotCensus.zip(want).foreach { case (g, w) =>
      assert(g == w, s"q117 census $g != q113-on-distinct $w")
    }

    // and the full production stack (q118 = exact-first ∘ routed): same
    // scalars, census == q116 on the duplicate-free corpus
    val got118 = SimilarityQueries.q118SemanticDedupStack(spark, dir2).collect()
    got118.foreach { r =>
      assert(r.getAs[Long]("n_total") == 2400L &&
        r.getAs[Long]("n_reps") == 2000L &&
        r.getAs[Long]("n_exact_removed") == 400L, s"stack scalars: $r")
    }
    val want116 = SimilarityQueries.q116SemanticDedupRouted(spark, corpusDir)
      .collect().map(_.toSeq).sortBy(_.toString)
    val got118Census = got118
      .map(r => Seq[Any](r.getAs[Int]("cid"), r.getAs[Long]("n_members"),
        r.getAs[Long]("n_moved"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_neardup_pairs"), r.getAs[Long]("n_sem_removed"),
        r.getAs[Double]("max_cos")))
      .sortBy(_.toString)
    assert(got118Census.length == want116.length && got118Census.nonEmpty)
    got118Census.zip(want116).foreach { case (g, w) =>
      assert(g == w, s"q118 census $g != q116-on-distinct $w")
    }
  }

  test("q119 capped census: an engineered seedless blob quarantines, resolves " +
    "in O(members), and small cells match the uncapped stack") {
    import spark.implicits._
    // The mega-cell event is SEED MISALLOCATION: md5-rank seeding is
    // mass-proportional, so a dense region usually gets ~B/64 seeds and
    // splits into target-size cells — the tail case is a blob that draws
    // NO seed (probability e^(−K·B/N)). Engineer it deterministically:
    // pick blob vec_ids whose md5 ranks are LARGEST among candidates, so
    // none of them can be among the K smallest (the seeds). All blob
    // members then fall into one outside centroid's cell.
    val blobSize = 600
    val candidates = (10000L until 14000L)
      .sortBy(id => (md5Int(id.toString), id))
    val blobIds = candidates.takeRight(blobSize) // largest md5 ranks
    val rows = (0 until n).map(i => (i.toLong, s"l${i % 3}", vecs(i).toSeq)) ++
      blobIds.zipWithIndex.map { case (id, j) =>
        // near-identical but DISTINCT: far from the crafted corpus'
        // [-1, 1]-cube clusters so the blob shares one outside cell
        (id, "lb", Array.tabulate(dim)(i =>
          (5.0 + 1e-4 * math.sin(j * 13.7 + i)).toFloat).toSeq)
      }
    val dir3 = java.nio.file.Files.createTempDirectory("q119corpus").toString
    rows.toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir3/embeddings.parquet")

    val got = SimilarityQueries.q119SemanticDedupCapped(spark, dir3).collect()
    val quarantined = got.filter(_.getAs[Boolean]("quarantined"))
    assert(quarantined.nonEmpty, "the seedless blob must exceed the 256 cap")
    val qMembers = quarantined.map(_.getAs[Long]("n_members")).sum
    assert(qMembers >= blobSize, s"blob must be quarantined: $qMembers")
    quarantined.foreach { r =>
      // O(members) resolution: exactly members−1 rep verifications
      assert(r.getAs[Long]("n_pairs") == r.getAs[Long]("n_members") - 1, s"$r")
      // near-identical blob: essentially every member is cos≈1 to the rep
      assert(r.getAs[Long]("n_sem_removed") >= r.getAs[Long]("n_members") - 2, s"$r")
      assert(r.getAs[Double]("max_cos") >= 0.99, s"$r")
    }
    // non-quarantined rows must equal the UNCAPPED stack's census rows
    // (q118 on the same corpus, same assignment) for the same cids
    val smallCids = got.filterNot(_.getAs[Boolean]("quarantined"))
      .map(_.getAs[Int]("cid")).toSet
    val uncapped = SimilarityQueries.q118SemanticDedupStack(spark, dir3)
      .collect()
      .filter(r => smallCids.contains(r.getAs[Int]("cid")))
      .map(r => Seq[Any](r.getAs[Int]("cid"), r.getAs[Long]("n_members"),
        r.getAs[Long]("n_moved"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_neardup_pairs"), r.getAs[Long]("n_sem_removed"),
        r.getAs[Double]("max_cos")))
      .sortBy(_.toString)
    val small119 = got.filterNot(_.getAs[Boolean]("quarantined"))
      .map(r => Seq[Any](r.getAs[Int]("cid"), r.getAs[Long]("n_members"),
        r.getAs[Long]("n_moved"), r.getAs[Long]("n_pairs"),
        r.getAs[Long]("n_neardup_pairs"), r.getAs[Long]("n_sem_removed"),
        r.getAs[Double]("max_cos")))
      .sortBy(_.toString)
    assert(small119.length == uncapped.length && small119.nonEmpty)
    small119.zip(uncapped).foreach { case (g, w) =>
      assert(g == w, s"small-cell census $g != uncapped $w")
    }
  }
}
