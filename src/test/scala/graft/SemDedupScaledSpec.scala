package graft

import org.apache.spark.sql.functions._
import graft.queries.SimilarityQueries

/** q113 (SemDeDup at production K) goldens:
  *
  *  1. the K rule itself (⌈N/64⌉) pinned at the scales SCALE.md measures;
  *  2. at the fixture scale (500 vectors → K=8, the same seed count and
  *     seed rule as q63) the scaled lane must equal q63 row-for-row —
  *     the broadcast-frame argmin is a different PHYSICAL plan than q63's
  *     literal-expression argmin, so this is a real cross-plan equality;
  *  3. a crafted 2000-vector corpus (K=32, planted near-dup pairs) whose
  *     whole pipeline — md5-rank seeds, two integer-exact Lloyd passes,
  *     within-cluster cosine census — is replayed in plain Scala with no
  *     shared code and compared row-for-row.
  */
class SemDedupScaledSpec extends GraftSuite {

  test("scaledK: ceil(N/64) at the measured scales") {
    assert(SimilarityQueries.scaledK(500) == 8) // sf0.01 fixture: coincides with q63's K
    assert(SimilarityQueries.scaledK(2000) == 32) // sf0.1
    assert(SimilarityQueries.scaledK(20000) == 313) // 10x embeddings
    assert(SimilarityQueries.scaledK(200000) == 3125) // 100x embeddings
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

  test("crafted 2000-vector corpus (K=32): full plain-Scala pipeline replay") {
    import spark.implicits._
    val dim = 64
    val n = 2000
    val rnd = new scala.util.Random(4242L)
    val centers = Array.fill(32, dim)(rnd.nextDouble() * 2 - 1)
    val vecs: Array[Array[Float]] = new Array(n)
    (0 until n).foreach { i =>
      vecs(i) =
        if (i % 10 == 9) // planted near-dup of the previous vector
          vecs(i - 1).map(x => x + 0.001f * (rnd.nextFloat() * 2 - 1))
        else {
          val c = centers(i % 32)
          Array.tabulate(dim)(j => (c(j) + 0.05 * (rnd.nextDouble() * 2 - 1)).toFloat)
        }
    }
    val dir = java.nio.file.Files.createTempDirectory("q113corpus").toString
    (0 until n).map(i => (i.toLong, s"l${i % 3}", vecs(i).toSeq))
      .toDF("vec_id", "label", "embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    // ---- plain-Scala replay (no shared code) ----
    val k = math.ceil(n / 64.0).toInt // 32
    // e as promoted doubles; left-fold dot, exactly DotFold's order
    val e: Array[Array[Double]] = vecs.map(_.map(_.toDouble))
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var acc = 0.0; var i = 0
      while (i < a.length) { acc += a(i) * b(i); i += 1 }
      acc
    }
    val nrm = e.map(v => math.sqrt(dot(v, v)))
    val mud: Array[Array[Double]] =
      e.map(_.map(x => r(x * 1e6, 0)))
    val seedIds = (0 until n).sortBy(i => (md5Int(i.toString), i)).take(k)
    val seeds = seedIds.map(mud(_)).toArray
    def sq(a: Array[Double], b: Array[Double]): Double = {
      // dist via dot(m,m) - 2 dot(m,c) + dot(c,c): all integer-valued
      dot(a, a) - 2.0 * dot(a, b) + dot(b, b)
    }
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
    val cents2 = (0 until k).map { c =>
      val members = (0 until n).filter(c1(_) == c)
      if (members.isEmpty) seeds(c)
      else Array.tabulate(dim) { j =>
        val s = members.map(i => mud(i)(j).toLong).sum
        r(s / members.size.toDouble, 0)
      }
    }.toArray
    val cid = assign(cents2)
    // census per cluster
    case class Row(cid: Int, nMembers: Long, nMoved: Long, nPairs: Long,
        nNeardup: Long, nRemoved: Long, maxCos: Double)
    val want = (0 until k).flatMap { c =>
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
    assert(want.map(_.nNeardup).sum > 50,
      "fixture must plant a meaningful number of near-dup pairs")
    assert(want.size > 16, "crafted corpus should populate many of the 32 cells")

    val got = SimilarityQueries.q113SemanticDedupScaled(spark, dir)
      .collect()
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
}
