package graft

import org.apache.spark.sql.functions._
import graft.operators.StarComponents

/** Pins the large-star/small-star component labeling (the adversarial-graph
  * scale lane) against a driver-side union-find on crafted graph shapes —
  * including the chain graphs q61's plain propagation is slow on — and pins
  * q87 == q61 row-for-row (same census, different algorithm).
  */
class StarComponentsSpec extends GraftSuite {

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(n => n -> find(n)).toMap
  }

  private def check(edges: Seq[(Long, Long)], clue: String): Unit = {
    import spark.implicits._
    val got = StarComponents.labels(edges.toDF("u", "v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq.sorted
    // a Map comparison would silently collapse duplicate (node, label)
    // rows — the exact failure mode of a premature-convergence bug — so
    // pin single-label-per-node explicitly and compare sorted row sets
    assert(got.map(_._1).distinct.length == got.length,
      s"$clue: duplicate node labels in $got")
    val want = unionFind(edges.filter(e => e._1 != e._2)).toSeq.sorted
    assert(got == want, s"$clue: got $got want $want")
  }

  test("chain graph (the q61-adversarial case) labels to the chain min") {
    check((1L until 12L).map(i => (i, i + 1)), "chain")
    // reversed orientation and duplicates must not matter
    check((1L until 12L).map(i => (i + 1, i)) ++ Seq((3L, 4L), (5L, 5L)), "chain-rev")
  }

  test("path 1-5-3-9-2: depth-1 alone is not convergence (two-parent state)") {
    // after one large+small-star round this graph reaches
    // {(3,1),(3,2),(5,1),(9,2)}: no edge target is also a source (depth
    // ≤ 1 holds) yet node 3 has two parents — a convergence test without
    // the unique-parent condition stops here and splits the single
    // component into labels {1, 2}
    check(Seq((1L, 5L), (3L, 5L), (3L, 9L), (2L, 9L)), "path-two-parent")
  }

  test("clique, star, and multi-component graphs") {
    val clique = for (a <- 1L to 6L; b <- (a + 1) to 6L) yield (a, b)
    check(clique, "clique")
    check((2L to 9L).map(v => (1L, v)), "star")
    check(Seq((10L, 11L), (11L, 12L), (20L, 21L), (30L, 31L), (31L, 32L),
      (32L, 30L)), "three components")
  }

  test("self-loop-only nodes are labeled as their own singleton components") {
    import spark.implicits._
    // pre-fix, the cu =!= cv filter discarded node 7's ONLY edge before
    // any node was recorded, so it vanished from the output — violating
    // the 'every node appearing in edges' contract (r13 review; dedup
    // callers always pass d1 < d2, so no fixture exercised it)
    val edges = Seq((7L, 7L), (1L, 2L), (3L, 3L), (2L, 2L)).toDF("u", "v")
    val got = graft.operators.StarComponents.labels(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 7L -> 7L), got.toString)
    // all-self-loop graph: every node is its own component
    val only = Seq((5L, 5L), (6L, 6L)).toDF("u", "v")
    val got2 = graft.operators.StarComponents.labels(only).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got2 == Map(5L -> 5L, 6L -> 6L), got2.toString)
  }

  test("random graph labels match union-find") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter(e => e._1 != e._2)
    check(edges, "random-120")
  }

  test("q87 census equals q61 row-for-row on the fixture") {
    val star = queries.DedupQueries.q87ComponentsStar(spark, sf).collect()
    val prop = queries.DedupQueries.q61DupComponents(spark, sf).collect()
    assert(star.nonEmpty)
    assert(star.toSeq == prop.toSeq)
  }

  test("q91 resolves a crafted over-cap bucket as one VERIFIED mega-cluster") {
    // the fixture SFs only exercise zero-quarantine (sf0.001/sf0.01) and
    // the degenerate-collision branch (sf0.1, 0 verified); this corpus
    // exercises the true mega-cluster branch: 70 near-identical docs (a
    // 120-word shared core + 2 unique words each) exceed the bucket cap
    // of 64, quarantine, merge into one component, and VERIFY (member-vs-
    // root jaccard stays far above 0.5)
    import spark.implicits._
    val core = (1 to 120).map(i => s"w$i").mkString(" ")
    val docs = (0 until 70).map { i =>
      (i.toLong, s"$core uniq${i}a uniq${i}b", "en", "crafted",
        (core.length + 16).toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_q91_fixture")
    docs.coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val r = queries.DedupQueries.q91QuarantineResolve(spark, dir.toString)
      .collect()(0)
    assert(r.getAs[Long]("n_over_cap_buckets") >= 1L)
    val nq = r.getAs[Long]("n_docs_quarantined")
    assert(nq >= 65L && nq <= 70L, s"quarantined $nq")
    assert(r.getAs[Long]("n_clusters") == 1L)
    assert(r.getAs[Long]("max_cluster_members") == nq)
    assert(r.getAs[Long]("n_member_pairs") == nq - 1)
    // every member verifies against the root: this is a genuine mega-cluster
    assert(r.getAs[Long]("n_verified_members") == nq - 1)
    assert(r.getAs[Double]("min_jac") > 0.5)
  }

  test("q89 keeps the max-quality member of every q61 cluster") {
    val byRoot = queries.DedupQueries.q61DupComponents(spark, sf).collect()
      .map(r => r.getAs[Long]("cluster_root") -> r.getAs[Long]("n_members")).toMap
    val kept = queries.DedupQueries.q89ClusterRep(spark, sf).collect()
    assert(kept.nonEmpty)
    // same clusters, same sizes, and the kept doc is a genuine member with
    // a defined quality; n_dropped accounts for everyone else
    assert(kept.map(r => r.getAs[Long]("cluster_root") ->
      r.getAs[Long]("n_members")).toMap == byRoot)
    kept.foreach { r =>
      val root = r.getAs[Long]("cluster_root")
      val doc = r.getAs[Long]("kept_doc_id")
      assert(doc >= root) // root is the component min
      assert(r.getAs[Long]("n_dropped") == r.getAs[Long]("n_members") - 1)
      assert(!r.isNullAt(r.fieldIndex("kept_quality")))
    }
  }
}
