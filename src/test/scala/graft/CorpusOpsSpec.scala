package graft

import org.apache.spark.sql.functions._
import graft.queries.{CorpusOpsQueries, TextQueries}

/** Invariants for the round-7 corpus operators (q92–q97) that the DuckDB
  * oracle can't express directly: the Bloom lane's plan-vs-answer contract,
  * the two-phase prefix-sum's conservation laws, chunk coverage, and a
  * hand-computed duplicated-span fixture.
  */
class CorpusOpsSpec extends GraftSuite {

  test("BloomMightContain has no false negatives and a sane fp rate") {
    import spark.implicits._
    val members = (0L until 2000L).map(_ * 7919L + 13L)
    val df = members.toDF("g")
    val bloom = df.stat.bloomFilter("g", 2000L, 0.01)
    val bytes = spark.sparkContext.broadcast {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val probeIn = df
      .filter(!graft.functions.GraftFunctions.bloomMightContain(col("g"), bytes))
      .count()
    assert(probeIn == 0L, "a Bloom false NEGATIVE breaks the prefilter contract")
    // non-members: fp rate should be near the configured 1%
    val nonMembers = (0L until 10000L).map(_ * 104729L + 5L)
      .filterNot(members.toSet).toDF("g")
    val fps = nonMembers
      .filter(graft.functions.GraftFunctions.bloomMightContain(col("g"), bytes))
      .count()
    assert(fps < 500L, s"fp count $fps out of ~10000 probes (expected ~1%)")
  }

  test("q92 (Bloom lane) == q55 (exact broadcast lane) row for row") {
    val bloomLane = CorpusOpsQueries.q92BloomDecontamination(spark, sf).collect()
    val exactLane = TextQueries.q55Decontamination(spark, sf).collect()
    assert(bloomLane.nonEmpty)
    assert(bloomLane.toSeq == exactLane.toSeq)
  }

  test("q92's plan actually carries the Bloom prefilter") {
    val plan = CorpusOpsQueries.q92BloomDecontamination(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"),
      "the prefilter was optimized away — the lane under test is not running")
  }

  test("q95 two-phase prefix-sum conserves tokens and produces contiguous shards") {
    import spark.implicits._
    val out = CorpusOpsQueries.q95GlobalShuffle(spark, sf).collect()
    val shardIds = out.map(_.getAs[Long]("shard_id")).toSeq
    assert(shardIds == (0L until shardIds.length.toLong), s"non-contiguous $shardIds")
    val totalFromShards = out.map(_.getAs[Long]("shard_tokens")).sum
    val totalDirect = graft.Tables.documents(spark, sf)
      .select(size(split(trim(col("text")), "\\s+")).cast("long").as("n"))
      .agg(sum(col("n"))).as[Long].collect()(0)
    assert(totalFromShards == totalDirect,
      s"shards carry $totalFromShards tokens, corpus has $totalDirect")
    // every shard but the last must START inside its budget window: its
    // first doc's start offset < (shard_id+1) * budget, i.e. cumulative
    // tokens before it ≤ shard_id * budget + (budget - 1) — equivalent to
    // the running-boundary check below
    val cum = out.scanLeft(0L)((acc, r) => acc + r.getAs[Long]("shard_tokens"))
    out.zipWithIndex.dropRight(1).foreach { case (r, i) =>
      assert(cum(i) < (r.getAs[Long]("shard_id") + 1) * 2000L,
        s"shard ${r.getAs[Long]("shard_id")} starts beyond its budget window")
    }
  }

  test("q96 chunk geometry: every doc covered, overlap accounted") {
    import spark.implicits._
    // crafted docs with known token counts: 1 token → 1 chunk; 64 → 1;
    // 65 → 2 (64 + 17-token tail); 160 → 3 (starts 0, 48, 96: 64/64/64)
    val docs = Seq(
      (1L, (1 to 1).map(i => s"t$i").mkString(" "), "en", "s", 1L),
      (2L, (1 to 64).map(i => s"t$i").mkString(" "), "en", "s", 1L),
      (3L, (1 to 65).map(i => s"t$i").mkString(" "), "en", "s", 1L),
      (4L, (1 to 160).map(i => s"t$i").mkString(" "), "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_q96_fixture")
    docs.coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val r = CorpusOpsQueries.q96RagChunks(spark, dir.toString).collect()(0)
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_chunks") == 1L + 1L + 2L + 3L)
    // chunk token mass: 1 + 64 + (64 + 17) + (64 + 64 + 64)
    assert(r.getAs[Long]("chunk_tokens") == 1L + 64L + 81L + 192L)
    assert(r.getAs[Double]("pct_multi_chunk") == 0.5)
  }

  test("q97 merges a shared phrase into one span per doc, hand-computed") {
    import spark.implicits._
    // two docs share a 10-word phrase; all other words are unique per doc,
    // so the duplicated 8-grams are exactly the phrase's 3 (positions
    // p..p+2 within the phrase), merging to one 10-token span per doc
    val phrase = (1 to 10).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, s"a1 a2 a3 $phrase a4 a5", "en", "s", 1L),
      (2L, s"b1 b2 $phrase b3 b4 b5 b6", "en", "s", 1L),
      (3L, (1 to 30).map(i => s"c$i").mkString(" "), "en", "s", 1L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("graft_q97_fixture")
    docs.coalesce(1).write.mode("overwrite")
      .parquet(dir.resolve("documents.parquet").toString)
    val r = CorpusOpsQueries.q97DupSpans(spark, dir.toString).collect()(0)
    assert(r.getAs[Long]("n_docs_with_dups") == 2L)
    assert(r.getAs[Long]("n_spans") == 2L)
    // each doc's span = the 10 phrase tokens
    assert(r.getAs[Long]("dup_tokens") == 20L)
    assert(r.getAs[Int]("max_span_tokens") == 10)
  }
}
