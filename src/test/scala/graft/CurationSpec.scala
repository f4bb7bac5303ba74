package graft

import org.apache.spark.sql.functions._

/** Semantics tests for the curation pack (q65-q67) beyond the DuckDB
  * hash-compare: water-filling optimality invariants, DSIR directionality,
  * and the PII detector kernel on crafted strings with known match counts
  * (the synthetic corpus contains no PII-shaped text, so the oracle alone
  * only pins the zero case).
  */
class CurationSpec extends GraftSuite {

  test("q65 waterfill: allocations respect caps, exhaust the budget, epochs <= 2") {
    val rows = queries.CurationQueries.q65MixtureWaterfill(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalTokens = rows.map(_.getAs[Long]("tokens")).sum
    val budget = totalTokens * 6 / 10
    var alloc = 0.0
    rows.foreach { r =>
      val t = r.getAs[Long]("tokens")
      val a = r.getAs[Double]("alloc_tokens")
      val e = r.getAs[Double]("epochs")
      assert(a >= 0.0 && a <= 2.0 * t + 1e-3, s"alloc $a exceeds cap of $r")
      assert(e <= 2.0 + 1e-9)
      alloc += a
    }
    // water level exists (budget < sum of caps here), so ties out exactly
    // up to the per-row 1e-4 output rounding of alloc_tokens
    assert(math.abs(alloc - budget) / budget < 1e-4,
      s"sum(alloc)=$alloc should equal budget=$budget")
  }

  test("q65 waterfill: capped domains are exactly the low-r prefix") {
    val df = queries.CurationQueries.q65MixtureWaterfill(spark, sf)
    // r = cap/wt ranks domains by how soon they saturate; every capped
    // domain must have r <= every uncapped domain's r
    val withR = df.withColumn("r",
      (col("tokens") * 2).cast("double") /
        floor(sqrt(col("tokens").cast("double")) * 1e6).cast("double"))
    val maxCapped = withR.filter(col("capped"))
      .agg(max(col("r"))).collect()(0)
    val minUncapped = withR.filter(!col("capped"))
      .agg(min(col("r"))).collect()(0)
    if (!maxCapped.isNullAt(0) && !minUncapped.isNullAt(0))
      assert(maxCapped.getDouble(0) <= minUncapped.getDouble(0) + 1e-12)
  }

  test("q66 DSIR: target language scores highest and is over-selected") {
    val rows = queries.CurationQueries.q66DsirSelection(spark, sf).collect()
    val byLang = rows.map(r => r.getAs[String]("lang") -> r).toMap
    val en = byLang("en")
    // the target slice must look more target-like than any other language
    val enScore = en.getAs[Double]("avg_token_score")
    byLang.filterNot(_._1 == "en").values.foreach { r =>
      assert(enScore > r.getAs[Double]("avg_token_score"),
        s"en=$enScore should beat ${r.getAs[String]("lang")}")
    }
    // and the target slice should be over-represented among selected docs
    // (selection is relative to the corpus-average per-token score)
    val totSel = rows.map(_.getAs[Long]("n_selected")).sum.toDouble
    val totDocs = rows.map(_.getAs[Long]("n_docs")).sum.toDouble
    val enFrac = en.getAs[Long]("n_selected").toDouble / en.getAs[Long]("n_docs")
    assert(enFrac > totSel / totDocs,
      s"en selected frac $enFrac should exceed corpus frac ${totSel / totDocs}")
  }

  test("q77 short docs: <2-token documents are excluded, not runtime errors") {
    import spark.implicits._
    // sequence(1, size-1) with a 1-token doc would step DOWNWARD and hit
    // element_at(t, 0); the size>=2 guard must exclude these identically to
    // the oracle's empty range(1, 1) — every fixture doc has >=10 tokens,
    // so only a crafted corpus exercises this
    val tmp = java.nio.file.Files.createTempDirectory("q77short").toString
    Seq(
      (1L, "en", "alpha beta gamma delta alpha beta gamma delta"),
      (2L, "en", "alpha beta"),
      (3L, "en", "single"),
      (4L, "en", ""),
      (5L, "en", "   "),
      (6L, "xx", "uno"))
      .toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = queries.CurationQueries.q77PerplexityFilter(spark, tmp).collect()
    val byLang = rows.map(r => r.getAs[String]("lang") -> r).toMap
    // docs 3-5 (en, <2 tokens) contribute nothing; doc 6 leaves xx empty
    assert(byLang("en").getAs[Long]("n_docs") == 2, byLang.toString)
    assert(!byLang.contains("xx"), byLang.toString)
  }

  test("q67 PII kernel: detector counts on crafted strings") {
    import spark.implicits._
    val docs = Seq(
      ("reach me at alice@example.com or bob.smith@mail.co", // 2 emails
        2, 0, 0, 0, 0),
      ("server 10.0.0.1 and 192.168.1.255 are up", 0, 2, 0, 0, 0),
      ("call 555-867-5309 or 555.867.5309", 0, 0, 2, 0, 0),
      ("ssn 078-05-1120 on file", 0, 0, 0, 1, 0),
      ("card 4111111111111111 charged", 0, 0, 0, 0, 1),
      ("no pii here at all", 0, 0, 0, 0, 0))
      .toDF("text", "e_email", "e_ipv4", "e_phone", "e_ssn", "e_card")
    val scored = queries.CurationQueries.withPiiColumns(docs).collect()
    scored.foreach { r =>
      assert(r.getAs[Int]("n_email") == r.getAs[Int]("e_email"), r.toString)
      assert(r.getAs[Int]("n_ipv4") == r.getAs[Int]("e_ipv4"), r.toString)
      assert(r.getAs[Int]("n_phone") == r.getAs[Int]("e_phone"), r.toString)
      assert(r.getAs[Int]("n_ssn") == r.getAs[Int]("e_ssn"), r.toString)
      assert(r.getAs[Int]("n_card") == r.getAs[Int]("e_card"), r.toString)
      val expectFlag = Seq("e_email", "e_ipv4", "e_phone", "e_ssn", "e_card")
        .exists(c => r.getAs[Int](c) > 0)
      assert(r.getAs[Boolean]("pii_flagged") == expectFlag, r.toString)
    }
    // redaction accounting: '078-05-1120' is 11 chars of matched PII
    val ssnRow = scored.find(_.getAs[Int]("n_ssn") == 1).get
    assert(ssnRow.getAs[Int]("chars_redacted") == 11)
  }
}
