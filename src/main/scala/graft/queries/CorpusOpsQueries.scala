package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Round-7 corpus operators: the remaining pipeline stages a production
  * training-data system runs between raw crawl and tokenizer — retrieval
  * scoring, snapshot drift monitoring, deterministic training order,
  * retrieval-chunking, substring-level duplication census, and the
  * Bloom-prefiltered decontamination lane. All six are oracle-checked
  * (q92 against q55's exact SQL — same answer, different physical plan).
  *
  * Scale notes are per-query; the common thread is that every shuffle
  * carries hashes, term keys, or census rows — never document text.
  */
object CorpusOpsQueries {
  import graft.queries.TextOps.{md5Int, md5IntSql, tokens, tokensSql}

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------------------
  // q92 — Bloom-prefiltered decontamination: the q55 semantics (flag corpus
  // docs sharing any word 5-gram with the benchmark slice) through the plan
  // you run when the benchmark n-gram set is too big to broadcast exactly:
  // build a Bloom filter over the benchmark grams (~1.2 bytes/gram at 1%
  // fpp vs 8 for the exact set), broadcast it once per executor into the
  // scan projection (BloomMightContain, codegen'd), and let only the ~fpp
  // fraction of non-matching grams plus the true matches reach the exact
  // confirm join — which is a SHUFFLE hash join by intent (the exact set
  // at real scale lives on the cluster, not the driver). Bloom errors are
  // one-sided, so confirm-join output == exact output: the oracle is
  // byte-for-byte q55's SQL.
  def q92BloomDecontamination(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .withColumn("is_bench", md5Int(col("doc_id").cast("string")) % 97 === 0)
      .withColumn("gh", GraftFunctions.hashedWordNgrams(col("text"), 5))
      .select(col("doc_id"), col("lang"), col("is_bench"), col("gh"))
    val benchGrams = docs.filter(col("is_bench"))
      .select(explode(col("gh")).as("g")).distinct()
      .persist()
    // index build: one count + one aggregation over the (benchmark-sized,
    // corpus-independent) gram set — the driver holds only the sketch
    val nBench = benchGrams.count()
    val bloom = benchGrams.stat.bloomFilter("g", math.max(nBench, 64L), 0.01)
    // broadcast, not tree-embedded: the serialized filter ships once per
    // executor; the expression (and every task binary) carries only the
    // broadcast handle
    val bloomBytes = spark.sparkContext.broadcast {
      val bos = new java.io.ByteArrayOutputStream()
      bloom.writeTo(bos)
      bos.toByteArray
    }
    val corpus = docs.filter(!col("is_bench"))
    val contaminated = corpus
      .select(col("doc_id"), col("lang"), explode(col("gh")).as("g"))
      .filter(GraftFunctions.bloomMightContain(col("g"), bloomBytes))
      .join(benchGrams.hint("shuffle_hash"), Seq("g"), "left_semi")
      .select(col("doc_id"), col("lang")).distinct()
      .groupBy(col("lang")).agg(count(lit(1)).as("n_contaminated"))
    corpus.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      .join(contaminated, Seq("lang"), "left")
      .na.fill(0L, Seq("n_contaminated"))
      .withColumn("pct_contaminated",
        round(col("n_contaminated").cast("double") / col("n_docs"), 6) + 0.0)
      .orderBy(col("lang"))
  }

  // ---------------------------------------------------------------------------
  // q93 — BM25 retrieval scoring (k1 = 1.2, b = 0.75, Lucene's
  // ln(1 + (N − df + ½)/(df + ½)) idf): two 4-term queries drawn
  // deterministically from the corpus' own df census (ranks 4–11 by
  // df desc — mid-frequency, the terms a retrieval query would use), then
  // per-(query, doc) scores and top-10.
  //
  // Scale shape: tf is computed INSIDE the row (array filter over the
  // token array against the 8 broadcast query terms) — the corpus' tokens
  // are never exploded for scoring. The only token-granular shuffle is the
  // df census, and that is map-side-combined to vocabulary size per
  // partition before it moves. Top-10 per query is a 2-partition window
  // over the matched (doc, query) scores.
  def q93Bm25(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), tokens(col("text")).as("tok"))
      .withColumn("dl", size(col("tok")).cast("double"))
    val stats = docs.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    val dfc = docs.select(explode(array_distinct(col("tok"))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
    // distributed top-11 (TakeOrderedAndProject), THEN the row_number on
    // the collected 11 rows — no vocabulary-sized single-partition window
    val qt = dfc.orderBy(col("df").desc, col("term")).limit(11)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("df").desc, col("term"))))
      .filter(col("rnk") >= 4 && col("rnk") <= 11)
      .withColumn("qid", col("rnk") % 2)
      .select(col("term"), col("df"), col("qid"))
    val matched = docs
      .crossJoin(broadcast(qt))
      .crossJoin(broadcast(stats))
      .withColumn("tf",
        size(filter(col("tok"), t => t === col("term"))).cast("double"))
      .filter(col("tf") > 0)
    val scored = matched.groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms_matched"),
        round(sum(
          log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5))
            * (col("tf") * lit(2.2))
            / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl")))),
          6).as("score"))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rnk") <= 10)
      .select(col("qid"), col("rnk"), col("doc_id"), col("n_terms_matched"),
        col("score"))
      .orderBy(col("qid"), col("rnk"))
  }

  val q93Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, ${tokensSql("text")} AS tok FROM documents),
       |d AS (SELECT doc_id, tok, len(tok)::DOUBLE AS dl FROM t),
       |stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM d),
       |dfc AS (
       |  SELECT term, count(*) AS df FROM (
       |    SELECT doc_id, unnest(list_distinct(tok)) AS term FROM t)
       |  GROUP BY term),
       |qt AS (
       |  SELECT term, df, rnk % 2 AS qid FROM (
       |    SELECT term, df, row_number() OVER (ORDER BY df DESC, term) AS rnk
       |    FROM dfc)
       |  WHERE rnk BETWEEN 4 AND 11),
       |m AS (
       |  SELECT d.doc_id, qt.qid, qt.df, d.dl,
       |    len(list_filter(d.tok, x -> x = qt.term))::DOUBLE AS tf
       |  FROM d CROSS JOIN qt),
       |sc AS (
       |  SELECT qid, doc_id, count(*) AS n_terms_matched,
       |    round(sum(ln(1 + (s.n_docs - df + 0.5) / (df + 0.5)) * (tf * 2.2)
       |      / (tf + 1.2 * (0.25 + 0.75 * dl / s.avgdl))), 6) AS score
       |  FROM m, stats s WHERE tf > 0 GROUP BY qid, doc_id)
       |SELECT qid, rnk, doc_id, n_terms_matched, score FROM (
       |  SELECT qid, doc_id, n_terms_matched, score,
       |    row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id) AS rnk
       |  FROM sc)
       |WHERE rnk <= 10 ORDER BY qid, rnk""".stripMargin

  // ---------------------------------------------------------------------------
  // q94 — corpus snapshot drift: split the corpus into two deterministic
  // hash snapshots (standing in for two crawl versions) and report, per
  // lang, the unigram-distribution divergence between them — add-one
  // smoothed KL(A‖B), Jensen-Shannon, OOV-mass rate, vocab growth. This is
  // the regression check a pipeline runs before swapping a corpus version
  // under a training mix.
  //
  // Scale shape: one token explode feeding a (lang, term) groupBy that is
  // map-side-combined to vocabulary size per partition; everything after
  // (totals join, divergence sums) runs on the vocabulary-sized census.
  def q94SnapshotDrift(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .withColumn("snap", md5Int(col("doc_id").cast("string")) % 2)
    val tc = docs
      .select(col("lang"), col("snap"), explode(tokens(col("text"))).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(sum(when(col("snap") === 0, 1L).otherwise(0L)).as("ca"),
        sum(when(col("snap") === 1, 1L).otherwise(0L)).as("cb"))
    val tot = tc.groupBy(col("lang"))
      .agg(sum(col("ca")).as("tota"), sum(col("cb")).as("totb"),
        count(lit(1)).as("v"))
    val pq = tc.join(broadcast(tot), "lang")
      .withColumn("p", (col("ca") + 1).cast("double") / (col("tota") + col("v")))
      .withColumn("q", (col("cb") + 1).cast("double") / (col("totb") + col("v")))
      .withColumn("m", (col("p") + col("q")) / 2)
    pq.groupBy(col("lang")).agg(
        any_value(col("tota")).as("tok_a"),
        any_value(col("totb")).as("tok_b"),
        count(when(col("ca") > 0, 1)).as("vocab_a"),
        count(when(col("cb") > 0, 1)).as("vocab_b"),
        count(lit(1)).as("vocab_union"),
        (round(sum(col("p") * log(col("p") / col("q"))), 6) + 0.0).as("kl_ab"),
        (round(lit(0.5) * sum(col("p") * log(col("p") / col("m")))
          + lit(0.5) * sum(col("q") * log(col("q") / col("m"))), 6) + 0.0).as("js"),
        (round(sum(when(col("ca") === 0, col("cb")).otherwise(0L)).cast("double")
          / nullif(any_value(col("totb")).cast("double"), lit(0.0)), 6) + 0.0)
          .as("oov_b"))
      .orderBy(col("lang"))
  }

  val q94Sql: String =
    s"""WITH t AS (
       |  SELECT lang, ${md5IntSql("CAST(doc_id AS VARCHAR)")} % 2 AS snap,
       |    unnest(${tokensSql("text")}) AS term
       |  FROM documents),
       |tc AS (
       |  SELECT lang, term,
       |    CAST(sum(CASE WHEN snap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
       |    CAST(sum(CASE WHEN snap = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cb
       |  FROM t GROUP BY lang, term),
       |tot AS (
       |  SELECT lang, CAST(sum(ca) AS BIGINT) AS tota,
       |    CAST(sum(cb) AS BIGINT) AS totb, count(*) AS v
       |  FROM tc GROUP BY lang),
       |pq AS (
       |  SELECT tc.lang, ca, cb, tota, totb, v,
       |    (ca + 1)::DOUBLE / (tota + v) AS p,
       |    (cb + 1)::DOUBLE / (totb + v) AS q,
       |    ((ca + 1)::DOUBLE / (tota + v) + (cb + 1)::DOUBLE / (totb + v)) / 2 AS m
       |  FROM tc JOIN tot USING (lang))
       |SELECT lang, any_value(tota) AS tok_a, any_value(totb) AS tok_b,
       |  count(CASE WHEN ca > 0 THEN 1 END) AS vocab_a,
       |  count(CASE WHEN cb > 0 THEN 1 END) AS vocab_b,
       |  count(*) AS vocab_union,
       |  round(sum(p * ln(p / q)), 6) + 0.0 AS kl_ab,
       |  round(0.5 * sum(p * ln(p / m)) + 0.5 * sum(q * ln(q / m)), 6) + 0.0 AS js,
       |  round(sum(CASE WHEN ca = 0 THEN cb ELSE 0 END)::DOUBLE
       |    / nullif(any_value(totb)::DOUBLE, 0.0), 6) + 0.0 AS oov_b
       |FROM pq GROUP BY lang ORDER BY lang""".stripMargin

  // ---------------------------------------------------------------------------
  // q95 — deterministic global training order + token-budget sharding: the
  // "shuffle the corpus once, then slice it into fixed-token-budget shards"
  // step every trainer needs, WITHOUT a global sort or a single-partition
  // cumsum. Order = a seeded 32-bit hash of doc_id; shard boundaries come
  // from the exclusive global prefix-sum of token counts in that order.
  //
  // Scale shape — the distributed prefix-sum: the top 12 bits of the order
  // hash split the hash space into 4096 ORDERED ranges, so the global
  // cumsum factors into (a) per-range token totals (one map-side-combined
  // groupBy, 4096 rows out), (b) an exclusive prefix over those 4096 rows
  // (driver-scale window), (c) a per-range window partitioned 4096 ways
  // with the range's offset broadcast back. No stage sorts more than
  // 1/4096th of the corpus; the same three stages serve any monotone
  // bucketing of a shuffle key at 1000 executors.
  private val ShardBudget = 2000L

  def q95GlobalShuffle(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .withColumn("n_tok", size(tokens(col("text"))).cast("long"))
      .withColumn("h",
        md5Int(concat(lit("shuffle42:"), col("doc_id").cast("string"))))
      .withColumn("bucket", floor(col("h") / lit(1L << 20)))
    val bTot = docs.groupBy(col("bucket")).agg(sum(col("n_tok")).as("btok"))
    val wB = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = bTot
      .withColumn("boff", coalesce(sum(col("btok")).over(wB), lit(0L)))
      .select(col("bucket"), col("boff"))
    val wIn = Window.partitionBy(col("bucket"))
      .orderBy(col("h"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs.join(broadcast(offs), "bucket")
      .withColumn("start",
        col("boff") + coalesce(sum(col("n_tok")).over(wIn), lit(0L)))
      .withColumn("shard_id", floor(col("start") / lit(ShardBudget)))
      .groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("shard_tokens"),
        min(col("h")).as("min_h"), max(col("h")).as("max_h"))
      .orderBy(col("shard_id"))
  }

  val q95Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, len(${tokensSql("text")}) AS n_tok,
       |    ${md5IntSql("'shuffle42:' || CAST(doc_id AS VARCHAR)")} AS h
       |  FROM documents),
       |c AS (
       |  SELECT h, n_tok,
       |    coalesce(sum(n_tok) OVER (ORDER BY h, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
       |  FROM t)
       |SELECT CAST(floor(start / $ShardBudget) AS BIGINT) AS shard_id,
       |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS shard_tokens,
       |  min(h) AS min_h, max(h) AS max_h
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  // ---------------------------------------------------------------------------
  // q96 — retrieval (RAG) chunking census: 64-token windows striding 48
  // (16-token overlap), one chunk minimum per doc, plus a cross-corpus
  // distinct-chunk count (chunk-level dedup pressure). Map-only explode —
  // a doc's chunks are produced where its row lives; the only shuffle is
  // the per-lang census (countDistinct on 8-byte chunk hashes).
  private val ChunkSize = 64
  private val ChunkStride = 48

  def q96RagChunks(spark: SparkSession, d: String): DataFrame = {
    val lastStart = ChunkSize - ChunkStride + 1 // 17: below this, no 2nd chunk
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("tok"))
      .withColumn("n_tok", size(col("tok")))
    val chunks = docs
      .select(col("doc_id"), col("lang"), col("tok"), col("n_tok"),
        explode(sequence(lit(0), greatest(col("n_tok") - lastStart, lit(0)),
          lit(ChunkStride))).as("s"))
      .withColumn("clen", least(lit(ChunkSize), col("n_tok") - col("s")))
      .withColumn("chash",
        md5Int(array_join(slice(col("tok"), col("s") + 1, col("clen")), " ")))
    chunks.groupBy(col("lang")).agg(
        countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_chunks"),
        countDistinct(col("chash")).as("n_distinct_chunks"),
        round(count(lit(1)).cast("double") / countDistinct(col("doc_id")), 4)
          .as("avg_chunks_per_doc"),
        sum(col("clen").cast("long")).as("chunk_tokens"),
        round(countDistinct(when(col("s") > 0, col("doc_id"))).cast("double")
          / countDistinct(col("doc_id")), 4).as("pct_multi_chunk"))
      .orderBy(col("lang"))
  }

  val q96Sql: String = {
    val lastStart = ChunkSize - ChunkStride + 1
    s"""WITH t AS (
       |  SELECT doc_id, lang, ${tokensSql("text")} AS tok FROM documents),
       |d AS (SELECT doc_id, lang, tok, len(tok) AS n_tok FROM t),
       |ch AS (
       |  SELECT doc_id, lang, s, least($ChunkSize, n_tok - s) AS clen,
       |    ${md5IntSql(
            s"array_to_string(list_slice(tok, s + 1, s + least($ChunkSize, n_tok - s)), ' ')")}
       |      AS chash
       |  FROM (
       |    SELECT doc_id, lang, tok, n_tok,
       |      unnest(range(0, greatest(n_tok - $lastStart, 0) + 1, $ChunkStride)) AS s
       |    FROM d))
       |SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
       |  count(DISTINCT chash) AS n_distinct_chunks,
       |  round(count(*)::DOUBLE / count(DISTINCT doc_id), 4) AS avg_chunks_per_doc,
       |  CAST(sum(clen) AS BIGINT) AS chunk_tokens,
       |  round(count(DISTINCT CASE WHEN s > 0 THEN doc_id END)::DOUBLE
       |    / count(DISTINCT doc_id), 4) AS pct_multi_chunk
       |FROM ch GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q97 — duplicated-substring span census (the word-8-gram form of
  // suffix-style training-data dedup): find every 8-gram occurring ≥ 2
  // times in the corpus, merge each doc's duplicated gram positions into
  // maximal token spans (gaps-and-islands), and report per-lang how much
  // of the corpus is span-duplicated text.
  //
  // Scale shape: the gram explode shuffles (hash, partial count) for the
  // census and (doc, pos) pairs for the surviving duplicated grams only;
  // the interval merge is a per-doc window over those survivors. Document
  // text itself never shuffles.
  private val SpanGram = 8

  def q97DupSpans(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("tok"))
      .withColumn("n_tok", size(col("tok")))
    val grams = docs
      .select(col("doc_id"), col("lang"), col("n_tok"), col("tok"),
        explode(sequence(lit(1), greatest(col("n_tok") - (SpanGram - 1), lit(1))))
          .as("i"))
      .withColumn("e", least(col("i") + (SpanGram - 1), col("n_tok")))
      .withColumn("gh",
        md5Int(array_join(slice(col("tok"), col("i"), col("e") - col("i") + 1), " ")))
      .select(col("doc_id"), col("lang"), col("n_tok"), col("i"), col("e"), col("gh"))
    val dupHashes = grams.groupBy(col("gh")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= 2).select(col("gh"))
    val dupPos = grams.join(dupHashes, Seq("gh"), "left_semi")
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("i"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val spans = dupPos
      .withColumn("pmax", max(col("e")).over(wPrev))
      .withColumn("is_new",
        when(col("pmax").isNull || col("i") > col("pmax") + 1, 1).otherwise(0))
      .withColumn("island", sum(col("is_new")).over(wRun))
      .groupBy(col("doc_id"), col("island"))
      .agg(any_value(col("lang")).as("lang"),
        min(col("i")).as("ss"), max(col("e")).as("se"))
      .withColumn("slen", col("se") - col("ss") + 1)
    val totals = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok").cast("long")).as("total_tokens"))
    val dupCensus = spans.groupBy(col("lang")).agg(
      countDistinct(col("doc_id")).as("n_docs_with_dups"),
      count(lit(1)).as("n_spans"),
      sum(col("slen").cast("long")).as("dup_tokens"),
      max(col("slen")).as("max_span_tokens"))
    totals.join(dupCensus, Seq("lang"), "left")
      .na.fill(0L, Seq("n_docs_with_dups", "n_spans", "dup_tokens"))
      .withColumn("pct_dup_tokens",
        round(col("dup_tokens").cast("double") / col("total_tokens"), 6) + 0.0)
      .select(col("lang"), col("n_docs"), col("total_tokens"),
        col("n_docs_with_dups"), col("n_spans"), col("dup_tokens"),
        col("max_span_tokens"), col("pct_dup_tokens"))
      .orderBy(col("lang"))
  }

  val q97Sql: String =
    s"""WITH t AS (
       |  SELECT doc_id, lang, ${tokensSql("text")} AS tok FROM documents),
       |d AS (SELECT doc_id, lang, tok, len(tok) AS n_tok FROM t),
       |g AS (
       |  SELECT doc_id, lang, n_tok, i, least(i + ${SpanGram - 1}, n_tok) AS e,
       |    ${md5IntSql(
          s"array_to_string(list_slice(tok, i, least(i + ${SpanGram - 1}, n_tok)), ' ')")}
       |      AS gh
       |  FROM (
       |    SELECT doc_id, lang, tok, n_tok,
       |      unnest(range(1, greatest(n_tok - ${SpanGram - 1}, 1) + 1)) AS i
       |    FROM d)),
       |dh AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
       |dp AS (SELECT g.* FROM g JOIN dh USING (gh)),
       |isl AS (
       |  SELECT doc_id, lang, i, e,
       |    CASE WHEN max(e) OVER w1 IS NULL OR i > max(e) OVER w1 + 1
       |      THEN 1 ELSE 0 END AS is_new
       |  FROM dp
       |  WINDOW w1 AS (PARTITION BY doc_id ORDER BY i
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
       |isl2 AS (
       |  SELECT *, sum(is_new) OVER (PARTITION BY doc_id ORDER BY i
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
       |  FROM isl),
       |sp AS (
       |  SELECT doc_id, any_value(lang) AS lang,
       |    max(e) - min(i) + 1 AS slen
       |  FROM isl2 GROUP BY doc_id, island),
       |tot AS (
       |  SELECT lang, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS total_tokens
       |  FROM d GROUP BY lang),
       |sc AS (
       |  SELECT lang, count(DISTINCT doc_id) AS n_docs_with_dups,
       |    count(*) AS n_spans, CAST(sum(slen) AS BIGINT) AS dup_tokens,
       |    max(slen) AS max_span_tokens
       |  FROM sp GROUP BY lang)
       |SELECT tot.lang, tot.n_docs, tot.total_tokens,
       |  coalesce(sc.n_docs_with_dups, 0) AS n_docs_with_dups,
       |  coalesce(sc.n_spans, 0) AS n_spans,
       |  coalesce(sc.dup_tokens, 0) AS dup_tokens,
       |  sc.max_span_tokens,
       |  round(coalesce(sc.dup_tokens, 0)::DOUBLE / tot.total_tokens, 6) + 0.0
       |    AS pct_dup_tokens
       |FROM tot LEFT JOIN sc USING (lang) ORDER BY tot.lang""".stripMargin

  // ---------------------------------------------------------------------------
  // q104 — heavy hitters WITHOUT a vocabulary shuffle: the exact top-20
  // word bigrams by a two-pass Misra-Gries candidate/confirm plan. q93's
  // df census shuffles one row per distinct term — fine at this corpus'
  // vocabulary, a wall when the term universe is web-scale n-grams. The
  // production shape: (1) each partition streams its terms through a
  // bounded Misra-Gries summary (capacity 1024 — O(cap) memory, amortized
  // O(1)/term), whose guarantee makes the union of per-partition survivors
  // a SUPERSET of every term with global count > N/cap; (2) an exact count
  // of the candidate terms only (candidates broadcast, corpus re-scanned
  // once, nothing vocabulary-sized ever shuffles). The final top-20 is
  // EXACT — candidate choice can depend on partitioning, the output cannot.
  // The exactness precondition (20th count > N/cap) is CHECKED at runtime:
  // the `margin` output column reports each count vs the threshold, and if
  // the 20th row fails it the query falls back to the exact census instead
  // of returning a correct-looking but unguaranteed list (TrainingOpsSpec
  // pins both the superset property and the flat-corpus fallback).
  // The oracle is the plain exact census SQL — same answer, different
  // physical plan (the q92/q55 pattern).
  private val MgCap = 1024

  def q104HeavyHitters(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = Tables.documents(spark, d)
      .select(tokens(col("text")).as("tok"))
      .filter(size(col("tok")) >= 2)
      .select(explode(expr(
        """transform(sequence(1, size(tok) - 1),
          |  i -> concat(element_at(tok, i), ' ', element_at(tok, i + 1)))"""
          .stripMargin)).as("term"))
      // persists for the count + candidate + confirm passes; re-invocation
      // re-persists the SAME canonical plan, which CacheManager dedupes
      // (one resident copy per corpus, dropped by any clearCache)
      .persist()
    val nTotal = terms.count()
    val cap = MgCap
    val candidates = terms.select(col("term"))
      .as(org.apache.spark.sql.Encoders.STRING)
      .mapPartitions { it =>
        // Misra-Gries: increment known terms; admit while below capacity;
        // otherwise decrement every counter (dropping zeros) — the classic
        // deterministic-per-partition frequent-items summary
        val m = new java.util.HashMap[String, java.lang.Long](cap * 2)
        while (it.hasNext) {
          val t = it.next()
          val cur = m.get(t)
          if (cur != null) m.put(t, cur + 1L)
          else if (m.size < cap) m.put(t, 1L)
          else {
            val itr = m.entrySet().iterator()
            while (itr.hasNext) {
              val e = itr.next()
              if (e.getValue == 1L) itr.remove() else e.setValue(e.getValue - 1L)
            }
          }
        }
        scala.jdk.CollectionConverters.SetHasAsScala(m.keySet()).asScala.iterator
      }(org.apache.spark.sql.Encoders.STRING)
      .toDF("term").distinct()
    def rank(counted: DataFrame): DataFrame = counted
      // top-20 via the DISTRIBUTED TakeOrderedAndProject first, THEN the
      // rank window over those 20 rows — a bare Window.orderBy over the
      // input pulled the whole frame into one task, which on the
      // exact-census fallback path is the full vocabulary (the very
      // web-scale wall this query exists to avoid; the q93 discipline,
      // r13 review). Same (n desc, term) order both steps → identical
      // rows and ranks.
      .orderBy(col("n").desc, col("term")).limit(20)
      .withColumn("rnk", row_number().over(Window.orderBy(col("n").desc, col("term"))))
      .filter(col("rnk") <= 20)
      .withColumn("pct", round(col("n").cast("double") / nTotal.toDouble, 6))
      // margin: how far the count clears the Misra-Gries admission
      // threshold N/cap — >1 for every row means the superset guarantee
      // held and the top-k is provably exact
      .withColumn("margin",
        round(col("n").cast("double") * cap / nTotal.toDouble, 6))
      .select(col("rnk"), col("term"), col("n"), col("pct"), col("margin"))
      .orderBy(col("rnk"))
    val viaCandidates = rank(
      terms.join(broadcast(candidates), "term")
        .groupBy(col("term")).agg(count(lit(1)).as("n")))
    // the top-20 is exact ONLY if the 20th count exceeds N/cap (then every
    // top-20 term is guaranteed among the candidates); on a flatter
    // distribution fall back to the exact census rather than silently
    // returning a correct-looking but unguaranteed list
    val st = viaCandidates.agg(min(col("n")), count(lit(1))).head()
    // exactness needs BOTH: the 20th count clears N/cap (superset
    // guarantee) AND the candidate path actually produced a full top-20 —
    // a pathological MG merge leaving <20 survivors must not be trusted
    // even if every survivor clears the threshold (r8 ADVICE)
    val guaranteed = !st.isNullAt(0) && st.getLong(0) * cap > nTotal &&
      st.getLong(1) >= 20L
    if (guaranteed) viaCandidates
    else rank(terms.groupBy(col("term")).agg(count(lit(1)).as("n")))
  }

  val q104Sql: String =
    """WITH d AS (
      |  SELECT regexp_split_to_array(trim(text), '\s+') AS tok FROM documents),
      |b AS (
      |  SELECT unnest(list_transform(range(1, len(tok)),
      |    i -> tok[i] || ' ' || tok[i + 1])) AS term
      |  FROM d WHERE len(tok) >= 2),
      |tot AS (SELECT count(*)::DOUBLE AS n_total FROM b),
      |c AS (SELECT term, count(*) AS n FROM b GROUP BY term),
      |r AS (
      |  SELECT term, n, row_number() OVER (ORDER BY n DESC, term) AS rnk
      |  FROM c)
      |SELECT rnk, term, n, round(n::DOUBLE / n_total, 6) AS pct,
      |  round(n::DOUBLE * 1024 / n_total, 6) AS margin
      |FROM r, tot WHERE rnk <= 20 ORDER BY rnk""".stripMargin

  val all: Map[String, Q] = Map(
    "q104_heavy_hitters" -> (q104HeavyHitters _),
    "q92_bloom_decontamination" -> (q92BloomDecontamination _),
    "q93_bm25" -> (q93Bm25 _),
    "q94_snapshot_drift" -> (q94SnapshotDrift _),
    "q95_global_shuffle" -> (q95GlobalShuffle _),
    "q96_rag_chunks" -> (q96RagChunks _),
    "q97_dup_spans" -> (q97DupSpans _))

  val oracles: Map[String, String] = Map(
    // q92 is the Bloom-lane PLAN for q55's semantics — same exact answer,
    // so the oracle is q55's SQL verbatim
    "q92_bloom_decontamination" -> TextQueries.q55Sql,
    "q93_bm25" -> q93Sql,
    "q94_snapshot_drift" -> q94Sql,
    "q95_global_shuffle" -> q95Sql,
    "q96_rag_chunks" -> q96Sql,
    "q97_dup_spans" -> q97Sql,
    "q104_heavy_hitters" -> q104Sql)
}
