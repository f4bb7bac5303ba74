package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for a large-scale training-data pipeline over the
  * `documents` table: token counting, quality scoring, language-ID
  * (marker-word heuristic), and winnowing document fingerprints (rolling
  * hash). These extend the reference's capabilities toward corpus curation
  * (the reference itself is numeric-only; these are the text analogues of
  * its per-row feature projections, SURVEY.md §2.2).
  *
  * Scale design: every operator here is a narrow per-row projection over the
  * documents scan — no joins, no shuffles except the final small groupBy.
  * All hashing is md5-based 32-bit arithmetic expressed identically in the
  * DuckDB oracle SQL, so results are bit-comparable across engines.
  */
object TextOps {

  /** 32-bit unsigned int from the first 8 hex chars of md5 — the shared
    * deterministic hash for shingles/tokens (same formula in oracle SQL).
    * Evaluated by the Md5PrefixInt kernel: one digest over the UTF-8
    * bytes, no hex round-trip (bit-identical to
    * `conv(substring(md5(c), 1, 8), 16, 10)`, pinned by spec). */
  def md5Int(c: Column): Column = graft.functions.GraftFunctions.md5PrefixInt(c)

  def md5IntSql(x: String): String =
    s"('0x' || substr(md5($x),1,8))::BIGINT"

  /** Whitespace tokenizer (BPE-ish splitting is regex-driven the same way;
    * whitespace is what the synthetic corpus needs). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokensSql(x: String): String = raw"regexp_split_to_array(trim($x), '\s+')"

  /** Character k-shingles of the raw text (expr form: Column-typed substring
    * offsets need the SQL lambda, the DSL substring takes Int literals). */
  def charShinglesExpr(textCol: String, k: Int): Column =
    expr(s"transform(sequence(1, greatest(length($textCol) - ${k - 1}, 1))," +
      s" i -> substring($textCol, i, $k))")

  def charShinglesSql(x: String, k: Int): String =
    s"list_transform(range(1, greatest(length($x) - ${k - 1}, 1) + 1), i -> substr($x, i, $k))"

  val stopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is", "it", "on", "for")
}

object TextQueries {
  import TextOps.{md5Int, md5IntSql}

  type Q = (SparkSession, String) => DataFrame

  private def toks(c: Column): Column = split(trim(c), "\\s+")
  private val toksSql = raw"regexp_split_to_array(trim(text), '\s+')"

  // BPE-style pre-tokenizer (the GPT-2 pattern family, minus the trailing
  // negative lookahead — RE2, hence the DuckDB oracle, has no lookahead):
  // contractions | optional-space letter runs | optional-space digit runs |
  // optional-space punctuation runs | whitespace runs. A "token" here is a
  // pre-tokenizer match — the unit a BPE vocabulary would then split —
  // which is the count that matters for training-data budgeting.
  private val bpeRe =
    raw"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"

  // ---------------------------------------------------------------------------
  // q21 — token counting + quality scoring, aggregated per (lang, source).
  // Per-doc work is pure projection (codegen'd, no shuffle); the only
  // shuffle is the tiny (lang,source) groupBy. At 100 TB this is the shape
  // of a corpus-quality census: one pass, map-side partial aggregation.
  def q21TextStats(spark: SparkSession, d: String): DataFrame = {
    val stop = TextOps.stopwords
    val df = Tables.documents(spark, d)
      .withColumn("tok", toks(col("text")))
      .withColumn("n_tok", size(col("tok")).cast("double"))
      .withColumn("n_bpe", regexp_count(col("text"), lit(bpeRe)).cast("double"))
      .withColumn("stop_ratio",
        // P4: a doc that tokenizes to nothing must yield NULL, not an
        // ANSI DIVIDE_BY_ZERO (none in the testdata — latent guard)
        size(filter(col("tok"), t => t.isInCollection(stop))).cast("double") /
          nullif(col("n_tok"), lit(0.0)))
      .withColumn("punct_ratio",
        (length(col("text")) - length(regexp_replace(col("text"), "[.,!?;:]", "")))
          .cast("double") / nullif(col("n_chars").cast("double"), lit(0.0)))
      .withColumn("alpha_ratio",
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          nullif(col("n_chars").cast("double"), lit(0.0)))
      .withColumn("quality",
        least(col("n_tok") / lit(100.0), lit(1.0)) * lit(0.3) +
          col("stop_ratio") * lit(0.3) + col("alpha_ratio") * lit(0.4))
    df.groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg(col("n_tok")), 4).as("avg_tokens"),
        round(avg(col("n_bpe")), 4).as("avg_bpe_tokens"),
        round(avg(col("stop_ratio")), 4).as("avg_stop_ratio"),
        round(avg(col("punct_ratio")), 4).as("avg_punct_ratio"),
        round(avg(col("quality")), 4).as("avg_quality"))
      .orderBy(col("lang"), col("source"))
  }

  val q21Sql: String =
    s"""WITH t AS (
      |  SELECT lang, source, n_chars,
      |    len($toksSql)::DOUBLE AS n_tok,
      |    len(regexp_extract_all(text,
      |      '''(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\s\\p{L}\\p{N}]+|\\s+'))::DOUBLE
      |      AS n_bpe,
      |    len(list_filter($toksSql, t -> t IN (${TextOps.stopwords.map("'" + _ + "'").mkString(",")})))::DOUBLE
      |      / nullif(len($toksSql)::DOUBLE, 0.0) AS stop_ratio,
      |    (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))::DOUBLE
      |      / nullif(n_chars::DOUBLE, 0.0) AS punct_ratio,
      |    length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
      |      / nullif(n_chars::DOUBLE, 0.0) AS alpha_ratio
      |  FROM documents)
      |SELECT lang, source, count(*) AS n_docs,
      |  round(avg(n_tok), 4) AS avg_tokens,
      |  round(avg(n_bpe), 4) AS avg_bpe_tokens,
      |  round(avg(stop_ratio), 4) AS avg_stop_ratio,
      |  round(avg(punct_ratio), 4) AS avg_punct_ratio,
      |  round(avg(least(n_tok/100.0, 1.0)*0.3 + stop_ratio*0.3 + alpha_ratio*0.4), 4) AS avg_quality
      |FROM t GROUP BY lang, source ORDER BY lang, source""".stripMargin

  // ---------------------------------------------------------------------------
  // q22 — language-ID by marker-word scoring (n-gram-heuristic family):
  // score the token list against per-language marker sets, predict the
  // argmax with a fixed tie-break order, and emit the lang × predicted
  // confusion matrix. Pure map + tiny groupBy, same scale story as q21.
  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("ma", "ne", "ba"))

  def q22LangId(spark: SparkSession, d: String): DataFrame = {
    val df0 = Tables.documents(spark, d).withColumn("tok", toks(col("text")))
    val scored = markers.foldLeft(df0) { case (df, (l, ws)) =>
      df.withColumn(s"s_$l", size(filter(col("tok"), t => t.isInCollection(ws))))
    }
    val m = greatest(markers.map { case (l, _) => col(s"s_$l") }: _*)
    // first-match-wins in declaration order (en, de, es, fr, zh)
    val predicted = markers.reverse.foldLeft(lit("und")) { case (acc, (l, _)) =>
      when(col(s"s_$l") === m && m > 0, lit(l)).otherwise(acc)
    }
    scored.withColumn("pred_lang", predicted)
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))
  }

  val q22Sql: String = {
    val scores = markers.map { case (l, ws) =>
      s"len(list_filter(tok, t -> t IN (${ws.map("'" + _ + "'").mkString(",")}))) AS s_$l"
    }.mkString(",\n    ")
    val m = s"greatest(${markers.map("s_" + _._1).mkString(",")})"
    val cases = markers.map { case (l, _) =>
      s"WHEN s_$l = $m AND $m > 0 THEN '$l'"
    }.mkString("\n      ")
    s"""WITH t AS (SELECT lang, $toksSql AS tok FROM documents),
      |s AS (
      |  SELECT lang,
      |    $scores
      |  FROM t)
      |SELECT lang,
      |  CASE $cases ELSE 'und' END AS pred_lang,
      |  count(*) AS n
      |FROM s GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------------------------
  // q23 — winnowing document fingerprints (rolling-hash family): 5-char
  // shingles → 32-bit hashes → minimum of each 4-hash window → distinct
  // mins are the fingerprint set. All-integer output, bit-exact vs the
  // oracle. Per-row array work stays inside one projection — at 100 TB the
  // cost is CPU-per-row, not shuffle.
  // The whole per-document loop is the WinnowStats kernel (one static call:
  // byte-range shingle windows, thread-cached digest, rolling min in-place)
  // — semantically the composed shingle→hash→window-min chain, pinned
  // element-wise against that chain by spec. Per-shingle MD5 is the
  // inherent cost; the wrapper allocations were ~10× on top of it.
  def q23Fingerprint(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("ws", graft.functions.GraftFunctions.winnowStats(col("text")))
      .select(
        col("doc_id"),
        col("ws.n_shingles").as("n_shingles"),
        col("ws.n_fp").as("n_fp"),
        col("ws.fp_min").as("fp_min"),
        col("ws.fp_max").as("fp_max"))
      .orderBy(col("doc_id"))

  val q23Sql: String =
    s"""WITH t AS (
      |  SELECT doc_id,
      |    list_transform(range(1, greatest(length(text) - 4, 1) + 1),
      |                   i -> substr(text, i, 5)) AS sh
      |  FROM documents),
      |h AS (
      |  SELECT doc_id, sh,
      |    list_transform(sh, s -> ${md5IntSql("s")}) AS hs
      |  FROM t),
      |m AS (
      |  SELECT doc_id, sh,
      |    list_transform(range(1, greatest(len(hs) - 3, 1) + 1),
      |                   i -> list_min(list_slice(hs, i, i + 3))) AS mins
      |  FROM h)
      |SELECT doc_id, len(sh) AS n_shingles,
      |  len(list_distinct(mins)) AS n_fp,
      |  list_min(mins) AS fp_min,
      |  list_max(mins) AS fp_max
      |FROM m ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q24 — exact deduplication census per source: hash-groupBy on md5(text)
  // and on whitespace-normalized text. The count(DISTINCT hash) is the
  // exact-dedup primitive — at 100 TB this is the standard two-stage
  // partial/final distinct aggregation, shuffling only 128-bit hashes, never
  // the documents themselves.
  def q24ExactDedup(spark: SparkSession, d: String): DataFrame =
    Tables.documents(spark, d)
      .withColumn("h", md5(col("text")))
      .withColumn("hn", md5(regexp_replace(lower(trim(col("text"))), "\\s+", " ")))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("h")).as("n_distinct"),
        (count(lit(1)) - countDistinct(col("h"))).as("n_exact_dups"),
        countDistinct(col("hn")).as("n_distinct_norm"))
      .orderBy(col("source"))

  val q24Sql: String =
    raw"""SELECT source, count(*) AS n_docs,
      |  count(DISTINCT md5(text)) AS n_distinct,
      |  count(*) - count(DISTINCT md5(text)) AS n_exact_dups,
      |  count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))) AS n_distinct_norm
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---------------------------------------------------------------------------
  // q50 — the composed corpus-CURATION pipeline: language-ID gate
  // (predicted lang must equal the labeled lang, q22's marker scorer) +
  // quality gate (q21's score ≥ 0.25, ≥ 5 tokens) → per-source census of
  // survivors vs drops by reason. The filter-then-census shape of a
  // training-data curation pass: one projection pass over the corpus, one
  // tiny groupBy — nothing shuffles but the census keys.
  def q50QualityFilterPipeline(spark: SparkSession, d: String): DataFrame = {
    val stop = TextOps.stopwords
    val df0 = Tables.documents(spark, d).withColumn("tok", toks(col("text")))
    val scored = markers.foldLeft(df0) { case (df, (l, ws)) =>
      df.withColumn(s"s_$l", size(filter(col("tok"), t => t.isInCollection(ws))))
    }
    val m = greatest(markers.map { case (l, _) => col(s"s_$l") }: _*)
    val predicted = markers.reverse.foldLeft(lit("und")) { case (acc, (l, _)) =>
      when(col(s"s_$l") === m && m > 0, lit(l)).otherwise(acc)
    }
    val gated = scored
      .withColumn("pred_lang", predicted)
      .withColumn("n_tok", size(col("tok")).cast("double"))
      .withColumn("stop_ratio",
        size(filter(col("tok"), t => t.isInCollection(stop))).cast("double") /
          nullif(col("n_tok"), lit(0.0)))
      .withColumn("alpha_ratio",
        length(regexp_replace(col("text"), "[^a-z]", "")).cast("double") /
          nullif(col("n_chars").cast("double"), lit(0.0)))
      .withColumn("quality",
        least(col("n_tok") / lit(100.0), lit(1.0)) * lit(0.3) +
          col("stop_ratio") * lit(0.3) + col("alpha_ratio") * lit(0.4))
      .withColumn("lang_ok", col("pred_lang") === col("lang"))
      .withColumn("quality_ok", col("quality") >= 0.25 && col("n_tok") >= 5)
    gated.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_if(col("lang_ok") && col("quality_ok")).as("n_survivors"),
        count_if(!col("lang_ok")).as("n_lang_dropped"),
        count_if(col("lang_ok") && !col("quality_ok")).as("n_quality_dropped"),
        round(avg(when(col("lang_ok") && col("quality_ok"), col("n_tok"))), 4)
          .as("avg_survivor_tokens"))
      .orderBy(col("source"))
  }

  val q50Sql: String = {
    val scores = markers.map { case (l, ws) =>
      s"len(list_filter(tok, t -> t IN (${ws.map("'" + _ + "'").mkString(",")}))) AS s_$l"
    }.mkString(",\n    ")
    val m = s"greatest(${markers.map("s_" + _._1).mkString(",")})"
    val cases = markers.map { case (l, _) =>
      s"WHEN s_$l = $m AND $m > 0 THEN '$l'"
    }.mkString("\n      ")
    s"""WITH t AS (
      |  SELECT lang, source, n_chars, text, $toksSql AS tok FROM documents),
      |s AS (
      |  SELECT lang, source, n_chars, text, tok,
      |    len(tok)::DOUBLE AS n_tok,
      |    $scores
      |  FROM t),
      |g AS (
      |  SELECT source, n_tok,
      |    (CASE $cases ELSE 'und' END) = lang AS lang_ok,
      |    (least(n_tok/100.0, 1.0)*0.3
      |      + (len(list_filter(tok, t -> t IN (${TextOps.stopwords.map("'" + _ + "'").mkString(",")})))::DOUBLE
      |          / nullif(n_tok, 0.0))*0.3
      |      + (length(regexp_replace(text, '[^a-z]', '', 'g'))::DOUBLE
      |          / nullif(n_chars::DOUBLE, 0.0))*0.4) >= 0.25
      |      AND n_tok >= 5 AS quality_ok
      |  FROM s)
      |SELECT source, count(*) AS n_docs,
      |  count(*) FILTER (WHERE lang_ok AND quality_ok) AS n_survivors,
      |  count(*) FILTER (WHERE NOT lang_ok) AS n_lang_dropped,
      |  count(*) FILTER (WHERE lang_ok AND NOT quality_ok) AS n_quality_dropped,
      |  round(avg(n_tok) FILTER (WHERE lang_ok AND quality_ok), 4) AS avg_survivor_tokens
      |FROM g GROUP BY source ORDER BY source""".stripMargin
  }

  val all: Map[String, Q] = Map(
    "q21_text_stats" -> (q21TextStats _),
    "q22_lang_id" -> (q22LangId _),
    "q23_fingerprint" -> (q23Fingerprint _),
    "q24_exact_dedup" -> (q24ExactDedup _),
    "q50_quality_filter_pipeline" -> (q50QualityFilterPipeline _))

  val oracles: Map[String, String] = Map(
    "q21_text_stats" -> q21Sql,
    "q22_lang_id" -> q22Sql,
    "q23_fingerprint" -> q23Sql,
    "q24_exact_dedup" -> q24Sql,
    "q50_quality_filter_pipeline" -> q50Sql)
}
