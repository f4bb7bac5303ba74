package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Oracle-checkable surface of the multimodal plumbing: payload metadata,
  * content hashing and frame-sampling arithmetic (the decode itself is a
  * stub — see [[graft.operators.Multimodal]]; its outputs are pinned by
  * MultimodalSpec, not the SQL oracle).
  */
object MultimodalQueries {

  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------------------
  // q39 — multimodal catalog census: per media row the modality, payload
  // byte length, payload md5 (binary-level identity), typed metadata, and
  // the frame count a 64-byte/stride-4 sampler would emit. Payloads are
  // UTF-8 text bytes, so the oracle hashes the same byte stream via
  // md5(text).
  def q39MultimodalMeta(spark: SparkSession, d: String): DataFrame =
    Multimodal.mediaTable(spark, d)
      .select(
        col("media_id"), col("modality"),
        length(col("content")).as("n_bytes"),
        md5(col("content")).as("content_md5"),
        col("meta.source").as("source"),
        col("meta.sample_rate").as("sample_rate"),
        col("meta.n_channels").as("n_channels"),
        when(col("modality") === "video",
          ceil(length(col("content")).cast("double") / 64).cast("int"))
          .otherwise(lit(0)).as("n_frames_total"))
      .orderBy(col("media_id"))

  val q39Sql: String =
    """SELECT doc_id AS media_id,
      |  (['image','audio','video'])[(doc_id % 3) + 1] AS modality,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS content_md5,
      |  source,
      |  CAST((doc_id % 16) + 1 AS INT) AS sample_rate,
      |  CAST((doc_id % 8) + 1 AS INT) AS n_channels,
      |  CASE WHEN (doc_id % 3) + 1 = 3
      |       THEN CAST(ceil(octet_length(encode(text)) / 64.0) AS INT)
      |       ELSE 0 END AS n_frames_total
      |FROM documents ORDER BY doc_id""".stripMargin

  val all: Map[String, Q] = Map(
    "q39_multimodal_meta" -> (q39MultimodalMeta _))

  val oracles: Map[String, String] = Map(
    "q39_multimodal_meta" -> q39Sql)
}
