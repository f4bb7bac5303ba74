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

  // ---------------------------------------------------------------------------
  // q84 — REAL image decode (javax.imageio PNG, pure JVM): per document a
  // small grayscale image is rasterized from a closed-form pixel formula,
  // PNG-ENCODED, then the opaque PNG bytes are PNG-DECODED and censused —
  // width/height and two pixel statistics read from the DECODED raster.
  // The DuckDB oracle evaluates the same pixel formula directly (lateral
  // range join), so a hash match proves the executor-side encode→decode
  // round trip is lossless and correctly indexed — the decode is real, not
  // the xor-fold stub q39 documents. Scale shape: map-only over doc ids,
  // one image in flight per row, payloads never shuffle; the aggregate-free
  // projection keeps it at source parallelism.
  def q84ImageDecode(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, d)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val w = (8 + id % 9).toInt
          val h = (8 + id % 7).toInt
          val pix = new Array[Int](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              pix(y * w + x) = ((id * 31 + y * 7 + x * 13) % 256).toInt
              x += 1
            }
            y += 1
          }
          val png = Multimodal.encodeGrayPng(w, h, pix)
          // decode the opaque bytes with the real JDK PNG reader; all
          // output statistics come from the DECODED raster only
          val (dw, dh, dec) = Multimodal.decodeGray(png)
          var sum = 0L
          var chk = 0L
          var i = 0
          while (i < dec.length) { sum += dec(i); chk += (i + 1L) * dec(i); i += 1 }
          (id, png.length, dw, dh, sum, chk)
        }
      }
      .toDF("doc_id", "png_bytes", "width", "height", "pix_sum", "pix_checksum")
      .select(col("doc_id"), col("width"), col("height"),
        col("pix_sum"), col("pix_checksum"))
      .orderBy(col("doc_id"))
  }

  // the oracle never sees a PNG: it evaluates the pixel formula in SQL and
  // must agree with what Spark read back OUT of the decoded image
  val q84Sql: String =
    """SELECT d.doc_id,
      |  CAST(8 + d.doc_id % 9 AS INT) AS width,
      |  CAST(8 + d.doc_id % 7 AS INT) AS height,
      |  CAST(sum((d.doc_id * 31 + i.i * 7 + j.j * 13) % 256) AS BIGINT)
      |    AS pix_sum,
      |  CAST(sum((i.i * (8 + d.doc_id % 9) + j.j + 1)
      |           * ((d.doc_id * 31 + i.i * 7 + j.j * 13) % 256)) AS BIGINT)
      |    AS pix_checksum
      |FROM documents d, range(0, 14) i(i), range(0, 16) j(j)
      |WHERE i.i < 8 + d.doc_id % 7 AND j.j < 8 + d.doc_id % 9
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  val all: Map[String, Q] = Map(
    "q39_multimodal_meta" -> (q39MultimodalMeta _),
    "q84_image_decode" -> (q84ImageDecode _))

  val oracles: Map[String, String] = Map(
    "q39_multimodal_meta" -> q39Sql,
    "q84_image_decode" -> q84Sql)
}
