package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Oracle-checkable surface of the multimodal plumbing: payload metadata
  * and catalog arithmetic (q39), plus REAL pure-JVM codec lanes for every
  * modality — image decode (q84) and perceptual-hash dedup (q111), audio
  * decode (q115), video MJPEG container-walk + frame decode (q128) — each
  * hash-checked against a closed-form oracle evaluation of the same
  * rasters/samples (see [[graft.operators.Multimodal]]).
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

  // ---------------------------------------------------------------------------
  // q111 — perceptual-hash (aHash) image near-dup detection over REAL
  // decoded rasters: per document the q84 PNG is decoded (javax.imageio),
  // block-averaged to an 8×8 grid in exact integer arithmetic, thresholded
  // at the grid mean into a 64-bit average-hash (two BIGINT halves — no
  // sign games), then near-duplicates are found by the production LSH
  // shape for Hamming space: 4 × 16-bit bands as exact-match candidate
  // keys (pigeonhole: hamming ≤ 3 ⇒ at least one band identical), with
  // bit_count(xor) verification on candidates only — never an all-pairs
  // scan. The oracle evaluates the same raster formula, blocks, threshold
  // and banding closed-form in SQL, so a hash match proves the WHOLE
  // decode→downscale→hash→band→verify pipeline, and the verified-pair
  // census is checked too, not just the hashes.
  //
  // Scale shape: hashing is map-only (one image in flight per row; the
  // corpus' pixels never shuffle — 16 bytes of hash per image do), and the
  // near-dup stage runs at HASH-GROUP granularity: identical hashes are
  // grouped FIRST (the exact→near order of the text pipeline q49), so the
  // banded candidate join and bit_count verification see one row per
  // DISTINCT hash — bounded by the hash space, not the corpus. The first
  // doc-granular form of this query paid 530 s at the 10× rehearsal
  // because thousands of true-duplicate images shared a hash and every
  // band bucket went quadratic in docs; grouping reduced that to the same
  // plan at ~bench cost (SCALE.md) — the q86 bucket lesson in Hamming
  // space.
  def q111ImagePhash(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val hashed = graft.Tables.documents(spark, d)
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
          val (dw, dh, dec) = Multimodal.decodeGray(png)
          // 8×8 block average on the DECODED raster, exact integers
          val cells = new Array[Long](64)
          var i = 0
          while (i < 8) {
            val y0 = i * dh / 8; val y1 = (i + 1) * dh / 8
            var j = 0
            while (j < 8) {
              val x0 = j * dw / 8; val x1 = (j + 1) * dw / 8
              var s = 0L
              var yy = y0
              while (yy < y1) {
                var xx = x0
                while (xx < x1) { s += dec(yy * dw + xx); xx += 1 }
                yy += 1
              }
              cells(i * 8 + j) = s / ((y1 - y0).toLong * (x1 - x0))
              j += 1
            }
            i += 1
          }
          val mean = cells.sum / 64
          var hLo = 0L; var hHi = 0L
          var k = 0
          while (k < 64) {
            if (cells(k) > mean) {
              if (k < 32) hLo |= 1L << k else hHi |= 1L << (k - 32)
            }
            k += 1
          }
          (id, hLo, hHi)
        }
      }.toDF("doc_id", "h_lo", "h_hi")
    // exact-dup grouping FIRST: one row per distinct hash
    val groups = hashed.groupBy(col("h_lo"), col("h_hi"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("rep_doc"))
    // posexplode gives the deterministic band index the join keys on;
    // /65536 is a power-of-two division — exact in doubles, floor on cast
    val bands = groups.select(col("h_lo"), col("h_hi"), col("n_docs"),
      posexplode(array(
        col("h_lo") % 65536,
        (col("h_lo") / 65536).cast("long") % 65536,
        col("h_hi") % 65536,
        (col("h_hi") / 65536).cast("long") % 65536)).as(Seq("bi", "bk")))
    val l = bands.select(col("bi"), col("bk"),
      col("h_lo").as("l1"), col("h_hi").as("hi1"))
    val r = bands.select(col("bi"), col("bk"),
      col("h_lo").as("l2"), col("h_hi").as("hi2"), col("n_docs").as("nd2"))
    // DISTINCT hash pairs sharing a band (pigeonhole covers hamming ≤ 3);
    // struct order on (lo, hi) halves the candidate space
    val pairs = l.join(r, Seq("bi", "bk"))
      .filter(struct(col("l1"), col("hi1")) < struct(col("l2"), col("hi2")))
      .select(col("l1"), col("hi1"), col("l2"), col("hi2"), col("nd2"))
      .distinct()
      .withColumn("hamming",
        expr("bit_count(l1 ^ l2) + bit_count(hi1 ^ hi2)").cast("long"))
      .filter(col("hamming") <= 3)
    // neighbor census per hash, both directions of each verified pair
    val nbr = pairs
      .select(col("l1").as("h_lo"), col("hi1").as("h_hi"), col("nd2").as("nd"))
      .unionByName(pairs
        .join(groups.select(col("h_lo").as("l1"), col("h_hi").as("hi1"),
          col("n_docs").as("nd1")), Seq("l1", "hi1"))
        .select(col("l2").as("h_lo"), col("hi2").as("h_hi"), col("nd1").as("nd")))
      .groupBy(col("h_lo"), col("h_hi"))
      .agg(count(lit(1)).as("n_nbr_hashes"), sum(col("nd")).as("n_nbr_docs"))
    groups.join(nbr, Seq("h_lo", "h_hi"), "left")
      .na.fill(0L, Seq("n_nbr_hashes", "n_nbr_docs"))
      .select(col("h_lo"), col("h_hi"), col("n_docs"), col("rep_doc"),
        col("n_nbr_hashes"), col("n_nbr_docs"))
      .orderBy(col("h_lo"), col("h_hi"))
  }

  val q111Sql: String =
    """WITH dims AS (
      |  SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h
      |  FROM documents),
      |cells AS (
      |  SELECT d.doc_id, i.i, j.j,
      |    CAST(sum((d.doc_id * 31 + y.y * 7 + x.x * 13) % 256) AS BIGINT)
      |      // count(*) AS cell
      |  FROM dims d, range(0, 8) i(i), range(0, 8) j(j),
      |    range(0, 14) y(y), range(0, 16) x(x)
      |  WHERE y.y >= i.i * d.h // 8 AND y.y < (i.i + 1) * d.h // 8
      |    AND x.x >= j.j * d.w // 8 AND x.x < (j.j + 1) * d.w // 8
      |  GROUP BY 1, 2, 3),
      |hs AS (
      |  SELECT doc_id,
      |    CAST(coalesce(sum(CASE WHEN above AND k < 32
      |      THEN (1::BIGINT << k) END), 0) AS BIGINT) AS h_lo,
      |    CAST(coalesce(sum(CASE WHEN above AND k >= 32
      |      THEN (1::BIGINT << (k - 32)) END), 0) AS BIGINT) AS h_hi
      |  FROM (
      |    SELECT doc_id, i * 8 + j AS k,
      |      cell > (CAST(sum(cell) OVER (PARTITION BY doc_id) AS BIGINT) // 64)
      |        AS above
      |    FROM cells)
      |  GROUP BY doc_id),
      |grp AS (
      |  SELECT h_lo, h_hi, count(*) AS n_docs, min(doc_id) AS rep_doc
      |  FROM hs GROUP BY 1, 2),
      |bands AS (
      |  SELECT h_lo, h_hi, n_docs, t.bi,
      |    CASE t.bi WHEN 0 THEN h_lo % 65536
      |      WHEN 1 THEN (h_lo // 65536) % 65536
      |      WHEN 2 THEN h_hi % 65536
      |      ELSE (h_hi // 65536) % 65536 END AS bk
      |  FROM grp, range(0, 4) t(bi)),
      |pairs AS (
      |  SELECT DISTINCT a.h_lo AS l1, a.h_hi AS hi1,
      |    b.h_lo AS l2, b.h_hi AS hi2, b.n_docs AS nd2
      |  FROM bands a JOIN bands b ON a.bi = b.bi AND a.bk = b.bk
      |    AND (a.h_lo < b.h_lo OR (a.h_lo = b.h_lo AND a.h_hi < b.h_hi))),
      |ham AS (
      |  SELECT l1, hi1, l2, hi2, nd2,
      |    CAST(bit_count(xor(l1, l2)) + bit_count(xor(hi1, hi2)) AS BIGINT)
      |      AS hamming
      |  FROM pairs),
      |nbr AS (
      |  SELECT h_lo, h_hi, count(*) AS n_nbr_hashes,
      |    CAST(sum(nd) AS BIGINT) AS n_nbr_docs
      |  FROM (
      |    SELECT l1 AS h_lo, hi1 AS h_hi, nd2 AS nd
      |    FROM ham WHERE hamming <= 3
      |    UNION ALL
      |    SELECT h.l2, h.hi2, g.n_docs
      |    FROM ham h JOIN grp g ON g.h_lo = h.l1 AND g.h_hi = h.hi1
      |    WHERE h.hamming <= 3)
      |  GROUP BY 1, 2)
      |SELECT grp.h_lo, grp.h_hi, grp.n_docs, grp.rep_doc,
      |  coalesce(nbr.n_nbr_hashes, 0) AS n_nbr_hashes,
      |  coalesce(nbr.n_nbr_docs, 0) AS n_nbr_docs
      |FROM grp LEFT JOIN nbr USING (h_lo, h_hi)
      |ORDER BY grp.h_lo, grp.h_hi""".stripMargin

  // ---------------------------------------------------------------------------
  // q115 — REAL audio decode (javax.sound.sampled WAV, pure JVM — the q84
  // pattern for the audio modality): per document a deterministic 16-bit
  // PCM signal (mono or stereo, varying sample rates) is synthesized from
  // a closed-form formula, WAV-ENCODED into an opaque RIFF container,
  // then WAV-DECODED — format fields (sample rate, channels) read from
  // the DECODED header, every sample statistic from the DECODED stream.
  // The DuckDB oracle evaluates the same sample formula directly, so a
  // hash match proves the container round trip is lossless, correctly
  // framed (stereo interleave included) and correctly endianness-handled.
  // Scale shape: map-only over doc ids, one clip in flight per row,
  // payloads never shuffle, source parallelism.
  def q115AudioDecode(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, d)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val rate = (8000 + (id % 4) * 4000).toFloat
          val channels = (1 + id % 2).toInt
          val nSamples = ((200 + id % 57) * channels).toInt
          val samples = Array.tabulate(nSamples)(k =>
            (((id * 31 + k * 17) % 65536) - 32768).toShort)
          val wav = Multimodal.encodeWav(rate, channels, samples)
          val (decRate, decCh, dec) = Multimodal.decodeWav(wav)
          var sum = 0L
          var chk = 0L
          var mn = Int.MaxValue
          var mx = Int.MinValue
          var k = 0
          while (k < dec.length) {
            val s = dec(k).toInt
            sum += s; chk += (k + 1L) * s
            if (s < mn) mn = s
            if (s > mx) mx = s
            k += 1
          }
          (id, decRate.toInt, decCh, dec.length.toLong, sum, chk, mn, mx)
        }
      }
      .toDF("doc_id", "sample_rate", "n_channels", "n_samples",
        "sample_sum", "sample_checksum", "sample_min", "sample_max")
      .orderBy(col("doc_id"))
  }

  // the oracle never sees a WAV: it evaluates the PCM formula in SQL and
  // must agree with what Spark read back OUT of the decoded container
  val q115Sql: String =
    """SELECT d.doc_id,
      |  CAST(8000 + (d.doc_id % 4) * 4000 AS INT) AS sample_rate,
      |  CAST(1 + d.doc_id % 2 AS INT) AS n_channels,
      |  CAST((200 + d.doc_id % 57) * (1 + d.doc_id % 2) AS BIGINT) AS n_samples,
      |  CAST(sum((d.doc_id * 31 + k.k * 17) % 65536 - 32768) AS BIGINT)
      |    AS sample_sum,
      |  CAST(sum((k.k + 1) * ((d.doc_id * 31 + k.k * 17) % 65536 - 32768)) AS BIGINT)
      |    AS sample_checksum,
      |  CAST(min((d.doc_id * 31 + k.k * 17) % 65536 - 32768) AS INT) AS sample_min,
      |  CAST(max((d.doc_id * 31 + k.k * 17) % 65536 - 32768) AS INT) AS sample_max
      |FROM documents d, range(0, 512) k(k)
      |WHERE k.k < (200 + d.doc_id % 57) * (1 + d.doc_id % 2)
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  // ---------------------------------------------------------------------------
  // q128 — REAL video frame decode (MJPEG through the JDK JPEG codec,
  // closing the video column of the modality matrix: image q84, audio
  // q115, video q128 — all real). Per document a short clip is
  // synthesized as BLOCK-CONSTANT grayscale frames (raster constant
  // within each 8×8 JPEG block), each frame JPEG-encoded at quality 1.0
  // and concatenated into an MJPEG elementary stream; then the opaque
  // clip bytes are container-SPLIT on SOI/EOI markers, every 2nd frame
  // is SAMPLED, and each sampled frame is JPEG-DECODED — every output
  // statistic comes from the DECODED rasters. Block-constant frames at
  // quality 1.0 round-trip bit-exactly (only the DC coefficient per
  // block survives the DCT and its quantizer divisor is 1 —
  // MultimodalSpec pins the exactness, including through the container
  // walk), so the DuckDB oracle evaluates the same block formula in
  // closed form: a hash match proves encode → container parse →
  // frame-sample → decode end to end. Scale shape: map-only over doc
  // ids, one clip in flight per row, payloads never shuffle,
  // aggregate-free projection at source parallelism.
  def q128VideoDecode(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    graft.Tables.documents(spark, d)
      .select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
        ids.map { id =>
          val nFrames = (3 + id % 5).toInt
          val nbx = (1 + id % 2).toInt
          val nby = (1 + id % 3).toInt
          val (w, h) = (8 * nbx, 8 * nby)
          val frames = (0 until nFrames).map { f =>
            val pix = new Array[Int](w * h)
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                pix(y * w + x) =
                  ((id * 31 + f * 17 + (y / 8) * 7 + (x / 8) * 13) % 256).toInt
                x += 1
              }
              y += 1
            }
            (w, h, pix)
          }
          val clip = Multimodal.encodeMjpeg(frames)
          // everything below reads ONLY the opaque clip bytes
          val split = Multimodal.splitMjpegFrames(clip)
          val sampled = split.zipWithIndex.filter(_._2 % 2 == 0)
          var pixSum = 0L
          var chk = 0L
          var dw = 0
          var dh = 0
          sampled.foreach { case (jpg, f) =>
            val (fw, fh, dec) = Multimodal.decodeGray(jpg)
            dw = fw; dh = fh
            var i = 0
            while (i < dec.length) {
              val bi = (i / fw) / 8
              val bj = (i % fw) / 8
              pixSum += dec(i)
              chk += (f + 1L) * (bi.toLong * (fw / 8) + bj + 1L) * dec(i)
              i += 1
            }
          }
          (id, split.length, sampled.length, dw, dh, pixSum, chk)
        }
      }
      .toDF("doc_id", "n_frames_total", "n_frames_sampled",
        "width", "height", "pix_sum", "pix_checksum")
      .orderBy(col("doc_id"))
  }

  // the oracle never sees a JPEG byte: it evaluates the block formula in
  // SQL and must agree with what Spark read back OUT of the decoded,
  // container-split, frame-sampled stream
  val q128Sql: String =
    """SELECT d.doc_id,
      |  CAST(3 + d.doc_id % 5 AS INT) AS n_frames_total,
      |  CAST(floor((4 + d.doc_id % 5) / 2.0) AS INT) AS n_frames_sampled,
      |  CAST(8 * (1 + d.doc_id % 2) AS INT) AS width,
      |  CAST(8 * (1 + d.doc_id % 3) AS INT) AS height,
      |  CAST(64 * sum((d.doc_id * 31 + f.f * 17 + bi.i * 7 + bj.j * 13) % 256)
      |    AS BIGINT) AS pix_sum,
      |  CAST(64 * sum((f.f + 1) * (bi.i * (1 + d.doc_id % 2) + bj.j + 1)
      |      * ((d.doc_id * 31 + f.f * 17 + bi.i * 7 + bj.j * 13) % 256))
      |    AS BIGINT) AS pix_checksum
      |FROM documents d, range(0, 7) f(f), range(0, 3) bi(i), range(0, 2) bj(j)
      |WHERE f.f < 3 + d.doc_id % 5 AND f.f % 2 = 0
      |  AND bi.i < 1 + d.doc_id % 3 AND bj.j < 1 + d.doc_id % 2
      |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin

  val all: Map[String, Q] = Map(
    "q39_multimodal_meta" -> (q39MultimodalMeta _),
    "q84_image_decode" -> (q84ImageDecode _),
    "q111_image_phash" -> (q111ImagePhash _),
    "q115_audio_decode" -> (q115AudioDecode _),
    "q128_video_decode" -> (q128VideoDecode _))

  val oracles: Map[String, String] = Map(
    "q39_multimodal_meta" -> q39Sql,
    "q84_image_decode" -> q84Sql,
    "q111_image_phash" -> q111Sql,
    "q115_audio_decode" -> q115Sql,
    "q128_video_decode" -> q128Sql)
}
