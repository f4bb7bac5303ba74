package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for a training-data pipeline: image/audio/
  * video as opaque `binary` columns with typed metadata, plus
  * decode / feature-extract / resize / frame-sample operators.
  *
  * Decode status by modality: IMAGE is real (JDK javax.imageio PNG,
  * [[encodeGrayPng]]/[[decodeGray]], q84/q111); AUDIO is real (JDK
  * javax.sound.sampled WAV, [[encodeWav]]/[[decodeWav]], q115); VIDEO
  * remains the one documented STUB (`fakeDecode` below — this container
  * ships no H.264 codec). Everything around the stub — the schema, the
  * per-partition batching, the frame-sampling arithmetic, the feature
  * vector shape — is the real Spark plumbing a production decode (JNI
  * codec / Python `mapInPandas` on a PySpark bridge) would drop into.
  *
  * Scale design: payloads never shuffle — every operator here is a
  * projection or a `mapPartitions` over the payload column; features
  * (small fixed-width vectors) are what flows into joins/aggregations
  * downstream. Partition sizing is payload-byte-aware
  * (`spark.sql.files.maxPartitionBytes` governs the scan; the batch
  * iterator bounds decode memory to one payload at a time).
  */
object Multimodal {

  /** Synthesize the multimodal table from `documents`: payload = UTF-8
    * bytes of the text (an *opaque* blob from the pipeline's viewpoint),
    * modality assigned deterministically, typed metadata struct.
    * Mirrors a real lake layout: (id, modality, content, meta).
    */
  def mediaTable(spark: SparkSession, d: String): DataFrame =
    graft.Tables.documents(spark, d)
      .select(
        col("doc_id").as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        encode(col("text"), "UTF-8").as("content"),
        struct(
          col("source"),
          col("n_chars").as("content_len"),
          (pmod(col("doc_id"), lit(16)) + 1).cast("int").as("sample_rate"),
          (pmod(col("doc_id"), lit(8)) + 1).cast("int").as("n_channels"))
          .as("meta"))

  /** STUB decode: deterministic byte-plane from the opaque payload.
    * A real implementation would decode JPEG/PCM/H.264 here; the plumbing
    * (mapPartitions batch shape, output schema) is what this pins down.
    */
  def fakeDecode(payload: Array[Byte], plane: Int): Array[Byte] = {
    // ??? real codec goes here — deterministic fake: xor-fold the payload
    // into a fixed 64-byte plane so downstream shapes are realistic.
    val out = new Array[Byte](64)
    var i = 0
    while (i < payload.length) {
      out(i % 64) = (out(i % 64) ^ payload(i) ^ plane).toByte
      i += 1
    }
    out
  }

  /** Feature extraction: 16-bin byte histogram over the (stub-)decoded
    * plane, L1-normalized — the fixed-width vector a real embedding model
    * would produce. Runs as mapPartitions: one payload in flight per row,
    * no payload materialization beyond the current batch element.
    */
  def withFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType(media.schema.fields :+
      org.apache.spark.sql.types.StructField("features",
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, containsNull = false)))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    media.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("content")
        val plane = fakeDecode(payload, 0)
        val hist = new Array[Double](16)
        plane.foreach { b => hist((b & 0xFF) / 16) += 1.0 }
        val total = hist.sum
        val feats = if (total > 0) hist.map(_ / total) else hist
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Frame sampling for video payloads: split the payload into fixed-size
    * pseudo-frames and keep every `stride`-th, exploded one row per frame
    * with its byte offset — the real decoder swaps in at `fakeDecode`.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media.filter(col("modality") === "video")
      .withColumn("n_frames_total",
        ceil(length(col("content")).cast("double") / frameBytes).cast("int"))
      .withColumn("frame_idx",
        explode(expr(s"filter(sequence(0, n_frames_total - 1), i -> i % $stride = 0)")))
      .withColumn("frame",
        expr(s"substring(content, frame_idx * $frameBytes + 1, $frameBytes)"))
      .withColumn("frame_offset", col("frame_idx") * frameBytes)

  /** Resize stub: truncate/pad the decoded plane to `targetLen` bytes —
    * stands in for bilinear resize; pins the output-shape contract. */
  def resizePlane(plane: Array[Byte], targetLen: Int): Array[Byte] =
    java.util.Arrays.copyOf(plane, targetLen)

  // ---------------------------------------------------------------------------
  // REAL image codec — pure-JVM `javax.imageio` PNG (ships with the JDK, no
  // native libs). This closes the "decode is stubbed" caveat for the image
  // modality: encodeGrayPng/decodeGray below run an actual lossless PNG
  // round trip on executors. JPEG/H.264/PCM would slot in behind the same
  // two signatures via an external codec jar.

  /** Encode a W×H 8-bit grayscale raster (row-major, `pix(y*w+x)`) to PNG
    * bytes. Memory-bounded: one image in flight per call; ImageIO's disk
    * cache is disabled so executor-side encode stays heap-only. */
  def encodeGrayPng(w: Int, h: Int, pix: Array[Int]): Array[Byte] = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setSample(x, y, 0, pix(y * w + x)); x += 1 }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Decode PNG (or BMP/GIF — whatever the JDK's registry recognizes)
    * bytes to (width, height, row-major gray samples from band 0). */
  def decodeGray(png: Array[Byte]): (Int, Int, Array[Int]) = {
    javax.imageio.ImageIO.setUseCache(false)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    require(img != null, "undecodable image payload")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, out)
  }

  /** REAL WAV encode (javax.sound.sampled ships with the JDK): 16-bit
    * signed PCM little-endian RIFF/WAVE container. This replaces the PCM
    * stub behind the same opaque-binary interface — q39's video codec
    * remains the one documented stub. */
  def encodeWav(sampleRate: Float, channels: Int, samples: Array[Short]): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(
      sampleRate, 16, channels, true, false)
    val pcm = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      pcm(2 * i) = (samples(i) & 0xff).toByte
      pcm(2 * i + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length / channels)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL WAV decode: container parse + format header via AudioSystem,
    * samples reconstructed per the HEADER's declared endianness — every
    * output of q115 comes from here, not from the writer's inputs. */
  def decodeWav(wav: Array[Byte]): (Float, Int, Array[Short]) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    require(fmt.getSampleSizeInBits == 16, s"expected 16-bit PCM, got $fmt")
    val bytes = ais.readAllBytes()
    ais.close()
    val out = new Array[Short](bytes.length / 2)
    val big = fmt.isBigEndian
    var i = 0
    while (i < out.length) {
      out(i) =
        if (big) (((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
        else (((bytes(2 * i + 1) & 0xff) << 8) | (bytes(2 * i) & 0xff)).toShort
      i += 1
    }
    (fmt.getSampleRate, fmt.getChannels, out)
  }
}
