package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** Pins the multimodal plumbing: schema contract, deterministic stub
  * decode, feature-vector shape/normalization, frame-sampling arithmetic,
  * resize contract. The decode is a stub; these tests are about the
  * Spark-side shapes a real codec would drop into.
  */
class MultimodalSpec extends GraftSuite {

  test("media table schema: id, modality enum, binary payload, typed meta") {
    val df = Multimodal.mediaTable(spark, sf)
    val s = df.schema
    assert(s("content").dataType.typeName == "binary")
    assert(s("meta").dataType.typeName == "struct")
    val mods = df.select("modality").distinct().collect().map(_.getString(0)).toSet
    assert(mods == Set("image", "audio", "video"))
    assert(df.count() == Tables.documents(spark, sf).count())
  }

  test("fakeDecode is deterministic and fixed-width") {
    val p = "some payload bytes".getBytes("UTF-8")
    val a = Multimodal.fakeDecode(p, 0)
    val b = Multimodal.fakeDecode(p, 0)
    assert(a.toSeq == b.toSeq)
    assert(a.length == 64)
    assert(Multimodal.fakeDecode(p, 1).toSeq != a.toSeq, "plane must matter")
  }

  test("withFeatures emits L1-normalized 16-bin vectors for every row") {
    val df = Multimodal.withFeatures(Multimodal.mediaTable(spark, sf))
    val rows = df.select("media_id", "features").collect()
    assert(rows.length == Tables.documents(spark, sf).count())
    rows.foreach { r =>
      val f = r.getSeq[Double](1)
      assert(f.length == 16)
      assert(math.abs(f.sum - 1.0) < 1e-9, s"not normalized: ${f.sum}")
      assert(f.forall(_ >= 0.0))
    }
    // deterministic across runs
    val again = Multimodal.withFeatures(Multimodal.mediaTable(spark, sf))
      .select("media_id", "features").collect()
    assert(rows.map(r => (r.getLong(0), r.getSeq[Double](1))).toMap ==
      again.map(r => (r.getLong(0), r.getSeq[Double](1))).toMap)
  }

  test("sampleFrames: stride arithmetic, offsets, frame byte-width") {
    val frames = Multimodal.sampleFrames(
      Multimodal.mediaTable(spark, sf), frameBytes = 64, stride = 4)
    val rows = frames
      .select("media_id", "n_frames_total", "frame_idx", "frame_offset", "frame")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val total = r.getInt(1); val idx = r.getInt(2)
      assert(idx % 4 == 0 && idx < total)
      assert(r.getInt(3) == idx * 64)
      val fr = r.getAs[Array[Byte]]("frame")
      assert(fr.length <= 64 && fr.length > 0)
    }
    // per-media sampled count = ceil(total/4)
    val counts = frames.groupBy("media_id", "n_frames_total")
      .agg(count(lit(1)).as("n")).collect()
    counts.foreach { r =>
      val want = (r.getInt(1) + 3) / 4
      assert(r.getLong(2) == want, s"media ${r.getLong(0)}: ${r.getLong(2)} != $want")
    }
  }

  test("resizePlane truncates and zero-pads to the target shape") {
    val p = Array[Byte](1, 2, 3, 4, 5)
    assert(Multimodal.resizePlane(p, 3).toSeq == Seq[Byte](1, 2, 3))
    val padded = Multimodal.resizePlane(p, 8)
    assert(padded.length == 8 && padded.drop(5).forall(_ == 0))
  }

  test("MJPEG: block-constant gray frames at quality 1.0 round-trip " +
    "bit-exactly through encode -> container split -> JPEG decode") {
    // the q128 oracle contract: a raster constant within each 8x8 block
    // keeps only the DC coefficient per block (quantizer divisor 1 at
    // quality 1.0), so decode must reproduce every pixel exactly
    val frames = (0 until 6).map { f =>
      val (w, h) = (16, 24)
      val pix = Array.tabulate(w * h) { i =>
        val (y, x) = (i / w, i % w)
        (f * 41 + (y / 8) * 7 + (x / 8) * 13) % 256
      }
      (w, h, pix)
    }
    val clip = Multimodal.encodeMjpeg(frames)
    val split = Multimodal.splitMjpegFrames(clip)
    assert(split.length == frames.length,
      s"container walk found ${split.length} frames, wrote ${frames.length}")
    // frame boundaries land exactly: re-concatenation is the original clip
    assert(split.foldLeft(0)(_ + _.length) == clip.length)
    frames.zip(split).zipWithIndex.foreach { case (((w, h, pix), jpg), f) =>
      val (dw, dh, dec) = Multimodal.decodeGray(jpg)
      assert(dw == w && dh == h, s"frame $f decoded ${dw}x$dh, wrote ${w}x$h")
      assert(dec.sameElements(pix), s"frame $f pixels drifted after JPEG decode")
    }
  }

  test("MJPEG container walk fails loudly on truncated / non-JPEG streams") {
    val clip = Multimodal.encodeMjpeg(
      Seq((8, 8, Array.fill(64)(128))))
    intercept[IllegalArgumentException] {
      Multimodal.splitMjpegFrames(clip.dropRight(2)) // EOI cut off
    }
    intercept[IllegalArgumentException] {
      Multimodal.splitMjpegFrames("not a jpeg".getBytes) // no SOI
    }
  }

  test("non-block-constant frames survive the container walk (lossy decode " +
    "is allowed there; only the q128 fixture class must be exact)") {
    val (w, h) = (16, 16)
    val pix = Array.tabulate(w * h)(i => (i * 37) % 256) // per-pixel gradient
    val clip = Multimodal.encodeMjpeg(Seq((w, h, pix), (w, h, pix)))
    val split = Multimodal.splitMjpegFrames(clip)
    assert(split.length == 2)
    val (dw, dh, dec) = Multimodal.decodeGray(split(1))
    assert(dw == w && dh == h && dec.length == w * h)
  }

  test("degenerate payloads: NULL content gets empty-payload features (no " +
    "NPE), zero-byte videos emit NO frame rows (no phantom sequence(0,-1))") {
    import spark.implicits._
    val media = Seq(
      (1L, "video", Some("some actual payload bytes here")),
      (2L, "video", Some("")), // zero-byte payload: ceil(0/64) = 0 frames
      (3L, "video", Option.empty[String]), // NULL payload
      (4L, "image", Some("img"))
    ).toDF("media_id", "modality", "text")
      .select(col("media_id"), col("modality"),
        encode(col("text"), "UTF-8").as("content"),
        struct(lit("src").as("source")).as("meta"))
    // pre-fix: row 3 NPE'd in fakeDecode; now it degrades to the
    // empty-payload feature vector (all-zero plane → all mass in bin 0)
    val feats = Multimodal.withFeatures(media)
      .select("media_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(feats.size == 4)
    assert(feats(3L) == feats(2L),
      "NULL payload must produce the same features as an empty payload")
    assert(feats(3L).head == 1.0, "empty plane mass sits in bin 0")
    // pre-fix: rows 2/3 produced phantom frames via sequence(0, -1) =
    // [0, -1]; now only the real payload emits frames
    val frames = Multimodal.sampleFrames(media, frameBytes = 8, stride = 1)
      .select("media_id", "frame_idx").collect()
    assert(frames.nonEmpty && frames.forall(_.getLong(0) == 1L),
      s"only media 1 has frames: ${frames.map(_.getLong(0)).toSet}")
    assert(frames.forall(_.getInt(1) >= 0), "no negative frame_idx")
  }
}
