package graft

import org.apache.spark.sql.functions._
import graft.queries.{CurationQueries, RankingQueries, TextQueries}

/** Brute-force replays for the round-5 additions q73/q74/q75: each query's
  * census is recomputed in plain Scala from the raw tables (same hash, same
  * merge semantics, same window geometry) and compared row-for-row. The
  * DuckDB oracle pins engine parity; this pins the semantics against an
  * implementation with no shared code.
  */
class TrainingOpsSpec extends GraftSuite {

  private def md5Int(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  test("q73 classifier: per-doc micro-scores replay with plain-Scala hashing") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("source"), col("text")).collect()
    // expected per-(lang, source) census
    case class Acc(var docs: Int = 0, var accepted: Int = 0, var scoreSum: Double = 0.0)
    val acc = scala.collection.mutable.Map.empty[(String, String), Acc]
    docs.foreach { r =>
      val toks = r.getAs[String]("text").trim.split("\\s+")
      var s = 0L
      toks.foreach { w =>
        val hb = md5Int(w) % 1024
        s += (hb * 2654435761L) % 2003L - 1001L
      }
      val a = acc.getOrElseUpdate(
        (r.getAs[String]("lang"), r.getAs[String]("source")), Acc())
      a.docs += 1
      if (s > 0) a.accepted += 1
      a.scoreSum += s.toDouble / toks.length / 1000.0
    }
    val got = CurationQueries.q73QualityClassifier(spark, sf).collect()
    assert(got.length == acc.size)
    got.foreach { r =>
      val a = acc((r.getAs[String]("lang"), r.getAs[String]("source")))
      assert(r.getAs[Long]("n_docs") == a.docs)
      assert(r.getAs[Long]("n_accepted") == a.accepted)
      assert(math.abs(r.getAs[Double]("avg_doc_score") - a.scoreSum / a.docs) < 1e-6)
    }
  }

  test("q74 encode apply: subtoken counts replay the learned merges greedily") {
    val merges = TextQueries.q64BpeMerges(spark, sf)
      .orderBy(col("round")).collect()
      .map(_.getAs[String]("merged_pair").split("\\+", 2) match {
        case Array(a, b) => (a, b)
      })
    def encode(w: String): Int = {
      var seg = " " + w.toCharArray.map(_.toString).mkString(" ") + " "
      merges.foreach { case (a, b) =>
        // same left-to-right non-overlapping replace-all semantics as the
        // engine-side replace(' a b ' -> ' ab ')
        seg = seg.replace(s" $a $b ", s" $a$b ")
      }
      seg.trim.split(" ").length
    }
    val expect = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .flatMap(r => r.getAs[String]("text").trim.split("\\s+")
        .map(w => (r.getAs[String]("lang"), w)))
      .groupBy(_._1)
      .map { case (lang, ws) =>
        lang -> (ws.length, ws.map(_._2.length).sum.toLong,
          ws.map(w => encode(w._2).toLong).sum)
      }
    val got = TextQueries.q74BpeEncode(spark, sf).collect()
    assert(got.length == expect.size)
    got.foreach { r =>
      val (nw, nchar, nbpe) = expect(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_words") == nw.toLong)
      assert(r.getAs[Long]("n_char_tokens") == nchar)
      assert(r.getAs[Long]("n_bpe_tokens") == nbpe,
        s"${r.getAs[String]("lang")}: ${r.getAs[Long]("n_bpe_tokens")} vs $nbpe")
      assert(nbpe <= nchar)
    }
  }

  test("q75 rolling windows: one series' ratio distribution replays brute-force") {
    val hourUs = 3600L * 1000 * 1000
    val dayUs = 24 * hourUs
    val ev = Tables.events(spark, sf)
    val rets = ev.select(col("event_type"), Tables.tsUs(ev).as("ts_us"),
        col("event_id"), col("value")).collect()
      .groupBy(_.getAs[String]("event_type"))
      .map { case (et, rs) =>
        val sorted = rs.sortBy(r => (r.getAs[Long]("ts_us"), r.getAs[Long]("event_id")))
        et -> sorted.sliding(2).collect {
          case Array(p, c) if p.getAs[Double]("value") != 0.0 =>
            (c.getAs[Long]("ts_us"),
              (c.getAs[Double]("value") - p.getAs[Double]("value"))
                / p.getAs[Double]("value"))
        }.toArray
      }
    val allTs = rets.values.flatten.map(_._1)
    val h0 = allTs.min / hourUs + 25
    val h1 = allTs.max / hourUs
    def ratios(series: Array[(Long, Double)]): Seq[Double] =
      (h0 to h1).flatMap { h =>
        val lo = h * hourUs - dayUs
        val hi = h * hourUs
        val in = series.filter(t => t._1 >= lo && t._1 < hi)
        if (in.isEmpty) None
        else {
          var cum = 0.0; var runmax = Double.NegativeInfinity; var dd = 0.0
          in.foreach { case (_, r) =>
            cum += r; runmax = math.max(runmax, cum); dd = math.max(dd, runmax - cum)
          }
          val ret = in.map(_._2).sum
          Some(math.rint((if (dd > 0) math.min(ret / dd, 50.0)
            else if (ret > 0) 50.0 else 0.0) * 1e8) / 1e8)
        }
      }
    val got = RankingQueries.q75RollingRddTopsis(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r).toMap
    rets.foreach { case (et, series) =>
      val rs = ratios(series).sorted
      val r = got(et)
      assert(r.getAs[Long]("n_windows") == rs.length.toLong, s"$et windows")
      assert(math.abs(r.getAs[Double]("worst_ratio") - rs.head) < 1e-6, s"$et worst")
      val med =
        if (rs.length % 2 == 1) rs(rs.length / 2)
        else (rs(rs.length / 2 - 1) + rs(rs.length / 2)) / 2.0
      assert(math.abs(r.getAs[Double]("med_ratio") - med) < 1e-6, s"$et med")
      val cons = rs.count(_ > 1.0).toDouble / rs.length
      assert(math.abs(r.getAs[Double]("consistency") - cons) < 1e-6, s"$et cons")
    }
  }

  test("q104 heavy hitters == exact census; MG guarantee holds on the fixture") {
    // exact bigram census in plain Scala
    val counts = scala.collection.mutable.Map.empty[String, Long]
    var nTotal = 0L
    Tables.documents(spark, sf).select(col("text")).collect().foreach { r =>
      val toks = r.getAs[String]("text").trim.split("\\s+")
      if (toks.length >= 2) (0 until toks.length - 1).foreach { i =>
        val b = toks(i) + " " + toks(i + 1)
        counts.update(b, counts.getOrElse(b, 0L) + 1L)
        nTotal += 1
      }
    }
    val want = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
    val got = graft.queries.CorpusOpsQueries.q104HeavyHitters(spark, sf).collect()
    assert(got.length == 20)
    got.zip(want).zipWithIndex.foreach { case ((row, (t, n)), i) =>
      assert(row.getAs[Int]("rnk") == i + 1)
      assert(row.getAs[String]("term") == t, s"rank ${i + 1}")
      assert(row.getAs[Long]("n") == n, s"rank ${i + 1} count")
    }
    // the exactness precondition: every true top-20 count must clear the
    // Misra-Gries superset threshold N/cap — with real margin, so the 10×
    // rehearsal (same scale-free distribution) inherits the guarantee
    val threshold = nTotal.toDouble / 1024
    assert(want.last._2 > threshold * 1.2,
      s"20th count ${want.last._2} too close to N/cap=$threshold for the " +
        "candidate pass to guarantee exactness")
  }

  test("q104 falls back to the exact census on a flat distribution and " +
    "the margin column flags the regime") {
    import spark.implicits._
    // crafted corpus: 3000 distinct bigrams, each count 1 → the 20th count
    // (1) is far below N/cap ≈ 2.9, so the Misra-Gries superset guarantee
    // does NOT hold and the candidate path would be unguaranteed
    val dir = java.nio.file.Files.createTempDirectory("q104flat").toString
    locally {
      (0 until 1500).map(i => (i.toLong, s"w${2 * i} w${2 * i + 1} w${2 * i} w${2 * i + 1}"))
        .toDF("doc_id", "text")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      // each doc contributes bigrams: (w_a w_b), (w_b w_a), (w_a w_b) →
      // actually "a b a b" yields a-b, b-a, a-b: counts 2 and 1 per doc,
      // all DISTINCT across docs → top-20 are the first 20 count-2 bigrams
      val got = graft.queries.CorpusOpsQueries.q104HeavyHitters(spark, dir).collect()
      assert(got.length == 20)
      // margin < 1 on every row: the MG threshold N/cap exceeds each count,
      // i.e. the output is flagged as the fallback (exact-census) regime
      got.foreach { r =>
        assert(r.getAs[Double]("margin") < 1.0,
          s"flat corpus must report margin < 1, got $r")
      }
      // and the output IS exact: count-2 bigrams ranked first, term asc
      val want = (0 until 1500).map(i => s"w${2 * i} w${2 * i + 1}")
        .sorted.take(20)
      got.zip(want).zipWithIndex.foreach { case ((row, t), i) =>
        assert(row.getAs[Int]("rnk") == i + 1)
        assert(row.getAs[String]("term") == t, s"rank ${i + 1}")
        assert(row.getAs[Long]("n") == 2L, s"rank ${i + 1} count")
      }
    }
  }

  test("q109 temperature sampling: selection set replays in plain Scala") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("lang"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byLang = docs.groupBy(_._2)
    val wMicro = byLang.view.mapValues(ds =>
      math.round(math.sqrt(ds.length.toDouble) * 1e6)).toMap
    val totW = wMicro.values.sum
    val target = docs.length.toLong / 4
    val want = byLang.map { case (lang, ds) =>
      val ranked = ds.map(_._1).sortBy(id => (md5Int(id.toString), id))
      val sel = ranked.zipWithIndex.filter { case (_, i) =>
        (i + 1).toLong * totW <= target * wMicro(lang)
      }.map(_._1)
      lang -> ((ds.length.toLong, sel.length.toLong, sel.sum))
    }
    val got = CurationQueries.q109TemperatureSampling(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (n, nSel, idSum) = want(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_selected") == nSel, r.getAs[String]("lang"))
      assert(r.getAs[Long]("sel_id_sum") == idSum, r.getAs[String]("lang"))
    }
    // α-flattening property: the smallest domain's realized sample RATE
    // strictly exceeds the largest domain's (that is the point of α < 1)
    val rates = got.map(r => r.getAs[Long]("n_docs") ->
      r.getAs[Long]("n_selected").toDouble / r.getAs[Long]("n_docs"))
    if (rates.map(_._1).distinct.length > 1) {
      assert(rates.minBy(_._1)._2 >= rates.maxBy(_._1)._2)
    }
  }

  test("q110 memorization census: gram overlap replays in plain Scala") {
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def grams(text: String): Set[Long] = {
      val toks = text.trim.split("\\s+", -1)
      val n = math.max(toks.length - 9, 1)
      (0 until n).map { i =>
        md5Int(toks.slice(i, math.min(i + 10, toks.length)).mkString(" "))
      }.toSet
    }
    def split(id: Long): String = {
      val b = md5Int(id.toString) % 100
      if (b < 80) "train" else if (b < 90) "val" else "test"
    }
    val trainGrams = docs.filter(d => split(d._1) == "train")
      .flatMap(d => grams(d._3)).toSet
    val vals = docs.filter(d => split(d._1) == "val")
    val want = vals.groupBy(_._2).map { case (lang, ds) =>
      val per = ds.map { d =>
        val g = grams(d._3)
        (g.size.toLong, g.count(trainGrams.contains).toLong)
      }
      lang -> ((ds.length.toLong, per.map(_._1).sum, per.map(_._2).sum,
        per.count(p => p._2 * 2 >= p._1).toLong))
    }
    val got = TextQueries.q110MemorizationCensus(spark, sf).collect()
    assert(got.length == want.size)
    got.foreach { r =>
      val (nDocs, nGrams, nSeen, nHigh) = want(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_val_docs") == nDocs)
      assert(r.getAs[Long]("n_grams") == nGrams, r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_seen") == nSeen, r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_high_exposure") == nHigh)
    }
  }

  test("q108 resample: grid totality, OHLC replay, gap forward-fill laws") {
    val ev = Tables.events(spark, sf)
    val rows = ev.select(col("event_type"), Tables.tsUs(ev).as("ts_us"),
        col("value")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val slotUs = 3600000000L
    val bySeries = rows.groupBy(_._1)
    val got = graft.queries.AsofQueries.q108ResampleFfill(spark, sf).collect()
    val gotBySeries = got.groupBy(_.getAs[String]("event_type"))
    assert(gotBySeries.keySet == bySeries.keySet)
    bySeries.foreach { case (et, es) =>
      val s0 = es.map(_._2).min / slotUs
      val s1 = es.map(_._2).max / slotUs
      val g = gotBySeries(et).sortBy(_.getAs[Long]("slot"))
      // totality: one row per slot of the series' span, in order
      assert(g.map(_.getAs[Long]("slot")).toSeq == (s0 to s1))
      var lastClose: Option[Double] = None
      g.foreach { r =>
        val slot = r.getAs[Long]("slot")
        val in = es.filter(e => e._2 / slotUs == slot)
        assert(r.getAs[Long]("n_events") == in.length)
        if (in.isEmpty) {
          assert(r.getAs[Int]("is_gap") == 1 && r.isNullAt(r.fieldIndex("c")))
          lastClose.foreach(c => assert(r.getAs[Double]("c_filled") == c))
        } else {
          val o = in.minBy(_._2)._3
          val c = in.maxBy(_._2)._3
          assert(r.getAs[Double]("o") == o && r.getAs[Double]("c") == c)
          assert(r.getAs[Double]("h") == in.map(_._3).max)
          assert(r.getAs[Double]("l") == in.map(_._3).min)
          assert(r.getAs[Double]("c_filled") == c && r.getAs[Int]("is_gap") == 0)
          lastClose = Some(c)
        }
      }
    }
  }
}
