package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.ResultSink

/** Pins the sink semantics the reference's crash-resume relies on:
  * dynamic partition overwrite must replace exactly the partitions being
  * written and leave the rest intact; appends accumulate; TSV/JSONL round
  * trips preserve rows.
  */
class ResultSinkSpec extends GraftSuite {

  private def tmp(): String =
    Files.createTempDirectory("graft_sink").toString + "/t"

  test("append accumulates across writes, partition pruning columns kept") {
    import spark.implicits._
    val p = tmp()
    ResultSink.append(Seq(("g1", "A", 1.0), ("g1", "B", 2.0))
      .toDF("generation", "symbol", "metric"), p, Seq("generation", "symbol"))
    ResultSink.append(Seq(("g2", "A", 3.0)).toDF("generation", "symbol", "metric"),
      p, Seq("generation", "symbol"))
    val back = ResultSink.read(spark, p)
    assert(back.count() == 3)
    // partition directories exist → pruning axis is physical
    assert(new java.io.File(s"$p/generation=g1/symbol=A").exists())
  }

  test("dynamic partition overwrite replaces only the written partition (S4 resume)") {
    import spark.implicits._
    val p = tmp()
    ResultSink.append(Seq(("g1", "A", 1.0), ("g1", "B", 2.0), ("g2", "A", 3.0))
      .toDF("generation", "symbol", "metric"), p, Seq("generation", "symbol"))
    // re-run of (g1, A) with corrected value
    ResultSink.overwritePartitions(
      Seq(("g1", "A", 99.0)).toDF("generation", "symbol", "metric"),
      p, Seq("generation", "symbol"))
    val rows = ResultSink.read(spark, p)
      .select("generation", "symbol", "metric").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(rows == Set(("g1", "A", 99.0), ("g1", "B", 2.0), ("g2", "A", 3.0)),
      s"partitions corrupted: $rows")
  }

  test("TSV round trip (S5)") {
    import spark.implicits._
    val p = tmp()
    val df = Seq(("x", 1, 1.5), ("y", 2, -0.25)).toDF("name", "n", "v")
    ResultSink.writeTsv(df, p)
    val back = ResultSink.readTsv(spark, p).orderBy("name").collect()
    assert(back.length == 2)
    assert(back(0).getString(0) == "x" && back(0).getInt(1) == 1 && back(0).getDouble(2) == 1.5)
  }

  test("TSV round-trips embedded newlines and tabs (quoted multi-line fields)") {
    import spark.implicits._
    // pre-fix the reader was line-oriented: the quoted two-line field
    // split into two corrupt rows (r13 review)
    val p = tmp()
    val df = Seq(("a", "line1\nline2"), ("b", "tab\there"), ("c", "plain"))
      .toDF("k", "v")
    ResultSink.writeTsv(df, p)
    val back = ResultSink.readTsv(spark, p).orderBy("k").collect()
    assert(back.length == 3, back.mkString(";"))
    assert(back(0).getString(1) == "line1\nline2")
    assert(back(1).getString(1) == "tab\there")
  }

  test("JSONL keeps null-valued keys (stable key set per row)") {
    import spark.implicits._
    // pre-fix ignoreNullFields dropped the key, so an all-null column
    // vanished from the inferred read schema entirely (r13 review)
    val p = tmp()
    ResultSink.writeJsonl(
      Seq((1L, Option.empty[String]), (2L, Option.empty[String]))
        .toDF("config_id", "status"), p)
    val part = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".json")).head
    val lines = scala.io.Source.fromFile(part).getLines().toList
    assert(lines.forall(_.contains("\"status\":null")), lines.mkString("|"))
    val back = ResultSink.readJsonl(spark, p)
    assert(back.columns.contains("status"),
      s"all-null column lost from schema: ${back.columns.mkString(",")}")
  }

  test("Arrow re-export overwrites stale shards from a wider previous run") {
    // pre-fix a re-export with fewer partitions left the old tail shards
    // in place and the shard-parallel reader consumed mixed data
    val p = tmp()
    val wide = spark.range(100).repartition(8).toDF("id")
    ResultSink.writeArrow(wide, p)
    assert(new java.io.File(p).listFiles().count(_.getName.endsWith(".arrows")) > 4)
    val narrow = spark.range(10).repartition(2).toDF("id")
    ResultSink.writeArrow(narrow, p)
    val shards = new java.io.File(p).listFiles().filter(_.getName.endsWith(".arrows"))
    assert(shards.length <= 2, s"stale shards survived: ${shards.map(_.getName).mkString(",")}")
    assert(!new java.io.File(p).listFiles().exists(_.getName.contains(".tmp-")),
      "temp files must not survive the export")
  }

  test("JSONL round trip + append (S6/S9 telemetry)") {
    import spark.implicits._
    val p = tmp()
    ResultSink.writeJsonl(Seq((1L, "ok", 0.5)).toDF("config_id", "status", "score"), p)
    ResultSink.appendJsonl(Seq((2L, "fail", 0.0)).toDF("config_id", "status", "score"), p)
    val back = ResultSink.readJsonl(spark, p)
    assert(back.count() == 2)
    assert(back.filter(col("status") === "ok").count() == 1)
    // files are genuine JSON lines
    val part = new java.io.File(p).listFiles().filter(_.getName.endsWith(".json")).head
    val firstLine = scala.io.Source.fromFile(part).getLines().next()
    assert(firstLine.startsWith("{") && firstLine.endsWith("}"))
  }

  test("gzip JSONL round trip; files are genuinely compressed (S10)") {
    import spark.implicits._
    val p = tmp()
    val df = spark.range(500).select(col("id"),
      concat(lit("payload-"), col("id")).as("s"))
    ResultSink.writeJsonlGz(df, p)
    val files = new java.io.File(p).listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".json.gz")), files.mkString(","))
    val back = ResultSink.readJsonl(spark, p)
    assert(back.count() == 500)
    assert(back.agg(sum("id")).first().getLong(0) == (0L until 500L).sum)
  }

  test("Arrow IPC export round-trips through the public arrow reader (S7)") {
    import org.apache.arrow.memory.RootAllocator
    import org.apache.arrow.vector.ipc.ArrowStreamReader
    val p = tmp()
    val df = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_returnflag"))
    ResultSink.writeArrow(df, p, batchRows = 1000)
    val shards = new java.io.File(p).listFiles()
      .filter(_.getName.endsWith(".arrows")).sortBy(_.getName)
    assert(shards.nonEmpty)
    val allocator = new RootAllocator(Long.MaxValue)
    var rows = 0L
    var keySum = 0L
    var priceSum = 0.0
    var flags = Set.empty[String]
    shards.foreach { f =>
      val in = new java.io.FileInputStream(f)
      val r = new ArrowStreamReader(in, allocator)
      val root = r.getVectorSchemaRoot
      assert(root.getSchema.getFields.size() == 3)
      while (r.loadNextBatch()) {
        val n = root.getRowCount
        val keys = root.getVector("l_orderkey")
          .asInstanceOf[org.apache.arrow.vector.BigIntVector]
        val prices = root.getVector("l_extendedprice")
          .asInstanceOf[org.apache.arrow.vector.Float8Vector]
        val rf = root.getVector("l_returnflag")
          .asInstanceOf[org.apache.arrow.vector.VarCharVector]
        (0 until n).foreach { i =>
          keySum += keys.get(i); priceSum += prices.get(i)
          flags += new String(rf.get(i), java.nio.charset.StandardCharsets.UTF_8)
        }
        rows += n
      }
      r.close(); in.close()
    }
    allocator.close()
    val want = df.agg(count(lit(1)), sum("l_orderkey"),
      sum("l_extendedprice"), countDistinct("l_returnflag")).first()
    assert(rows == want.getLong(0))
    assert(keySum == want.getLong(1))
    assert(math.abs(priceSum - want.getDouble(2)) < 1e-6 * want.getDouble(2))
    assert(flags.size == want.getLong(3))
  }
}
