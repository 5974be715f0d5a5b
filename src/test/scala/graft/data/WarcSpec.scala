package graft.data

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def rec(id: String, uri: String, body: String) = Warc.WarcRecord(
    id, "response", "2026-01-02T03:04:05Z", uri, "text/plain",
    body.getBytes(UTF_8).length.toLong, Seq.empty, body.getBytes(UTF_8))

  test("codec round-trips records through plain and per-record-gzip streams") {
    val rs = Seq(rec("urn:a", "https://x/1", "hello world"),
      rec("urn:b", "https://x/2", "second\r\nbody with\nnewlines"))
    val out = new ByteArrayOutputStream()
    rs.foreach(Warc.writeRecord(out, _))
    val back = Warc.records(new ByteArrayInputStream(out.toByteArray), gzipped = false).toSeq
    assert(back.map(_.recordId) == Seq("urn:a", "urn:b"))
    assert(back.map(r => new String(r.content, UTF_8)) ==
      Seq("hello world", "second\r\nbody with\nnewlines"))
    assert(back.head.warcDate == "2026-01-02T03:04:05Z")
    assert(back.head.contentLength == 11L)

    val gz = new ByteArrayOutputStream()
    rs.foreach { r => // one member per record, the random-access layout
      val g = new java.util.zip.GZIPOutputStream(gz)
      Warc.writeRecord(g, r); g.finish()
    }
    val backGz = Warc.records(new ByteArrayInputStream(gz.toByteArray), gzipped = true).toSeq
    assert(backGz.map(r => new String(r.content, UTF_8)) == back.map(r => new String(r.content, UTF_8)))
  }

  test("skipContent skips payload bytes but keeps lengths and headers") {
    val out = new ByteArrayOutputStream()
    Seq(rec("urn:a", "u1", "x" * 1000), rec("urn:b", "u2", "tail")).foreach(Warc.writeRecord(out, _))
    val back = Warc.records(new ByteArrayInputStream(out.toByteArray),
      gzipped = false, skipContent = true).toSeq
    assert(back.map(_.content) == Seq(null, null))
    assert(back.map(_.contentLength) == Seq(1000L, 4L))
    assert(back.map(_.targetUri) == Seq("u1", "u2"))
  }

  test("folded header continuations and the headers map survive parsing") {
    val raw = "WARC/1.0\r\nWARC-Type: metadata\r\nX-Long: part one\r\n  part two\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n"
    val r = Warc.records(new ByteArrayInputStream(raw.getBytes(UTF_8)), gzipped = false).toSeq.head
    assert(r.headers.toMap.apply("X-Long") == "part one part two")
    assert(r.warcType == "metadata")
  }

  test("malformed version line and truncated payload fail loudly") {
    val bad = "HTTP/1.1 200 OK\r\n\r\n"
    assertThrows[java.io.IOException] {
      Warc.records(new ByteArrayInputStream(bad.getBytes(UTF_8)), gzipped = false).toSeq
    }
    val truncated = "WARC/1.0\r\nContent-Length: 100\r\n\r\nshort"
    assertThrows[java.io.EOFException] {
      Warc.records(new ByteArrayInputStream(truncated.getBytes(UTF_8)), gzipped = false).toSeq
    }
  }

  test("save + format(\"warc\") round-trips a DataFrame; one task per file") {
    val dir = Files.createTempDirectory("graft_warc_rt").toString
    val df = spark.range(100).select(
      concat(lit("https://ex.com/p/"), col("id")).as("url"),
      encode(concat(lit("body-"), col("id")), "UTF-8").as("content"),
      lit("text/plain").as("content_type"),
      to_timestamp(lit("2026-03-04 05:06:07")).as("warc_date"))
    val files = Warc.save(df.repartition(3), dir)
    assert(files == 3)
    val back = spark.read.format("warc").load(dir)
    assert(back.rdd.getNumPartitions == 3)
    assert(back.count() == 100)
    assert(back.filter(col("warc_type") === "response").count() == 100)
    assert(back.filter(decode(col("content"), "UTF-8") ===
      concat(lit("body-"), regexp_extract(col("url"), "/p/(\\d+)$", 1))).count() == 100)
    assert(back.select(date_format(col("warc_date"), "yyyy-MM-dd HH:mm:ss")).distinct()
      .as[String].collect().toSeq == Seq("2026-03-04 05:06:07"))
    // deterministic ids: a replayed save is byte-identical
    val before = Files.list(Paths.get(dir)).toArray.map(_.toString).sorted
      .map(p => java.util.Arrays.hashCode(Files.readAllBytes(Paths.get(p)))).toSeq
    Warc.save(df.repartition(3), dir)
    val after = Files.list(Paths.get(dir)).toArray.map(_.toString).sorted
      .map(p => java.util.Arrays.hashCode(Files.readAllBytes(Paths.get(p)))).toSeq
    assert(before == after)
    // task-commit protocol: every attempt writes to an attempt-scoped temp
    // path and renames on commit — no temp files may survive a save
    val names = Files.list(Paths.get(dir)).toArray.map(_.toString)
    assert(!names.exists(_.contains("_tmp-")), s"uncommitted temp files left: ${names.mkString(",")}")
    assert(names.count(_.endsWith(".warc.gz")) == 3)
  }

  test("reused-deflater gzip members: readable, concatenable, deterministic") {
    // payload shapes a crawl hits: empty, tiny, binary-with-all-bytes, large
    val payloads = Seq(
      Array.emptyByteArray,
      "x".getBytes(UTF_8),
      Array.tabulate(4096)(i => (i * 31 + 7).toByte),
      Array.tabulate(1 << 20)(i => (i % 251).toByte))
    def save(dir: java.nio.file.Path): Unit = {
      val df = payloads.zipWithIndex
        .map { case (p, i) => (s"https://m/$i", p) }.toDF("url", "content")
      Warc.save(df.coalesce(1), dir.toString)
    }
    val d1 = Files.createTempDirectory("graft_gzm1"); save(d1)
    val f1 = Files.list(d1).toArray.map(_.toString).filter(_.endsWith(".warc.gz")).head
    // GZIPInputStream must read the concatenated members natively
    val back = Warc.records(new java.io.BufferedInputStream(
      new java.io.FileInputStream(f1)), gzipped = true).toSeq
    assert(back.map(_.contentLength) == payloads.map(_.length.toLong))
    payloads.indices.foreach { i =>
      val r = back.find(_.targetUri == s"https://m/$i").get
      assert(java.util.Arrays.equals(r.content, payloads(i)), s"payload $i corrupted")
    }
    // byte-determinism: a replayed save produces the identical file
    val d2 = Files.createTempDirectory("graft_gzm2"); save(d2)
    val f2 = Files.list(d2).toArray.map(_.toString).filter(_.endsWith(".warc.gz")).head
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(f1)), Files.readAllBytes(Paths.get(f2))))
  }

  test("keep predicate filters on metadata and stream stays aligned past skipped payloads") {
    val out = new ByteArrayOutputStream()
    Seq(rec("urn:a", "https://a/1", "x" * 5000), rec("urn:b", "https://b/2", "keep me"),
      rec("urn:c", "https://a/3", "y" * 3000), rec("urn:d", "https://b/4", "also kept"))
      .foreach(Warc.writeRecord(out, _))
    val kept = Warc.records(new ByteArrayInputStream(out.toByteArray), gzipped = false,
      keep = r => r.targetUri.startsWith("https://b/")).toSeq
    assert(kept.map(_.recordId) == Seq("urn:b", "urn:d"))
    // payloads of the kept records are intact even though big neighbors were skipped
    assert(kept.map(r => new String(r.content, UTF_8)) == Seq("keep me", "also kept"))
  }

  test("http payload helpers split status/header/body; non-HTTP passes through") {
    val http = ("HTTP/1.1 301 Moved\r\nLocation: https://ex.com/new\r\n" +
      "Content-Type: text/html; charset=utf-8\r\n\r\n<html>hi</html>").getBytes(UTF_8)
    // body with a non-UTF8 byte: the split must be byte-preserving
    val bin = "HTTP/1.1 200 OK\r\nContent-Type: application/octet-stream\r\n\r\n"
      .getBytes(UTF_8) ++ Array[Byte](0, -1, 127, -128)
    val raw = "not an http message at all".getBytes(UTF_8)
    val df = Seq(("a", http), ("b", bin), ("c", raw)).toDF("id", "content")
    val got = df.select(col("id"),
        Warc.httpStatus(col("content")).as("st"),
        Warc.httpHeader(col("content"), "content-type").as("ct"),
        Warc.httpHeader(col("content"), "Location").as("loc"),
        Warc.httpBody(col("content")).as("body"))
      .orderBy("id").collect()
    assert(got(0).getInt(1) == 301)
    assert(got(0).getString(2) == "text/html; charset=utf-8")
    assert(got(0).getString(3) == "https://ex.com/new")
    assert(new String(got(0).getAs[Array[Byte]]("body"), UTF_8) == "<html>hi</html>")
    assert(got(1).getInt(1) == 200)
    assert(got(1).getAs[Array[Byte]]("body").toSeq == Seq[Byte](0, -1, 127, -128))
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
    assert(got(2).getAs[Array[Byte]]("body").toSeq == raw.toSeq) // pass-through
  }

  test("metadata filters push into the scan and results stay exact") {
    val dir = Files.createTempDirectory("graft_warc_pushdown").toString
    Warc.save(spark.range(200).select(
      concat(lit("https://site-"), col("id") % 4, lit(".ex/p/"), col("id")).as("url"),
      encode(concat(lit("body-"), col("id"), lit("-"),
        // ids divisible by 10 get a much larger payload
        when(col("id") % 10 === 1, lpad(lit("z"), 500, "z")).otherwise(lit(""))), "UTF-8")
        .as("content")), dir)
    val df = spark.read.format("warc").load(dir)
      .filter(col("url").startsWith("https://site-1.") && col("content_length") < 100)
    val scanLine = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("PushedFilters: [") && scanLine.contains("StringStartsWith"),
      scanLine)
    assert(scanLine.contains("LessThan(content_length"), scanLine)
    // exactness: same rows as post-filtering an unfiltered read
    val expect = spark.read.format("warc").load(dir).collect()
      .filter(r => r.getAs[String]("url").startsWith("https://site-1.")
        && r.getAs[Long]("content_length") < 100)
      .map(_.getAs[String]("url")).sorted.toSeq
    assert(df.select("url").collect().map(_.getString(0)).sorted.toSeq == expect)
    assert(expect.size == 40) // 50 site-1 urls minus the 10 big ones (id ≡ 1 mod 20)
  }

  test("readStream ingests new warc files exactly once, across a restart") {
    val watch = Files.createTempDirectory("graft_warc_stream").toString
    val ckpt = Files.createTempDirectory("graft_warc_ckpt").toString

    def addFiles(tag: String, lo: Int, hi: Int): Unit = {
      val tmp = Files.createTempDirectory(s"graft_warc_b$tag").toString
      Warc.save(spark.range(lo, hi).select(
        concat(lit("https://ex.com/"), col("id")).as("url"),
        encode(concat(lit("b"), col("id")), "UTF-8").as("content"))
        .repartition(2), tmp)
      Files.list(Paths.get(tmp)).toArray.map(_.toString).filter(_.endsWith(".warc.gz"))
        .zipWithIndex.foreach { case (f, i) =>
          Files.copy(Paths.get(f), Paths.get(watch, s"$tag-$i.warc.gz"))
        }
    }

    val outDir = Files.createTempDirectory("graft_warc_sink").toString
    addFiles("a", 0, 30)
    def start() = spark.readStream.format("warc").load(watch)
      .select(regexp_extract(col("url"), "/(\\d+)$", 1).cast("long").as("id"))
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).start()
    def ids(): Seq[Long] = spark.read.parquet(outDir).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq
    val q1 = start()
    q1.processAllAvailable()
    assert(ids() == (0L until 30L))
    addFiles("b", 30, 50)
    q1.processAllAvailable()
    assert(ids() == (0L until 50L)) // every id exactly once
    q1.stop()
    // restart from the checkpoint: a/b must NOT replay, c must land
    addFiles("c", 50, 60)
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    assert(ids() == (0L until 60L), s"restart broke exactly-once: ${ids().size} rows")
  }

  test("maxFilesPerTrigger bounds each micro-batch; backlog drains in steps") {
    val watch = Files.createTempDirectory("graft_warc_mft").toString
    val ckpt = Files.createTempDirectory("graft_warc_mft_ck").toString
    val outDir = Files.createTempDirectory("graft_warc_mft_out").toString
    // a 6-file backlog BEFORE the stream starts
    (0 until 6).foreach { i =>
      val tmp = Files.createTempDirectory(s"graft_mft_$i").toString
      Warc.save(spark.range(i * 10, i * 10 + 10).select(
        concat(lit("https://ex.com/"), col("id")).as("url"),
        encode(col("id").cast("string"), "UTF-8").as("content")).coalesce(1), tmp)
      val f = Files.list(Paths.get(tmp)).toArray.map(_.toString)
        .filter(_.endsWith(".warc.gz")).head
      Files.copy(Paths.get(f), Paths.get(watch, f"backlog-$i%02d.warc.gz"))
    }
    val q = spark.readStream.format("warc")
      .option("maxFilesPerTrigger", "2").load(watch)
      .select(regexp_extract(col("url"), "/(\\d+)$", 1).cast("long").as("id"))
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    q.stop()
    assert(spark.read.parquet(outDir).select("id").collect()
      .map(_.getLong(0)).sorted.toSeq == (0L until 60L))
    assert(batches.length == 3, s"expected 3 capped batches, got ${batches.length}")
    assert(batches.forall(_.numInputRows == 20L),
      batches.map(_.numInputRows).mkString(","))
  }

  test("scan reports statistics: a small warc dim broadcasts in a join") {
    val dir = Files.createTempDirectory("graft_warc_stats").toString
    Warc.save(spark.range(50).select(
      concat(lit("https://d/"), col("id")).as("url"),
      encode(col("id").cast("string"), "UTF-8").as("content")), dir)
    val dim = spark.read.format("warc").load(dir)
      .select(regexp_extract(col("url"), "/(\\d+)$", 1).cast("long").as("k"),
        col("content_length"))
    val fact = spark.range(100000).select(col("id").as("k"), (col("id") * 2).as("v"))
    val joined = fact.join(dim, "k")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(joined.count() == 50)
  }

  test("column pruning reaches the BatchScan (content never buffered)") {
    val dir = Files.createTempDirectory("graft_warc_prune").toString
    Warc.save(spark.range(10).select(
      concat(lit("u"), col("id")).as("url"),
      encode(lit("payload"), "UTF-8").as("content")), dir, gzip = false)
    val meta = spark.read.format("warc").load(dir).select("url", "content_length")
    val scanLine = meta.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("BatchScan")).getOrElse("")
    assert(scanLine.contains("schema=url,content_length"), scanLine)
    assert(!scanLine.contains("content_type"), scanLine)
    assert(meta.agg(sum("content_length")).head.getLong(0) == 70L)
  }
}
