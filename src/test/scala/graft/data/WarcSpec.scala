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
