package graft.data

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TableIOSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("iceberg-style layout round-trips and prunes partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tableio").toString
    val pages = WebPages.dataset(spark, 1000, 4)
    TableIO.write(pages, dir, buckets = 4)

    // layout: lang=<v>/url_bucket=<b>/ dirs
    val langDirs = new java.io.File(dir).listFiles.filter(_.isDirectory).map(_.getName)
    assert(langDirs.forall(_.startsWith("lang=")), langDirs.toSeq)
    val bucketDirs = new java.io.File(s"$dir/${langDirs.head}").listFiles
      .filter(_.isDirectory).map(_.getName)
    assert(bucketDirs.forall(_.startsWith("url_bucket=")), bucketDirs.toSeq)

    // full round-trip: same rows (url,text,lang), none lost or duplicated
    val back = TableIO.read(spark, dir)
    assert(back.count() == 1000)
    val orig = pages.select(col("url"), col("text")).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val rt = back.select(col("url"), col("text")).collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rt == orig)

    // partition-pruned read: only the lang=en dirs are scanned
    val en = TableIO.readLang(spark, dir, "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"), plan.take(600))
    assert(en.count() == pages.filter(col("lang") === "en").count())

    // bucket stability: recomputing the bucket of a read-back row matches
    // its partition dir value (stable across writes/appends)
    val mismatch = back
      .withColumn("recomputed", TableIO.urlBucket(4))
      .filter(col("recomputed") =!= col("url_bucket")).count()
    assert(mismatch == 0)
  }

  test("readUrl point lookup prunes to one bucket partition per language") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tableio-url").toString
    val pages = WebPages.dataset(spark, 1000, 4)
    TableIO.write(pages, dir, buckets = 4)
    val target = WebPages.url(WebPages.DefaultSeed, 123L)
    val hit = TableIO.readUrl(spark, dir, target, buckets = 4)
    // the bucket predicate must reach PartitionFilters (dir-level pruning)
    val plan = hit.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("url_bucket"),
      plan.take(600))
    val rows = hit.collect()
    assert(rows.map(_.getAs[String]("url")).toSeq == Seq(target))
    assert(rows.head.getAs[String]("text") == WebPages.text(WebPages.DefaultSeed, 123L))
    // absent url: pruned scan, zero rows
    assert(TableIO.readUrl(spark, dir, "https://nowhere.example/x", buckets = 4).count() == 0)
  }
}
