package graft.data

import java.nio.file.Files

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def mkTable(n: Int, files: Int): String = {
    val dir = Files.createTempDirectory("graft_sidx").toString
    // range-partitioned so each file owns a contiguous id span — the
    // layout where data skipping has something to skip
    spark.range(0, n).select(col("id"),
        concat(lit("u"), col("id")).as("url"),
        (col("id") % 7).as("grp"))
      .repartitionByRange(files, col("id"))
      .write.mode("overwrite").parquet(dir)
    dir
  }

  test("build writes one index row per data file; sidecar invisible to plain reads") {
    val dir = mkTable(10000, 8)
    val nFiles = SketchIndex.build(spark, dir, "id")
    assert(nFiles == 8)
    val idx = SketchIndex.load(spark, dir, "id")
    assert(idx.columns.sorted.toSeq == Seq("bloom", "file", "max_key", "min_key", "nrows"))
    assert(idx.agg(sum("nrows")).head.getLong(0) == 10000L)
    // the underscore sidecar must not leak into normal table reads
    assert(spark.read.parquet(dir).count() == 10000L)
    assert(spark.read.parquet(dir).columns.toSet == Set("id", "url", "grp"))
  }

  test("point lookups read a strict subset of files and return exact rows") {
    val dir = mkTable(20000, 10)
    SketchIndex.build(spark, dir, "id")
    val keys = Seq("17", "9999", "19999")
    val (total, read) = SketchIndex.pruneStats(spark, dir, "id", keys)
    assert(total == 10)
    assert(read < total, s"no files skipped: $read of $total")
    val got = SketchIndex.readPruned(spark, dir, "id", keys)
      .select("id", "url").orderBy("id").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(17L, 9999L, 19999L))
    assert(got.map(_.getString(1)).toSeq == Seq("u17", "u9999", "u19999"))
  }

  test("string keys, misses, and bloom false positives stay exact") {
    val dir = mkTable(5000, 5)
    SketchIndex.build(spark, dir, "url")
    // present + absent keys: absent must yield zero rows even if a Bloom
    // false positive admits a file
    val got = SketchIndex.readPruned(spark, dir, "url", Seq("u42", "nope", "u4999"))
    assert(got.select("id").orderBy("id").collect().map(_.getLong(0)).toSeq == Seq(42L, 4999L))
    // all-miss lookup may read zero files and must return an empty frame
    val none = SketchIndex.readPruned(spark, dir, "url", Seq("zzz-missing"))
    assert(none.count() == 0)
    assert(none.columns.toSet == Set("id", "url", "grp"))
  }

  test("refresh indexes only appended files; stale rows for deleted files drop") {
    val dir = mkTable(8000, 4)
    assert(SketchIndex.build(spark, dir, "id") == 4)
    // append two more files (ids beyond the originals)
    spark.range(8000, 12000).select(col("id"),
        concat(lit("u"), col("id")).as("url"), (col("id") % 7).as("grp"))
      .repartitionByRange(2, col("id"))
      .write.mode("append").parquet(dir)
    val (fresh, total) = SketchIndex.refresh(spark, dir, "id")
    assert(fresh == 2, s"expected 2 new files indexed, got $fresh")
    assert(total == 6)
    // index equals a from-scratch rebuild, row for row
    val afterRefresh = SketchIndex.load(spark, dir, "id")
      .select("file", "nrows", "min_key", "max_key").orderBy("file").collect().toSeq
    SketchIndex.build(spark, dir, "id")
    val rebuilt = SketchIndex.load(spark, dir, "id")
      .select("file", "nrows", "min_key", "max_key").orderBy("file").collect().toSeq
    assert(afterRefresh == rebuilt)
    // lookups work through the refreshed sidecar across old and new files
    val got = SketchIndex.readPruned(spark, dir, "id", Seq("7999", "11999"))
      .select("id").orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(got == Seq(7999L, 11999L))
    // no-op refresh touches nothing
    assert(SketchIndex.refresh(spark, dir, "id") == ((0L, 6L)))
  }

  test("readRange prunes by zone maps and filters exactly") {
    val dir = Files.createTempDirectory("graft_sidx_rng").toString
    // zero-padded keys so string collation == numeric order
    spark.range(0, 9000).select(format_string("k%05d", col("id")).as("key"), col("id"))
      .repartitionByRange(9, col("key"))
      .write.mode("overwrite").parquet(dir)
    SketchIndex.build(spark, dir, "key")
    val files = SketchIndex.prunedFilesRange(spark, dir, "key", "k01000", "k01999")
    assert(files.nonEmpty && files.size < 9, s"read ${files.size} of 9")
    val got = SketchIndex.readRange(spark, dir, "key", "k01000", "k01999")
    assert(got.count() == 1000)
    assert(got.agg(min("id"), max("id")).head.toSeq == Seq(1000L, 1999L))
    // empty range reads nothing and returns an empty, schema-correct frame
    assert(SketchIndex.readRange(spark, dir, "key", "zzz", "zzzz").count() == 0)
  }

  test("partition-directory columns survive a pruned read (basePath)") {
    val dir = Files.createTempDirectory("graft_sidx_part").toString
    spark.range(0, 3000).select(col("id"), (col("id") % 3).as("lang"))
      .repartitionByRange(4, col("id"))
      .write.partitionBy("lang").mode("overwrite").parquet(dir)
    SketchIndex.build(spark, dir, "id")
    val got = SketchIndex.readPruned(spark, dir, "id", Seq("1234"))
    assert(got.columns.toSet == Set("id", "lang"))
    val r = got.collect()
    assert(r.length == 1 && r.head.getAs[Long]("id") == 1234L
      && r.head.getAs[Int]("lang") == (1234 % 3))
  }
}
