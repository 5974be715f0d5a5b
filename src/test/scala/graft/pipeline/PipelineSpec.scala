package graft.pipeline

import graft.SparkTestSession
import graft.core.BloomSketch
import graft.data.WebPages
import graft.functions._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("web page generator: deterministic and partitioning-invariant") {
    val a = WebPages.dataset(spark, 500, 4).collect().sortBy(_.url)
    val b = WebPages.dataset(spark, 500, 7).collect().sortBy(_.url)
    assert(a.length == 500)
    a.zip(b).foreach { case (x, y) =>
      assert(x.url == y.url && x.text == y.text && x.lang == y.lang)
      assert(x.html.toSeq == y.html.toSeq && x.warc_ts == y.warc_ts)
    }
  }

  test("per-row invariant: extractText(html) byte-identical to text, every row") {
    WebPages.dataset(spark, 2000, 4).collect().foreach { pg =>
      val extracted = WebPages.extractText(pg.html)
      assert(extracted == pg.text, s"row ${pg.url}")
      assert(extracted.getBytes("UTF-8").toSeq == pg.text.getBytes("UTF-8").toSeq)
    }
  }

  test("lang distribution is Zipf-skewed (en dominates)") {
    val counts = WebPages.dataset(spark, 5000, 4).groupBy($"lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") > 1200, s"en=${counts.get("en")}")
    assert(counts.size >= 8)
    assert(counts("en") > counts.getOrElse("nl", 0L) * 4)
  }

  test("salted two-level bloom == unsalted build, per group, bit for bit") {
    val df = WebPages.dataset(spark, 3000, 8).toDF()
    val unsalted = df.groupBy($"lang").agg(bloom_sketch($"url", 10000, 0.01f).as("sketch"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sketch").toSeq).toMap
    val salted = SketchPipeline.saltedGroupByBloom(df, "lang", "url", 10000, 0.01f, 16)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sketch").toSeq).toMap
    assert(salted.keySet == unsalted.keySet)
    salted.foreach { case (k, v) => assert(v == unsalted(k), s"lang $k") }
  }

  test("salted two-level hll == unsalted, generic helper") {
    val df = WebPages.dataset(spark, 3000, 8).toDF()
    val unsalted = df.groupBy($"lang").agg(hll_sketch($"url", 12).as("sketch"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sketch").toSeq).toMap
    val salted = SketchPipeline.saltedGroupBy(df, "lang", "url", 16,
        c => hll_sketch(c, 12), c => hll_merge_agg(c))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sketch").toSeq).toMap
    salted.foreach { case (k, v) => assert(v == unsalted(k), s"lang $k") }
  }

  test("partial sketches carry lineage + update counts; merge == direct build") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-parts").toString
    WebPages.dataset(spark, 2000, 5).toDF().write.mode("overwrite").parquet(s"$tmp/pages")
    val df = spark.read.parquet(s"$tmp/pages")
    val parts = SketchPipeline.partialBloomSketches(df, "url", 10000, 0.01f).collect()
    assert(parts.map(_.update_count).sum == 2000)
    assert(parts.forall(_.input_files.nonEmpty))
    assert(parts.map(_.partition_id).distinct.length == parts.length)
    val merged = parts.map(p => BloomSketch.deserialize(p.sketch)).reduceLeft(_ mergeInPlace _)
    val direct = df.agg(bloom_sketch($"url", 10000, 0.01f)).head.getAs[Array[Byte]](0)
    assert(merged.serialize().toSeq == direct.toSeq)
  }

  test("checkpoint/resume: kill mid-job, resume completes, result == uncheckpointed") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    WebPages.dataset(spark, 2000, 6).toDF().write.mode("overwrite").parquet(s"$tmp/pages")
    val files = spark.read.parquet(s"$tmp/pages").inputFiles.toSeq
    assert(files.length >= 4, s"need several files, got ${files.length}")
    // full, uncheckpointed oracle
    val direct = spark.read.parquet(s"$tmp/pages")
      .agg(bloom_sketch($"url".cast("string"), 10000, 0.01f)).head.getAs[Array[Byte]](0)
    // run 1: dies after 2 groups
    val died = intercept[RuntimeException] {
      SketchPipeline.buildBloomCheckpointed(spark, files, "url", 10000, 0.01f,
        s"$tmp/ckpt", numGroups = 4, simulateFailureAfter = 2)
    }
    assert(died.getMessage.contains("simulated failure"))
    // partial state exists for exactly the completed groups
    val doneDirs = new java.io.File(s"$tmp/ckpt").listFiles().count(_.getName.startsWith("group="))
    assert(doneDirs == 2)
    // run 2: resumes, only processes what's missing, completes
    val blob = SketchPipeline.buildBloomCheckpointed(spark, files, "url", 10000, 0.01f,
      s"$tmp/ckpt", numGroups = 4)
    assert(blob.toSeq == direct.toSeq)
    // run 3: fully idempotent (everything checkpointed, nothing recomputed)
    val blob2 = SketchPipeline.buildBloomCheckpointed(spark, files, "url", 10000, 0.01f,
      s"$tmp/ckpt", numGroups = 4, simulateFailureAfter = 0) // would throw if any group ran
    assert(blob2.toSeq == direct.toSeq)
  }

  test("generic checkpoint/resume covers the round-3 sketches (mg + bottom-k)") {
    import graft.functions.{mg_sketch, mg_merge, bottomk_sample, bk_merge}
    val tmp = java.nio.file.Files.createTempDirectory("graft-ckpt-mg").toString
    WebPages.dataset(spark, 2000, 6).toDF().write.mode("overwrite").parquet(s"$tmp/pages")
    val files = spark.read.parquet(s"$tmp/pages").inputFiles.toSeq
    val pages = spark.read.parquet(s"$tmp/pages")
    def viaCkpt(dir: String) = SketchPipeline.buildCheckpointed[(Array[Byte], Array[Byte])](
      spark, files,
      df => df.agg(mg_sketch($"lang", 8).as("mg"), bottomk_sample($"url", 20).as("bk")),
      parts => {
        val r = parts.agg(mg_merge($"mg").as("mg"), bk_merge($"bk").as("bk")).head
        (r.getAs[Array[Byte]]("mg"), r.getAs[Array[Byte]]("bk"))
      },
      s"$tmp/$dir", numGroups = 3)
    val (mgB, bkB) = viaCkpt("ck1")
    // bottom-k is an exact monoid: checkpointed == direct, bitwise
    val direct = pages.agg(bottomk_sample($"url", 20)).head.getAs[Array[Byte]](0)
    assert(bkB.toSeq == direct.toSeq)
    // mg bound survives the grouped build + blob re-merge
    val mg = graft.core.MgSketch.deserialize(mgB)
    val exact = pages.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(mg.totalCount == 2000L)
    exact.foreach { case (lang, cnt) =>
      assert(mg.estimate(lang) <= cnt && mg.estimate(lang) >= cnt - mg.errorBound)
    }
  }

  test("merge aggregates handle empty input (null result)") {
    val empty = spark.emptyDataFrame.withColumn("b", lit(Array.emptyByteArray)).limit(0)
    val r = WebPages.dataset(spark, 10, 2).toDF()
      .agg(bloom_sketch($"url", 100, 0.01f).as("sk"))
      .select(bloom_merge($"sk").as("m")) // merge over 1 row still works
    assert(r.head.getAs[Array[Byte]]("m") != null)
  }
}
