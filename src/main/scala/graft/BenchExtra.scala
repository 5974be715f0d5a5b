package graft

import org.apache.spark.sql.SparkSession

/** Optimization-round helper (guide §1): times individual declared queries
  * with the SAME session config and methodology as [[Bench]]'s headline
  * phase (local[32], 32 shuffle partitions, `.collect()` timed, cache
  * cleared between queries), min over `reps` runs, and optionally dumps
  * `.explain("formatted")` per query for the plan evidence in plans/r06.
  *
  * Usage:
  *   sbt "runMain graft.BenchExtra [reps] [q01_... q02_...]"
  *   SPARK_GRAFT_PLANS_DIR=plans/r06 SPARK_GRAFT_PLAN_SUFFIX=before \
  *     sbt "runMain graft.BenchExtra 1 q28_dedup_pathological"
  *
  * This main is measurement tooling only — the frozen [[Bench]] contract
  * is untouched.
  */
object BenchExtra {

  private val headline = Seq("q01_pricing_agg", "q02_bloom_semijoin", "q05_hll_accuracy",
    "q07_quantiles", "q10_dedup_exact", "q11_dedup_minhash", "q14_embed_knn",
    "q16_text_stats", "q19_salted_group", "q28_dedup_pathological",
    "q29_sharded_bloom_join", "q30_embed_neardup", "q33_theta_setops",
    "q35_paragraph_dedup", "q42_mg_heavyhitters", "q43_kll_range_partition")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // first arg is the rep count only when it parses as one; otherwise
    // every arg is a query name and reps default
    val repsOpt = args.headOption.flatMap(_.toIntOption)
    val reps = repsOpt.getOrElse(2)
    val nameArgs = if (repsOpt.isDefined) args.drop(1).toSeq else args.toSeq
    val names = if (nameArgs.nonEmpty) nameArgs else headline
    val plansDir = sys.env.get("SPARK_GRAFT_PLANS_DIR")
    val planSuffix = sys.env.getOrElse("SPARK_GRAFT_PLAN_SUFFIX", "before")

    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    // JIT/codegen warm-up outside any timed window
    s.range(20000000L).selectExpr("count(id)").head

    val queries = SparkEntry.queries
    val times = names.map { name =>
      val fn = queries(name)
      plansDir.foreach { pd =>
        val dir = new java.io.File(pd)
        dir.mkdirs()
        s.sparkContext.setJobDescription(s"$name: plan capture")
        val plan = try {
          fn(s, sfDir).queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
        } catch { case e: Throwable => s"explain failed: ${e.getMessage}" }
        s.catalog.clearCache()
        val w = new java.io.PrintWriter(new java.io.File(dir, s"${name}_$planSuffix.txt"))
        try w.write(plan) finally w.close()
      }
      val ts = (1 to reps).map { i =>
        s.sparkContext.setJobDescription(s"$name: timed rep $i")
        val t0 = System.nanoTime()
        val failed =
          try { fn(s, sfDir).collect(); false }
          catch { case e: Throwable =>
            System.err.println(s"[extra] $name FAILED: ${e.getMessage}"); true }
        val t = (System.nanoTime() - t0) / 1e9
        s.catalog.clearCache()
        // a crashed rep must never enter the min as a "fast" measurement
        if (failed) Double.NaN else t
      }
      System.err.println(f"[extra] $name reps=${ts.map(t => f"$t%.3f").mkString(",")}")
      val ok = ts.filterNot(_.isNaN)
      name -> (if (ok.isEmpty) Double.NaN else ok.min)
    }
    s.stop()
    val j = times.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    println(s"""{"extra_queries":$j,"sf":"$sfDir","reps":$reps}""")
  }
}
