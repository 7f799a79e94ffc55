package graft

/** Dump `.explain("formatted")` for named SparkEntry queries to files —
  * the plan evidence for the optimization-round writeups (plans/r<N>/).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [queryName ...]
  *        (default queries: the Bench headline set)
  *
  * Writes `<outDir>/<query>_<suffix>.txt`. Separate main so the frozen
  * Bench harness stays untouched (guide §1.4/§7.2 tooling).
  */
object PlanDump {

  private val headline = Seq(
    "g_pagerank", "g_components", "g_labelprop", "g_triangles",
    "a_wordcount", "a_cooccurrence", "w_topk", "j_twohop",
    "d_exact_dedup", "d_ngram_jaccard", "d_minhash_pairs", "d_dup_clusters",
    "e_ann_top1", "e_ivf_top1", "f_tidytitle", "t_tokencount")

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <suffix> [query ...]")
    val outDir = args(0)
    val suffix = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq else headline
    new java.io.File(outDir).mkdirs()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, shufflePartitions = 32)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      spark.catalog.clearCache()
      val df = fn(spark, sfDir)
      // formatted mode of the df's own execution; iterative kernels
      // (pagerank/CC) return a localCheckpoint'd frame, so the plan shows
      // the final-state scan — for those the per-superstep plan shape is
      // asserted in PlanSpec instead
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${name}_$suffix.txt"), txt)
      println(s"wrote $outDir/${name}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
