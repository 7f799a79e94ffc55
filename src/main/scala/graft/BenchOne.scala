package graft

/** Time individual SparkEntry queries in one warmed session (bench-style,
  * local[SPARK_GRAFT_CPUS], sf dir from SPARK_GRAFT_SF_DIR). Emits one JSON
  * line per rep so regressions can be bisected without a full Bench run.
  *
  * Usage: runMain graft.BenchOne <queryName> [queryName ...] [-reps N]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val reps = args.sliding(2).collectFirst {
      case Array("-reps", n) => n.toInt }.getOrElse(2)
    val names = args.takeWhile(_ != "-reps")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, shufflePartitions = 32)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val secs = (0 until reps).map { _ =>
        // cache-cold per rep: drop leftover CacheManager entries (e.g.
        // triangles' cached canonical frame) so a rep never silently
        // reads a prior rep's materialized state
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"""{"query":"$name","reps":${secs.map(s => f"$s%.3f").mkString("[", ",", "]")},"best":${secs.min}%.3f}""")
    }
    spark.stop()
  }
}
