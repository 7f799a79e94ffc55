package graft

/** Time individual SparkEntry queries in one warmed session (bench-style,
  * local[SPARK_GRAFT_CPUS], sf dir from SPARK_GRAFT_SF_DIR). Emits one JSON
  * line per rep so regressions can be bisected without a full Bench run.
  *
  * Usage: runMain graft.BenchOne <queryName> [queryName ...] [-reps N]
  *        runMain graft.BenchOne -kernels [-reps N] [-scale K]
  *
  * `-kernels` runs the native-expression vs reference-form (UDF/HOF) A/B
  * for the hot scalar kernels over the sf documents table, reps
  * INTERLEAVED (native, reference, native, ...) in one session — so a
  * multi-minute host phase hits both forms equally and the ratio is
  * meaningful even when absolute timings wobble (this box's documented
  * noise mode). Each form is forced through an aggregate that consumes
  * the kernel output (`max(element_at(...))` / `sum(size(...))`), since
  * a bare `select(...).count()` would let Catalyst prune the projection
  * and time nothing. */
object BenchOne {

  private def kernelAb(spark: org.apache.spark.sql.SparkSession,
      sfDir: String, reps: Int, scale: Int): Unit = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.DataFrame
    // replicate the input `scale`x: at sf0.1 a single pass sits at the
    // ~35-40 ms task-scheduling floor, which hides single-digit-ms kernel
    // deltas entirely — the A/B needs per-pass work well above that floor
    // to discriminate forms
    def rep(df: DataFrame): DataFrame =
      df.crossJoin(spark.range(scale.toLong).select(col("id").as("rep_i")))
        .repartition(32)
    val docs = rep(spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")))
    docs.persist().count() // pin input so scan cost drops out of the A/B
    val vecs = rep(spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id").as("id"), col("embedding").as("vec")))
    vecs.persist().count()
    // Each entry is a THUNK building a FRESH plan per invocation. This is
    // load-bearing: re-collecting the same DataFrame object reuses the
    // aggregate's shuffle-map stage (the DAGScheduler sees the same
    // lineage), and the map stage is where ALL the kernel work lives — a
    // reused-object rep times only the final reduce (~50 ms) and reads as
    // a 20x-too-fast kernel.
    val pairs: Seq[(String, () => DataFrame)] = Seq(
      "minhash_native" -> (() => docs.select(
        graft.functions.GraftExpressions.minhashSignature(col("text"), 5, 12).as("v"))
        .agg(max(element_at(col("v"), 1)))),
      "minhash_udf" -> (() => docs.select(
        graft.pipeline.Dedup.minhashSignatureUdf(col("text"), 5, 12).as("v"))
        .agg(max(element_at(col("v"), 1)))),
      "ngram3_distinct_native" -> (() => docs.select(
        graft.text.TextAnalysis.distinctWordNgrams(col("text"), 3).as("v"))
        .agg(sum(size(col("v"))))),
      "ngram3_distinct_hof" -> (() => docs.select(
        array_distinct(graft.text.TextAnalysis.wordNgramsHof(col("text"), 3)).as("v"))
        .agg(sum(size(col("v"))))),
      "normalize_native" -> (() => vecs.select(
        graft.pipeline.Ann.normalize(col("vec")).as("v"))
        .agg(max(element_at(col("v"), 1)))),
      "normalize_hof" -> (() => vecs.select(
        graft.pipeline.Ann.normalizeHof(col("vec")).as("v"))
        .agg(max(element_at(col("v"), 1)))),
      "stophits_native" -> (() => docs.select(
        graft.functions.GraftExpressions.stopHits(
          graft.text.TextAnalysis.tokens(col("text")), "en").as("v"))
        .agg(sum(col("v")))),
      "stophits_hof" -> (() => docs.select(
        graft.text.TextAnalysis.stopHitsHof(
          graft.text.TextAnalysis.tokens(col("text"))).as("v"))
        .agg(sum(col("v")))),
      "langid_native" -> (() => docs.select(
        graft.text.TextAnalysis.langId(col("text")).as("v"))
        .agg(count(when(col("v") === "en", 1)))),
      "langid_udf" -> (() => docs.select(
        graft.text.TextAnalysis.langIdUdf(
          graft.text.TextAnalysis.tokens(col("text"))).as("v"))
        .agg(count(when(col("v") === "en", 1)))),
      "hyperplane_native" -> (() => vecs.select(
        graft.pipeline.Ann.hyperplaneSignature(col("vec"), 8).as("v"))
        .agg(max(col("v")))),
      "hyperplane_udf" -> (() => vecs.select(
        graft.pipeline.Ann.hyperplaneSignatureUdf(col("vec"), 8).as("v"))
        .agg(max(col("v")))),
      "maxrun_native" -> (() => docs.select(
        graft.functions.GraftExpressions.maxSortedRun(
          graft.functions.GraftExpressions.wordNgrams(
            graft.text.TextAnalysis.tokens(col("text")), 2)).as("v"))
        .agg(sum(col("v")))),
      "maxrun_hof" -> (() => docs.select(
        graft.text.TextAnalysis.topRunHof(
          graft.functions.GraftExpressions.wordNgrams(
            graft.text.TextAnalysis.tokens(col("text")), 2)).as("v"))
        .agg(sum(col("v")))))
    // one untimed warm pass per form (codegen/JIT), then interleaved reps
    pairs.foreach(_._2().collect())
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
      .withDefaultValue(Nil)
    (0 until reps).foreach { _ =>
      pairs.foreach { case (name, mk) =>
        val df = mk()
        val t0 = System.nanoTime()
        df.collect()
        times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    pairs.foreach { case (name, _) =>
      val secs = times(name)
      println(f"""{"kernel":"$name","reps":${secs.map(s => f"$s%.3f").mkString("[", ",", "]")},"best":${secs.min}%.3f}""")
    }
    docs.unpersist(); vecs.unpersist()
  }

  def main(args: Array[String]): Unit = {
    val reps = args.sliding(2).collectFirst {
      case Array("-reps", n) => n.toInt }.getOrElse(2)
    val names = args.takeWhile(_ != "-reps")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, shufflePartitions = 32)
    spark.sparkContext.setLogLevel("ERROR")
    if (args.contains("-kernels")) {
      // -kernels is a mode, not a query: reject mixing so a typo'd
      // invocation fails loudly instead of silently benchmarking nothing
      // a digit token is legal ONLY as the value right after -scale; an
      // orphan number (forgotten flag) must fail, not silently run at the
      // default scale
      val legal = names.zipWithIndex.forall { case (f, i) =>
        f == "-kernels" || f == "-scale" ||
          (f.nonEmpty && f.forall(_.isDigit) && i > 0 && names(i - 1) == "-scale")
      }
      require(legal,
        s"-kernels cannot be combined with query names, got: ${names.mkString(" ")}")
      val scale = args.sliding(2).collectFirst {
        case Array("-scale", k) => k.toInt }.getOrElse(8)
      kernelAb(spark, sfDir, math.max(reps, 3), math.max(scale, 1))
      spark.stop()
      return
    }
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
