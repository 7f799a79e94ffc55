package graft

/** Plan-quality audit over SparkEntry queries: execute each named query
  * (cache-cleared) and report, from the FINAL adaptive plan, the number of
  * parquet scans, exchanges, reused exchanges/subqueries, and sort nodes.
  * A query whose final-plan scan count exceeds the number of distinct
  * tables it reads is re-executing a scan subtree some consumer branch
  * failed to share (see ngramJaccard's exchange-reuse notes in
  * pipeline/Dedup.scala) — invisible at sf0.01, a doubled corpus read at
  * 100 TB.
  *
  * Caveats when reading the counts: (a) plans that cache intermediate
  * frames print the cache-build subtree under each InMemoryRelation, so
  * their scans are counted once per cache CONSUMER even though they
  * execute once at cache fill (c_tfidf, c_simranks); (b) queries reading
  * k distinct tables legitimately show >= k scans; (c) a two-hop shape
  * (j_twohop, corpus-from-graph) reads the same table under two different
  * join keys — sharing that scan would trade against an extra full
  * shuffle, so two scans is the intended plan there.
  *
  * Usage: runMain graft.PlanAudit [queryName ...]   (default: all)
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = GraftSession.local(cpus, shufflePartitions = 32)
    spark.sparkContext.setLogLevel("ERROR")
    // SPARK_GRAFT_AUDIT_NOBROADCAST=1 scopes broadcast joins off so the
    // audit sees the web-scale plan shape: at 100 TB no join side of a
    // corpus-derived frame fits a broadcast, so scan sharing must come
    // from exchange reuse — duplicated scans here are real 2x corpus
    // reads at scale, while duplicated scans in the default (broadcast)
    // audit are small-scale AQE choices and usually fine.
    if (sys.env.get("SPARK_GRAFT_AUDIT_NOBROADCAST").contains("1")) {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    }
    val names =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name, sys.error(s"unknown query $name"))
      spark.catalog.clearCache()
      val df = fn(spark, sfDir)
      // run df's OWN queryExecution (count() would plan a separate query,
      // leaving this one's adaptive plan un-finalized with runtime
      // exchange reuse never applied) without collecting rows to the
      // driver
      df.queryExecution.toRdd.foreach(_ => ())
      val plan = df.queryExecution.executedPlan.toString
      val finalPlan = plan.linesIterator
        .takeWhile(!_.contains("== Initial Plan ==")).toSeq
      def n(p: String) = finalPlan.count(_.contains(p))
      println(s"""{"query":"$name","scans":${n("FileScan parquet")},""" +
        s""""exchanges":${n("Exchange hashpartitioning")},""" +
        s""""reused":${n("ReusedExchange")},"sorts":${n("Sort [")},""" +
        s""""inmem":${n("InMemoryTableScan")}}""")
    }
    spark.stop()
  }
}
