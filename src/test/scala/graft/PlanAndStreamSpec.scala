package graft

import org.apache.spark.sql.functions._

import graft.graph.PageRank
import graft.ingest.Pages
import graft.streaming.StreamIngest

/** Physical-plan quality gates (the 100-TB checklist, asserted):
  * predicate pushdown reaches the parquet scan, dimension joins broadcast,
  * cached edge partitioning is reused (no edge-side exchange per
  * superstep), whole-stage codegen covers the relational surface.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect() // force AQE final plan
    df.queryExecution.executedPlan.toString
  }

  test("filters are pushed down to the parquet scan") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val q = li.where($"l_quantity" > 45.0 && $"l_discount" < 0.05)
      .select("l_orderkey")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(l_quantity"), plan.take(800))
    // and the scan reads only the referenced columns
    val rs = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!rs.contains("l_extendedprice") && !rs.contains("l_shipdate"))
  }

  test("small dimension join is a broadcast join") {
    val o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val n = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val q = o.join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy("n_name").count()
    assert(executed(q).contains("BroadcastHashJoin"))
  }

  test("relational aggregations run inside whole-stage codegen") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val q = li.groupBy("l_returnflag").agg(sum("l_quantity"))
    // "*(n)" prefixes mark operators fused into a WholeStageCodegen stage
    val plan = executed(q)
    assert(plan.contains("*(1) HashAggregate") || plan.contains("*(2) HashAggregate"),
      plan.take(800))
  }

  test("vocab id assignment has no single-partition exchange or global window") {
    val docs = (0L until 200L).map(d => (d, s"w${d % 7} common w${d % 13} tail$d"))
      .toDF("doc", "text")
    val toks = graft.corpus.Corpus.tokens(docs, "doc", "text")
    val v = graft.corpus.Corpus.vocab(toks)
    v.collect()
    val plan = v.queryExecution.executedPlan.toString
    // the old implementation funneled every term through
    // `Window.orderBy(...)` = Exchange SinglePartition; the zipWithIndex
    // rewrite must never do that
    assert(!plan.contains("SinglePartition"), plan.take(1200))
    assert(!plan.contains("Window"), plan.take(1200))
    // ids are still the dense first-seen order (0..n-1)
    val ids = v.select("word").as[Int].collect().sorted
    assert(ids.toSeq == (0 until ids.length))
  }

  test("PageRank superstep: cached CSR edges are neither re-shuffled nor re-sorted") {
    val pages = Pages.synthesize(spark, 2000, 42L, 8)
    val (_, edges) = graft.ingest.Graphs.buildGraph(pages)
    // replicate the kernel's layout: hash-partition by src + sort within
    // partitions (CSR blocks) + cache
    val e = edges.repartition($"src").sortWithinPartitions("src", "dst").cache()
    e.count()
    val ranks = e.select($"src".as("vid")).distinct()
      .withColumn("rank", lit(1.0)).cache()
    ranks.count()
    // force the sort-merge path (at web scale the ranks side never
    // broadcasts) so the edge-side sort-elimination is what's tested
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val contribs = e.join(ranks.withColumnRenamed("vid", "src"), "src")
        .groupBy("dst").agg(sum($"rank").as("m"))
      contribs.collect()
      val plan = contribs.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(2000))
      // inspect only the superstep region ABOVE the edge-side cache scan
      // (everything below the first InMemoryRelation is the one-off cache
      // build, not per-superstep work). The tree prints the join's edge
      // (left) child first, so this region contains the final aggregate,
      // its exchange, the join, and the edge-side path — which must show
      // NO Exchange into the cache scan and NO Sort (the cached (src,dst)
      // ordering feeds the merge join directly).
      val top = plan.linesIterator
        .takeWhile(!_.contains("InMemoryRelation")).toSeq
      assert(top.exists(_.contains("InMemoryTableScan")), plan.take(2000))
      val shuffles = top.count(_.contains("Exchange hashpartitioning"))
      assert(shuffles <= 1, // the groupBy(dst) exchange — PageRank itself
        s"expected <=1 shuffle above the edge cache scan, got $shuffles:\n${top.mkString("\n")}")
      val sorts = top.count(_.contains("Sort ["))
      assert(sorts == 0,
        s"edge side must not re-sort, got $sorts:\n${top.mkString("\n")}")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      e.unpersist(); ranks.unpersist()
    }
  }

  test("triangles perVertex reuses ONE cached canonical edge frame") {
    import graft.graph.Triangles
    val pages = Pages.synthesize(spark, 1000, 7L, 4)
    val (_, edges) = graft.ingest.Graphs.buildGraph(pages)
    try {
      val pv = Triangles.perVertex(edges)
      pv.count() // fill the caches
      // the canonical (distinct u<v) frame is cached, so every consumer —
      // degree build, orientation join, and the vertex-universe branch —
      // reads one InMemoryRelation instead of re-running the distinct
      // shuffle (round-4 defect: perVertex ran canonical() twice)
      val canonCached = Triangles.canonical(edges).queryExecution.withCachedData
      assert(canonCached.isInstanceOf[
        org.apache.spark.sql.execution.columnar.InMemoryRelation],
        s"canonical edge frame not served from cache:\n$canonCached")
      // and the final plan's live region (above the cache-build subtrees)
      // reads the cache
      val plan = pv.queryExecution.executedPlan.toString
      val live = plan.linesIterator
        .takeWhile(!_.contains("InMemoryRelation")).toSeq
      assert(live.exists(_.contains("InMemoryTableScan")), plan.take(2000))
    } finally spark.catalog.clearCache()
  }

  test("dedup self-joins read ONE shuffled subplan via exchange reuse") {
    // minhashCandidates / simhashCandidatesFp self-join a frame whose
    // subplan carries the expensive per-document hashing (signature /
    // fingerprint UDF over full text). Both repartition that frame on the
    // join key exactly once, so the second join side must be served as a
    // ReusedExchange (AQE reused stage) — document scan + hashing execute
    // once, not once per join side (2x the dominant cost at 100 TB).
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for (q <- Seq(
        graft.pipeline.Dedup.minhashCandidates(docs, "doc_id", "text")
          .select("id1", "id2"),
        graft.pipeline.Dedup.simhashCandidates(docs, "doc_id", "text",
          maxHamming = 3).select("id1", "id2"))) {
      val plan = executed(q)
      val finalPlan = plan.linesIterator
        .takeWhile(!_.contains("== Initial Plan ==")).toSeq
      assert(finalPlan.exists(_.contains("ReusedExchange")), plan.take(3000))
      assert(finalPlan.count(_.contains("FileScan parquet")) == 1,
        plan.take(3000))
    }
  }

  test("ngram Jaccard reads the document scan ONCE via a shared gram exchange") {
    // ngramJaccard repartitions the exploded gram table by gram before
    // fanning out to its consumers (per-doc sizes, gram document
    // frequencies, the AllPairs prefix join, the exact-verify joins), so
    // the physical plan must contain exactly ONE parquet scan of the
    // document table plus ReusedExchange nodes for every further consumer
    // — the scan + tokenize + ngram explode run once, not once per
    // consumer (5 corpus rescans at 100 TB otherwise). Broadcast joins are
    // scoped off: that is the web-scale regime (no join side of the gram
    // table broadcasts at 100 TB), and at sf0.001 AQE would otherwise
    // broadcast the tiny self-join side, re-executing the scan into the
    // broadcast build instead of reading the shared exchange.
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      for (q <- Seq(
          // brute-force exact path: self-join + size joins
          graft.pipeline.Dedup.ngramJaccard(docs, "doc_id", "text", n = 3),
          // AllPairs prefix-filter path: df counts + prefix self-join +
          // exact verify — the widest consumer fan-out
          graft.pipeline.Dedup.ngramJaccard(docs, "doc_id", "text", n = 3,
            minJaccard = 0.4))) {
        val plan = executed(q)
        val finalPlan = plan.linesIterator
          .takeWhile(!_.contains("== Initial Plan ==")).toSeq
        assert(finalPlan.exists(_.contains("ReusedExchange")), plan.take(3000))
        assert(finalPlan.count(_.contains("FileScan parquet")) == 1,
          plan.take(3000))
      }
    } finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("dangling-mass total reads the contribution shuffle via exchange reuse") {
    // replicate the PageRank superstep's dangling branch UNDER THE
    // KERNEL'S EXECUTION CONDITIONS (AQE off — PageRank.run scopes it off
    // precisely because AQE's stage cache misses this reuse and executes
    // the contribution shuffle twice): the 1-row totalIn aggregate and the
    // rank-update join both read `summed` — the physical plan must contain
    // a ReusedExchange (one contribution shuffle per superstep, not two)
    // zipf graph with planted danglers; broadcast threshold lowered so the
    // |V|-row summed side does NOT broadcast (as at web scale) while the
    // 1-row totals still rides a BroadcastNestedLoopJoin
    val edges = (graft.graph.Referee.zipf(500, 2000, 42L) ++
      Seq((1L, 9001L), (2L, 9002L))).toDF("src", "dst")
    val e = edges.repartition($"src").sortWithinPartitions("src", "dst").cache()
    e.count()
    val vertDeg = e.select($"src".as("vid"))
      .union(e.select($"dst".as("vid"))).distinct()
      .join(e.groupBy($"src".as("vid")).agg(count(lit(1)).as("outDeg")),
        Seq("vid"), "left")
      .na.fill(0L, Seq("outDeg")).cache()
    val n = vertDeg.count()
    val st = vertDeg.withColumn("rank", lit(1.0 / n))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val contribs = e
        .join(st.where($"outDeg" > 0).withColumnRenamed("vid", "src")
          .select($"src", ($"rank" / $"outDeg").as("c")), "src")
        .select($"dst".as("vid"), $"c")
      val summed = contribs.groupBy("vid").agg(sum($"c").as("inMass"))
      val totals = summed.agg(coalesce(sum($"inMass"), lit(0.0)).as("totalIn"))
      val q = vertDeg.join(summed, Seq("vid"), "left")
        .na.fill(0.0, Seq("inMass"))
        .crossJoin(totals)
        .select($"vid", (lit(0.15 / n) + lit(0.85)
          * ($"inMass" + (lit(1.0) - $"totalIn") / n)).as("rank"))
      val plan = executed(q)
      assert(plan.contains("ReusedExchange") || plan.contains("(reuse"),
        plan.take(3000))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      e.unpersist(); vertDeg.unpersist()
    }
  }
}

/** Streaming ingestion: AvailableNow micro-batch extracts the same edges
  * the batch path extracts. */
class StreamSpec extends SparkSpec {

  test("AvailableNow stream appends the batch-equivalent edge set") {
    val pagesDir = tmpDir("spages")
    val edgesDir = tmpDir("sedges")
    val ckpt = tmpDir("sckpt")
    val pages = Pages.synthesize(spark, 300, 42L, 4)
    pages.write.mode("overwrite").parquet(pagesDir)

    StreamIngest.ingestOnce(spark, pagesDir, edgesDir, ckpt)

    val streamed = spark.read.parquet(edgesDir)
      .select("src_url", "dst_url").collect().map(_.toString).sorted
    val batch = graft.ingest.LinkExtract.linkEdges(pages)
      .select("src_url", "dst_url").collect().map(_.toString).sorted
    assert(streamed.toSeq == batch.toSeq)

    // a second AvailableNow run with no new files appends nothing
    StreamIngest.ingestOnce(spark, pagesDir, edgesDir, ckpt)
    val again = spark.read.parquet(edgesDir).count()
    assert(again == batch.length.toLong)
  }
}
