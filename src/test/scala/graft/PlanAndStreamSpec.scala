package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.SparkPlan
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

  test("PageRank superstep: cached src-partitioned edges are not re-shuffled") {
    val pages = Pages.synthesize(spark, 2000, 42L, 8)
    val (_, edges) = graft.ingest.Graphs.buildGraph(pages)
    // replicate the kernel's layout: hash-partition by src + cache
    val e = edges.repartition($"src").cache()
    e.count()
    val ranks = e.select($"src".as("vid")).distinct()
      .withColumn("rank", lit(1.0)).cache()
    ranks.count()
    val contribs = e.join(ranks.withColumnRenamed("vid", "src"), "src")
      .groupBy("dst").agg(sum($"rank").as("m"))
    contribs.collect()
    val plan = contribs.queryExecution.executedPlan
    def countShuffles(p: SparkPlan): Int =
      (if (p.isInstanceOf[ShuffleExchangeExec]) 1 else 0) +
        p.children.map(countShuffles).sum +
        p.subqueries.map(countShuffles).sum
    val shuffles = plan.collect { case s: ShuffleExchangeExec => s }.size
    // the ONLY shuffles allowed are ranks-side alignment + the groupBy(dst);
    // the cached edge side must reuse its partitioning (0 edge exchanges)
    assert(shuffles <= 2, s"expected <=2 shuffles, got $shuffles:\n$plan")
    e.unpersist(); ranks.unpersist()
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
