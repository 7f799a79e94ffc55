package graft

import org.apache.spark.sql.SparkSession

import graft.graph.PageRank
import graft.ingest.{Graphs, Pages}

/** Benchmark driver. Emits ONE JSON line:
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`
  * plus north-rule extras: PageRank edges/sec, supersteps/hour, and (when
  * SPARK_GRAFT_SCALING=1) the two-parallelism scaling efficiency
  * (local[8] vs local[32] on identical input — the sandbox stand-in for
  * N vs 4N executors).
  */
object Bench {

  private val headline = Seq(
    "g_pagerank", "g_components", "g_labelprop", "g_triangles",
    "a_wordcount", "a_cooccurrence", "w_topk", "j_twohop",
    "d_exact_dedup", "d_ngram_jaccard", "d_minhash_pairs", "e_ann_top1",
    "f_tidytitle", "t_tokencount")

  /** One full PageRank measurement on a synthesized web-graph: returns
    * (edges, supersteps, seconds). */
  private def pagerankRun(spark: SparkSession, nPages: Long, iters: Int)
      : (Long, Int, Double) = {
    val pages = Pages.synthesize(spark, nPages, seed = 42L,
      partitions = spark.sparkContext.defaultParallelism)
    val (_, edges) = Graphs.buildGraph(pages)
    val e = edges.cache()
    val m = e.count()
    val t0 = System.nanoTime()
    val r = PageRank.run(spark, e, maxIters = iters, tol = -1.0)
    r.ranks.count()
    val secs = (System.nanoTime() - t0) / 1e9
    e.unpersist()
    (m, r.supersteps, secs)
  }

  private def session(cores: Int): SparkSession = {
    val s = GraftSession.local(cores, shufflePartitions = 32)
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val scaling = sys.env.getOrElse("SPARK_GRAFT_SCALING", "1") == "1"
    val prPages = sys.env.getOrElse("SPARK_GRAFT_PR_PAGES", "200000").toLong
    val prIters = 5

    var spark = session(cpus)

    val results = headline.flatMap { name =>
      SparkEntry.queries.get(name).map { fn =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count() }
        catch { case _: Throwable => -1L }
        name -> (System.nanoTime() - t0) / 1e9
      }
    }

    // north-rule PageRank throughput at full parallelism
    val (edgesN, steps, prSecs) = pagerankRun(spark, prPages, prIters)
    val edgesPerSec = edgesN.toDouble * steps / prSecs
    val superstepsPerHour = steps / prSecs * 3600.0

    // two-parallelism scaling evidence: local[8] vs the local[cpus] run
    val scalingJson = if (scaling) {
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val s8 = session(8)
      val (_, steps8, secs8) = pagerankRun(s8, prPages, prIters)
      s8.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
      val eps8 = edgesN.toDouble * steps8 / secs8
      val efficiency = edgesPerSec / (4.0 * eps8)
      spark = session(cpus)
      f""","scaling":{"edges_per_sec_8":$eps8%.1f,"edges_per_sec_$cpus":$edgesPerSec%.1f,"efficiency_8_to_$cpus":$efficiency%.4f}"""
    } else ""

    val qs = (results :+ ("pagerank_5steps_200k" -> prSecs))
      .map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum + prSecs
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir","pagerank":{"edges":$edgesN,"supersteps":$steps,"secs":$prSecs%.3f,"edges_per_sec":$edgesPerSec%.1f,"supersteps_per_hour":$superstepsPerHour%.1f}$scalingJson}""")
    spark.stop()
  }
}
