package graft

import org.apache.spark.sql.SparkSession

import graft.graph.PageRank
import graft.ingest.{Graphs, Pages}

/** Standalone scaling experiment: same input, same seed, warm JVM, measured
  * PageRank supersteps at two parallelism levels. Usage:
  *   runMain graft.ScalingProbe <nPages> <coresA> <coresB> <iters>
  */
object ScalingProbe {

  /** One session at `cores`: build+cache the graph, warm up 2 supersteps,
    * then time `iters` supersteps `reps` times and keep the fastest run
    * (VM-neighbor noise makes single timed runs unreliable; best-of-reps
    * within a warmed session is the standard defense). */
  def measure(cores: Int, nPages: Long, iters: Int, reps: Int = 2): (Long, Double) = {
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    val sp = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32").toInt
    // SPARK_GRAFT_CLUSTER=1: `cores` = executor count, each executor its
    // own JVM with fixed cores/heap (the faithful N-vs-4N proxy)
    val spark =
      if (sys.env.getOrElse("SPARK_GRAFT_CLUSTER", "0") == "1")
        GraftSession.localCluster(workers = cores,
          coresPerWorker = sys.env.getOrElse("SPARK_GRAFT_WCORES", "4").toInt,
          memMB = sys.env.getOrElse("SPARK_GRAFT_WMEM", "6144").toInt,
          shufflePartitions = sp)
      else GraftSession.local(cores, shufflePartitions = sp)
    spark.sparkContext.setLogLevel("ERROR")
    val pages = Pages.synthesize(spark, nPages, seed = 42L,
      partitions = spark.sparkContext.defaultParallelism)
    val (_, edges) = Graphs.buildGraph(pages)
    val e = edges.cache()
    val m = e.count()
    val kahan = sys.env.getOrElse("SPARK_GRAFT_KAHAN", "1") == "1"
    // warm-up: 2 supersteps (JIT, codegen, cache priming)
    PageRank.run(spark, e, maxIters = 2, tol = -1.0, kahan = kahan).ranks.count()
    val secs = (0 until math.max(1, reps)).map { _ =>
      val t0 = System.nanoTime()
      PageRank.run(spark, e, maxIters = iters, tol = -1.0, kahan = kahan).ranks.count()
      (System.nanoTime() - t0) / 1e9
    }.min
    spark.stop()
    SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    (m, secs)
  }

  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 1000000L
    val coresA = if (args.length > 1) args(1).toInt else 8
    val coresB = if (args.length > 2) args(2).toInt else 32
    val iters = if (args.length > 3) args(3).toInt else 5

    // full-path JVM warm-up at BOTH core counts (discarded): the first
    // pipeline execution in a JVM pays JIT + codegen compilation that would
    // otherwise bias whichever config runs first
    measure(coresA, nPages / 5, 2)
    measure(coresB, nPages / 5, 2)

    val (mA, secsA) = measure(coresA, nPages, iters)
    val (mB, secsB) = measure(coresB, nPages, iters)
    val epsA = mA.toDouble * iters / secsA
    val epsB = mB.toDouble * iters / secsB
    val eff = epsB / (coresB.toDouble / coresA) / epsA
    println(f"""{"pages":$nPages,"edges":$mA,"iters":$iters,"cores_a":$coresA,"secs_a":$secsA%.2f,"eps_a":$epsA%.1f,"cores_b":$coresB,"secs_b":$secsB%.2f,"eps_b":$epsB%.1f,"efficiency":$eff%.4f}""")
  }
}
