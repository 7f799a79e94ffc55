package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.graph.PageRank
import graft.ingest.{Graphs, Pages}
import graft.io.TableIO

/** Bench-scale checkpoint/resume drill (north rule: "resumable from
  * checkpoint with per-partition lineage + metrics"):
  *
  *   1. build the synthetic graph (same generator/seed as the bench),
  *   2. run PageRank for `total` supersteps WITH TableIO checkpointing —
  *      the truth run,
  *   3. wipe state back to superstep `crashAt` by replaying a fresh run
  *      that stops there (simulating a mid-job crash: HEAD points at
  *      `crashAt`, later snapshots never existed),
  *   4. resume from the table (PageRank.run picks up HEAD) for the
  *      remaining supersteps,
  *   5. compare resumed ranks against the truth run per vertex.
  *
  * With fixed-iteration runs the resumed computation replays the exact
  * same superstep sequence over the same cached edge partitioning, so the
  * comparison gate is exact equality of the final (vid, rank) rows, not
  * just allclose. Emits one JSON line.
  *
  * Usage: runMain graft.ResumeDrill [nPages] [totalSteps] [crashAt]
  */
object ResumeDrill {

  def main(args: Array[String]): Unit = {
    val nPages = if (args.length > 0) args(0).toLong else 10000000L
    val total = if (args.length > 1) args(1).toInt else 5
    val crashAt = if (args.length > 2) args(2).toInt else 2
    require(crashAt < total)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, shufflePartitions = 32)
    spark.sparkContext.setLogLevel("ERROR")

    val work = Files.createTempDirectory("graft-resume").toString
    val truthTable = s"$work/truth"
    val crashTable = s"$work/crash"

    val pages = Pages.synthesize(spark, nPages, seed = 42L,
      partitions = spark.sparkContext.defaultParallelism)
    val (_, edges) = Graphs.buildGraph(pages)
    val e = edges.cache()
    val m = e.count()

    // truth: uninterrupted run with checkpointing
    val truth = PageRank.run(spark, e, maxIters = total, tol = -1.0,
      checkpointTable = truthTable).ranks
      .withColumnRenamed("rank", "truthRank").cache()
    truth.count()

    // crash: same job stopped at `crashAt` supersteps (HEAD = crashAt-1
    // ... last committed step is crashAt-1; the job "dies" before step crashAt)
    PageRank.run(spark, e, maxIters = crashAt, tol = -1.0,
      checkpointTable = crashTable).ranks.count()
    val headAfterCrash = TableIO.currentSnapshot(crashTable).map(_.step).getOrElse(-1L)

    // resume: a NEW run call against the same table continues from HEAD
    val t0 = System.nanoTime()
    val resumed = PageRank.run(spark, e, maxIters = total, tol = -1.0,
      checkpointTable = crashTable).ranks
    val mismatches = resumed.join(truth, "vid")
      .where(col("rank") =!= col("truthRank")).count()
    val maxAbs = resumed.join(truth, "vid")
      .agg(coalesce(max(abs(col("rank") - col("truthRank"))), lit(0.0)))
      .head().getDouble(0)
    val resumeSecs = (System.nanoTime() - t0) / 1e9

    // lineage sanity: the crash table's history chains crashAt..total-1
    val hist = TableIO.history(crashTable).map(_.step)
    val lineageOk = hist == (0L until total.toLong)

    println(
      f"""{"drill":"pagerank_resume","pages":$nPages,"edges":$m,"total_supersteps":$total,"crash_after":$crashAt,"head_at_crash":$headAfterCrash,"resume_secs":$resumeSecs%.2f,"rank_mismatches":$mismatches,"max_abs_diff":$maxAbs%.3e,"lineage_steps_ok":$lineageOk,"exact":${mismatches == 0L}}""")
    spark.stop()
  }
}
