package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.io.TableIO

/** Synchronous label propagation (north-rule kernel #3).
  *
  * Each superstep, every vertex adopts the most frequent label among its
  * in-neighbors; ties break to the MINIMUM label (deterministic under any
  * partitioning — required for exact-match verification). Vertices with no
  * neighbors keep their label. Initial label = vid unless a seed frame is
  * given.
  *
  * Reference seed semantics: label assignment/refinement — GSDMM
  * one-topic-per-doc resampling (CitationGraphs.go:1747-1822), argmax
  * communities (:3236-3259), label histograms (:3886-3896) — generalized to
  * the synchronous propagation fixpoint.
  *
  * The per-vertex mode is computed as `groupBy(vid, label).count` followed
  * by a `row_number` window ordered `(count DESC, label ASC)` — both stages
  * shuffle on `vid`, so AQE reuses the exchange; no driver-side state.
  */
object LabelPropagation {

  /** @param checkpointEvery TableIO commit cadence in supersteps (with
    *                        checkpointTable set) — see
    *                        [[ConnectedComponents.hashMin]]. The final
    *                        superstep always commits. */
  def run(
      spark: SparkSession,
      edges: DataFrame,
      numIters: Int = 10,
      seedLabels: DataFrame = null, // (vid, label); default = vid
      checkpointTable: String = null,
      checkpointEvery: Int = 1): DataFrame = {
    val ckpt = Option(checkpointTable).filter(_.nonEmpty)
    // src-partition + sort ONCE before caching (CSR layout): distinct()'s
    // (src,dst) hash partitioning would force a full edge re-shuffle in
    // every iteration's join on src
    val sym = ConnectedComponents.symmetrize(edges)
      .repartition(col("src"))
      .sortWithinPartitions("src", "dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vertices = sym.select(col("src").as("vid")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val init = Option(seedLabels)
      .map(_.select(col("vid"), col("label")))
      .getOrElse(vertices.withColumn("label", col("vid")))

    val (startStep, start) = ckpt.flatMap(TableIO.read(spark, _)) match {
      case Some((meta, df)) => (meta.step.toInt + 1, df)
      case None => (0, init)
    }

    var labels = start.localCheckpoint(true)
    var step = startStep
    while (step < numIters) {
      val counts = sym
        .join(labels.withColumnRenamed("vid", "src"), "src")
        .groupBy(col("dst").as("vid"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy("vid").orderBy(desc("cnt"), asc("label"))
      val mode = counts
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("vid"), col("label").as("newLabel"))
      val next = labels
        .join(mode, Seq("vid"), "left")
        .select(col("vid"), coalesce(col("newLabel"), col("label")).as("label"))
        .localCheckpoint(true) // truncate lineage per superstep
      ckpt.foreach { t =>
        if ((step - startStep) % math.max(1, checkpointEvery) == 0 ||
            step == numIters - 1)
          TableIO.commit(next, t, step, Map.empty)
      }
      labels.unpersist()
      labels = next
      step += 1
    }
    sym.unpersist(); vertices.unpersist()
    labels
  }
}
