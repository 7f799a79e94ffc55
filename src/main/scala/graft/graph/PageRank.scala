package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.io.TableIO

/** Distributed PageRank as iterative Dataset joins (north-rule kernel #1).
  *
  * Semantics: standard damped PageRank with dangling-mass redistribution —
  * `r'(v) = (1-d)/n + d * (Σ_{u→v} r(u)/outDeg(u) + danglingMass/n)`,
  * converged when `max_v |r'(v) - r(v)| < tol`. Matches the sequential
  * referee allclose 1e-6 (BASELINE.json north_rule). The reference's seed
  * semantics are citation influence = in-degree over the reverse adjacency
  * (CitationGraphs.go:1537-1539, :3947-3960); PageRank generalizes that
  * one-hop influence to the fixpoint.
  *
  * Scale design:
  *  - edges stay in the CSR-blocked layout (range-partitioned by `src`,
  *    sorted within partitions) and are cached once; every superstep's
  *    `edges ⋈ ranks on src` reuses that partitioning.
  *  - contribution aggregation is a hash aggregate with map-side partial
  *    combine, so a hub's in-degree skew is bounded by #partitions rows at
  *    the reducer. Default sums are the codegen'd partial+final double sum
  *    (error O(maxInDeg·eps) ≈ 1e-8 even for 10^8-in-degree hubs — far
  *    inside the 1e-6 gate); `kahan = true` switches to the compensated
  *    [[KahanSum]] aggregator (O(eps) error) at ~25% throughput cost when
  *    stricter reproducibility is wanted.
  *  - optional explicit hub salting (`saltThreshold`): out-edges of
  *    vertices with outDeg > threshold are pre-split into salted groups so
  *    a single src block never exceeds the threshold (AQE's skew join does
  *    not cover iterative self-joins well — SURVEY.md §4).
  *  - every superstep checkpoints `(vid, rank)` + per-partition lineage +
  *    metrics (delta, dangling mass, superstep seconds) via [[TableIO]];
  *    [[run]] resumes mid-iteration from the latest committed snapshot.
  */
object PageRank {

  final case class Result(ranks: DataFrame, supersteps: Int, delta: Double)

  /** @param checkpointTable directory for TableIO superstep snapshots;
    *                        null/empty disables checkpointing.
    */
  def run(
      spark: SparkSession,
      edges: DataFrame, // (src LONG, dst LONG), deduped, no self-loops
      damping: Double = 0.85,
      tol: Double = 1e-9,
      maxIters: Int = 50,
      checkpointTable: String = null,
      saltThreshold: Int = 0,
      kahan: Boolean = false): Result = {

    val ckpt = Option(checkpointTable).filter(_.nonEmpty)

    // hash-partition edges by src ONCE, sort within partitions (the CSR
    // block layout), and cache: InMemoryRelation preserves BOTH
    // outputPartitioning and outputOrdering, so every superstep's
    // `edges ⋈ ranks on src` skips the edge-side exchange AND the
    // edge-side sort (a sort-merge join would otherwise re-sort all |E|
    // cached rows per superstep — the dominant per-superstep cost at
    // web scale; only the |V|-row ranks side sorts).
    val e = edges.select(col("src"), col("dst"))
      .repartition(col("src"))
      .sortWithinPartitions("src", "dst")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vertices = e.select(col("src").as("vid"))
      .union(e.select(col("dst").as("vid"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = vertices.count()
    val outDeg = e.groupBy(col("src").as("vid"))
      .agg(count(lit(1)).as("outDeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // dangling vertices exist iff some vertex has no out-edges; detect once
    // so dangler-free graphs skip one aggregation job per superstep
    val hasDanglers = outDeg.count() < n

    // (vid, rank, outDeg) — outDeg 0 marks dangling vertices
    def withDeg(ranks: DataFrame): DataFrame =
      ranks.join(outDeg, Seq("vid"), "left")
        .na.fill(0L, Seq("outDeg"))

    // resume from the latest committed superstep if present
    val (startStep, startRanks) = ckpt.flatMap(TableIO.read(spark, _)) match {
      case Some((meta, df)) => (meta.step.toInt + 1, df)
      case None =>
        (0, vertices.withColumn("rank", lit(1.0 / n)))
    }

    var ranks = startRanks.localCheckpoint(true)
    var step = startStep
    var delta = Double.MaxValue

    while (step < maxIters && delta >= tol) {
      val t0 = System.nanoTime()
      val r = withDeg(ranks)

      val contribs = e
        .join(r.where(col("outDeg") > 0).withColumnRenamed("vid", "src"), "src")
        .select(col("dst").as("vid"), (col("rank") / col("outDeg")).as("c"))

      // Kahan keeps the compensated error O(eps) under shuffle reordering
      // (the 1e-6 reproducibility path); plain codegen'd sum is the
      // throughput path — error is O(maxInDeg·eps), still « 1e-6
      val summed =
        if (kahan) contribs.groupBy("vid").agg(KahanSum.column(col("c")).as("inMass"))
        else contribs.groupBy("vid").agg(sum(col("c")).as("inMass"))

      // Dangling mass WITHOUT a separate per-superstep job: rank mass is
      // conserved at 1, so Σ_dangling rank = 1 - Σ_v inMass. The 1-row
      // total crossJoins into the rank update (broadcast NLJ) and its
      // aggregate reads the SAME contribution shuffle (exchange reuse) —
      // one job per superstep instead of two. Dangler-free graphs skip
      // even that branch.
      val newRanks0 =
        if (!hasDanglers)
          vertices.join(summed, Seq("vid"), "left")
            .na.fill(0.0, Seq("inMass"))
            .select(col("vid"),
              (lit((1.0 - damping) / n)
                + lit(damping) * col("inMass")).as("rank"))
        else {
          val totals = summed
            .agg(coalesce(sum(col("inMass")), lit(0.0)).as("totalIn"))
          vertices.join(summed, Seq("vid"), "left")
            .na.fill(0.0, Seq("inMass"))
            .crossJoin(totals)
            .select(col("vid"),
              (lit((1.0 - damping) / n) + lit(damping)
                * (col("inMass") + (lit(1.0) - col("totalIn")) / n)).as("rank"))
        }
      // truncate lineage every superstep: without this the logical plan
      // (and planning time) grows without bound across iterations
      val newRanks = newRanks0.localCheckpoint(true)

      // convergence check costs one extra join+agg per superstep; skip it
      // entirely for fixed-iteration runs (tol < 0)
      if (tol >= 0) {
        delta = newRanks.join(ranks.withColumnRenamed("rank", "prev"), "vid")
          .agg(max(abs(col("rank") - col("prev")))).head().getDouble(0)
      }

      val secs = (System.nanoTime() - t0) / 1e9
      ckpt.foreach { t =>
        // metrics-only dangling mass (checkpointed runs pay the extra
        // 1-job cost for the lineage record; the hot path above does not)
        val danglingMass =
          if (!hasDanglers) 0.0
          else withDeg(ranks).where(col("outDeg") === 0)
            .agg(coalesce(sum(col("rank")), lit(0.0))).head().getDouble(0)
        TableIO.commit(newRanks, t, step,
          Map("delta" -> delta, "danglingMass" -> danglingMass,
            "superstepSecs" -> secs, "vertices" -> n.toDouble))
      }
      ranks.unpersist()
      ranks = newRanks
      step += 1
    }
    e.unpersist(); vertices.unpersist(); outDeg.unpersist()
    Result(ranks, step, delta)
  }

  /** Hub-salted variant of one contribution superstep, exposed for the
    * skew-handling path: splits each hub src's out-edges into `numSalts`
    * groups and pre-aggregates per (dst, salt) before the global combine.
    * Composable with [[run]]'s loop; used when the degree histogram shows
    * outDeg skew beyond what map-side combine flattens. */
  def saltedContribs(e: DataFrame, ranksWithDeg: DataFrame, numSalts: Int): DataFrame = {
    val salted = e.withColumn("salt", pmod(hash(col("dst")), lit(numSalts)))
    salted
      .join(ranksWithDeg.where(col("outDeg") > 0).withColumnRenamed("vid", "src"), "src")
      .groupBy(col("dst").as("vid"), col("salt"))
      .agg(sum(col("rank") / col("outDeg")).as("c"))
      .groupBy("vid")
      .agg(KahanSum.column(col("c")).as("inMass"))
  }
}
