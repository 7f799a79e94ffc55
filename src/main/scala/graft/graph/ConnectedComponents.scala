package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.io.TableIO

/** Connected components (north-rule kernel #2), two interchangeable
  * algorithms over the undirected (symmetrized) edge table:
  *
  *  - [[hashMin]]: synchronous min-label propagation — component id of v =
  *    min vid reachable from v; converges in O(diameter) supersteps. Simple,
  *    exact, and the semantics referee for the star variant.
  *  - [[smallStarLargeStar]]: the alternating small-star/large-star edge
  *    rewriting of Kiveris et al. ("Connected Components in MapReduce and
  *    Beyond", SoCC'14) — O(log n) rounds on high-diameter graphs, the
  *    scale path for 10^12-vertex web graphs.
  *
  * Both return `(vid LONG, component LONG)` with component = min member vid
  * (deterministic), and checkpoint per-superstep state via [[TableIO]].
  * The reference consumes CC semantics through its DBSCAN community
  * expansion (CitationGraphs.go:2873) — ε-threshold similarity graph
  * components; this kernel is that expansion made distributed.
  */
object ConnectedComponents {

  /** Symmetrize + dedup: every undirected edge present in both directions.
    *
    * Shape (guide §2.3 — shuffle fewer bytes): canonicalize each edge to
    * `(min, max)` FIRST and dedup that, then mirror the deduped set with a
    * narrow projection. The dedup exchange now carries |E| canonical rows
    * instead of the 2|E| rows the mirror-then-distinct form shuffled —
    * half the bytes through the only exchange of the operator, with an
    * identical output set (a directed pair and its reverse canonicalize to
    * the same row; the mirror of a strict-u<v set cannot collide with the
    * set itself, so no second distinct is needed). */
  def symmetrize(edges: DataFrame): DataFrame = {
    val canon = edges
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .where(col("src") =!= col("dst"))
      .distinct()
    canon.union(canon.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** @param checkpointEvery TableIO commit cadence in supersteps (with
    *                        checkpointTable set): an executor loss costs at
    *                        most `checkpointEvery` supersteps of recompute —
    *                        `localCheckpoint` blocks are executor-local and
    *                        die with the executor, so long runs on a real
    *                        cluster need a reliable-commit cadence. Commits
    *                        land on the first block boundary at or past each
    *                        cadence multiple, plus always at convergence.
    * @param stepsPerJob     supersteps chained lazily per Spark job (the
    *                        PageRank block-fusion cadence): amortizes the
    *                        per-job fixed cost k-fold; safe because min
    *                        propagation is monotone — a block that changes
    *                        nothing proves the fixpoint was already reached,
    *                        so block-granular convergence stops at the same
    *                        labels as step-granular.
    *
    * Superstep shape: the state frame is consumed exactly ONCE per
    * superstep — the edge table carries an explicit self-loop per vertex,
    * so `min(own, neighbors)` is a single `edges ⋈ state → groupBy(dst)
    * min` with no join-back (the join-back form references the uncached
    * state twice, which under lazy block fusion doubles the subplan per
    * chained step — exponential in the block size). One exchange per
    * superstep: the state arrives partitioned on vid from the previous
    * aggregate, the edge side is cached pre-partitioned on src, and only
    * the `groupBy(dst)` shuffles. The block-end changed-count rides the
    * SAME job as the lazy lineage truncation (one action per block, not
    * two). AQE stays ON (unlike [[PageRank.run]], which must protect a
    * ReusedExchange and a vertDeg frame co-partitioned across supersteps):
    * here each superstep's state partitioning is derived fresh, so AQE's
    * runtime broadcast of a shrunken state side / small-stage coalescing
    * are pure wins at low scale and no-ops at web scale. */
  def hashMin(
      spark: SparkSession,
      edges: DataFrame,
      maxIters: Int = 100,
      checkpointTable: String = null,
      checkpointEvery: Int = 1,
      stepsPerJob: Int = 1): DataFrame = {
    val ckpt = Option(checkpointTable).filter(_.nonEmpty)
    // ONE scan of the input feeds the whole setup: the canonical (min,max)
    // edge rows — INCLUDING self-loop rows, so the vertex universe keeps
    // loop-only vertices (referee-pinned r5 fix) — are deduped once and
    // persisted; both the vertex universe and the symmetrized table derive
    // from that cache. Previously the vertex-endpoint distinct and the
    // symmetrize each recomputed the full input subtree (two scans +
    // derivations of a 100 TB edge table); the canonical dedup also
    // shuffles |E| rows instead of the 2|E| a mirror-then-distinct would
    // (guide §2.3/§2.4).
    // The final layout still ends in repartition(src) + sortWithinPartitions
    // (CSR blocks): distinct's (src,dst) hash partitioning does NOT satisfy
    // the per-iteration join's clustering on src.
    // A self-loop per vertex is unioned in BEFORE the layout: it feeds each
    // vertex its own component through the same aggregate that feeds it the
    // neighbors' (single-use state — see scaladoc), at +|V| rows on 2|E|.
    val canon = edges
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val vertices = canon.select(col("src").as("vid"))
      .union(canon.select(col("dst").as("vid"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sym0 = canon.where(col("src") =!= col("dst"))
    val sym = sym0
      .union(sym0.select(col("dst").as("src"), col("src").as("dst")))
      .union(vertices.select(col("vid").as("src"), col("vid").as("dst")))
      .repartition(col("src"))
      .sortWithinPartitions("src", "dst")
      .persist(StorageLevel.MEMORY_AND_DISK)

    val (startStep, start) = ckpt.flatMap(TableIO.read(spark, _)) match {
      case Some((meta, df)) => (meta.step.toInt + 1, df)
      case None => (0, vertices.withColumn("component", col("vid")))
    }

    // one chained superstep over (vid, component, prev): candidate = min
    // over in-neighbors ∪ self (the self-loop row); `prev` (the block-start
    // label) rides along on the self-loop row for the block-end
    // convergence check. Symmetrize drops genuine self-edges, so
    // src = dst identifies the added loops exactly.
    def superstep(st: DataFrame): DataFrame = sym
      .join(st.select(col("vid").as("src"), col("component"), col("prev")), "src")
      .groupBy(col("dst").as("vid"))
      .agg(min(col("component")).as("component"),
        max(when(col("src") === col("dst"), col("prev"))).as("prev"))

    val debug = sys.env.get("SPARK_GRAFT_CC_DEBUG").contains("1")
    val t00 = System.nanoTime()
    var labels = start.localCheckpoint(true)
    if (debug) println(f"""{"cc_setup_secs":${(System.nanoTime() - t00) / 1e9}%.3f}""")
    var step = startStep
    var changed = 1L
    val cadence = math.max(1, checkpointEvery)
    var nextCommitRel = 0L
    while (step < maxIters && changed > 0) {
      val tB = System.nanoTime()
      val block = math.min(math.max(1, stepsPerJob), maxIters - step)
      var cur = labels.withColumn("prev", col("component"))
      var i = 0
      while (i < block) { cur = superstep(cur); i += 1 }
      // ONE job per block: the LAZY localCheckpoint materializes while the
      // changed-count scans it (the eager checkpoint + separate count was
      // two full actions per superstep — the CC fixed-cost regression)
      val next = cur.localCheckpoint(false)
      changed = next.where(col("component") =!= col("prev")).count()
      val endStep = step + block - 1
      if (debug) println(f"""{"cc_block":{"start":$step,"end":$endStep,"secs":${(System.nanoTime() - tB) / 1e9}%.3f,"changed":$changed}}""")
      val result = next.select("vid", "component")
      // commit on the cadence (block-boundary granular), plus always at
      // convergence / the final step — the final state must land durably
      // even when the cadence would skip it
      ckpt.foreach { t =>
        val endRel = endStep - startStep
        if (endRel >= nextCommitRel || changed == 0L || endStep >= maxIters - 1) {
          TableIO.commit(result, t, endStep, Map("changed" -> changed.toDouble))
          nextCommitRel = (endRel / cadence + 1) * cadence
        }
      }
      labels.unpersist()
      labels = result
      step += block
    }
    sym.unpersist(); vertices.unpersist(); canon.unpersist()
    labels
  }

  /** Alternating large-star / small-star until the edge set reaches
    * fixpoint; then component(v) = its parent in the resulting star forest.
    *
    * large-star: ∀u, m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u.
    * small-star: ∀u, m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v ≤ u
    * (plus (u, m)). Edge lists are kept as directed pairs with the
    * neighborhood grouped on `u`.
    */
  def smallStarLargeStar(
      spark: SparkSession,
      edges: DataFrame,
      maxIters: Int = 50): DataFrame = {
    // canonical (u > v) pairs directly — symmetrize-then-recanonicalize
    // would dedup the same |E| set through a 2|E|-row exchange (guide §2.3)
    var e = edges
      .select(greatest(col("src"), col("dst")).as("u"),
        least(col("src"), col("dst")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    // invariant: pairs (u, v) with v < u ("child -> smaller neighbor")

    // cheap convergence signature: (edge count, xor of edge hashes). Two
    // full `except`s per round cost two extra distinct-shuffles; instead we
    // compare signatures (one aggregation each) and only when they match run
    // ONE confirming one-sided except (counts equal + A∖B empty ⇒ A = B).
    def sigOf(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prevSig = sigOf(e)
    var iter = 0
    var converged = false
    while (iter < maxIters && !converged) {
      // ---- large-star on the symmetric view -------------------------------
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val minN = sym.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      // connect every neighbor larger than u to m
      val large = sym.join(minN, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
      val afterLarge = large.union(e).distinct()

      // ---- small-star -----------------------------------------------------
      val sym2 = afterLarge
      val minN2 = sym2.groupBy("u")
        .agg(least(min(col("v")), first(col("u"))).as("m"))
      val small = sym2.join(minN2, "u")
        .select(col("u"), col("v"), col("m"))
      val newEdges = small.select(col("v").as("u"), col("m").as("v"))
        .union(small.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .distinct()
        .localCheckpoint(true) // truncate lineage per round

      val newSig = sigOf(newEdges)
      converged = newSig == prevSig && newEdges.except(e).isEmpty
      prevSig = newSig
      e.unpersist()
      e = newEdges
      iter += 1
    }
    // star forest: every u points at its component min v; roots are their
    // own. The universe comes from raw endpoints — an endpoint-level
    // distinct, strictly cheaper than the (src,dst)-pair distinct a
    // re-symmetrize would shuffle, and it keeps self-loop-only vertices
    // (singleton components) that symmetrize would drop.
    val vertices = edges.select(col("src").as("vid"))
      .union(edges.select(col("dst").as("vid"))).distinct()
    vertices.join(e.select(col("u").as("vid"), col("v").as("component")),
        Seq("vid"), "left")
      .groupBy("vid").agg(min(coalesce(col("component"), col("vid"))).as("component"))
  }
}
