package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.ConnectedComponents

/** The clustering behavior the reference consumes from
  * ConcurrenceBasedClustering (`GroupPairDBScan` / `GroupPairAHC`, call
  * sites CitationGraphs.go:2871-2875, :2920-2924), re-implemented natively
  * (SURVEY.md §2.9):
  *
  *  - DBSCAN over a similarity space = connected components of the
  *    ε-thresholded similarity graph restricted to core points, with
  *    border points attached to their best core neighbor — the ε-core
  *    expansion IS our CC kernel, reused.
  *  - AHC (average-link agglomerative, used when minPts == 0 in the
  *    reference's WPDM) runs driver-side over the (sparsified) similarity
  *    matrix — it is inherently sequential; the distributed part is the
  *    sparsification that makes the matrix small.
  */
object Clustering {

  /** @param sims `(w1, w2, sim)` sparse symmetric similarity entries
    * @return `(member, cluster)`; noise points cluster alone (id = member)
    */
  def dbscan(spark: SparkSession, sims: DataFrame, eps: Double, minPts: Int)
      : DataFrame = {
    val strong = sims.where(col("sim") >= eps)
      .select(col("w1").cast("long").as("src"), col("w2").cast("long").as("dst"))
    val sym = ConnectedComponents.symmetrize(strong).cache()
    // core points: >= minPts neighbors within eps (plus self)
    val degrees = sym.groupBy(col("src").as("member"))
      .agg(count(lit(1)).as("deg"))
    val core = degrees.where(col("deg") + 1 >= minPts).select("member").cache()
    // components over the core-core subgraph
    val coreEdges = sym
      .join(core.withColumnRenamed("member", "src"), "src", "left_semi")
      .join(core.withColumnRenamed("member", "dst"), "dst", "left_semi")
      .select("src", "dst")
    val coreClusters = ConnectedComponents.hashMin(spark, coreEdges)
      .withColumnRenamed("vid", "member").withColumnRenamed("component", "cluster")
    // isolated core points (no core neighbor) cluster alone
    val isolatedCore = core.join(coreClusters, Seq("member"), "left_anti")
      .select(col("member"), col("member").as("cluster"))
    val allCore = coreClusters.union(isolatedCore).cache()
    // border points: non-core with a core neighbor -> min core cluster
    val border = sym
      .join(core.withColumnRenamed("member", "src"), "src", "left_semi")
      .select(col("src"), col("dst").as("member"))
      .join(allCore, Seq("member"), "left_anti") // not core themselves
      .join(allCore.withColumnRenamed("member", "src"), "src")
      .groupBy("member").agg(min("cluster").as("cluster"))
    val clustered = allCore.union(border)
    // noise: any point mentioned in sims but not clustered
    val all = sims.select(col("w1").cast("long").as("member"))
      .union(sims.select(col("w2").cast("long").as("member"))).distinct()
    val noise = all.join(clustered, Seq("member"), "left_anti")
      .select(col("member"), col("member").as("cluster"))
    clustered.union(noise)
  }

  /** Average-link AHC over sparsified similarities; merges until no pair
    * exceeds `eps`. Driver-side by design (see class doc). */
  def ahc(sims: Seq[(Long, Long, Double)], eps: Double): Map[Long, Long] = {
    val members = (sims.map(_._1) ++ sims.map(_._2)).distinct.sorted
    var clusterOf = members.map(m => m -> m).toMap
    var simMap = sims.flatMap { case (a, b, s) =>
      Seq(((a, b), s), ((b, a), s))
    }.toMap
    var active = members.toSet
    var done = false
    while (!done) {
      // best merge among active cluster representatives
      val cand = simMap.filter { case ((a, b), s) =>
        a < b && active(a) && active(b) && s >= eps }
      if (cand.isEmpty) done = true
      else {
        val ((a, b), _) = cand.maxBy { case ((x, y), s) => (s, -x, -y) }
        // average-link: new sims of merged(a) to others = mean of members
        val sizeA = clusterOf.count(_._2 == a).toDouble
        val sizeB = clusterOf.count(_._2 == b).toDouble
        clusterOf = clusterOf.map { case (m, c) => m -> (if (c == b) a else c) }
        active -= b
        simMap = simMap.flatMap { case ((x, y), s) =>
          if (x == b || y == b) None else Some(((x, y), s))
        } ++ active.filter(_ != a).flatMap { o =>
          val sa = simMap.getOrElse((a, o), 0.0)
          val sb = sims.collectFirst {
            case (x, y, s) if (x == b && y == o) || (x == o && y == b) => s
          }.getOrElse(0.0)
          val merged = (sa * sizeA + sb * sizeB) / (sizeA + sizeB)
          Seq(((a, o), merged), ((o, a), merged))
        }
      }
    }
    clusterOf
  }
}
