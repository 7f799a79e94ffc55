package graft.metrics

import graft.SparkSpec

/** Metrics vs literal sequential ports of the reference algorithms
  * (CitationGraphs.go:3135-3608) on small membership fixtures.
  */
class MetricsSpec extends SparkSpec {
  import spark.implicits._

  // 8 nodes, 3 topics; memberships -> argmax communities {0:{0,1,2},1:{3,4},2:{5,6,7}}
  val membs: Map[Long, Seq[Double]] = Map(
    0L -> Seq(0.8, 0.1, 0.1), 1L -> Seq(0.7, 0.2, 0.1), 2L -> Seq(0.6, 0.3, 0.1),
    3L -> Seq(0.1, 0.8, 0.1), 4L -> Seq(0.2, 0.7, 0.1),
    5L -> Seq(0.1, 0.1, 0.8), 6L -> Seq(0.0, 0.2, 0.8), 7L -> Seq(0.1, 0.3, 0.6))

  // an alternative hard clustering to compare against
  val other: Map[Long, Int] = Map(0L -> 0, 1L -> 0, 2L -> 1, 3L -> 1,
    4L -> 1, 5L -> 2, 6L -> 2, 7L -> 2)

  def membDF = membs.toSeq.sortBy(_._1).toDF("nodeId", "membership")
  def commDF(m: Map[Long, Int]) =
    m.toSeq.map { case (n, c) => (c, n) }.toDF("cid", "member")

  def argmaxComms: Map[Long, Int] =
    membs.map { case (n, v) => n -> v.indexOf(v.max) }

  // ---- sequential referee (literal ports) ----------------------------------

  def membCos(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  def refModularity(comms: Map[Long, Int]): Double = {
    val nodes = membs.keys.toSeq.sorted
    val sumSims = nodes.map(i => i ->
      nodes.map(j => membCos(membs(i), membs(j))).sum).toMap
    val total = sumSims.values.sum
    val byC = comms.groupBy(_._2).values.map(_.keys.toSeq)
    byC.map { members =>
      (for (i <- members; j <- members)
        yield membCos(membs(i), membs(j)) - sumSims(i) * sumSims(j) / total).sum
    }.sum / total
  }

  def refCpm(comms: Map[Long, Int], gamma: Double): Double = {
    val byC = comms.groupBy(_._2).values.map(_.keys.toSeq)
    byC.map { members =>
      (for (i <- members; j <- members)
        yield membCos(membs(i), membs(j)) - gamma).sum
    }.sum
  }

  def refRI(c1: Map[Long, Int], c2: Map[Long, Int]): Double = {
    val nodes = c1.keys.toSeq
    val pairs = for (i <- nodes; j <- nodes if i < j) yield (i, j)
    val agree = pairs.count { case (i, j) =>
      (c1(i) == c1(j)) == (c2(i) == c2(j)) }
    agree.toDouble / pairs.size
  }

  test("communitiesFromMemberships = argmax") {
    val got = Metrics.communitiesFromMemberships(membDF)
      .as[(Int, Long)].collect().map(_.swap).toMap
    assert(got == argmaxComms)
  }

  test("modularity matches the literal O(n²) referee") {
    val comms = Metrics.communitiesFromMemberships(membDF)
    val got = Metrics.modularity(membDF, comms)
    val want = refModularity(argmaxComms)
    assert(math.abs(got - want) < 1e-9, s"got=$got want=$want")
  }

  test("CPM matches the literal referee") {
    val comms = Metrics.communitiesFromMemberships(membDF)
    val got = Metrics.cpm(membDF, comms, gamma = 0.3)
    val want = refCpm(argmaxComms, 0.3)
    assert(math.abs(got - want) < 1e-9, s"got=$got want=$want")
  }

  test("RI matches pair-counting referee") {
    val c1 = commDF(other)
    val c2 = Metrics.communitiesFromMemberships(membDF)
    val got = Metrics.randIndex(c1, c2)
    val want = refRI(other, argmaxComms)
    assert(math.abs(got - want) < 1e-12, s"got=$got want=$want")
  }

  test("ARI is 1 for identical clusterings, < 1 otherwise") {
    val c = commDF(other)
    assert(math.abs(Metrics.adjustedRandIndex(c, c) - 1.0) < 1e-12)
    val c2 = Metrics.communitiesFromMemberships(membDF)
    assert(Metrics.adjustedRandIndex(c, c2) < 1.0)
  }

  test("NMI is 1 for identical clusterings; MI/entropies consistent") {
    val c = commDF(other)
    assert(math.abs(Metrics.nmi(c, c) - 1.0) < 1e-12)
    val (cross, e1, e2) = Metrics.entropies(c, c)
    assert(math.abs((e1 + e2 - cross) - Metrics.mi(c, c)) < 1e-12)
    assert(math.abs(cross - e1) < 1e-12) // self cross-entropy = entropy
  }

  test("numCombs replicates the interleaved-division semantics") {
    // numCombs(a1..am1, -1, b1..bk) = (Πa_i!)/(Πb_j!) with Σa = Σb
    // e.g. C(5,2) = 5!/(2!·3!) = numCombs(5, -1, 2, 3)
    assert(math.abs(Metrics.numCombs(5, -1, 2, 3) - 10.0) < 1e-12)
    assert(math.abs(Metrics.numCombs(6, -1, 3, 3) - 20.0) < 1e-12)
    // 4!·3!/(5!·2!) = 144/240 = 0.6
    assert(math.abs(Metrics.numCombs(4, 3, -1, 5, 2) - 0.6) < 1e-9)
  }

  test("EMI and AMI: AMI(c,c)=1 within float tolerance") {
    val c = commDF(other)
    val ami = Metrics.ami(c, c)
    assert(ami > 0.99 && ami <= 1.0 + 1e-9, s"ami=$ami")
  }
}
