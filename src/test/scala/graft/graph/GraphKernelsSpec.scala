package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Distributed kernels vs sequential referee on the FIXTURES.md §4 graphs:
  * PageRank allclose 1e-6, CC / LP / triangles exact (north rule).
  */
class GraphKernelsSpec extends SparkSpec {
  import spark.implicits._

  def edgeDF(edges: Seq[(Long, Long)]): DataFrame =
    edges.toDF("src", "dst").repartition(5) // deliberately odd partitioning

  val fixtures: Seq[(String, Seq[(Long, Long)])] = Seq(
    "chain10" -> Referee.chain10,
    "twoCliques" -> Referee.twoCliques,
    "star1k" -> Referee.star1k,
    "danglers" -> Referee.danglers,
    "zipf2k" -> Referee.zipf(500, 2000, 42L)
  )

  test("PageRank matches referee allclose 1e-6 (incl dangling mass)") {
    fixtures.foreach { case (name, edges) =>
      val want = Referee.pageRank(edges)
      val got = PageRank.run(spark, edgeDF(edges), tol = 1e-10, maxIters = 60)
        .ranks.as[(Long, Double)].collect().toMap
      assert(got.keySet == want.keySet, s"$name vertex set")
      want.foreach { case (v, r) =>
        assert(math.abs(got(v) - r) < 1e-6, s"$name vid=$v got=${got(v)} want=$r")
      }
      // probability mass preserved
      assert(math.abs(got.values.sum - 1.0) < 1e-6, s"$name mass")
    }
  }

  test("hash-min CC matches BFS referee exactly") {
    fixtures.foreach { case (name, edges) =>
      val want = Referee.components(edges)
      val got = ConnectedComponents.hashMin(spark, edgeDF(edges))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"$name")
    }
  }

  test("small-star/large-star CC matches BFS referee exactly") {
    fixtures.foreach { case (name, edges) =>
      val want = Referee.components(edges)
      val got = ConnectedComponents.smallStarLargeStar(spark, edgeDF(edges))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"$name")
    }
  }

  test("label propagation matches referee exactly (min-label ties)") {
    fixtures.foreach { case (name, edges) =>
      val iters = 4
      val want = Referee.labelProp(edges, iters)
      val got = LabelPropagation.run(spark, edgeDF(edges), numIters = iters)
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"$name")
    }
  }

  test("triangle counts match referee exactly") {
    fixtures.foreach { case (name, edges) =>
      val want = Referee.triangles(edges)
      val got = Triangles.perVertex(edgeDF(edges))
        .as[(Long, Long)].collect().toMap
      assert(got == want, s"$name")
    }
  }

  test("twoCliques known truths") {
    val e = edgeDF(Referee.twoCliques)
    // one component once bridged
    val comps = ConnectedComponents.hashMin(spark, e)
      .select(countDistinct($"component")).as[Long].head()
    assert(comps == 1L)
    // 2 * C(5,3) = 20 triangles
    assert(Triangles.globalCount(e) == 20L)
  }

  test("KahanSum merge folds partial compensation with the right sign") {
    // a state (sum, c) represents sum - c; merging (0,0) with (10,3) must
    // yield 7 — the wrong sign (add +c_b) would yield 13
    assert(KahanSum.finish(KahanSum.merge((0.0, 0.0), (10.0, 3.0))) == 7.0)
    assert(KahanSum.finish(KahanSum.merge((10.0, 3.0), (0.0, 0.0))) == 7.0)
    // end-to-end through reduce+merge: values whose compensation is live at
    // merge time (1e16 has ulp 2, so the three 1.0s survive only in c)
    val parts = Seq(Seq(1e16, 1.0, 1.0, 1.0), Seq(-1e16, -1.0))
    val states = parts.map(_.foldLeft(KahanSum.zero)(KahanSum.reduce))
    assert(math.abs(KahanSum.finish(states.reduce(KahanSum.merge)) - 2.0) <= 2.0 + 1e-9)
    // order/partitioning invariance across a wide dynamic range via the udaf
    val xs = (0 until 1000).flatMap(i => Seq(1e12 + i, -(1e12 + i), 0.001))
    val g1 = xs.toDF("x").repartition(3).agg(KahanSum.column($"x")).as[Double].head()
    val g2 = xs.reverse.toDF("x").repartition(17).agg(KahanSum.column($"x")).as[Double].head()
    // condition number Σ|x|/|result| ≈ 2e15 ⇒ even compensated summation
    // only guarantees ~eps·Σ|x| ≈ 1e-3 here; the point is order invariance
    // within that bound, not exactness
    assert(math.abs(g1 - 1.0) < 0.01 && math.abs(g2 - 1.0) < 0.01)
  }

  test("kernels are partitioning-invariant") {
    val edges = Referee.zipf(300, 1200, 7L)
    val a = edges.toDF("src", "dst").repartition(2)
    val b = edges.toDF("src", "dst").repartition(11)
    val pa = PageRank.run(spark, a, maxIters = 12).ranks
      .as[(Long, Double)].collect().toMap
    val pb = PageRank.run(spark, b, maxIters = 12).ranks
      .as[(Long, Double)].collect().toMap
    pa.foreach { case (v, r) => assert(math.abs(pb(v) - r) < 1e-9) }
    val la = LabelPropagation.run(spark, a, numIters = 3)
      .as[(Long, Long)].collect().toMap
    val lb = LabelPropagation.run(spark, b, numIters = 3)
      .as[(Long, Long)].collect().toMap
    assert(la == lb)
  }
}
