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
