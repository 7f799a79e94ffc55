package graft.corpus

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ref.{Leap2Trend, Memberships}

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // two dense similarity blobs {0,1,2} and {10,11,12}, one stray point 20
  val sims = Seq(
    (0L, 1L, 0.9), (0L, 2L, 0.85), (1L, 2L, 0.95),
    (10L, 11L, 0.9), (10L, 12L, 0.8), (11L, 12L, 0.88),
    (0L, 10L, 0.1), (2L, 20L, 0.2)
  ).toDF("w1", "w2", "sim")

  test("DBSCAN: two clusters, stray point is noise-alone") {
    val out = Clustering.dbscan(spark, sims, eps = 0.5, minPts = 2)
      .as[(Long, Long)].collect().toMap
    assert(out(0L) == out(1L) && out(1L) == out(2L))
    assert(out(10L) == out(11L) && out(11L) == out(12L))
    assert(out(0L) != out(10L))
    assert(out(20L) == 20L, "noise clusters alone")
  }

  test("DBSCAN minPts gates core expansion") {
    // with minPts 4 nothing in a 3-point blob is core => all noise-alone
    val out = Clustering.dbscan(spark, sims, eps = 0.5, minPts = 4)
      .as[(Long, Long)].collect().toMap
    assert(out.forall { case (m, c) => c == m })
  }

  test("AHC merges above eps with average link") {
    val flat = Seq((0L, 1L, 0.9), (1L, 2L, 0.8), (0L, 2L, 0.7), (3L, 0L, 0.1))
    val out = Clustering.ahc(flat, eps = 0.5)
    assert(out(0L) == out(1L) && out(1L) == out(2L))
    assert(out(3L) != out(0L))
  }
}

class Leap2TrendSpec extends SparkSpec {
  import spark.implicits._

  test("rank jumps surface the phrase pair that moved together") {
    // year 2000: a-b far apart in rank; year 2001: a-b nearest neighbors
    val vecs = Seq(
      (2000L, "a", Seq(1.0, 0.0, 0.0)),
      (2000L, "b", Seq(0.0, 1.0, 0.0)),
      (2000L, "c", Seq(0.9, 0.1, 0.0)),
      (2000L, "d", Seq(0.8, 0.3, 0.0)),
      (2001L, "a", Seq(1.0, 0.0, 0.0)),
      (2001L, "b", Seq(0.95, 0.05, 0.0)),
      (2001L, "c", Seq(0.0, 0.9, 0.1)),
      (2001L, "d", Seq(0.0, 0.1, 0.9))
    ).toDF("year", "phrase", "vec")
    val jumps = Leap2Trend.run(vecs, minJump = 1)
      .select("p", "nbr", "jump").as[(String, String, Long)].collect()
    assert(jumps.exists { case (p, n, j) =>
      ((p == "a" && n == "b") || (p == "b" && n == "a")) && j >= 1 })
  }

  test("simRanks are dense 0..k-1 per (year, phrase)") {
    val vecs = (0 until 6).map(i =>
      (2000L, s"p$i", Seq(i.toDouble, 1.0, (i % 3).toDouble)))
      .toDF("year", "phrase", "vec")
    val ranks = Leap2Trend.simRanksByYear(vecs)
    val per = ranks.groupBy("year", "p").agg(collect_list("rank").as("rs"))
      .select("rs").as[Seq[Int]].collect()
    per.foreach(rs => assert(rs.sorted == (0 until rs.size)))
  }

  test("cumulative training data: later years contain earlier docs") {
    val docs = Seq(
      (2000L, "en", "alpha beta"),
      (2001L, "en", "gamma delta"),
      (2001L, "de", "nicht englisch"),
      (2002L, "en", "epsilon zeta")
    ).toDF("year", "lang", "text")
    val dir = tmpDir("w2v")
    Leap2Trend.saveTrainingData(docs, dir, yearStartFrom = 2000)
    def linesOf(y: Int): Set[String] =
      spark.read.text(s"$dir/y=$y").as[String].collect().toSet
    assert(linesOf(2000) == Set("alpha_beta"))
    assert(linesOf(2001) == Set("alpha_beta", "gamma_delta")) // cumulative, en-only
    assert(linesOf(2002) == Set("alpha_beta", "gamma_delta", "epsilon_zeta"))
  }

  test("MLlib embedding training yields per-year unit-testable vectors") {
    val docs = (0 until 30).map { i =>
      val topic = if (i % 2 == 0) "alpha beta gamma alpha beta" else "delta epsilon zeta delta"
      (2000L + i % 2, "en", topic)
    }.toDF("year", "lang", "text")
    val vecs = Leap2Trend.trainEmbeddings(docs, 2000, dim = 8, minCount = 1)
    val byYear = vecs.groupBy("year").count()
      .as[(Long, Long)].collect().toMap
    assert(byYear.keySet == Set(2000L, 2001L))
    assert(byYear(2001L) >= byYear(2000L)) // cumulative corpus grows vocab
    val dims = vecs.select(size($"vec")).distinct().as[Int].collect().toSeq
    assert(dims == Seq(8))
  }

  test("memberships JSON round trip + J4 check") {
    val m = Seq((1L, Seq(0.2, 0.8)), (2L, Seq(0.6, 0.4))).toDF("nodeId", "membership")
    val dir = tmpDir("memb")
    Memberships.save(m, dir)
    val back = Memberships.load(spark, dir)
    assert(back.as[(Long, Seq[Double])].collect().toMap
      == Map(1L -> Seq(0.2, 0.8), 2L -> Seq(0.6, 0.4)))
    val mains = Seq(1L, 2L, 3L).toDF("id")
    val (missing, dims) = Memberships.check(back, mains)
    assert(missing == 1L && dims == 1L)
  }
}
