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

  test("rank jumps use the reference's rank - prevRank orientation") {
    // year 2000: a-c nearest neighbors; year 2001: c moved away from a
    // (jump = rank - prevRank, CitationGraphs.go:4311 — positive when the
    // pair moved APART in the ranking)
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
    // a-c were rank-0 neighbors in 2000 and far apart in 2001
    assert(jumps.exists { case (p, n, j) =>
      ((p == "a" && n == "c") || (p == "c" && n == "a")) && j >= 1 })
    // a-b moved TOGETHER => negative jump => must not surface
    assert(!jumps.exists { case (p, n, _) =>
      (p == "a" && n == "b") || (p == "b" && n == "a") })
  }

  test("S5/S6 file workflow: vec round trip + jump ranking files") {
    val dir = tmpDir("leapfiles")
    val prefix = s"$dir/test"
    // hand-write the reference's file layout for two years
    def writeLines(path: String, lines: Seq[String]): Unit = {
      val f = new java.io.File(path); f.getParentFile.mkdirs()
      java.nio.file.Files.writeString(f.toPath, lines.mkString("", "\n", "\n"))
    }
    val d = 3
    writeLines(s"$prefix-2000.txt", Seq.fill(5)("aa bb cc dd"))
    writeLines(s"$prefix-2001.txt", Seq.fill(5)("aa bb cc dd"))
    writeLines(s"$prefix-cbow-2000.vec",
      Seq("header-line-too-short", // < dim+1 fields -> skipped (:4258)
        "aa 1.0 0.0 0.0", "bb 0.0 1.0 0.0", "cc 0.9 0.1 0.0", "dd 0.8 0.3 0.0"))
    writeLines(s"$prefix-cbow-2001.vec",
      Seq("aa 1.0 0.0 0.0", "bb 0.95 0.05 0.0", "cc 0.0 0.9 0.1", "dd 0.0 0.1 0.9"))
    writeLines(s"$prefix-IDs-2000.txt", Seq("7", "11", "not-a-number"))

    // S5 readers
    val v2000 = Leap2Trend.loadVecFile(spark, s"$prefix-cbow-2000.vec", 2000, d)
    assert(v2000.count() == 4) // short line skipped
    assert(v2000.where($"phrase" === "aa").select("vec")
      .as[Seq[Double]].head() == Seq(1.0, 0.0, 0.0))
    val ids = Leap2Trend.loadIdsFile(spark, s"$prefix-IDs-2000.txt")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(0L, 7L, 11L)) // parse error -> 0 (:4273)

    // S7 sink reads back identically through the S5 reader
    val out = tmpDir("vecsink")
    Leap2Trend.saveVecFile(v2000.select("phrase", "vec"), out)
    val back = Leap2Trend.loadVecFile(spark, out, 2000, d)
    assert(back.select("phrase", "vec").as[(String, Seq[Double])].collect().toMap
      == v2000.select("phrase", "vec").as[(String, Seq[Double])].collect().toMap)

    // full file loop writes -jumpranking-<y>.csv in "idx, p1, p2, jump" form
    Leap2Trend.leap2trendFiles(spark, prefix, 2000, 2001,
      minFreq = 2, minJump = 1, dim = d)
    val lines2001 = spark.read.text(s"$prefix-jumpranking-2001.csv")
      .as[String].collect().toSeq
    assert(lines2001.nonEmpty)
    val fields = lines2001.head.split(", ")
    assert(fields.length == 4 && fields(0) == "0")
    // a-c moved apart => present with positive jump
    assert(lines2001.exists { l =>
      val f = l.split(", ")
      Set(f(1), f(2)) == Set("aa", "cc") && f(3).toInt >= 1
    })
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
    // toks are vocab TERMS — a multi-word phrase term gets its spaces
    // replaced PER TERM (:3859), terms join with plain spaces
    val docs = Seq(
      (2000L, "en", Seq("alpha beta")),
      (2001L, "en", Seq("gamma delta", "eta")),
      (2001L, "de", Seq("nicht englisch")),
      (2002L, "en", Seq("epsilon", "zeta"))
    ).toDF("year", "lang", "toks")
    val dir = tmpDir("w2v")
    Leap2Trend.saveTrainingData(docs, dir, yearStartFrom = 2000)
    def linesOf(y: Int): Set[String] =
      spark.read.text(s"$dir/y=$y").as[String].collect().toSet
    assert(linesOf(2000) == Set("alpha_beta"))
    assert(linesOf(2001) == Set("alpha_beta", "gamma_delta eta")) // cumulative, en-only
    assert(linesOf(2002) == Set("alpha_beta", "gamma_delta eta", "epsilon zeta"))
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

  test("full file chain: training data -> word2vec -> leap2trend files") {
    val dir = tmpDir("leapchain")
    val prefix = s"$dir/ijcai"
    val docs = (0 until 24).map { i =>
      val t = if (i % 2 == 0) Seq("graph", "mining", "trend", "graph", "mining")
              else Seq("query", "engine", "join", "query", "engine")
      (i.toLong, 2000L + i % 2, "en", t)
    }.toDF("id", "year", "lang", "toks")
    Leap2Trend.saveTrainingDataFiles(docs, prefix, 2000)
    // reference naming: <prefix>-<y>.txt cumulative + -IDs-<y>.txt
    assert(spark.read.text(s"$prefix-2000.txt").count() == 12)
    assert(spark.read.text(s"$prefix-2001.txt").count() == 24) // cumulative
    assert(Leap2Trend.loadIdsFile(spark, s"$prefix-IDs-2001.txt").count() == 24)
    Leap2Trend.word2vecFiles(spark, prefix, 2000, 2001, dim = 8, minCount = 1)
    val v = Leap2Trend.loadVecFile(spark, s"$prefix-cbow-2001.vec", 2001, 8)
    assert(v.count() >= 4) // vocab: graph mining trend query engine join
    Leap2Trend.leap2trendFiles(spark, prefix, 2000, 2001,
      minFreq = 1, minJump = 1, dim = 8)
    // the first year has no previous ranks -> file exists (possibly empty);
    // the second year's file parses as "idx, p1, p2, jump"
    val files2001 = new java.io.File(s"$prefix-jumpranking-2001.csv")
    assert(files2001.exists)
    val lines = spark.read.text(s"$prefix-jumpranking-2001.csv")
      .as[String].collect()
    lines.foreach { l =>
      val f = l.split(", ")
      assert(f.length == 4 && f(0).toInt >= 0 && f(3).toInt >= 1)
    }
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
