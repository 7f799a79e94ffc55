package graft.ml

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ref.Leap2Trend

/** CBOW + negative sampling (the reference's training objective, wego
  * parity — CitationGraphs.go:4110-4134): planted-topic recovery,
  * bit-exact determinism, the vocab guardrail, and the §7(g)
  * deviation-impact measurement (CBOW-NS vs MLlib skip-gram rank
  * agreement on the signal Leap2Trend actually consumes).
  */
class CbowNsSpec extends SparkSpec {
  import spark.implicits._

  // two planted topics with tight co-occurrence inside each
  private val topicA = Seq("graph", "mining", "trend", "edge")
  private val topicB = Seq("query", "engine", "join", "scan")
  private def sentence(topic: Seq[String], salt: Int): String =
    (0 until 8).map(j => topic((j + salt) % topic.size)).mkString(" ")
  private val docsDF = (0 until 60).map { i =>
    val t = if (i % 2 == 0) topicA else topicB
    (i.toLong, sentence(t, i / 2))
  }.toDF("doc", "text")
    .select(col("doc"), split(col("text"), " ").as("toks"))

  private def cos(a: Seq[Double], b: Seq[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    dot / (na * nb)
  }

  // subsample = 0: the word2vec.c 1e-3 default is tuned for web-scale
  // corpora — on a 480-token fixture it deletes ~90% of the tokens
  private def fitVecs(seed: Long): Map[String, Seq[Double]] =
    new CbowNs(dim = 8, window = 2, negative = 3, minCount = 1,
      epochs = 12, subsample = 0.0, seed = seed)
      .fit(spark, docsDF)
      .as[(String, Seq[Double])].collect().toMap

  test("CBOW-NS separates the planted topics") {
    val v = fitVecs(42L)
    assert(v.keySet == (topicA ++ topicB).toSet)
    // mean within-topic cosine must dominate mean cross-topic cosine
    def pairs(xs: Seq[String], ys: Seq[String]) =
      for { a <- xs; b <- ys if a != b } yield cos(v(a), v(b))
    val within = (pairs(topicA, topicA) ++ pairs(topicB, topicB))
    val cross = pairs(topicA, topicB)
    val wMean = within.sum / within.size
    val cMean = cross.sum / cross.size
    assert(wMean > cMean + 0.2, s"within=$wMean cross=$cMean")
  }

  test("CBOW-NS is bit-exact deterministic (hash-seeded RNG)") {
    val a = fitVecs(7L)
    val b = fitVecs(7L)
    assert(a.keySet == b.keySet)
    a.foreach { case (w, vec) => assert(vec == b(w), s"word $w") }
    // and a different seed actually changes the vectors
    val c = fitVecs(8L)
    assert(a.exists { case (w, vec) => vec != c(w) })
  }

  test("vocab ceiling fails loudly before materializing the weights") {
    val ex = intercept[IllegalArgumentException] {
      new CbowNs(dim = 8, minCount = 1, vocabCeiling = 4L).fit(spark, docsDF)
    }
    assert(ex.getMessage.contains("minCount"))
  }

  test("deviation impact: CBOW-NS and MLlib skip-gram agree on sim ranks") {
    // the §7(g) question, measured: Leap2Trend consumes only per-year
    // neighbor RANKS — train both objectives on one planted corpus and
    // compare the rank signal, not the raw vectors
    val year = 2000L
    val docs = docsDF.select(lit(year).as("year"), lit("en").as("lang"),
      concat_ws(" ", col("toks")).as("text"))

    val cbowVecs = Leap2Trend.trainEmbeddingsCBOW(docs, 2000, dim = 8,
      window = 2, minCount = 1, epochs = 12, negative = 3, subsample = 0.0)
    val sgVecs = Leap2Trend.trainEmbeddings(docs, 2000, dim = 8,
      minCount = 1, maxIter = 3)

    def ranksOf(v: org.apache.spark.sql.DataFrame): Map[(String, String), Int] =
      Leap2Trend.simRanksByYear(v)
        .select(col("p"), col("nbr"), col("rank"))
        .as[(String, String, Int)].collect()
        .map { case (p, n, r) => (p, n) -> r }.toMap

    val rc = ranksOf(cbowVecs)
    val rs = ranksOf(sgVecs)
    val keys = rc.keySet.intersect(rs.keySet)
    assert(keys.nonEmpty)

    // Spearman rank correlation across all (p, nbr) pairs
    val xs = keys.toSeq.map(k => (rc(k).toDouble, rs(k).toDouble))
    val n = xs.size.toDouble
    val mx = xs.map(_._1).sum / n; val my = xs.map(_._2).sum / n
    val cov = xs.map { case (x, y) => (x - mx) * (y - my) }.sum
    val sx = math.sqrt(xs.map { case (x, _) => (x - mx) * (x - mx) }.sum)
    val sy = math.sqrt(xs.map { case (_, y) => (y - my) * (y - my) }.sum)
    val rho = cov / (sx * sy)
    assert(rho > 0.5, s"rank correlation between objectives too low: $rho")

    // and the coarse topical signal agrees exactly: top-1 neighbor stays
    // within the planted topic under BOTH objectives
    val inTopic = (w: String, nbr: String) =>
      (topicA.contains(w) && topicA.contains(nbr)) ||
        (topicB.contains(w) && topicB.contains(nbr))
    val top1c = rc.collect { case ((p, nb), 0) => p -> nb }
    val top1s = rs.collect { case ((p, nb), 0) => p -> nb }
    assert(top1c.forall { case (p, nb) => inTopic(p, nb) },
      s"CBOW top-1 left the topic: $top1c")
    assert(top1s.forall { case (p, nb) => inTopic(p, nb) },
      s"skip-gram top-1 left the topic: $top1s")
  }

  test("file chain trains CBOW when asked (cbow = true)") {
    val dir = tmpDir("cbowchain")
    val prefix = s"$dir/ref"
    val docs = (0 until 24).map { i =>
      val t = if (i % 2 == 0) topicA else topicB
      (i.toLong, 2000L + i % 2, "en", Seq(t(0), t(1), t(2), t(0), t(1)))
    }.toDF("id", "year", "lang", "toks")
    Leap2Trend.saveTrainingDataFiles(docs, prefix, 2000)
    Leap2Trend.word2vecFiles(spark, prefix, 2000, 2001, dim = 8,
      minCount = 1, maxIter = 3, cbow = true)
    val v = Leap2Trend.loadVecFile(spark, s"$prefix-cbow-2001.vec", 2001, 8)
    assert(v.count() >= 6) // both topics' trigrams in the cumulative year
    assert(v.select(size(col("vec"))).distinct().as[Int].collect().toSeq == Seq(8))
  }
}
