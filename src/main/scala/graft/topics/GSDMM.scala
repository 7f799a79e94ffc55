package graft.topics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Pages.mix

/** GSDMM (one-topic-per-document Gibbs, reference CitationGraphs.go:
  * 1587-1930) as a superstep job.
  *
  * Ported semantics: `probTopicOfDoc` with self-subtraction and the
  * rising-factorial word part (:1711-1743), per-iteration counter refresh
  * (:1817), `Infer` (:1838-1884), resampling-distribution entropy
  * (:1889-1917). Superstep state is tiny (K×V word counts, K doc counts,
  * K word sums) and broadcast; docs are rows `(doc, words, topic)` and
  * resampling is a pure map with hash-seeded RNG.
  */
object GSDMM {
  /** Infer core (:1838-1884), shared by the driver-side and distributed
    * paths. docPart denominator uses `dct - 1` exactly as the reference. */
  private[topics] def inferDoc(words: Seq[(Int, Int)], numTopics: Int,
      alpha: Double, beta: Double, topicDocCount: Array[Long],
      topicWordCount: Map[(Int, Int), Long], topicWordSum: Array[Long],
      numDocs: Long, numWords: Int): Seq[Double] = {
    val probs = (0 until numTopics).map { idxK =>
      val dct = topicDocCount(idxK).toDouble
      val docPart = (dct + alpha) / (dct - 1.0 + alpha * numDocs)
      var wordPart = 1.0
      var idxWordInDoc = 0
      val tws = topicWordSum(idxK).toDouble
      words.foreach { case (w, cnt) =>
        val wct = topicWordCount.getOrElse((idxK, w), 0L).toDouble
        (0 until cnt).foreach { j =>
          wordPart *= (wct + beta + j) / (tws + beta * numWords + idxWordInDoc)
          idxWordInDoc += 1
        }
      }
      docPart * wordPart
    }
    val s0 = probs.sum
    val s = if (s0 == 0.0) 1.0 else s0
    probs.map(_ / s)
  }
}

class GSDMM(
    val numTopics: Int,
    val alpha: Double = 0.1,
    val beta: Double = 0.01,
    val seed: Long = 42L) extends Serializable {

  private def u01(h: Long): Double = ((h >>> 11).toDouble) / (1L << 53).toDouble
  private def rngHash(doc: Long, iter: Int): Long =
    mix(mix(seed ^ doc) ^ (iter * 0x9e3779b9L))

  /** doc rows: (doc, words as (word,cnt) pairs, numWordsInDoc, topic) */
  type DocRow = (Long, Seq[(Int, Int)], Int, Int)

  private[topics] def probTopicOfDoc(
      words: Seq[(Int, Int)], nInDoc: Int, kOld: Int, idxK: Int,
      topicDocCount: Array[Long], topicWordCount: Map[(Int, Int), Long],
      topicWordSum: Array[Long], numDocs: Long, numWords: Double): Double = {
    var dct = topicDocCount(idxK).toDouble
    if (idxK == kOld) dct -= 1
    val docPart = (dct + alpha) / (numDocs - 1.0 + alpha * numTopics)
    var tws = topicWordSum(idxK).toDouble
    if (idxK == kOld) tws -= nInDoc
    var wordPart = 1.0
    var idxWordInDoc = 0
    words.foreach { case (w, cnt) =>
      var wct = topicWordCount.getOrElse((idxK, w), 0L).toDouble
      if (idxK == kOld) wct -= cnt
      var j = 0
      while (j < cnt) {
        wordPart *= (wct + beta + j) / (tws + beta * numWords + idxWordInDoc)
        idxWordInDoc += 1
        j += 1
      }
    }
    docPart * wordPart
  }

  def train(spark: SparkSession, bow: DataFrame, numWords: Int, numIters: Int)
      : GSDMMModel = {
    import spark.implicits._

    var docs: Dataset[DocRow] = bow
      .select(col("doc").cast("long"), col("word").cast("int"), col("cnt").cast("int"))
      .as[(Long, Int, Int)]
      .groupByKey(_._1)
      .mapGroups { (doc, it) =>
        val ws = it.map(r => (r._2, r._3)).toSeq.sortBy(_._1)
        (doc, ws, ws.map(_._2).sum,
          math.floorMod(rngHash(doc, -1), numTopics).toInt)
      }.localCheckpoint(true)

    val numDocs = docs.count()

    def countersOf(ds: Dataset[DocRow])
        : (Array[Long], Map[(Int, Int), Long], Array[Long]) = {
      val tdc = new Array[Long](numTopics)
      ds.groupByKey(_._4).count().collect().foreach { case (k, c) => tdc(k) = c }
      val twc = ds.flatMap { case (_, ws, _, k) => ws.map { case (w, c) => ((k, w), c.toLong) } }
        .groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _).collect().toMap
      val tws = new Array[Long](numTopics)
      twc.foreach { case ((k, _), c) => tws(k) += c }
      (tdc, twc, tws)
    }

    (0 until numIters).foreach { iter =>
      val (tdc, twc, tws) = countersOf(docs)
      val tdcB = spark.sparkContext.broadcast(tdc)
      val twcB = spark.sparkContext.broadcast(twc)
      val twsB = spark.sparkContext.broadcast(tws)
      val k = numTopics; val nw = numWords.toDouble
      docs = docs.map { case (doc, ws, nInDoc, kOld) =>
        val prefix = new Array[Double](k)
        var idxK = 0
        while (idxK < k) {
          val p = probTopicOfDoc(ws, nInDoc, kOld, idxK,
            tdcB.value, twcB.value, twsB.value, numDocs, nw)
          prefix(idxK) = if (idxK == 0) p else prefix(idxK - 1) + p
          idxK += 1
        }
        val u = u01(rngHash(doc, iter)) * prefix(k - 1)
        var kNew = kOld; var i = 0; var done = false
        while (i < k && !done) { if (u < prefix(i)) { kNew = i; done = true }; i += 1 }
        (doc, ws, nInDoc, kNew)
      }.localCheckpoint(true)
    }

    val (tdc, twc, tws) = countersOf(docs)
    GSDMMModel(this, docs.toDF("doc", "words", "nWords", "topic"),
      tdc, twc, tws, numDocs, numWords)
  }
}

final case class GSDMMModel(
    gsdmm: GSDMM,
    docs: DataFrame, // (doc, words, nWords, topic)
    topicDocCount: Array[Long],
    topicWordCount: Map[(Int, Int), Long],
    topicWordSum: Array[Long],
    numDocs: Long,
    numWords: Int) {

  /** Infer (:1838-1884) — note the reference's docPart uses
    * `docCountOfTopic - 1` in the denominator; replicated verbatim. */
  def infer(words: Seq[(Int, Int)]): Seq[Double] =
    GSDMM.inferDoc(words, gsdmm.numTopics, gsdmm.alpha, gsdmm.beta,
      topicDocCount, topicWordCount, topicWordSum, numDocs, numWords)

  /** Distributed Infer over every trained doc: `(doc, membership)`. The
    * (tiny) counter tables ride a broadcast; inference is a pure map. */
  def inferMemberships(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val g = gsdmm
    val k = g.numTopics; val a = g.alpha; val b = g.beta
    val stateB = spark.sparkContext.broadcast(
      (topicDocCount, topicWordCount, topicWordSum))
    val nd = numDocs; val nw = numWords
    docs.select(col("doc"), col("words"))
      .as[(Long, Seq[(Int, Int)])]
      .map { case (doc, ws) =>
        val (tdc, twc, tws) = stateB.value
        (doc, GSDMM.inferDoc(ws, k, a, b, tdc, twc, tws, nd, nw))
      }
      .toDF("doc", "membership")
  }

  /** Hard assignment per doc. */
  def assignments: DataFrame = docs.select(col("doc"), col("topic"))

  /** ComputeEntropy (:1888-1917): mean over docs of the entropy of each
    * doc's normalized resampling distribution `probTopicOfDoc(doc, kOld,
    * ·)` — self-subtraction against the doc's CURRENT topic included,
    * exactly like the reference. Distributed as a pure map over doc rows
    * with the (tiny) counter tables broadcast. */
  def entropy(spark: SparkSession): Double = {
    import spark.implicits._
    val g = gsdmm
    val k = g.numTopics
    val nd = numDocs
    val nw = numWords.toDouble
    val tdcB = spark.sparkContext.broadcast(topicDocCount)
    val twcB = spark.sparkContext.broadcast(topicWordCount)
    val twsB = spark.sparkContext.broadcast(topicWordSum)
    val perDoc = docs.select(col("doc"), col("words"), col("nWords"), col("topic"))
      .as[(Long, Seq[(Int, Int)], Int, Int)]
      .map { case (_, ws, nInDoc, kOld) =>
        val probs = new Array[Double](k)
        var sum = 0.0
        var idxK = 0
        while (idxK < k) {
          probs(idxK) = g.probTopicOfDoc(ws, nInDoc, kOld, idxK,
            tdcB.value, twcB.value, twsB.value, nd, nw)
          sum += probs(idxK)
          idxK += 1
        }
        var e = 0.0
        if (sum > 0.0) {
          idxK = 0
          while (idxK < k) {
            val p = probs(idxK) / sum
            if (p != 0.0) e -= p * math.log(p)
            idxK += 1
          }
        }
        e
      }
    perDoc.toDF("e").agg(sum(col("e"))).head().getDouble(0) / nd.toDouble
  }

  /** ComputeRelativeEntropy (:1921-1928). */
  def relativeEntropy(spark: SparkSession): Double =
    entropy(spark) / (-math.log(1.0 / gsdmm.numTopics))
}
