package graft.ref

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.corpus.{Corpus, Keyphrase}
import graft.ingest.Pages

/** E1/E2 composition chains (CitationCorpus) vs literal sequential ports of
  * the reference loops (CitationGraphs.go:2058-2265, :2390-2637,
  * :2797-3026, :3673-3797) on a deterministic fixture graph whose titles
  * contain stopwords (multiple candidate groups per title).
  */
class CitationCorpusSpec extends SparkSpec {
  import spark.implicits._

  private val titlePool = Seq(
    "mining of citation graphs for trend analysis",
    "deep learning methods in graph clustering",
    "query engines and the art of distributed joins",
    "crawling the web at scale",
    "trend analysis of deep graph mining",
    "distributed query planning for graph engines",
    "scale out web crawling systems",
    "clustering citation graphs with topic models")

  val nodes: Seq[(Long, Boolean, Long, String)] = (0L until 30L).map { i =>
    (i, i < 10, 2000 + i % 5, titlePool(math.floorMod(Pages.mix(i), titlePool.size).toInt))
  }
  val edges: Seq[(Long, Long)] = (0 until 60).flatMap { k =>
    val a = math.floorMod(Pages.mix(k * 5 + 3), 10) // citer: main nodes
    val b = math.floorMod(Pages.mix(k * 11 + 1), 30)
    if (a != b) Some((a.toLong, b.toLong)) else None
  }.distinct
  val labels: Seq[(Long, String)] = (0L until 30L).map { i =>
    (i, Seq("graph mining", "trend detection", "query engines", "web crawling")(
      math.floorMod(Pages.mix(i + 3), 4).toInt))
  }

  def nodesDF: DataFrame = nodes.toDF("id", "isMain", "year", "title")
  def edgesDF: DataFrame = edges.toDF("id", "refId")
  def labelsDF: DataFrame = labels.toDF("id", "label")

  private val titleOf: Map[Long, String] = nodes.map(n => (n._1, n._4)).toMap
  private val refsOf: Map[Long, Seq[Long]] =
    edges.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sorted }
      .withDefaultValue(Seq.empty)
  private val mainIds = nodes.filter(_._2).map(_._1)

  /** literal CreateCorpus word list per node (:2408-2447), refs by refId */
  private def refWords(id: Long, corpusType: Int): Seq[String] = {
    val own =
      if (corpusType <= 2) Keyphrase.extractCandidates(titleOf(id)).flatMap(_.split(" "))
      else labels.filter(_._1 == id).map(_._2).sorted.map(Stemmer.stemPhrase)
    val refs =
      if (corpusType <= 0)
        refsOf(id).flatMap(r =>
          Keyphrase.extractCandidates(titleOf(r)).flatMap(_.split(" ")))
      else Seq.empty
    own ++ refs
  }

  test("tokenStream matches the literal CreateCorpus word order per type") {
    Seq(0, 1, 2, 3).foreach { t =>
      val docs = if (t == 2) nodes.map(_._1) else mainIds
      val got = CitationCorpus.tokenStream(nodesDF, edgesDF, labelsDF, t)
        .orderBy("doc", "pos").as[(Long, Int, String)].collect()
        .groupBy(_._1).map { case (d, rs) => d -> rs.sortBy(_._2).map(_._3).toSeq }
      val want = docs.map(id => id -> refWords(id, t)).filter(_._2.nonEmpty).toMap
      assert(got == want, s"corpusType=$t")
    }
  }

  test("createCorpus vocab equals sequential AddDoc first-seen ids") {
    val (_, v) = CitationCorpus.createCorpus(nodesDF, edgesDF, null, 0)
    val got = v.as[(String, Int)].collect().toMap
    // sequential referee: AddDoc over docs in node-id order
    var nextId = 0
    val vocab = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    mainIds.sorted.foreach { id =>
      refWords(id, 0).foreach { w =>
        if (!vocab.contains(w)) { vocab(w) = nextId; nextId += 1 }
      }
    }
    assert(got == vocab.toMap)
  }

  test("translateX re-encodes groups and flags missing terms") {
    val (bowX, vX, _) = CitationCorpus.createCorpusX(nodesDF, edgesDF, 1)
    val (_, vAll, _) = CitationCorpus.createCorpusX(nodesDF, edgesDF, 2)
    val (out, missing) = Corpus.translateX(bowX, vX, vAll)
    assert(missing.isEmpty, "type-1 sub-phrases must all exist in type-2 vocab")
    // translation preserves (doc, grp, term-string, cnt) content exactly
    def keyed(bow: DataFrame, v: DataFrame) =
      bow.join(v, "word").select("doc", "grp", "term", "cnt")
        .as[(Long, Int, String, Int)].collect().toSet
    assert(keyed(out, vAll) == keyed(bowX, vX))
    // and a vocab lacking terms reports them
    val tiny = vAll.limit(1)
    val (_, missing2) = Corpus.translateX(bowX, vX, tiny)
    assert(missing2.count() > 0)
  }

  test("tfidf matches the literal TFIDF referee") {
    val got = CitationCorpus.tfidf(nodesDF, edgesDF)
      .as[(Long, String, Double)].collect()
      .map { case (d, p, w) => (d, p) -> w }.toMap
    // referee (:2058-2102): TF counts in candidates++aux, IDF over title
    // candidate groups of main nodes
    val candsOf = mainIds.map(id => id -> Keyphrase.extractCandidates(titleOf(id))).toMap
    val auxOf = mainIds.map(id => id ->
      refsOf(id).flatMap(r => Keyphrase.extractCandidates(titleOf(r)))).toMap
    val dfOf = candsOf.values.flatMap(_.distinct).groupBy(identity)
      .map { case (p, xs) => p -> xs.size }
    val nMain = mainIds.size.toDouble
    val want = (for {
      id <- mainIds
      p <- candsOf(id).distinct
    } yield {
      val tf = (candsOf(id) ++ auxOf(id)).count(_ == p).toDouble
      (id, p) -> tf * math.log(nMain / dfOf(p))
    }).toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (k, w) =>
      assert(math.abs(got(k) - w) < 1e-9, s"$k got=${got(k)} want=$w")
    }
  }

  test("tfidf extracts title candidates once, shared by tf and idf") {
    // the candidates frame is localCheckpoint'd before fan-out, so the
    // keyphrase-extraction UDF over MAIN titles never appears in the tfidf
    // plan at all — both factors read the checkpointed RDD; the only UDF
    // application left is the aux (referenced-title) branch
    val plan = CitationCorpus.tfidf(nodesDF, edgesDF)
      .queryExecution.executedPlan.toString
    val rddScans = plan.linesIterator.count(_.contains("Scan ExistingRDD"))
    assert(rddScans >= 2, s"expected checkpointed candidate scans:\n${plan.take(1500)}")
    // exactly ONE extraction site (aux refs); a per-factor re-extraction
    // would show 2+ generator/UDF applications over a title column
    val gens = plan.linesIterator.count(l =>
      l.contains("Generate explode") && l.contains("UDF"))
    assert(gens <= 1, s"extractor re-run in the plan ($gens sites)")
  }

  test("simTFIDF with empty similarity equals greedy-deduped tfidf") {
    val emptySims = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("p1", StringType), StructField("p2", StringType),
        StructField("sim", DoubleType))))
    val a = CitationCorpus.simTFIDF(nodesDF, edgesDF, emptySims)
      .as[(Long, String, Double)].collect().toSet
    val b = Keyphrase.greedyContainmentDedup(CitationCorpus.tfidf(nodesDF, edgesDF))
      .as[(Long, String, Double)].collect().toSet
    assert(a == b)
  }

  test("simTF weights identical phrases 1.0 and uses symmetric sim lookups") {
    val sims = Seq(("graph", "web", 0.5)).toDF("p1", "p2", "sim")
    val st = CitationCorpus.simTF(nodesDF, edgesDF, sims)
      .as[(Long, String, Double)].collect()
      .map { case (d, p, tf) => (d, p) -> tf }.toMap
    // referee
    val candsOf = mainIds.map(id => id -> Keyphrase.extractCandidates(titleOf(id))).toMap
    val auxOf = mainIds.map(id => id ->
      refsOf(id).flatMap(r => Keyphrase.extractCandidates(titleOf(r)))).toMap
    def sim(a: String, b: String): Double =
      if (a == b) 1.0
      else if (Set(a, b) == Set("graph", "web")) 0.5
      else 0.0
    val want = (for {
      id <- mainIds
      p <- candsOf(id).distinct
    } yield (id, p) -> (candsOf(id) ++ auxOf(id)).map(sim(p, _)).sum).toMap
    assert(st.keySet == want.keySet)
    want.foreach { case (k, w) => assert(math.abs(st(k) - w) < 1e-9, s"$k") }
  }

  test("phraseSimilarityX drops same-group overlap exclusions") {
    val sims = CitationCorpus.phraseSimilarityX(nodesDF, edgesDF, simType = 2)
      .as[(String, String, Double)].collect()
    assert(sims.nonEmpty)
    sims.foreach { case (_, _, s) => assert(s > 0.0 && s <= 1.0) }
    // referee exclusion set: same-group sub-phrase pairs that Overlap
    val exclusions = (for {
      id <- nodes.map(_._1)
      cand <- Keyphrase.extractCandidates(titleOf(id))
      subs = Keyphrase.allPossiblePhrases(cand)
      a <- subs; b <- subs
      if a < b && Keyphrase.overlaps(a, b)
    } yield (a, b)).toSet
    sims.foreach { case (p1, p2, _) =>
      val k = if (p1 < p2) (p1, p2) else (p2, p1)
      assert(!exclusions.contains(k), s"excluded pair $k survived")
    }
  }

  test("stronglyConnectedPhrases matches the literal referee") {
    val got = CitationCorpus.stronglyConnectedPhrases(nodesDF, edgesDF,
        thresFreq = 2.0, thresRatio = 1.0)
      .as[(String, String, Double, Double)].collect()
      .map { case (p1, p2, a, e) => (p1, p2) -> ((a, e)) }.toMap
    // referee (:3673-3797) — vocab ids in first-seen (doc-id, pos) order
    var nextId = 0
    val vocab = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    val docGroups = nodes.map(_._1).sorted.map { id =>
      val groups = Keyphrase.extractCandidates(titleOf(id))
        .map(c => Keyphrase.allPossiblePhrases(c))
      groups.flatten.foreach { w =>
        if (!vocab.contains(w)) { vocab(w) = nextId; nextId += 1 }
      }
      id -> groups.map(_.map(vocab).toSet)
    }
    val numDocs = docGroups.size.toDouble
    val n = nodes.size.toDouble
    // cross-group concurrences, literal GetDocConcurrences loop (:857-884):
    // fresh visited set per (doc, group-occurrence of w1) — a sub-phrase in
    // k groups of one doc contributes k, and the count is directed by w1
    val pairFreq = scala.collection.mutable.Map.empty[(Int, Int), Double]
    val dfOf = scala.collection.mutable.Map.empty[Int, Int]
    docGroups.foreach { case (_, groups) =>
      groups.flatten.toSet.foreach { w: Int => dfOf(w) = dfOf.getOrElse(w, 0) + 1 }
      for ((g1, i) <- groups.zipWithIndex; w1 <- g1) {
        val visited = scala.collection.mutable.Set.empty[Int]
        for {
          (g2, j) <- groups.zipWithIndex
          if j != i
          w2 <- g2
          if w2 != w1 && !visited(w2)
        } {
          pairFreq((w1, w2)) = pairFreq.getOrElse((w1, w2), 0.0) + 1.0
          visited += w2
        }
      }
    }
    val byName = vocab.map(_.swap)
    // findStronglyConnectedPhrases reads the w1<w2 orientation (:3761-3769)
    val want = pairFreq.iterator.filter { case ((w1, w2), _) => w1 < w2 }
      .flatMap { case ((w1, w2), freq) =>
        val expected = dfOf(w1) / numDocs * dfOf(w2) / numDocs * n
        if (freq >= 2.0 && freq >= expected)
          Some((byName(w1), byName(w2)) -> ((freq, expected)))
        else None
      }.toMap
    assert(got.nonEmpty, "thresholds must produce rows on the fixture")
    assert(got.keySet == want.keySet)
    want.foreach { case (k, (a, e)) =>
      assert(got(k)._1 == a && math.abs(got(k)._2 - e) < 1e-9, s"$k")
    }
  }

  test("clusterByLDA end-to-end: one membership per main node, mass 1") {
    val m = CitationCorpus.clusterByLDA(spark, nodesDF, edgesDF,
      numTopics = 3, alpha = 0.1, beta = 0.01, numIters = 3)
      .as[(Long, Seq[Double])].collect().toMap
    assert(m.keySet == mainIds.toSet)
    m.values.foreach { v =>
      assert(v.size == 3)
      assert(math.abs(v.sum - 1.0) < 1e-9 || v.sum == 0.0)
    }
    // deterministic
    val m2 = CitationCorpus.clusterByLDA(spark, nodesDF, edgesDF, 3, 0.1, 0.01, 3)
      .as[(Long, Seq[Double])].collect().toMap
    assert(m == m2)
  }

  test("clusterTitlesByGSDMM end-to-end (E2 chain)") {
    val m = CitationCorpus.clusterTitlesByGSDMM(spark, nodesDF, edgesDF,
      simType = 2, numTopics = 3, alpha = 0.1, beta = 0.01, numIters = 3)
      .as[(Long, Seq[Double])].collect().toMap
    assert(m.keySet == mainIds.toSet)
    m.values.foreach { v =>
      assert(v.size == 3)
      assert(math.abs(v.sum - 1.0) < 1e-9)
    }
  }

  test("clusterLabelsByGSDMM end-to-end") {
    val m = CitationCorpus.clusterLabelsByGSDMM(spark, nodesDF, labelsDF,
      numTopics = 2, alpha = 0.1, beta = 0.01, numIters = 3)
      .as[(Long, Seq[Double])].collect().toMap
    assert(m.keySet == mainIds.toSet)
  }

  test("clusterTitlesByWPDM covers every main node exactly once") {
    val c = CitationCorpus.clusterTitlesByWPDM(spark, nodesDF, edgesDF,
      eps = 0.05, minPts = 2, simType = 2)
      .as[(Long, Long)].collect()
    assert(c.map(_._1).toSet == mainIds.toSet)
    assert(c.length == mainIds.size) // one cluster per member
    // same-title docs share word groups => identical similarity rows =>
    // they must land in the same cluster when any clustering happens
    val byTitle = mainIds.groupBy(titleOf)
    val clusterOf = c.toMap
    byTitle.values.filter(_.size > 1).foreach { ids =>
      assert(ids.map(clusterOf).toSet.size == 1,
        s"duplicate-title docs split across clusters: $ids")
    }
  }

  test("clusterLabelsByWPDM AHC path (minPts = 0) covers all main nodes") {
    val c = CitationCorpus.clusterLabelsByWPDM(spark, nodesDF, labelsDF,
      eps = 0.9, minPts = 0, simType = 2)
      .as[(Long, Long)].collect()
    assert(c.map(_._1).toSet == mainIds.toSet)
  }

  test("AHC path fails loudly over the driver pair-collect ceiling") {
    val groups = Seq((1L, 10L), (2L, 11L), (3L, 12L)).toDF("doc", "word")
    val sims = Seq((10L, 11L, 0.9), (11L, 12L, 0.8), (10L, 12L, 0.7))
      .toDF("w1", "w2", "sim")
    val e = intercept[IllegalArgumentException] {
      CitationCorpus.wpdmCluster(spark, groups, sims, eps = 0.5, minPts = 0,
        ahcPairCeiling = 1L).collect()
    }
    assert(e.getMessage.contains("use dbscan (minPts > 0)"), e.getMessage)
  }
}
