package graft.ref

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.corpus.{Clustering, Corpus, Keyphrase, Similarity}
import graft.topics.{GSDMM, LDA}

/** The reference's corpus-from-graph compositions and top-level clustering
  * entry points (the E1/E2 chains of SURVEY.md §3), re-expressed over the
  * normalized graph frames `nodes (id, isMain, year, title)`, `edges
  * (id, refId)`, `labels (id, label)`:
  *
  *  - CreateCorpus / CreateCorpusX / CreateCorpusSeq corpusType semantics
  *    (CitationGraphs.go:2390-2510, :2520-2637, :2639-2775):
  *      0 = title + ref-title words, main nodes; 1 = title words, main
  *      nodes; 2 = title words, all nodes; 3 = stemmed labels, main nodes.
  *    Docs are keyed by node id (the reference keys by a dense index whose
  *    type-2 tail order is Go-map-nondeterministic; node-id order is the
  *    deterministic equivalent). Ref-title words follow title words, refs
  *    ordered by refId (the reference keeps edge-file order, which
  *    LoadCitationGraph does not canonicalize either).
  *  - GetPhraseSimilarity / GetPhraseSimilarityX (:2269-2326, :2330-2379):
  *    word/phrase co-occurrence -> one of the five similarity kernels,
  *    string-keyed. The X variant works over all-possible-sub-phrase
  *    vocab with cross-group concurrences minus same-group exclusions
  *    (`cm.SetExclusions`, :2344 — excluded pairs are dropped from the
  *    model before inducing similarities).
  *  - TFIDF / SimTFIDF / SimTFSimIDF (:2058-2102, :2111-2196, :2205-2265).
  *    TF/SimTF/IDF/SimIDF semantics live in the external
  *    KeyphraseExtraction library (consumed, not defined, by the
  *    reference); the behavior implemented here is the natural reading of
  *    the call sites and is documented per function.
  *  - ClusterByLDA (:2797-2823), ClusterTitlesByGSDMM (:2983-3026),
  *    ClusterLabelsByGSDMM (:3046-3075), ClusterTitlesByWPDM (:2840-2882),
  *    ClusterLabelsByWPDM (:2898-2936).
  *  - GetStronglyConnectedPhrases (:3673-3797).
  */
object CitationCorpus {

  private def mainNodes(nodes: DataFrame): DataFrame = nodes.where(col("isMain"))

  private def baseNodes(nodes: DataFrame, corpusType: Int): DataFrame =
    if (corpusType == 2) nodes else mainNodes(nodes)

  /** stemmed candidate words of a title column, flattened in order */
  private def titleWords(title: org.apache.spark.sql.Column) =
    flatten(transform(Keyphrase.extract_candidates(title), c => split(c, " ")))

  /** `(doc, pos, term)` word-token stream per corpusType — the CreateCorpus
    * / CreateCorpusSeq document content (word granularity). Feed into
    * [[Corpus.vocab]] / bag-of-words for the Corpus equivalent. */
  def tokenStream(nodes: DataFrame, edges: DataFrame, labels: DataFrame,
      corpusType: Int): DataFrame = {
    require(corpusType >= 0 && corpusType <= 3, s"corpusType $corpusType")
    val base = baseNodes(nodes, corpusType)
    val parts: DataFrame =
      if (corpusType == 3) {
        val stem = udf(Stemmer.stemPhrase _)
        // each stemmed label is ONE token (:2440-2444); ordered by label
        // text for determinism (the reference keeps label-file order)
        base.join(labels, "id")
          .select(col("id").as("doc"), lit(0).as("part"),
            col("label").as("sub"), array(stem(col("label"))).as("ws"))
      } else {
        val own = base.select(col("id").as("doc"), lit(0).as("part"),
          lit("").as("sub"), titleWords(col("title")).as("ws"))
        if (corpusType <= 0) {
          val refTitles = nodes.select(col("id").as("refId"), col("title").as("refTitle"))
          val refs = base.select(col("id").as("doc"))
            .join(edges.withColumnRenamed("id", "doc"), "doc")
            .join(refTitles, "refId") // unknown refIds drop (reference nil-panics)
            .select(col("doc"), lit(1).as("part"),
              format_string("%020d", col("refId")).as("sub"),
              titleWords(col("refTitle")).as("ws"))
          own.union(refs)
        } else own
      }
    val toks = parts
      .select(col("doc"), col("part"), col("sub"),
        posexplode(col("ws")).as(Seq("pp", "term")))
    val w = Window.partitionBy("doc").orderBy("part", "sub", "pp")
    toks.withColumn("pos", row_number().over(w) - 1)
      .select("doc", "pos", "term")
  }

  /** Corpus from the graph: `(bow (doc, word, cnt), vocab (term, word))`. */
  def createCorpus(nodes: DataFrame, edges: DataFrame, labels: DataFrame,
      corpusType: Int): (DataFrame, DataFrame) = {
    val toks = tokenStream(nodes, edges, labels, corpusType).cache()
    val v = Corpus.vocab(toks)
    val bow = toks.join(v, "term")
      .groupBy("doc", "word").agg(count(lit(1)).cast("int").as("cnt"))
    (bow, v)
  }

  /** Candidate phrases per doc: `(doc, grp, phrase)` with grp dense in
    * title-then-refs order — the CorpusX word-group skeleton (one group
    * per keyphrase candidate, :2544-2561). */
  def candidateGroups(nodes: DataFrame, edges: DataFrame, corpusType: Int): DataFrame = {
    require(corpusType >= 0 && corpusType <= 2, s"corpusType $corpusType")
    val base = baseNodes(nodes, corpusType)
    val own = base.select(col("id").as("doc"), lit(0).as("part"), lit("").as("sub"),
      posexplode(Keyphrase.extract_candidates(col("title"))).as(Seq("ci", "phrase")))
    val cands =
      if (corpusType <= 0) {
        val refTitles = nodes.select(col("id").as("refId"), col("title").as("refTitle"))
        val refs = base.select(col("id").as("doc"))
          .join(edges.withColumnRenamed("id", "doc"), "doc")
          .join(refTitles, "refId")
          .select(col("doc"), lit(1).as("part"),
            format_string("%020d", col("refId")).as("sub"),
            posexplode(Keyphrase.extract_candidates(col("refTitle"))).as(Seq("ci", "phrase")))
        own.union(refs)
      } else own
    val w = Window.partitionBy("doc").orderBy("part", "sub", "ci")
    cands.withColumn("grp", row_number().over(w) - 1)
      .select("doc", "grp", "phrase")
  }

  /** CorpusX from the graph: every group expands to ALL possible
    * sub-phrases of its candidate (GetAllPossiblePhrases, :2546).
    * Returns `(bowX (doc, grp, word, cnt), vocab (term, word),
    * candidates (doc, grp, phrase))`. */
  def createCorpusX(nodes: DataFrame, edges: DataFrame, corpusType: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    val cands = candidateGroups(nodes, edges, corpusType).cache()
    val terms = cands.select(col("doc"), col("grp"),
      posexplode(Keyphrase.allPossiblePhrasesUdf(col("phrase"))).as(Seq("gp", "term")))
    val w = Window.partitionBy("doc").orderBy("grp", "gp")
    val toksX = terms.withColumn("pos", row_number().over(w) - 1)
      .select("doc", "pos", "term", "grp").cache()
    val v = Corpus.vocab(toksX.select("doc", "pos", "term"))
    val bowX = toksX.join(v, "term")
      .groupBy("doc", "grp", "word").agg(count(lit(1)).cast("int").as("cnt"))
    (bowX, v, cands)
  }

  /** symmetric string-keyed similarity view `(p1, p2, sim)` + identity is
    * NOT added here (callers decide how to treat self-similarity) */
  private def toPhraseSims(sims: DataFrame, vocab: DataFrame): DataFrame =
    sims
      .join(vocab.select(col("word").as("w1"), col("term").as("p1")), "w1")
      .join(vocab.select(col("word").as("w2"), col("term").as("p2")), "w2")
      .select("p1", "p2", "sim")

  /** GetPhraseSimilarity (:2269-2326): CreateCorpus(2) word corpus ->
    * concurrences -> similarity kernel `simType` (0-4), string-keyed
    * `(p1, p2, sim)` with p1 < p2 one direction stored. */
  def phraseSimilarity(nodes: DataFrame, edges: DataFrame, simType: Int): DataFrame = {
    val (bow, v) = createCorpus(nodes, edges, null, corpusType = 2)
    val cooc = Corpus.concurrences(bow)
    toPhraseSims(Similarity.induce(cooc, simType), v)
  }

  /** GetPhraseSimilarityX (:2330-2379): CreateCorpusX(2) sub-phrase corpus
    * -> cross-group concurrences minus same-group overlap exclusions ->
    * similarity kernel. Exclusion semantics (`cm.SetExclusions`, :2344):
    * excluded pairs are removed from the concurrence model before the
    * kernel is induced. */
  def phraseSimilarityX(nodes: DataFrame, edges: DataFrame, simType: Int): DataFrame = {
    val (bowX, v, cands) = createCorpusX(nodes, edges, corpusType = 2)
    val cooc = Corpus.concurrencesX(bowX)
    // exclusions are produced at phrase-string level over sub-phrases of
    // the same group (J9) and re-encoded onto the vocab
    val subPhrases = cands.select(col("doc"), col("grp"),
      explode(Keyphrase.allPossiblePhrasesUdf(col("phrase"))).as("phrase"))
    val excl = Keyphrase.exclusions(subPhrases)
      .join(v.select(col("term").as("p1"), col("word").as("ew1")), "p1")
      .join(v.select(col("term").as("p2"), col("word").as("ew2")), "p2")
      .select(least(col("ew1"), col("ew2")).as("w1"),
        greatest(col("ew1"), col("ew2")).as("w2"))
      .distinct()
    val kept = cooc.join(excl, Seq("w1", "w2"), "left_anti")
    toPhraseSims(Similarity.induce(kept, simType), v)
  }

  // ---- TF-IDF family -------------------------------------------------------

  /** title candidate phrases per main node, multiplicity kept: `(doc, p)` */
  private def titleCandidates(nodes: DataFrame): DataFrame =
    mainNodes(nodes).select(col("id").as("doc"),
      explode(Keyphrase.extract_candidates(col("title"))).as("p"))

  /** aux phrases = candidates of all referenced titles, multiplicity kept */
  private def auxPhrases(nodes: DataFrame, edges: DataFrame): DataFrame =
    mainNodes(nodes).select(col("id").as("doc"))
      .join(edges.withColumnRenamed("id", "doc"), "doc")
      .join(nodes.select(col("id").as("refId"), col("title").as("refTitle")), "refId")
      .select(col("doc"), explode(Keyphrase.extract_candidates(col("refTitle"))).as("p"))

  // -- TF/IDF family cores over a PRE-EXTRACTED candidates frame ------------
  // Every public entry point below runs the keyphrase-extraction UDF over
  // the titles exactly ONCE (localCheckpoint'd `cands`) and feeds all the
  // cores from it — at scale the extractor is the dominant scan cost and
  // must not run once per factor (tf AND idf AND simdf).

  private def tfFrom(cands: DataFrame, pool: DataFrame): DataFrame =
    cands.select(col("doc"), col("p").as("phrase")).distinct()
      .join(pool, Seq("doc"))
      .where(col("p") === col("phrase"))
      .groupBy("doc", "phrase").agg(count(lit(1)).cast("double").as("tf"))

  private def simTFFrom(cands: DataFrame, pool: DataFrame,
      phraseSim: DataFrame): DataFrame = {
    val sym = phraseSim.select(col("p1").as("phrase"), col("p2").as("p"), col("sim"))
      .union(phraseSim.select(col("p2").as("phrase"), col("p1").as("p"), col("sim")))
    cands.select(col("doc"), col("p").as("phrase")).distinct()
      .join(pool, Seq("doc"))
      .join(sym, Seq("phrase", "p"), "left")
      .select(col("doc"), col("phrase"),
        when(col("phrase") === col("p"), lit(1.0))
          .otherwise(coalesce(col("sim"), lit(0.0))).as("w"))
      .groupBy("doc", "phrase").agg(sum("w").as("tf"))
  }

  private def idfFrom(cands: DataFrame, numMain: Double): DataFrame =
    cands.select(col("doc"), col("p")).distinct()
      .groupBy(col("p").as("phrase"))
      .agg(count(lit(1)).as("df"))
      .select(col("phrase"), log(lit(numMain) / col("df")).as("idf"))

  private def simIDFFrom(cands: DataFrame, numMain: Double,
      phraseSim: DataFrame): DataFrame = {
    val groups = cands.select(col("doc"), col("p")).distinct()
    val sym = phraseSim.select(col("p1").as("phrase"), col("p2").as("p"), col("sim"))
      .union(phraseSim.select(col("p2").as("phrase"), col("p1").as("p"), col("sim")))
      .union(groups.select(col("p").as("phrase"), col("p"), lit(1.0).as("sim")).distinct())
    val perDoc = sym.join(groups, Seq("p"))
      .groupBy(col("doc"), col("phrase"))
      .agg(max("sim").as("m"))
    perDoc.groupBy("phrase").agg(sum("m").as("simdf"))
      .select(col("phrase"), log(lit(numMain) / col("simdf")).as("idf"))
  }

  /** one extraction pass shared by a whole TFIDF-family invocation */
  private def extractedCandidates(nodes: DataFrame): DataFrame =
    titleCandidates(nodes).localCheckpoint(true)

  /** KeyphraseExtraction.TF as consumed at :2077 — for each distinct title
    * candidate, its occurrence count in (title candidates ++ aux phrases)
    * of the same node. */
  def tf(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val cands = extractedCandidates(nodes)
    tfFrom(cands, cands.union(auxPhrases(nodes, edges)))
  }

  /** KeyphraseExtraction.SimTF as consumed at :2142 — fuzzy count:
    * SimTF(c) = Σ_{p ∈ title candidates ++ aux} sim(c, p), with
    * sim(c, c) = 1 for identical phrases and the sparse `phraseSim`
    * entries (symmetric lookup) otherwise. */
  def simTF(nodes: DataFrame, edges: DataFrame, phraseSim: DataFrame): DataFrame = {
    val cands = extractedCandidates(nodes)
    simTFFrom(cands, cands.union(auxPhrases(nodes, edges)), phraseSim)
  }

  /** KeyphraseExtraction.IDF as consumed at :2084 — idf(p) = ln(numMain /
    * df(p)) where df = # main nodes whose TITLE candidate group contains
    * p (aux phrases do not count toward df, matching
    * `phraseCandidateGroups` holding only title candidates). */
  def idf(nodes: DataFrame, edges: DataFrame): DataFrame =
    idfFrom(extractedCandidates(nodes), mainNodes(nodes).count().toDouble)

  /** KeyphraseExtraction.SimIDF as consumed at :2236 — fuzzy document
    * frequency: simdf(p) = Σ_docs max_{q ∈ title candidates of doc}
    * sim(p, q) (1 if the doc contains p itself); idf = ln(numMain /
    * simdf). */
  def simIDF(nodes: DataFrame, edges: DataFrame, phraseSim: DataFrame): DataFrame =
    simIDFFrom(extractedCandidates(nodes), mainNodes(nodes).count().toDouble,
      phraseSim)

  /** TFIDF (:2058-2102): per main node, weight(c) = TF(c) · IDF(c) over
    * title candidates — no containment dedup in the plain variant. One
    * candidate extraction feeds both factors. */
  def tfidf(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val cands = extractedCandidates(nodes)
    val numMain = mainNodes(nodes).count().toDouble
    tfFrom(cands, cands.union(auxPhrases(nodes, edges)))
      .join(idfFrom(cands, numMain), "phrase")
      .select(col("doc"), col("phrase"), (col("tf") * col("idf")).as("weight"))
  }

  /** SimTFIDF (:2111-2196): SimTF · IDF followed by the ArgSort + greedy
    * containment dedup (W2) the reference applies in this variant only. */
  def simTFIDF(nodes: DataFrame, edges: DataFrame, phraseSim: DataFrame): DataFrame = {
    val cands = extractedCandidates(nodes)
    val numMain = mainNodes(nodes).count().toDouble
    val weighted = simTFFrom(cands, cands.union(auxPhrases(nodes, edges)), phraseSim)
      .join(idfFrom(cands, numMain), "phrase")
      .select(col("doc"), col("phrase"), (col("tf") * col("idf")).as("weight"))
    Keyphrase.greedyContainmentDedup(weighted)
  }

  /** SimTFSimIDF (:2205-2265): SimTF · SimIDF, no dedup. */
  def simTFSimIDF(nodes: DataFrame, edges: DataFrame, phraseSim: DataFrame): DataFrame = {
    val cands = extractedCandidates(nodes)
    val numMain = mainNodes(nodes).count().toDouble
    simTFFrom(cands, cands.union(auxPhrases(nodes, edges)), phraseSim)
      .join(simIDFFrom(cands, numMain, phraseSim), "phrase")
      .select(col("doc"), col("phrase"), (col("tf") * col("idf")).as("weight"))
  }

  // ---- clustering entry points --------------------------------------------

  /** E1 — ClusterByLDA (:2797-2823): corpus(0) -> LDA -> memberships
    * `(doc = main node id, membership ARRAY<DOUBLE>)`. Main nodes whose
    * corpus document is empty get the all-zero membership the reference's
    * Infer produces for empty docs. */
  def clusterByLDA(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      numTopics: Int, alpha: Double, beta: Double, numIters: Int): DataFrame = {
    require(numTopics > 0 && alpha > 0.0 && beta > 0.0 && numIters > 0,
      "all parameters of ClusterByLDA must be > 0")
    val (bow, v) = createCorpus(nodes, edges, null, corpusType = 0)
    val numWords = v.count().toInt
    val model = new LDA(numTopics, alpha, beta).train(spark, bow, numWords, numIters)
    val inferred = model.infer(spark, bow)
    val empty = mainNodes(nodes).select(col("id").as("doc"))
      .join(inferred, Seq("doc"), "left_anti")
      .withColumn("membership",
        array_repeat(lit(0.0), numTopics).cast("array<double>"))
    inferred.union(empty)
  }

  /** E2 — ClusterTitlesByGSDMM (:2983-3026): GetPhraseSimilarityX(simType)
    * -> SimTFIDF -> per-doc mean-weight filter (drop weight <
    * 0.5·meanWeight, :2996-3005) -> phrase corpus (each kept phrase is one
    * token) -> GSDMM -> memberships `(doc, membership)`. */
  def clusterTitlesByGSDMM(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      simType: Int, numTopics: Int, alpha: Double, beta: Double, numIters: Int)
      : DataFrame = {
    require(numTopics > 0 && alpha > 0.0 && beta > 0.0 && numIters > 0,
      "all parameters of ClusterTitlesByGSDMM must be > 0")
    val sims = phraseSimilarityX(nodes, edges, simType).localCheckpoint(true)
    val weighted = simTFIDF(nodes, edges, sims)
    val w = Window.partitionBy("doc")
    val kept = weighted
      .withColumn("meanW", avg("weight").over(w))
      .where(col("weight") >= lit(0.5) * col("meanW"))
      .select(col("doc"), col("phrase"))
    gsdmmMemberships(spark, nodes, kept, numTopics, alpha, beta, numIters)
  }

  /** ClusterLabelsByGSDMM (:3046-3075): corpus(3) -> GSDMM -> memberships. */
  def clusterLabelsByGSDMM(spark: SparkSession, nodes: DataFrame, labels: DataFrame,
      numTopics: Int, alpha: Double, beta: Double, numIters: Int): DataFrame = {
    require(numTopics > 0 && alpha > 0.0 && beta > 0.0 && numIters > 0,
      "all parameters of ClusterLabelsByGSDMM must be > 0")
    val toks = tokenStream(nodes, null, labels, corpusType = 3)
    gsdmmMemberships(spark, nodes,
      toks.select(col("doc"), col("term").as("phrase")),
      numTopics, alpha, beta, numIters)
  }

  /** shared GSDMM tail: phrase rows -> vocab corpus -> train -> per-doc
    * membership inference, empty main docs inferred on the empty word
    * list (reference Infer of an empty doc). */
  private def gsdmmMemberships(spark: SparkSession, nodes: DataFrame,
      docPhrases: DataFrame, numTopics: Int, alpha: Double, beta: Double,
      numIters: Int): DataFrame = {
    import spark.implicits._
    val w2 = Window.partitionBy("doc").orderBy("phrase")
    val toks = docPhrases
      .withColumn("pos", row_number().over(w2) - 1)
      .select(col("doc"), col("pos"), col("phrase").as("term"))
    val v = Corpus.vocab(toks)
    val bow = toks.join(v, "term")
      .groupBy("doc", "word").agg(count(lit(1)).cast("int").as("cnt"))
    val numWords = v.count().toInt
    val model = new GSDMM(numTopics, alpha, beta).train(spark, bow, numWords, numIters)
    val inferred = model.inferMemberships(spark)
    val emptyMembership = model.infer(Seq.empty)
    val empty = mainNodes(nodes).select(col("id").as("doc"))
      .join(inferred, Seq("doc"), "left_anti")
      .withColumn("membership", typedLit(emptyMembership))
    inferred.union(empty)
  }

  /** ClusterTitlesByWPDM (:2840-2882): corpus(2) concurrences -> word
    * similarity kernel with SetPairFilter(0.1, 3.0) -> main-node doc
    * groups (word sets of corpus(1) translated onto the corpus(2) vocab,
    * :2856-2868) -> GroupPairDBScan (minPts > 0) or GroupPairAHC.
    *
    * Group-pair similarity (external ConcurrenceBasedClustering semantics,
    * documented inference): sim(G1, G2) = mean over (w1 ∈ G1, w2 ∈ G2) of
    * word sim(w1, w2), with sim(w, w) = 1. Returns `(member = main node
    * id, cluster)`. */
  def clusterTitlesByWPDM(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      eps: Double, minPts: Int, simType: Int): DataFrame = {
    val (bow, v) = createCorpus(nodes, edges, null, corpusType = 2)
    val cooc = Corpus.concurrences(bow)
    // truncate lineage at the chain boundary: the similarity frame is
    // re-referenced many times downstream (pair filter ×3, symmetrize ×2,
    // DBSCAN core/border/noise passes) and would otherwise multiply the
    // whole corpus plan into an exponentially large tree
    val wordSims = Similarity.pairFilter(Similarity.induce(cooc, simType), 0.1, 3.0)
      .localCheckpoint(true)
    val (mainBow, mainV) = createCorpus(nodes, edges, null, corpusType = 1)
    val (translated, missing) = Corpus.translate(mainBow, mainV, v)
    require(missing.isEmpty, "main-corpus term missing from full vocab (J3 fatal)")
    val groups = translated.select(col("doc"), col("word")).distinct()
      .localCheckpoint(true)
    wpdmCluster(spark, groups, wordSims, eps, minPts)
  }

  /** ClusterLabelsByWPDM (:2898-2936): corpus(3) concurrences; no pair
    * filter, groups = label-word sets of the same corpus. */
  def clusterLabelsByWPDM(spark: SparkSession, nodes: DataFrame, labels: DataFrame,
      eps: Double, minPts: Int, simType: Int): DataFrame = {
    val (bow, _) = createCorpus(nodes, null, labels, corpusType = 3)
    val cooc = Corpus.concurrences(bow)
    val wordSims = Similarity.induce(cooc, simType).localCheckpoint(true)
    val groups = bow.select(col("doc"), col("word")).distinct()
      .localCheckpoint(true)
    wpdmCluster(spark, groups, wordSims, eps, minPts)
  }

  /** group-pair similarity + DBSCAN/AHC tail shared by the WPDM wrappers.
    * AHC (`minPts == 0`, reference parity — the dendrogram is inherently
    * sequential) collects the full doc-pair similarity frame to the
    * driver, so that path is gated by `ahcPairCeiling`, mirroring
    * [[graft.pipeline.Ann.bruteForceTopK]]'s collect guard. */
  private[graft] def wpdmCluster(spark: SparkSession, groups: DataFrame,
      wordSims: DataFrame, eps: Double, minPts: Int,
      ahcPairCeiling: Long = 2L * 1000 * 1000): DataFrame = {
    import spark.implicits._
    val sizes = groups.groupBy("doc").agg(count(lit(1)).as("sz"))
    val sym = wordSims.select(col("w1"), col("w2"), col("sim"))
      .union(wordSims.select(col("w2").as("w1"), col("w1").as("w2"), col("sim")))
      .union(groups.select(col("word").as("w1"), col("word").as("w2"),
        lit(1.0).as("sim")).distinct())
    // Σ_{w1∈G1, w2∈G2} sim(w1,w2) via the sparse sim entries only
    val cross = groups.select(col("doc").as("d1"), col("word").as("w1"))
      .join(sym, "w1")
      .join(groups.select(col("doc").as("d2"), col("word").as("w2")), "w2")
      .where(col("d1") < col("d2"))
      .groupBy("d1", "d2").agg(sum("sim").as("s"))
    val pairSims = cross
      .join(sizes.select(col("doc").as("d1"), col("sz").as("n1")), "d1")
      .join(sizes.select(col("doc").as("d2"), col("sz").as("n2")), "d2")
      .select(col("d1").as("w1"), col("d2").as("w2"),
        (col("s") / (col("n1") * col("n2"))).as("sim"))
      .localCheckpoint(true) // DBSCAN re-references this frame many times
    val clustered =
      if (minPts > 0) Clustering.dbscan(spark, pairSims, eps, minPts)
      else {
        // Guardrail: fail loudly instead of OOMing the driver on a
        // misrouted large pair frame (the only driver collect without a
        // ceiling until round 5)
        val numPairs = pairSims.count()
        require(numPairs <= ahcPairCeiling,
          s"wpdmCluster: AHC (minPts == 0) collects all $numPairs doc-pair " +
            s"similarities to the driver, over the ceiling $ahcPairCeiling; " +
            "use dbscan (minPts > 0) for large corpora, or raise the " +
            "ceiling if the driver really has the memory")
        val seq = pairSims.select(col("w1").cast("long"), col("w2").cast("long"),
          col("sim")).as[(Long, Long, Double)].collect().toSeq
        val m = Clustering.ahc(seq, eps)
        m.toSeq.toDF("member", "cluster")
      }
    // docs with no similar pair at all still cluster (alone)
    val singletons = groups.select(col("doc").cast("long").as("member")).distinct()
      .join(clustered, Seq("member"), "left_anti")
      .select(col("member"), col("member").as("cluster"))
    clustered.union(singletons)
  }

  /** GetStronglyConnectedPhrases (:3673-3797): CorpusX(2) sub-phrase corpus
    * -> cross-group per-(doc,group)-occurrence concurrences (A4, exact
    * visited-set-per-(g1,w1) semantics) -> lift filter
    * (freq >= thresFreq AND freq >= thresRatio · expected, where
    * expected = df1/numDocs · df2/numDocs · numNodes). The reference reads
    * the DIRECTED count oriented from the smaller vocab id
    * (`concurrences[w1][w2]` with `w1 < w2`, :3761-3769) — replicated by
    * the id filter below. Returns `(p1, p2, actual, expected)`
    * string-keyed. */
  def stronglyConnectedPhrases(nodes: DataFrame, edges: DataFrame,
      thresFreq: Double, thresRatio: Double): DataFrame = {
    val (bowX, v, _) = createCorpusX(nodes, edges, corpusType = 2)
    // corpus.Docs includes empty docs (AddDoc runs for every node), so
    // numDocs = node count, which for type 2 also equals n (:3687, :3759)
    val n = nodes.count().toDouble
    val numDocs = n
    val pairs = Corpus.docConcurrencesX(bowX)
      .where(col("w1") < col("w2")) // reference orientation: smaller id first
    val dfreq = bowX.select(col("doc"), col("word")).distinct()
      .groupBy("word").agg(count(lit(1)).as("df"))
    pairs
      .join(dfreq.select(col("word").as("w1"), col("df").as("df1")), "w1")
      .join(dfreq.select(col("word").as("w2"), col("df").as("df2")), "w2")
      .withColumn("expected",
        col("df1") / lit(numDocs) * col("df2") / lit(numDocs) * lit(n))
      .where(col("docs") >= thresFreq &&
        col("docs") >= lit(thresRatio) * col("expected"))
      .join(v.select(col("word").as("w1"), col("term").as("p1")), "w1")
      .join(v.select(col("word").as("w2"), col("term").as("p2")), "w2")
      .select(col("p1"), col("p2"), col("docs").cast("double").as("actual"),
        col("expected"))
  }
}
