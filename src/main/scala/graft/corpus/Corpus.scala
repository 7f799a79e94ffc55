package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextAnalysis

/** Corpus representations (reference CitationGraphs.go:83-102) in long form:
  *
  *  - Corpus:    `(doc LONG, word INT, cnt INT)` bag-of-words
  *  - CorpusX:   `(doc LONG, grp INT, word INT, cnt INT)` word groups
  *  - CorpusSeq: `(doc LONG, pos INT, word INT)` positional sequences
  *
  * plus the vocab dimension `(term STRING, word INT)`.
  *
  * Vocab id assignment: the reference assigns ids in first-seen order while
  * scanning docs sequentially (`AddDoc`, CitationGraphs.go:138-158) — a
  * partitioning-dependent notion. The deterministic distributed equivalent
  * (SURVEY.md §7 hard part b): id = `row_number` over `(first doc id, first
  * position within that doc)` of each term, which equals the sequential
  * first-seen order whenever docs are processed in doc-id order.
  */
object Corpus {

  /** Tokenized long form `(doc, pos, term)` from `(doc, text)`. */
  def tokens(docs: DataFrame, docCol: String = "doc", textCol: String = "text"): DataFrame =
    docs.select(col(docCol).as("doc"),
        posexplode(TextAnalysis.tokens(lower(col(textCol)))).as(Seq("pos", "term")))

  /** Deterministic first-seen-order vocab: `(term, word)` with dense ids.
    *
    * Id assignment is the same range-partition + sortWithinPartitions +
    * zipWithIndex prefix-sum mechanism as `Graphs.encodeVertices` — NOT a
    * single-partition `row_number` window, which would funnel every distinct
    * term through one task (a driver-adjacent bottleneck at billions of
    * terms). Range partitioning preserves global `(firstDoc, firstPos,
    * term)` order, so ids are invariant to the partition count. */
  def vocab(toks: DataFrame): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    val p = spark.sessionState.conf.numShufflePartitions
    val firstSeen = toks.groupBy("term")
      .agg(min(struct(col("doc"), col("pos"))).as("first"))
      .select(col("first.doc").as("fd"), col("first.pos").as("fp"), col("term"))
    firstSeen
      .repartitionByRange(p, col("fd"), col("fp"), col("term"))
      .sortWithinPartitions("fd", "fp", "term")
      .select("term").as[String]
      .rdd.zipWithIndex()
      .map { case (term, idx) =>
        // word ids are INT downstream (bow/topic tables); past 2^31 terms
        // the cast would wrap negative — fail loudly at the scale this
        // path advertises instead of silently corrupting ids
        require(idx <= Int.MaxValue,
          s"vocab overflows Int word ids at term index $idx; widen the " +
            "word id column to LONG before training at this vocabulary size")
        (term, idx.toInt)
      }
      .toDF("term", "word")
  }

  /** Bag-of-words corpus + vocab from raw documents. */
  def build(docs: DataFrame): (DataFrame, DataFrame) = {
    val toks = tokens(docs).cache()
    val v = vocab(toks)
    val bow = toks.join(v, "term")
      .groupBy("doc", "word").agg(count(lit(1)).cast("int").as("cnt"))
    (bow, v)
  }

  /** Positional corpus (CorpusSeq) + vocab. */
  def buildSeq(docs: DataFrame): (DataFrame, DataFrame) = {
    val toks = tokens(docs).cache()
    val v = vocab(toks)
    (toks.join(v, "term").select("doc", "pos", "word"), v)
  }

  /** `Corpus.translate` (CitationGraphs.go:932-953): re-encode onto a new
    * vocab; the reference log.Fatals on a missing term — here the returned
    * `missing` frame must be asserted empty by the caller (J3 semantics). */
  def translate(bow: DataFrame, oldVocab: DataFrame, newVocab: DataFrame)
      : (DataFrame, DataFrame) = {
    val mapped = oldVocab.select(col("term"), col("word").as("oldWord"))
      .join(newVocab.select(col("term"), col("word").as("newWord")), Seq("term"), "left")
    val missing = mapped.where(col("newWord").isNull).select("term")
    val out = bow.join(broadcast(mapped.where(col("newWord").isNotNull))
        .select(col("oldWord").as("word"), col("newWord")), "word")
      .select(col("doc"), col("newWord").as("word"), col("cnt"))
    (out, missing)
  }

  /** `CorpusX.translate` (CitationGraphs.go:957-981): the grouped-corpus
    * variant of [[translate]] — re-encode `(doc, grp, word, cnt)` onto a
    * new vocab, preserving groups; the caller must assert `missing`
    * empty (the reference log.Fatals on an unmapped term). */
  def translateX(bowX: DataFrame, oldVocab: DataFrame, newVocab: DataFrame)
      : (DataFrame, DataFrame) = {
    val mapped = oldVocab.select(col("term"), col("word").as("oldWord"))
      .join(newVocab.select(col("term"), col("word").as("newWord")), Seq("term"), "left")
    val missing = mapped.where(col("newWord").isNull).select("term")
    val out = bowX.join(broadcast(mapped.where(col("newWord").isNotNull))
        .select(col("oldWord").as("word"), col("newWord")), "word")
      .select(col("doc"), col("grp"), col("newWord").as("word"), col("cnt"))
    (out, missing)
  }

  /** Drop words whose document frequency exceeds `maxDf` (0 = keep all).
    * The SetPairFilter philosophy (SURVEY §4): sparsify BEFORE any O(d²)
    * pair enumeration — one hot word in every doc otherwise quadratically
    * dominates every same-doc pair join at web scale. */
  def capDf(bow: DataFrame, maxDf: Long): DataFrame =
    if (maxDf <= 0L) bow
    else bow.join(docFreqs(bow).where(col("df") > maxDf).select("word"),
      Seq("word"), "left_anti")

  /** A2/A3 — GetConcurrences: Σ_docs cnt1*cnt2 over same-doc word pairs,
    * `w1 < w2` triangular enumeration (CitationGraphs.go:214-294). The
    * self-join shuffles once on `doc`; the pair aggregation is a map-side
    * combinable hash agg. `maxDf` (default off — exact reference
    * semantics) caps per-word document frequency before the pair join. */
  def concurrences(bow: DataFrame, maxDf: Long = 0L): DataFrame = {
    val capped = capDf(bow, maxDf)
    val a = capped.select(col("doc"), col("word").as("w1"), col("cnt").as("c1"))
    val b = capped.select(col("doc"), col("word").as("w2"), col("cnt").as("c2"))
    a.join(b, "doc")
      .where(col("w1") < col("w2"))
      .groupBy("w1", "w2")
      .agg(sum(col("c1") * col("c2")).as("cooc"))
  }

  /** A4 — GetDocConcurrences: # distinct docs containing both words
    * (CitationGraphs.go:835-928). */
  def docConcurrences(bow0: DataFrame, maxDf: Long = 0L): DataFrame = {
    val bow = capDf(bow0, maxDf)
    val a = bow.select(col("doc"), col("word").as("w1"))
    val b = bow.select(col("doc"), col("word").as("w2"))
    a.join(b, "doc")
      .where(col("w1") < col("w2"))
      .groupBy("w1", "w2")
      .agg(countDistinct(col("doc")).as("docs"))
  }

  /** CorpusX (grouped corpus, reference :91-94): one word-group per
    * keyphrase candidate — `(doc, grp, word, cnt)`. */
  def buildX(docs: DataFrame): (DataFrame, DataFrame) = {
    val candidates = docs.select(col("doc"),
        posexplode(Keyphrase.extract_candidates(col("text"))).as(Seq("grp", "phrase")))
    val toks = candidates.select(col("doc"), col("grp"),
        posexplode(split(col("phrase"), " ")).as(Seq("pos", "term")))
      .withColumn("pos", col("grp") * 1000 + col("pos")) // global order within doc
    val v = vocab(toks)
    val bowX = toks.join(v, "term")
      .groupBy("doc", "grp", "word").agg(count(lit(1)).cast("int").as("cnt"))
    (bowX, v)
  }

  /** A3 — CorpusX.GetConcurrences (CitationGraphs.go:740-830): same-doc
    * pairs restricted to DIFFERENT word groups. */
  def concurrencesX(bowX0: DataFrame, maxDf: Long = 0L): DataFrame = {
    val bowX = capDf(bowX0, maxDf)
    val a = bowX.select(col("doc"), col("grp").as("g1"), col("word").as("w1"),
      col("cnt").as("c1"))
    val b = bowX.select(col("doc"), col("grp").as("g2"), col("word").as("w2"),
      col("cnt").as("c2"))
    a.join(b, "doc")
      .where(col("w1") < col("w2") && col("g1") =!= col("g2"))
      .groupBy("w1", "w2")
      .agg(sum(col("c1") * col("c2")).as("cooc"))
  }

  /** A4 — CorpusX.GetDocConcurrences (:835-928), exact loop semantics:
    * the reference opens a FRESH visited set per (doc, group-occurrence of
    * w1), so each group g1 containing w1 contributes one count for every
    * w2 present in some OTHER group of the same doc. A sub-phrase sitting
    * in k candidate groups of one doc therefore adds k, not 1 — the count
    * is per `(doc, g1)` occurrence, and DIRECTED: `docs(w1→w2)` tallies
    * the occurrences of w1's groups, which differs from `docs(w2→w1)`
    * when the two words' group multiplicities differ. Output carries both
    * directions; consumers pick the orientation the reference reads
    * (findStronglyConnectedPhrases uses the smaller vocab id as w1). */
  def docConcurrencesX(bowX: DataFrame): DataFrame = {
    val a = bowX.select(col("doc"), col("grp").as("g1"), col("word").as("w1"))
    val b = bowX.select(col("doc"), col("grp").as("g2"), col("word").as("w2"))
    a.join(b, "doc")
      .where(col("w1") =!= col("w2") && col("g1") =!= col("g2"))
      // ∃-quantify over g2: one count per (doc, g1) regardless of how many
      // other groups carry w2 (the reference's visited-set dedup)
      .select(col("doc"), col("g1"), col("w1"), col("w2")).distinct()
      .groupBy("w1", "w2")
      .agg(count(lit(1)).as("docs"))
  }

  /** A8 — document lengths. */
  def docLengths(bow: DataFrame): DataFrame =
    bow.groupBy("doc").agg(sum("cnt").as("len"))

  /** A9 — document frequency per word (IDF numerator). */
  def docFreqs(bow: DataFrame): DataFrame =
    bow.groupBy("word").agg(countDistinct(col("doc")).as("df"))

  /** TF-IDF with the reference's doc-mean weight filter (P6/W6,
    * CitationGraphs.go:2996-3005): keep `(doc, word)` whose weight is at
    * least `minRatio` × the doc's mean weight. */
  def tfidf(bow: DataFrame, numDocs: Long, minRatio: Double = 0.5): DataFrame = {
    val withIdf = bow.join(docFreqs(bow), "word")
      .withColumn("weight", col("cnt") * log(lit(numDocs.toDouble) / col("df")))
    val w = Window.partitionBy("doc")
    withIdf
      .withColumn("docMean", avg("weight").over(w))
      .where(col("weight") >= lit(minRatio) * col("docMean"))
      .select("doc", "word", "weight")
  }
}
