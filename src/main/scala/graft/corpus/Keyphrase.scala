package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.ref.Stemmer

/** The KeyphraseExtraction surface the reference consumes (SURVEY.md §2.9
  * row 1: ExtractKeyPhraseCandidates / Includes / Overlaps /
  * GetAllPossiblePhrases / ArgSort+containment-dedup), re-implemented
  * natively. Call sites: CitationGraphs.go:2065-2236, :2414-2689, :693,
  * :2175-2191.
  */
object Keyphrase {

  // minimal English stopword set used as phrase delimiters
  private val stopwords: Set[String] = Set(
    "a", "an", "the", "of", "in", "on", "for", "to", "and", "or", "with",
    "by", "at", "from", "as", "is", "are", "was", "were", "be", "its",
    "this", "that", "these", "those", "via", "using", "toward", "towards")

  /** ExtractKeyPhraseCandidates: lowercase, split on stopwords/punctuation
    * boundaries, stem each word; each maximal non-stopword run is one
    * candidate phrase. */
  def extractCandidates(title: String): Seq[String] = {
    if (title == null) return Seq.empty
    val words = title.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
    val out = Seq.newBuilder[String]
    val cur = scala.collection.mutable.Buffer.empty[String]
    def flush(): Unit = {
      if (cur.nonEmpty) { out += cur.mkString(" "); cur.clear() }
    }
    words.foreach { w =>
      if (stopwords(w)) flush() else cur += Stemmer.stemWord(w)
    }
    flush()
    out.result()
  }

  val extractCandidatesUdf = udf(extractCandidates _)

  def extract_candidates(c: Column): Column = extractCandidatesUdf(c)

  /** GetAllPossiblePhrases: every contiguous word sub-span of a phrase. */
  def allPossiblePhrases(phrase: String): Seq[String] = {
    val ws = phrase.split(" ").filter(_.nonEmpty)
    for {
      i <- ws.indices
      j <- i until ws.length
    } yield ws.slice(i, j + 1).mkString(" ")
  }

  val allPossiblePhrasesUdf = udf(allPossiblePhrases _)

  /** Includes: phrase a contains phrase b as a contiguous word sub-span. */
  def includes(a: String, b: String): Boolean = {
    val aw = a.split(" ").toSeq
    val bw = b.split(" ").toSeq
    bw.nonEmpty && aw.containsSlice(bw)
  }

  /** Overlaps: the phrases share at least one word (the J9 theta
    * predicate for exclusion pairs, CitationGraphs.go:693). */
  def overlaps(a: String, b: String): Boolean = {
    val aw = a.split(" ").toSet
    b.split(" ").exists(aw.contains)
  }

  val overlapsUdf = udf(overlaps _)

  /** W2 — ArgSort + greedy containment dedup (CitationGraphs.go:
    * 2175-2191): per doc, sort phrases by weight desc and keep a phrase
    * only if no already-kept phrase Includes it in either direction.
    * Order-dependent sequential scan -> flatMapGroups over sorted
    * iterators; embarrassingly parallel across docs. */
  def greedyContainmentDedup(weighted: DataFrame): DataFrame = {
    val spark = weighted.sparkSession
    import spark.implicits._
    weighted.select(col("doc").cast("long"), col("phrase"), col("weight").cast("double"))
      .as[(Long, String, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (doc, it) =>
        val sorted = it.toSeq.sortBy { case (_, p, w) => (-w, p) }
        val kept = scala.collection.mutable.Buffer.empty[(String, Double)]
        sorted.foreach { case (_, p, w) =>
          if (!kept.exists { case (k, _) => includes(k, p) || includes(p, k) })
            kept += ((p, w))
        }
        kept.iterator.map { case (p, w) => (doc, p, w) }
      }.toDF("doc", "phrase", "weight")
  }

  /** Exclusion pairs (J9): same-group phrase pairs whose texts overlap —
    * a self-join on (doc, grp) with the Overlaps theta residual. */
  def exclusions(phrases: DataFrame): DataFrame = {
    val a = phrases.select(col("doc"), col("grp"), col("phrase").as("p1"))
    val b = phrases.select(col("doc"), col("grp"), col("phrase").as("p2"))
    a.join(b, Seq("doc", "grp"))
      .where(col("p1") < col("p2") && overlapsUdf(col("p1"), col("p2")))
      .select("p1", "p2").distinct()
  }
}
