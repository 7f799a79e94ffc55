package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.Pages.mix

/** word2vec CBOW + negative sampling as an iterative Dataset job — the
  * reference's training objective (wego: `word2vec.Cbow` +
  * `word2vec.NegativeSampling`, NegativeSampleSize 5, Window 5, Dim 100 —
  * CitationGraphs.go:4110-4134), re-expressed Spark-first. This closes the
  * SURVEY §7(g) deviation: MLlib ships skip-gram+HS only, so the CBOW+NS
  * objective is implemented here directly.
  *
  * Objective per center position t (standard CBOW-NS, Mikolov et al. 2013):
  * `h = mean of context input vectors` over a hash-shrunk window, one
  * positive (the center word) + `negative` unigram^(3/4) samples through
  * the logistic loss; gradients flow to the output vectors and back to
  * every context word's input vector.
  *
  * Distribution design (the Spark-first part):
  *  - the corpus stays a Dataset of token-id arrays; each superstep (epoch)
  *    broadcasts the two weight matrices and trains true sequential SGD
  *    inside `mapPartitions` on a partition-local copy — the classic
  *    parameter-averaging scheme (what MLlib Word2Vec does for skip-gram).
  *  - partitions emit per-word DELTAS `(wordId, side, Δvec, touches)`; a
  *    distributed `groupBy(word, side)` aggregates them touch-weighted, the
  *    driver applies `w += Σ touchesᵖ·Δᵖ / Σ touchesᵖ` and rebroadcasts.
  *    Only touched words travel — the shuffle is bounded by the active
  *    vocabulary per epoch, not |corpus|.
  *  - vocab×dim×2 doubles live on the driver + broadcast: that is the
  *    word2vec memory model (wego is single-machine for the same reason).
  *    `vocabCeiling` fails loudly before an OOM; the fix is `minCount`.
  *  - all randomness (init, window shrink, negative draws, subsampling) is
  *    counter-mode hash of `(seed, doc, pos, epoch, …)` — every gradient a
  *    partition computes is reproducible by construction for a fixed
  *    partition count (sequential-SGD averaging is inherently
  *    partition-count-sensitive). Same-`parts` reruns are bit-identical in
  *    local mode (spec-asserted); on a real cluster the per-epoch delta
  *    merge sums partition contributions in shuffle-fetch order, so float
  *    non-associativity can perturb low-order bits run-to-run — the
  *    guarantee there is deterministic gradients, not a bit-exact model.
  */
class CbowNs(
    val dim: Int = 100,
    val window: Int = 5,
    val negative: Int = 5,
    val minCount: Int = 5,
    val epochs: Int = 5,
    val lr0: Double = 0.025,
    val subsample: Double = 1e-3,
    val seed: Long = 42L,
    val parts: Int = 0, // 0 = spark.sql.shuffle.partitions
    val vocabCeiling: Long = 32L * 1000 * 1000) extends Serializable {

  private def u01(h: Long): Double = ((h >>> 11).toDouble) / (1L << 53).toDouble
  private def sigmoid(x: Double): Double =
    if (x > 8) 1.0 else if (x < -8) 0.0 else 1.0 / (1.0 + math.exp(-x))

  /** Train on `(doc LONG, toks ARRAY<STRING>)`. Returns `(word, vec)` with
    * vec = input+output aggregate (the reference saves `vector.Agg`). */
  def fit(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val nParts =
      if (parts > 0) parts else spark.sessionState.conf.numShufflePartitions

    // ---- vocab: count-desc, term-asc ids (deterministic) -----------------
    val counts = docs.select(explode(col("toks")).as("term"))
      .groupBy("term").agg(count(lit(1)).as("c"))
      .where(col("c") >= minCount)
      .orderBy(desc("c"), asc("term"))
      .as[(String, Long)].collect()
    val v = counts.length
    require(v.toLong * dim * 2 <= vocabCeiling,
      s"CBOW-NS: vocab $v × dim $dim × 2 exceeds the weight ceiling " +
        s"$vocabCeiling; raise minCount (or the ceiling if the driver " +
        "really has the memory)")
    if (v == 0) return Seq.empty[(String, Seq[Double])].toDF("word", "vec")
    val vocabIdx: Map[String, Int] = counts.iterator.map(_._1).zipWithIndex.toMap
    val cnt: Array[Long] = counts.map(_._2)
    val totalTokens = cnt.sum.toDouble

    // unigram^(3/4) cumulative table for negative draws (binary search)
    val cum = new Array[Double](v)
    var acc = 0.0
    var i = 0
    while (i < v) { acc += math.pow(cnt(i).toDouble, 0.75); cum(i) = acc; i += 1 }

    val sc = spark.sparkContext
    val vocabB = sc.broadcast(vocabIdx)
    val cumB = sc.broadcast(cum)
    val cntB = sc.broadcast(cnt)

    // corpus as id arrays, pinned to a deterministic partition layout:
    // docs hash-route by id, sorted within partitions, cached for all epochs
    val corpus = docs.select(col("doc").cast("long"), col("toks"))
      .as[(Long, Seq[String])]
      .map { case (d, ts) =>
        val idx = vocabB.value
        (d, ts.iterator.flatMap(idx.get).toArray)
      }
      .repartition(nParts, col("_1"))
      .sortWithinPartitions("_1")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpus.count()

    // ---- weights: in-vectors hash-random in [-.5/dim, .5/dim), out zero --
    val syn0 = new Array[Double](v * dim)
    val syn1 = new Array[Double](v * dim)
    i = 0
    while (i < syn0.length) {
      syn0(i) = (u01(mix(seed ^ 0x5eed0L ^ i.toLong)) - 0.5) / dim
      i += 1
    }

    val g = this
    val kDim = dim; val kWin = window; val kNeg = negative
    val kSub = subsample; val kSeed = seed

    (0 until epochs).foreach { epoch =>
      val lr = math.max(lr0 * (1.0 - epoch.toDouble / epochs), lr0 * 1e-4)
      val s0B = sc.broadcast(syn0)
      val s1B = sc.broadcast(syn1)

      // each partition: local sequential SGD over its docs, emit deltas
      val deltas = corpus.mapPartitions { it =>
        val base0 = s0B.value; val base1 = s1B.value
        val loc0 = base0.clone(); val loc1 = base1.clone()
        val cums = cumB.value; val cs = cntB.value
        val nV = cums.length
        val touched0 = new java.util.HashMap[Integer, Integer]()
        val touched1 = new java.util.HashMap[Integer, Integer]()
        val h = new Array[Double](kDim)
        val grad = new Array[Double](kDim)
        val ctx = new Array[Int](2 * kWin)

        def negSample(r: Double): Int = {
          val target = r * cums(nV - 1)
          var lo = 0; var hi = nV - 1
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (cums(mid) < target) lo = mid + 1 else hi = mid
          }
          lo
        }

        it.foreach { case (d, ids0) =>
          // frequent-word subsampling (word2vec.c formula), hash-seeded
          var ids = ids0
          if (kSub > 0) {
            ids = ids0.zipWithIndex.filter { case (w, p) =>
              val f = cs(w).toDouble / totalTokens
              val keep = (math.sqrt(f / kSub) + 1.0) * kSub / f
              keep >= 1.0 ||
                g.u01(mix(mix(kSeed ^ d) ^ (p.toLong * 0x9e3779b9L) ^ epoch)) < keep
            }.map(_._1)
          }
          val n = ids.length
          var t = 0
          while (t < n) {
            val center = ids(t)
            // window shrink: b uniform in [0, window)
            val b = (mix(mix(kSeed ^ d ^ 0xb0bL) ^ (t.toLong << 17) ^ epoch)
              >>> 33).toInt % kWin
            var cw = 0
            var j = t - kWin + b
            val hi = t + kWin - b
            while (j <= hi) {
              if (j != t && j >= 0 && j < n) { ctx(cw) = ids(j); cw += 1 }
              j += 1
            }
            if (cw > 0) {
              // h = mean of context input vectors
              java.util.Arrays.fill(h, 0.0)
              var c = 0
              while (c < cw) {
                val off = ctx(c) * kDim
                var k = 0
                while (k < kDim) { h(k) += loc0(off + k); k += 1 }
                c += 1
              }
              var k = 0
              while (k < kDim) { h(k) /= cw; k += 1 }
              java.util.Arrays.fill(grad, 0.0)
              // positive + negatives through logistic loss
              var s = 0
              while (s <= kNeg) {
                val target =
                  if (s == 0) center
                  else negSample(g.u01(mix(mix(kSeed ^ d ^ 0x4e9L)
                    ^ (t.toLong * 31 + s) ^ epoch)))
                if (s == 0 || target != center) {
                  val label = if (s == 0) 1.0 else 0.0
                  val off1 = target * kDim
                  var dot = 0.0
                  k = 0
                  while (k < kDim) { dot += h(k) * loc1(off1 + k); k += 1 }
                  val gl = (label - g.sigmoid(dot)) * lr
                  k = 0
                  while (k < kDim) {
                    grad(k) += gl * loc1(off1 + k)
                    loc1(off1 + k) += gl * h(k)
                    k += 1
                  }
                  touched1.merge(target, 1, (a, bb) => a + bb)
                }
                s += 1
              }
              // backprop the accumulated gradient to every context word
              c = 0
              while (c < cw) {
                val off = ctx(c) * kDim
                k = 0
                while (k < kDim) { loc0(off + k) += grad(k); k += 1 }
                touched0.merge(ctx(c), 1, (a, bb) => a + bb)
                c += 1
              }
            }
            t += 1
          }
        }

        // emit per-word deltas (side 0 = input vecs, 1 = output vecs)
        val out = Iterator.tabulate(2) {
          side =>
            val (tm, loc, base) =
              if (side == 0) (touched0, loc0, base0) else (touched1, loc1, base1)
            val itW = tm.entrySet().iterator()
            new Iterator[(Int, Int, Long, Seq[Double])] {
              def hasNext: Boolean = itW.hasNext
              def next(): (Int, Int, Long, Seq[Double]) = {
                val e = itW.next()
                val w = e.getKey.intValue()
                val off = w * kDim
                val delta = new Array[Double](kDim)
                var k = 0
                while (k < kDim) { delta(k) = loc(off + k) - base(off + k); k += 1 }
                (w, side, e.getValue.longValue(), delta.toSeq)
              }
            }
        }.flatten
        out
      }

      // touch-weighted delta averaging, aggregated DISTRIBUTED on
      // (word, side) — the driver only sees one row per touched weight
      val merged = deltas
        .groupByKey(r => (r._1, r._2))
        .mapValues { case (_, _, n, dv) => (n, dv.map(_ * n)) }
        .reduceGroups { (a, b) =>
          (a._1 + b._1, a._2.zip(b._2).map { case (x, y) => x + y })
        }
        .map { case ((w, side), (n, sum)) => (w, side, sum.map(_ / n)) }
        .collect()

      merged.foreach { case (w, side, d) =>
        val arr = if (side == 0) syn0 else syn1
        val off = w * kDim
        var k = 0
        while (k < kDim) { arr(off + k) += d(k); k += 1 }
      }
      s0B.destroy(); s1B.destroy()
    }
    corpus.unpersist()

    // vector.Agg save semantics: word vector = input + output aggregate
    val rows = counts.iterator.zipWithIndex.map { case ((term, _), w) =>
      val off = w * dim
      (term, (0 until dim).map(k => syn0(off + k) + syn1(off + k)))
    }.toSeq
    rows.toDF("word", "vec")
  }
}
