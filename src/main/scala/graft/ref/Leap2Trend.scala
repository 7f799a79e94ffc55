package graft.ref

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.corpus.Similarity

/** The Leap2Trend temporal pipeline (reference CitationGraphs.go:3799-3866
  * S4 writer, :4105-4137 per-year word2vec, :4237-4331 trend detection),
  * re-expressed with `year` as a partition column.
  */
object Leap2Trend {

  /** S4 — SaveWord2VecTrainingData (:3799-3866): per-year CUMULATIVE token
    * files — for each year Y in [yearStartFrom, maxYear], all English docs
    * with year <= Y. Docs carry `toks ARRAY<STRING>` (vocab terms, each
    * possibly a multi-word phrase); each term gets space->underscore
    * (:3859, applied PER TERM) and terms join with spaces. The per-year
    * loop becomes a years-dim crossJoin + filter, written `partitionBy(y)`. */
  def saveTrainingData(docs: DataFrame, outDir: String, yearStartFrom: Int): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val years = docs.agg(min("year"), max("year")).as[(Long, Long)].head()
    val yMin = math.max(years._1.toInt, yearStartFrom)
    val yMax = years._2.toInt
    val yearsDim = (yMin to yMax).toDF("y")
    docs.where(col("lang") === "en")
      .crossJoin(yearsDim)
      .where(col("year") <= col("y"))
      .select(col("y"), trainLine(col("toks")).as("line"))
      .write.mode("overwrite").partitionBy("y").text(outDir)
  }

  /** one training-file line: per-term space->underscore, space-joined */
  private def trainLine(toks: org.apache.spark.sql.Column) =
    concat_ws(" ", transform(toks, t => regexp_replace(t, " ", "_")))

  /** Per-year phrase similarity ranks: for each `(year, phrase, vec)` row,
    * rank all other phrases of the same year by cosine desc (J6 + W1).
    * `minFreq` filtering (P7) must be applied upstream — keep the pair
    * join sparse BEFORE the O(p²) work (SURVEY.md §4). */
  def simRanksByYear(vectors: DataFrame): DataFrame = {
    val a = vectors.select(col("year"), col("phrase").as("p1"), col("vec").as("v1"))
    val b = vectors.select(col("year"), col("phrase").as("p2"), col("vec").as("v2"))
    val sims = a.join(b, Seq("year"))
      .where(col("p1") < col("p2"))
      .select(col("year"), col("p1").as("w1"), col("p2").as("w2"),
        Similarity.cosine(col("v1"), col("v2")).as("sim"))
    val sym = sims.select(col("year"), col("w1").as("p"), col("w2").as("nbr"), col("sim"))
      .union(sims.select(col("year"), col("w2").as("p"), col("w1").as("nbr"), col("sim")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("year", "p").orderBy(desc("sim"), asc("nbr"))
    sym.withColumn("rank", row_number().over(w) - 1)
  }

  /** J10 + S6 — year-over-year rank jumps (:4307-4326): equi-join each
    * year's ranks with the previous year on (p, nbr); jump = rank -
    * prevRank (the reference's orientation, :4311); keep jump >= minJump;
    * sorted by jump desc. */
  def rankJumps(ranksByYear: DataFrame, minJump: Int): DataFrame =
    Similarity.rankJumps(ranksByYear, minJump)

  /** Full pipeline over a `(year, phrase, vec)` embedding table (vectors
    * may come from [[trainEmbeddings]] or any other source). */
  def run(vectors: DataFrame, minJump: Int): DataFrame =
    rankJumps(simRanksByYear(vectors), minJump)

  /** Per-year embedding training via MLlib Word2Vec over the CUMULATIVE
    * corpus (S4 semantics: year Y trains on all docs with year <= Y).
    *
    * Objective note (SURVEY.md §7 hard part g): the reference trains CBOW +
    * negative sampling (wego, CitationGraphs.go:4110-4134); MLlib implements
    * skip-gram + hierarchical softmax. This entry point keeps MLlib (fast,
    * battle-tested); [[trainEmbeddingsCBOW]] trains the reference's exact
    * objective via [[graft.ml.CbowNs]]. Leap2Trend consumes only RELATIVE
    * neighbor ranks per year, and the spec's rank-correlation test measures
    * the objectives' agreement on that signal.
    * Returns `(year, phrase, vec ARRAY<DOUBLE>)`. */
  def trainEmbeddings(docs: DataFrame, yearStartFrom: Int,
      dim: Int = 100, window: Int = 5, minCount: Int = 5,
      maxIter: Int = 1, seed: Long = 42L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val years = docs.agg(min("year"), max("year")).as[(Long, Long)].head()
    val yMin = math.max(years._1.toInt, yearStartFrom)
    val yMax = years._2.toInt
    (yMin to yMax).map { y =>
      // upstream Word2Phrase already joins multi-word phrases with "_"
      // (S4 writer semantics); tokens are whitespace-separated
      val corpus = docs
        .where(col("lang") === "en" && col("year") <= y)
        .select(split(col("text"), "\\s+").as("toks"))
      val model = new org.apache.spark.ml.feature.Word2Vec()
        .setInputCol("toks").setOutputCol("vec")
        .setVectorSize(dim).setWindowSize(window)
        .setMinCount(minCount).setMaxIter(maxIter).setSeed(seed)
        .fit(corpus)
      model.getVectors
        .select(lit(y.toLong).as("year"), col("word").as("phrase"),
          vecToArray(col("vector")).as("vec"))
    }.reduce(_ union _)
  }

  /** Per-year embedding training with the reference's ACTUAL objective —
    * CBOW + negative sampling ([[graft.ml.CbowNs]], wego parity:
    * CitationGraphs.go:4110-4134) — over the same cumulative corpus as
    * [[trainEmbeddings]]. Doc RNG ids are content hashes, so training is
    * invariant to row order and input partitioning of `docs`. */
  def trainEmbeddingsCBOW(docs: DataFrame, yearStartFrom: Int,
      dim: Int = 100, window: Int = 5, minCount: Int = 5,
      epochs: Int = 5, negative: Int = 5, subsample: Double = 1e-3,
      seed: Long = 42L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val years = docs.agg(min("year"), max("year")).as[(Long, Long)].head()
    val yMin = math.max(years._1.toInt, yearStartFrom)
    val yMax = years._2.toInt
    (yMin to yMax).map { y =>
      val corpus = docs.where(col("lang") === "en" && col("year") <= y)
        .select(xxhash64(col("text")).as("doc"),
          split(col("text"), "\\s+").as("toks"))
      new graft.ml.CbowNs(dim = dim, window = window, minCount = minCount,
          epochs = epochs, negative = negative, subsample = subsample,
          seed = seed)
        .fit(spark, corpus)
        .select(lit(y.toLong).as("year"), col("word").as("phrase"), col("vec"))
    }.reduce(_ union _)
  }

  private val vecToArray = udf { (v: org.apache.spark.ml.linalg.Vector) =>
    v.toArray.toSeq
  }

  // ---- S5/S6/S7 file-format parity (:4240-4331, :4131-4134) ---------------

  /** S5 — `.vec` text reader (:4252-4266): lines `phrase v1 .. vDim`
    * space-separated; lines with fewer than dim+1 fields are skipped;
    * unparseable floats become 0.0 (the reference ignores ParseFloat
    * errors). Returns `(year, phrase, vec ARRAY<DOUBLE>)`. */
  def loadVecFile(spark: SparkSession, path: String, year: Int,
      dim: Int = 100): DataFrame = {
    val fields = split(col("value"), " ")
    spark.read.text(path)
      .where(size(fields) >= dim + 1)
      .select(lit(year.toLong).as("year"),
        element_at(fields, 1).as("phrase"),
        // try_cast: malformed floats become 0.0 (ignored ParseFloat error),
        // and ANSI mode must not abort the scan
        transform(slice(fields, 2, dim),
          f => coalesce(f.try_cast(DoubleType), lit(0.0))).as("vec"))
  }

  /** S7 — `.vec` text sink: one `phrase v1 .. vDim` line per vector, the
    * format [[loadVecFile]] and the reference's loader read back. */
  def saveVecFile(vectors: DataFrame, path: String): Unit =
    vectors.select(concat_ws(" ", col("phrase"),
        concat_ws(" ", transform(col("vec"), v => v.cast("string")))).as("line"))
      .coalesce(1).write.mode("overwrite").text(path)

  /** S5 — `-IDs-` file reader (:4269-4275): one id per line; unparseable
    * lines become 0 (ignored ParseInt error). */
  def loadIdsFile(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(coalesce(trim(col("value")).try_cast(LongType), lit(0L)).as("id"))

  /** training-text phrase frequencies (:4278-4297): space-split token
    * counts over the per-year training file; `highFreq` keeps
    * freq >= minFreq (P7). */
  def loadTrainFreqs(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)
      .select(explode(split(col("value"), " ")).as("phrase"))
      .groupBy("phrase").agg(count(lit(1)).as("freq"))

  /** S6 — `-jumpranking-Y.csv` sink (:4321-4326): `idx, p1, p2, jump`
    * lines joined with `", "`, sorted by jump desc (ties pinned by
    * (p, nbr) — the reference's sort.Slice is unstable). */
  def saveJumpRanking(jumps: DataFrame, prefix: String, year: Int): Unit = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("jump"), asc("p"), asc("nbr"))
    jumps.select(col("p"), col("nbr"), col("jump"))
      .withColumn("idx", row_number().over(w) - 1)
      .select(concat_ws(", ", col("idx"), col("p"), col("nbr"), col("jump")).as("line"))
      .coalesce(1).write.mode("overwrite").text(s"$prefix-jumpranking-$year.csv")
  }

  /** S4 file-name parity: per-year CUMULATIVE training text under the
    * reference's `<prefix>-<y>.txt` names (:3838-3865; each "file" is a
    * single-part directory Spark and the readers here both accept).
    * Docs carry `toks ARRAY<STRING>` like [[saveTrainingData]]. Writes the
    * parallel `<prefix>-IDs-<y>.txt` id files too when docs carry an `id`
    * column. */
  def saveTrainingDataFiles(docs: DataFrame, prefix: String,
      yearStartFrom: Int): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val years = docs.agg(min("year"), max("year")).as[(Long, Long)].head()
    val yMin = math.max(years._1.toInt, yearStartFrom)
    (yMin to years._2.toInt).foreach { y =>
      val upTo = docs.where(col("lang") === "en" && col("year") <= y)
      upTo.select(trainLine(col("toks")).as("line"))
        .coalesce(1).write.mode("overwrite").text(s"$prefix-$y.txt")
      if (docs.columns.contains("id"))
        upTo.select(col("id").cast("string"))
          .coalesce(1).write.mode("overwrite").text(s"$prefix-IDs-$y.txt")
    }
  }

  /** S7 — the reference's Word2Vec file step (:4105-4137): per year, train
    * on the cumulative `<prefix>-<y>.txt` corpus and save vectors as
    * `<prefix>-cbow-<y>.vec` (the name [[leap2trendFiles]] loads back).
    * Training itself is [[trainEmbeddings]] — see its documented
    * CBOW-vs-skip-gram deviation. */
  def word2vecFiles(spark: SparkSession, prefix: String,
      yearStartFrom: Int, yearEndWith: Int, dim: Int = 100,
      minCount: Int = 5, maxIter: Int = 1, seed: Long = 42L,
      cbow: Boolean = false): Unit = {
    (yearStartFrom to yearEndWith).foreach { y =>
      val vectors =
        if (cbow) {
          // the reference's actual objective (wego CBOW+NS, :4110-4134)
          val corpus = spark.read.text(s"$prefix-$y.txt")
            .select(xxhash64(col("value")).as("doc"),
              split(col("value"), "\\s+").as("toks"))
          new graft.ml.CbowNs(dim = dim, window = 5, minCount = minCount,
              epochs = math.max(1, maxIter), seed = seed)
            .fit(spark, corpus)
            .select(col("word").as("phrase"), col("vec"))
        } else {
          val corpus = spark.read.text(s"$prefix-$y.txt")
            .select(split(col("value"), "\\s+").as("toks"))
          val model = new org.apache.spark.ml.feature.Word2Vec()
            .setInputCol("toks").setOutputCol("vec")
            .setVectorSize(dim).setWindowSize(5)
            .setMinCount(minCount).setMaxIter(maxIter).setSeed(seed)
            .fit(corpus)
          model.getVectors.select(col("word").as("phrase"),
            vecToArray(col("vector")).as("vec"))
        }
      saveVecFile(vectors, s"$prefix-cbow-$y.vec")
    }
  }

  /** The reference's file-driven Leap2Trend loop (:4237-4331) replayed
    * over the same file layout: per year load `<prefix>-cbow-<y>.vec` +
    * `<prefix>-<y>.txt`, filter to high-frequency phrases, rank pairwise
    * cosine neighbors, join against the previous year's ranks, and write
    * `<prefix>-jumpranking-<y>.csv`. A user of the reference's file
    * workflow can run this verbatim. */
  def leap2trendFiles(spark: SparkSession, prefix: String,
      yearStartFrom: Int, yearEndWith: Int, minFreq: Int, minJump: Int,
      dim: Int = 100): Unit = {
    require(minJump >= 1,
      "minJump >= 1 required: missing pairs default to rank 0 in the " +
        "reference, which the inner join reproduces only for positive jumps")
    val years = (yearStartFrom to yearEndWith)
    val vectors = years.map { y =>
      val high = loadTrainFreqs(spark, s"$prefix-$y.txt")
        .where(col("freq") >= minFreq).select("phrase")
      loadVecFile(spark, s"$prefix-cbow-$y.vec", y, dim)
        .join(high, Seq("phrase"), "left_semi")
    }.reduce(_ union _)
    val ranks = simRanksByYear(vectors).localCheckpoint(true)
    years.foreach { y =>
      saveJumpRanking(
        rankJumps(ranks, minJump).where(col("year") === y), prefix, y)
    }
  }
}

/** S3 — memberships JSON sink/source (CitationGraphs.go:3612-3658). */
object Memberships {

  def save(memberships: DataFrame, path: String): Unit =
    memberships.select(col("nodeId"), col("membership"))
      .write.mode("overwrite").json(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("nodeId LONG, membership ARRAY<DOUBLE>")
      .json(path)

  /** J4 — checkMemberships (:3081-3098): every main node present, uniform
    * dims; returns the violations (reference log.Fatals — callers assert
    * empty). */
  def check(memberships: DataFrame, mainNodes: DataFrame): (Long, Long) = {
    val missing = mainNodes.join(
      memberships.withColumnRenamed("nodeId", "id"), Seq("id"), "left_anti").count()
    val dims = memberships.select(size(col("membership")).as("d"))
      .distinct().count()
    (missing, dims)
  }
}
