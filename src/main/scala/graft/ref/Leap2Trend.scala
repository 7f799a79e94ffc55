package graft.ref

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.corpus.Similarity

/** The Leap2Trend temporal pipeline (reference CitationGraphs.go:3799-3866
  * S4 writer, :4105-4137 per-year word2vec, :4237-4331 trend detection),
  * re-expressed with `year` as a partition column.
  */
object Leap2Trend {

  /** S4 — SaveWord2VecTrainingData (:3799-3866): per-year CUMULATIVE token
    * files — for each year Y in [yearStartFrom, maxYear], all English docs
    * with year <= Y; phrases space->underscore (:3859). The per-year loop
    * becomes a years-dim crossJoin + filter, written `partitionBy(y)`. */
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
      .select(col("y"), regexp_replace(col("text"), " ", "_").as("line"))
      .write.mode("overwrite").partitionBy("y").text(outDir)
  }

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
    * year's ranks with the previous year on (p, nbr); jump = prevRank -
    * rank; keep jump >= minJump; sorted by jump desc. */
  def rankJumps(ranksByYear: DataFrame, minJump: Int): DataFrame = {
    val cur = ranksByYear.select(col("p"), col("nbr"), col("year"), col("rank"))
    val prev = ranksByYear.select(col("p"), col("nbr"),
      (col("year") + 1).as("year"), col("rank").as("prevRank"))
    cur.join(prev, Seq("p", "nbr", "year"))
      .withColumn("jump", col("prevRank") - col("rank"))
      .where(col("jump") >= minJump)
      .orderBy(desc("jump"), asc("p"), asc("nbr"))
  }

  /** Full pipeline over a `(year, phrase, vec)` embedding table (vectors
    * may come from [[trainEmbeddings]] or any other source). */
  def run(vectors: DataFrame, minJump: Int): DataFrame =
    rankJumps(simRanksByYear(vectors), minJump)

  /** Per-year embedding training via MLlib Word2Vec over the CUMULATIVE
    * corpus (S4 semantics: year Y trains on all docs with year <= Y).
    *
    * DOCUMENTED DEVIATION (SURVEY.md §7 hard part g): the reference trains
    * CBOW + negative sampling (wego, CitationGraphs.go:4110-4134); MLlib
    * implements skip-gram + hierarchical softmax. Same window/dim/seed
    * knobs, different objective — acceptable because Leap2Trend consumes
    * only RELATIVE neighbor ranks per year, not absolute vector values.
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

  private val vecToArray = udf { (v: org.apache.spark.ml.linalg.Vector) =>
    v.toArray.toSeq
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
