package graft.ref

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.text.Tidy

/** The reference's citation-graph operator surface (CitationGraphs.go),
  * re-expressed over Datasets:
  *
  *  - CSV load/save in the reference's exact 3-file format with header
  *    validation and `[comma]`/TidyTitle handling (S1/S2, :1442-1582,
  *    :1950-2049)
  *  - cite histories = in-degree-by-year (A12, :3947-3960)
  *  - GetEmergingTrends (:3869-3925), GetEmergingTopicPublications
  *    (:3931-4013), GetHotTopicPublications (:4019-4075) — the scan over a
  *    node's per-year histogram is a fixed-width-array UDF (W4); everything
  *    else is joins + aggregations
  *  - SortByYear (:4084-4103)
  *
  * Schemas: nodes `(id LONG, isMain BOOLEAN, year LONG, title STRING)`,
  * edges `(id LONG, refId LONG)` (id cites refId), labels `(id LONG,
  * label STRING)`.
  */
object CitationOps {

  val nodesSchema = StructType(Seq(
    StructField("id", LongType), StructField("isMain", BooleanType),
    StructField("year", LongType), StructField("title", StringType)))

  /** LoadCitationGraph (S1): reads the three CSVs, validates headers
    * exactly like the reference (:1471-1479, :1519-1525, :1558-1564 —
    * fail-fast on mismatch), unescapes `[comma]` and applies TidyTitle. */
  def load(spark: SparkSession, path: String, prefix: String)
      : (DataFrame, DataFrame, DataFrame) = {
    def readCsv(file: String, wantHeader: Seq[String]): DataFrame = {
      val df = spark.read.option("header", true).csv(s"$path/$file")
      // the reference's writer joins fields with ", " — trim the resulting
      // leading space off header names (value-side spaces are absorbed by
      // casts/trim below)
      val got = df.columns.toSeq.map(_.trim)
      require(got == wantHeader,
        s"$file: corrupted header: expected $wantHeader, got $got")
      df.toDF(got: _*)
    }
    val nodes = readCsv(s"$prefix-citation-graph-nodes.csv",
        Seq("#id", s"in-$prefix", "year", "title"))
      .select(col("#id").cast("long").as("id"),
        (lower(trim(col(s"in-$prefix"))) === "true").as("isMain"),
        col("year").cast("long").as("year"),
        Tidy.tidy_title(udf(Tidy.unescapeComma _).apply(col("title"))).as("title"))
    val edges = readCsv(s"$prefix-citation-graph-edges.csv", Seq("#id", "ref-id"))
      .select(col("#id").cast("long").as("id"), col("ref-id").cast("long").as("refId"))
    val labels = readCsv(s"$prefix-citation-graph-labels.csv", Seq("#id", "label"))
      .select(col("#id").cast("long").as("id"), trim(col("label")).as("label"))
    (nodes, edges, labels)
  }

  /** SaveCitationGraph (S2): writes the three files in the reference's
    * byte format (:1967-2046): fields joined by `", "` (comma-space, `%d, %t,
    * %d, %s` — no CSV quoting), header line first, and TidyTitle applied to
    * the comma-escaped title at save time (:1980). Edges are deduped (refs ∪
    * reverse-of-cites collapses to a plain distinct in the normalized
    * model — :2003-2026). */
  def save(nodes: DataFrame, edges: DataFrame, labels: DataFrame,
      path: String, prefix: String): Unit = {
    val spark = nodes.sparkSession
    def writeLines(header: String, body: DataFrame, file: String): Unit = {
      val h = spark.createDataFrame(
        java.util.List.of(org.apache.spark.sql.Row(0L, header)),
        StructType(Seq(StructField("k", LongType), StructField("line", StringType))))
      h.union(body.select(lit(1L).as("k"), col("line")))
        .repartition(1).sortWithinPartitions(col("k"))
        .select("line")
        .write.mode("overwrite").text(s"$path/$file")
    }
    val esc = udf(Tidy.escapeComma _)
    writeLines(s"#id, in-$prefix, year, title",
      nodes.select(concat_ws(", ", col("id"), col("isMain").cast("string"),
        col("year"), Tidy.tidy_title(esc(col("title")))).as("line")),
      s"$prefix-citation-graph-nodes.csv")
    writeLines("#id, ref-id",
      edges.select(col("id"), col("refId")).distinct()
        .select(concat_ws(", ", col("id"), col("refId")).as("line")),
      s"$prefix-citation-graph-edges.csv")
    writeLines("#id, label",
      labels.select(concat_ws(", ", col("id"), col("label")).as("line")),
      s"$prefix-citation-graph-labels.csv")
  }

  /** A12 — cite history: for each main node in the year window, citations
    * received per citer-year (in-degree-by-year over the reverse adjacency,
    * derived by key swap — never materialized). `noBackward` drops
    * citations from years before publication (the Hot variant, :4044). */
  def citeHistories(nodes: DataFrame, edges: DataFrame,
      yearFarAway: Int, yearToday: Int, noBackward: Boolean = false): DataFrame = {
    val main = nodes.where(col("isMain") &&
      col("year").between(yearFarAway, yearToday))
    val citers = nodes.select(col("id").as("citerId"), col("year").as("citeYear"))
    val cites = edges.select(col("refId").as("id"), col("id").as("citerId"))
    val inWindow = main.select(col("id"), col("year"))
      .join(cites, "id")
      .join(citers, "citerId")
      .where(col("citeYear").between(yearFarAway, yearToday) &&
        (if (noBackward) col("citeYear") >= col("year") else lit(true)))
    inWindow.groupBy(col("id"), col("year"), col("citeYear"))
      .agg(count(lit(1)).as("cites"))
  }

  /** Dense per-node year histogram `(id, year, hist ARRAY<INT>)` covering
    * `[yearFarAway, yearToday]`; nodes with zero in-window citations keep an
    * all-zero histogram (the reference allocates these too, :3952). */
  private def histograms(nodes: DataFrame, edges: DataFrame,
      yearFarAway: Int, yearToday: Int, noBackward: Boolean): DataFrame = {
    val numYears = yearToday - yearFarAway + 1
    val main = nodes.where(col("isMain") &&
      col("year").between(yearFarAway, yearToday))
      .select(col("id"), col("year"))
    val ch = citeHistories(nodes, edges, yearFarAway, yearToday, noBackward)
      .groupBy("id")
      .agg(collect_list(struct(col("citeYear"), col("cites"))).as("pairs"))
    main.join(ch, Seq("id"), "left")
      .select(col("id"), col("year"),
        // scatter (citeYear, cites) pairs into a dense 0-filled array
        transform(sequence(lit(0), lit(numYears - 1)), i =>
          coalesce(
            aggregate(
              filter(coalesce(col("pairs"),
                array().cast("array<struct<citeYear:bigint,cites:bigint>>")),
                p => p.getField("citeYear") - yearFarAway === i),
              lit(0L), (acc, p) => acc + p.getField("cites")),
            lit(0L))).as("hist"))
  }

  /** GetEmergingTrends (:3869-3925): stemmed-label year histograms pruned by
    * `countFarAway < lowThreshold && countRecent >= highThreshold`. */
  def emergingTrends(nodes: DataFrame, labels: DataFrame,
      yearToday: Int, yearRecent: Int, yearFarAway: Int,
      lowThreshold: Int, highThreshold: Int): DataFrame = {
    require(yearFarAway < yearRecent && yearRecent < yearToday,
      "Must make sure yearFarAway < yearRecent < yearToday")
    val stem = udf(Stemmer.stemPhrase _)
    val main = nodes.where(col("isMain") &&
      col("year").between(yearFarAway, yearToday))
    val byLabelYear = main.join(labels, "id")
      .select(stem(col("label")).as("label"), col("year"))
      .groupBy("label", "year").agg(count(lit(1)).as("cnt"))
    val agged = byLabelYear.groupBy("label").agg(
      sum(when(col("year") < yearRecent, col("cnt")).otherwise(0L)).as("countFarAway"),
      sum(when(col("year") >= yearRecent, col("cnt")).otherwise(0L)).as("countRecent"))
    agged.where(col("countFarAway") < lowThreshold &&
        col("countRecent") >= highThreshold)
      .select("label", "countFarAway", "countRecent")
  }

  /** The reference's cold-run scan (:3963-4006), verbatim, over the dense
    * histogram — fixed-width array, pure scalar UDF (W4). Returns true iff
    * the node qualifies as an emerging-topic publication. */
  private[ref] def emergingScan(hist: Seq[Long], year: Int, yearFarAway: Int,
      yearRecent: Int, yearToday: Int, lowThreshold: Int, highThreshold: Int)
      : Boolean = {
    if (hist(year - yearFarAway) > lowThreshold) return false
    var coldYear = year
    while (coldYear + 1 < yearToday &&
      hist(coldYear + 1 - yearFarAway) <= lowThreshold) coldYear += 1
    if (coldYear - year < 2) return false
    if (coldYear < yearRecent || coldYear >= yearToday) return false
    var hotSum = 0.0; var numHot = 0
    var y = coldYear + 1
    while (y <= yearToday) { hotSum += hist(y - yearFarAway); numHot += 1; y += 1 }
    hotSum / numHot >= highThreshold
  }

  /** GetEmergingTopicPublications (:3931-4013). */
  def emergingPublications(nodes: DataFrame, edges: DataFrame,
      yearToday: Int, yearRecent: Int, yearFarAway: Int,
      lowThreshold: Int, highThreshold: Int): DataFrame = {
    require(yearFarAway < yearRecent && yearRecent < yearToday,
      "Must make sure yearFarAway < yearRecent < yearToday")
    val keep = udf { (hist: Seq[Long], year: Long) =>
      emergingScan(hist, year.toInt, yearFarAway, yearRecent, yearToday,
        lowThreshold, highThreshold)
    }
    histograms(nodes, edges, yearFarAway, yearToday, noBackward = false)
      .where(keep(col("hist"), col("year")))
      .select(col("id"), col("year"), col("hist"))
  }

  /** GetHotTopicPublications (:4019-4075): citations never counted from
    * before publication; hot start = `highThreshold` citations in the
    * publication year or the next. */
  def hotPublications(nodes: DataFrame, edges: DataFrame,
      yearToday: Int, yearRecent: Int, yearFarAway: Int,
      highThreshold: Int): DataFrame = {
    require(yearFarAway < yearRecent && yearRecent < yearToday,
      "Must make sure yearFarAway < yearRecent < yearToday")
    val keep = udf { (hist: Seq[Long], year0: Long) =>
      val year = year0.toInt
      if (hist(year - yearFarAway) >= highThreshold) true
      else if (year + 1 <= yearToday) hist(year + 1 - yearFarAway) >= highThreshold
      else false
    }
    histograms(nodes, edges, yearFarAway, yearToday, noBackward = true)
      .where(keep(col("hist"), col("year")))
      .select(col("id"), col("year"), col("hist"))
  }

  /** SortByYear (:4084-4103): year -> titles, sorted. The reference iterates
    * ALL g.Nodes (main and cited alike), so no isMain filter here; titles
    * are sorted within each year for determinism (the reference's map-order
    * output is nondeterministic anyway). */
  def sortByYear(nodes: DataFrame): DataFrame =
    nodes
      .groupBy("year")
      .agg(sort_array(collect_list(col("title"))).as("titles"))
      .orderBy("year")
}

/** Light Porter-style suffix stemmer standing in for
  * KeyphraseExtraction.StemPhrases (consumed, not defined, by the
  * reference — SURVEY.md §2.9). Deterministic, per-word. */
object Stemmer {
  def stemWord(w0: String): String = {
    var w = w0.toLowerCase
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ies")) w = w.dropRight(2)
    else if (w.endsWith("s") && !w.endsWith("ss") && w.length > 3) w = w.dropRight(1)
    if (w.endsWith("ing") && w.length > 5) w = w.dropRight(3)
    else if (w.endsWith("ed") && w.length > 4) w = w.dropRight(2)
    w
  }
  def stemPhrase(p: String): String =
    p.trim.split("\\s+").map(stemWord).mkString(" ")
}
