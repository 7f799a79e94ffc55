package graft.ingest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.text.Tidy

/** Pages synthesis, the per-row byte-identity invariant, link extraction,
  * and deterministic vertex encoding (FIXTURES.md §1-2).
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  lazy val pages = Pages.synthesize(spark, 1000, seed = 42L, partitions = 7).cache()

  test("pages table has the exact input_hint schema") {
    assert(pages.schema.map(f => (f.name, f.dataType.simpleString)) == Seq(
      "url" -> "string", "warc_ts" -> "timestamp", "html" -> "binary",
      "text" -> "string", "lang" -> "string"))
  }

  test("per-row invariant: extractor(html) is byte-identical to text") {
    val mismatches = pages
      .select(LinkExtract.extract_text($"html").as("got"), $"text")
      .where($"got" =!= $"text")
      .count()
    assert(mismatches == 0L)
    // and the planted quirk rows really exercise the <?> path
    val quirks = pages.where($"text".contains("<?>")).count()
    assert(quirks > 0L)
  }

  test("extraction goes through TidyTitle semantics") {
    val raw = Pages.rawTitle(3L, 42L) // i%11==3 -> &//x41; quirk
    assert(raw.contains("&//x41;"))
    assert(LinkExtract.extractText(Pages.htmlOf(3L, 100L, 42L))
      == Tidy.tidyTitle(raw))
  }

  test("normalizeUrl lowercases only scheme+authority, never path or query") {
    assert(LinkExtract.normalizeUrl("https://Site.Example/Path?Q=AbC#Frag")
      == "https://site.example/Path?Q=AbC")
    // query with NO path: the '?' ends the authority (previously the whole
    // URL including the case-sensitive query was lowercased)
    assert(LinkExtract.normalizeUrl("https://Site.Example?Page=Home&Token=AbC")
      == "https://site.example?Page=Home&Token=AbC")
    assert(LinkExtract.normalizeUrl("https://Site.Example") == "https://site.example")
    assert(LinkExtract.normalizeUrl("  relative/Path#f  ") == "relative/Path")
    assert(LinkExtract.normalizeUrl("") == "")
  }

  test("synthesis is deterministic and partitioning-invariant") {
    def render(partitions: Int): Seq[String] =
      Pages.synthesize(spark, 500, 42L, partitions)
        .orderBy("url").collect().toSeq
        .map(r => Seq(r.getString(0), r.getTimestamp(1).toString,
          new String(r.getAs[Array[Byte]](2), "UTF-8"),
          r.getString(3), r.getString(4)).mkString("|"))
    assert(render(3) == render(13))
  }

  test("vertex encoding: dense, deterministic, sorted by url") {
    val v1 = Graphs.encodeVertices(pages.select("url"), partitions = 3)
      .as[(Long, String)].collect().sortBy(_._1)
    val v2 = Graphs.encodeVertices(pages.select("url"), partitions = 9)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(v1.toSeq == v2.toSeq, "partitioning-invariant")
    assert(v1.map(_._1).toSeq == (0L until v1.length.toLong), "dense 0..n-1")
    assert(v1.map(_._2).toSeq == v1.map(_._2).sorted.toSeq, "order = url sort")
  }

  test("buildGraph: deduped, loop-free, endpoints resolve") {
    val (vertices, edges) = Graphs.buildGraph(pages)
    val e = edges.cache()
    assert(e.where($"src" === $"dst").count() == 0L, "no self-loops")
    assert(e.count() == e.distinct().count(), "deduped")
    val nV = vertices.count()
    val bad = e.where($"src" >= nV || $"dst" >= nV || $"src" < 0 || $"dst" < 0).count()
    assert(bad == 0L, "vids in range")
    assert(e.count() > 1000L, "hub-skewed synthetic graph has edges")
  }

  test("link graph is hub-skewed (Zipf-ish targets)") {
    val (_, edges) = Graphs.buildGraph(pages)
    val inDeg = edges.groupBy("dst").count()
    val maxIn = inDeg.agg(max("count")).as[Long].head()
    val avgIn = inDeg.agg(avg("count")).as[Double].head()
    assert(maxIn > 10 * avgIn, s"max=$maxIn avg=$avgIn — skew exists to exercise salting")
  }

  test("html column pruned from the parquet link-edge scan") {
    // Written to parquet (as on a real cluster), the link-edge projection
    // must prune the scan to (url, html) — text/lang/warc_ts never read.
    val dir = tmpDir("pages")
    pages.write.mode("overwrite").parquet(dir)
    val fromDisk = spark.read.parquet(dir)
    val executed = LinkExtract.linkEdges(fromDisk)
      .queryExecution.executedPlan.toString
    val readSchema = executed.linesIterator
      .find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("url") && readSchema.contains("html"))
    assert(!readSchema.contains("warc_ts") && !readSchema.contains("text")
      && !readSchema.contains("lang"))
  }
}
