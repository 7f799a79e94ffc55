package graft.ref

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ingest.Pages

case class Node(id: Long, isMain: Boolean, year: Long, title: String)

/** CitationOps vs literal sequential ports of the Go loops
  * (CitationGraphs.go:3869-4103) on a deterministic fixture graph
  * (FIXTURES.md §3: 60 nodes, 20 main, years 1998-2023).
  */
class CitationOpsSpec extends SparkSpec {
  import spark.implicits._

  // deterministic fixture: node i, year spread, main = i < 20
  val nodes: Seq[Node] = (0L until 60L).map { i =>
    Node(i, i < 20, 1998 + (Pages.mix(i) & 0x1f) % 26,
      s"title ${Pages.mix(i + 100) % 7} of $i")
  }
  // 150 deterministic edges (citer -> cited)
  val edges: Seq[(Long, Long)] = (0 until 150).flatMap { k =>
    val a = math.floorMod(Pages.mix(k * 3 + 1), 60)
    val b = math.floorMod(Pages.mix(k * 7 + 2), 20) // cited: main nodes
    if (a != b) Some((a, b)) else None
  }
  val labels: Seq[(Long, String)] = (0L until 60L).map { i =>
    (i, Seq("graphs mining", "deep learning", "query engines", "crawling")(
      math.floorMod(Pages.mix(i + 7), 4).toInt))
  }

  def nodesDF = nodes.toDF()
  def edgesDF = edges.toDF("id", "refId") // id cites refId
  def labelsDF = labels.toDF("id", "label")

  val (yToday, yRecent, yFar) = (2023, 2015, 1998)

  // ---- sequential referee (literal ports) ----------------------------------

  def yearOf(i: Long): Int = nodes(i.toInt).year.toInt

  /** node -> dense cite history over [yFar, yToday] (forward = all cites). */
  def refHistories(noBackward: Boolean): Map[Long, Array[Int]] = {
    val numYears = yToday - yFar + 1
    val mains = nodes.filter(n => n.isMain && n.year >= yFar && n.year <= yToday)
    val hist = mains.map(n => n.id -> new Array[Int](numYears)).toMap
    edges.foreach { case (citer, cited) =>
      hist.get(cited).foreach { h =>
        val cy = yearOf(citer)
        val ok = cy >= yFar && cy <= yToday && (!noBackward || cy >= yearOf(cited))
        if (ok) h(cy - yFar) += 1
      }
    }
    hist
  }

  def refEmerging(low: Int, high: Int): Set[Long] =
    refHistories(noBackward = false).filter { case (id, h) =>
      val year = yearOf(id)
      if (h(year - yFar) > low) false
      else {
        var coldYear = year
        while (coldYear + 1 < yToday && h(coldYear + 1 - yFar) <= low) coldYear += 1
        if (coldYear - year < 2) false
        else if (coldYear < yRecent || coldYear >= yToday) false
        else {
          val hot = (coldYear + 1 to yToday).map(y => h(y - yFar))
          hot.sum.toDouble / hot.size >= high
        }
      }
    }.keySet

  def refHot(high: Int): Set[Long] =
    refHistories(noBackward = true).filter { case (id, h) =>
      val year = yearOf(id)
      h(year - yFar) >= high ||
        (year + 1 <= yToday && h(year + 1 - yFar) >= high)
    }.keySet

  // ---- tests ---------------------------------------------------------------

  test("cite histories match referee") {
    val got = CitationOps.citeHistories(nodesDF, edgesDF, yFar, yToday)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, _, cy, c) => (id, cy) -> c }.toMap
    val want = refHistories(noBackward = false).toSeq.flatMap { case (id, h) =>
      h.zipWithIndex.collect { case (c, i) if c > 0 =>
        (id, (i + yFar).toLong) -> c.toLong }.toSeq
    }.toMap
    assert(got == want)
  }

  test("emerging publications match the literal Go scan") {
    (0 to 2).foreach { low =>
      val high = low + 1
      val got = CitationOps.emergingPublications(nodesDF, edgesDF,
        yToday, yRecent, yFar, low, high).select("id").as[Long].collect().toSet
      assert(got == refEmerging(low, high), s"low=$low high=$high")
    }
  }

  test("hot publications match the literal Go scan") {
    (1 to 3).foreach { high =>
      val got = CitationOps.hotPublications(nodesDF, edgesDF,
        yToday, yRecent, yFar, high).select("id").as[Long].collect().toSet
      assert(got == refHot(high), s"high=$high")
    }
  }

  test("emerging trends prune by far/recent thresholds") {
    val out = CitationOps.emergingTrends(nodesDF, labelsDF,
      yToday, yRecent, yFar, lowThreshold = 3, highThreshold = 1)
      .as[(String, Long, Long)].collect()
    out.foreach { case (_, far, recent) =>
      assert(far < 3 && recent >= 1)
    }
  }

  test("sortByYear groups sorted titles per year") {
    // the reference iterates ALL g.Nodes (:4091), not just main ones
    val rows = CitationOps.sortByYear(nodesDF).as[(Long, Seq[String])].collect()
    val want = nodes.groupBy(_.year)
      .map { case (y, ns) => y -> ns.map(_.title).sorted }
    rows.foreach { case (y, titles) => assert(titles == want(y)) }
    assert(rows.map(_._1).toSeq == rows.map(_._1).sorted.toSeq)
  }

  test("CSV round trip with header validation and [comma]/TidyTitle") {
    val dir = tmpDir("citcsv")
    // hand-write reference-format CSVs incl. quirk titles
    val nodesCsv = "#id,in-test,year,title\n" +
      "1,true,2001,hello [comma] world\n" +
      "2,false,2002,x &//x41; y\n" +
      "3,true,2003,a &amp; b\n"
    val edgesCsv = "#id,ref-id\n2,1\n3,1\n3,1\n" // dup edge kept at load
    val labelsCsv = "#id,label\n1,graph mining\n1,engines\n3,crawling\n"
    def write(name: String, s: String): Unit = {
      val d = new java.io.File(s"$dir/$name"); d.getParentFile.mkdirs()
      java.nio.file.Files.writeString(d.toPath, s)
    }
    write("test-citation-graph-nodes.csv", nodesCsv)
    write("test-citation-graph-edges.csv", edgesCsv)
    write("test-citation-graph-labels.csv", labelsCsv)

    val (n, e, l) = CitationOps.load(spark, dir, "test")
    val titles = n.orderBy("id").select("title").as[String].collect().toSeq
    assert(titles == Seq("hello , world", "x <?> y", "a & b"))
    assert(n.where($"isMain").count() == 2)
    assert(e.count() == 3) // duplicates preserved at load (reference keeps them)
    assert(l.count() == 3)

    // save dedups edges (S2 semantics) and re-escapes commas
    val out = tmpDir("citcsvOut")
    CitationOps.save(n, e, l, out, "test")
    val (n2, e2, l2) = CitationOps.load(spark, out, "test")
    assert(e2.count() == 2) // dedup on save
    assert(n2.orderBy("id").select("title").as[String].collect().toSeq
      == Seq("hello , world", "x <?> y", "a & b"))

    // header validation fails fast on a corrupted header
    write("bad-citation-graph-nodes.csv", "#id,wrong,year,title\n1,true,2000,t\n")
    write("bad-citation-graph-edges.csv", edgesCsv)
    write("bad-citation-graph-labels.csv", labelsCsv)
    intercept[IllegalArgumentException] {
      CitationOps.load(spark, dir, "bad")
    }
  }
}
