package graft

/** The driver's smoke contract: `SparkEntry.entry` returns rows. */
class EntrySpec extends SparkSpec {

  test("entry: pages -> link graph -> PageRank returns ranked vertices") {
    val out = SparkEntry.entry(spark)
    assert(out.columns.toSeq == Seq("vid", "rank"))
    val rows = out.count()
    assert(rows > 1000L, s"rows=$rows")
    // ranks form a probability distribution
    val mass = out.agg(org.apache.spark.sql.functions.sum("rank"))
      .head().getDouble(0)
    assert(math.abs(mass - 1.0) < 1e-6)
  }
}
