package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ingest.LinkExtract

/** Structured Streaming ingestion of new pages (SURVEY.md §2.12).
  *
  * The reference is batch-only; its per-year cumulative corpus files
  * (CitationGraphs.go:3838-3865) are a batch emulation of an append-only
  * timeline. The streaming path generalizes that: new page files land in a
  * directory, `readStream` picks them up, link extraction runs
  * incrementally, and `foreachBatch` appends url-level edges to the edge
  * table with `Trigger.AvailableNow` (process-everything-then-stop — the
  * right trigger for crawl-dump ingestion; no stateful operators, no
  * late-data semantics are needed to match the reference, so none are
  * used). A watermark on `warc_ts` is still declared so a future windowed
  * aggregation can attach without replumbing.
  */
object StreamIngest {

  /** Start an AvailableNow stream: parquet pages under `pagesDir` ->
    * url-level edges appended as parquet under `edgesDir`. Returns after
    * processing everything currently available. */
  def ingestOnce(spark: SparkSession, pagesDir: String, edgesDir: String,
      checkpointDir: String): Unit = {
    val pages = spark.readStream
      .schema("url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING")
      .parquet(pagesDir)
      .withWatermark("warc_ts", "1 hour")
    val q = pages.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        LinkExtract.linkEdges(batch)
          .write.mode("append").parquet(edgesDir)
      }
      .start()
    q.awaitTermination()
  }

  /** Streaming per-minute page-rate stats (shows the watermark + windowed
    * aggregation path; used by monitoring, not correctness). */
  def pageRates(pages: DataFrame): DataFrame =
    pages
      .withWatermark("warc_ts", "10 minutes")
      .groupBy(window(col("warc_ts"), "1 minute"), col("lang"))
      .agg(count(lit(1)).as("pages"))
}
