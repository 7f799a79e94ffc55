package graft.io

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-shaped table layer: partitioned Parquet snapshots with an atomic
  * JSON manifest per commit carrying lineage (parent snapshot) and
  * per-partition metrics.
  *
  * The offline image ships no Iceberg runtime jar, so this emulates the
  * subset of Iceberg semantics the engine needs — atomic snapshot commits,
  * snapshot history, resumable reads of "the latest committed state" — with
  * a layout designed so `iceberg-spark-runtime` is a drop-in swap:
  *
  * {{{
  *   <table>/
  *     data/snap-<id>/part-*.parquet      // one immutable dir per snapshot
  *     manifests/manifest-<id>.json       // committed atomically (tmp+rename)
  *     HEAD                               // text file: current snapshot id
  * }}}
  *
  * A snapshot is visible iff its manifest rename completed and HEAD points at
  * it; a crashed writer leaves only an orphaned data dir, never a torn table.
  * This is the checkpoint/lineage substrate for all iterative kernels
  * (BASELINE.json north_rule: "resumable from checkpoint with per-partition
  * lineage + metrics").
  */
final case class SnapshotMeta(
    table: String,
    snapshotId: Long,
    parentId: Option[Long],
    step: Long,
    rows: Long,
    numPartitions: Int,
    partitionRows: Seq[Long],
    metrics: Map[String, Double])

object TableIO {

  private def manifestDir(table: String): Path = Paths.get(table, "manifests")
  private def headFile(table: String): Path = Paths.get(table, "HEAD")
  private def dataDir(table: String, id: Long): Path =
    Paths.get(table, "data", f"snap-$id%06d")

  /** Commit `df` as snapshot `step` of `table`. Returns the meta written.
    * Atomicity: parquet lands in a snapshot-private dir, the manifest is
    * written to a temp file and atomically renamed, then HEAD is swapped.
    */
  def commit(
      df: DataFrame,
      table: String,
      step: Long,
      metrics: Map[String, Double] = Map.empty): SnapshotMeta = {
    val spark = df.sparkSession
    val parent = currentSnapshot(table).map(_.snapshotId)
    // A writer that crashed between the manifest rename and the HEAD swap
    // leaves an orphaned manifest-<parent+1>.json; the next commit reuses
    // that id and overwrites both the data dir (mode overwrite) and the
    // manifest (REPLACE_EXISTING below), so the table never becomes
    // uncommittable and history stays gap-free.
    val id = parent.map(_ + 1).getOrElse(0L)
    val dir = dataDir(table, id)
    df.write.mode("overwrite").parquet(dir.toString)

    // per-partition row counts = lineage metrics for skew diagnosis on resume
    val back = spark.read.parquet(dir.toString)
    val partRows = back
      .groupBy(spark_partition_id().as("pid")).count()
      .orderBy("pid").collect().map(_.getLong(1)).toSeq
    val rows = partRows.sum

    val meta = SnapshotMeta(table, id, parent, step, rows,
      back.rdd.getNumPartitions, partRows, metrics)

    Files.createDirectories(manifestDir(table))
    val json = renderJson(meta)
    val tmp = manifestDir(table).resolve(s"manifest-$id.json.tmp")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifestDir(table).resolve(s"manifest-$id.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    val headTmp = Paths.get(table, "HEAD.tmp")
    Files.write(headTmp, id.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(headTmp, headFile(table), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    meta
  }

  /** Latest committed snapshot meta, or None for a fresh/absent table. */
  def currentSnapshot(table: String): Option[SnapshotMeta] = {
    val head = headFile(table)
    if (!Files.exists(head)) None
    else {
      val id = new String(Files.readAllBytes(head), StandardCharsets.UTF_8).trim.toLong
      readManifest(table, id)
    }
  }

  def readManifest(table: String, id: Long): Option[SnapshotMeta] = {
    val p = manifestDir(table).resolve(s"manifest-$id.json")
    if (!Files.exists(p)) None
    else Some(parseJson(table, new String(Files.readAllBytes(p), StandardCharsets.UTF_8)))
  }

  /** All committed snapshots, oldest first (the lineage chain). */
  def history(table: String): Seq[SnapshotMeta] = {
    val dir = manifestDir(table)
    if (!Files.exists(dir)) Seq.empty
    else
      Files.list(dir).iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("manifest-") && s.endsWith(".json") =>
          s.stripPrefix("manifest-").stripSuffix(".json").toLong
        }
        .toSeq.sorted.flatMap(readManifest(table, _))
  }

  /** Read the latest snapshot's data. */
  def read(spark: SparkSession, table: String): Option[(SnapshotMeta, DataFrame)] =
    currentSnapshot(table).map { m =>
      (m, spark.read.parquet(dataDir(table, m.snapshotId).toString))
    }

  // -- minimal hand-rolled JSON (no external deps allowed) ------------------

  private def renderJson(m: SnapshotMeta): String = {
    val metricsJson = m.metrics.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")
    s"""{
       |  "snapshotId": ${m.snapshotId},
       |  "parentId": ${m.parentId.map(_.toString).getOrElse("null")},
       |  "step": ${m.step},
       |  "rows": ${m.rows},
       |  "numPartitions": ${m.numPartitions},
       |  "partitionRows": ${m.partitionRows.mkString("[", ",", "]")},
       |  "metrics": $metricsJson
       |}""".stripMargin
  }

  private def parseJson(table: String, s: String): SnapshotMeta = {
    def longField(name: String): Long = {
      val p = java.util.regex.Pattern.compile("\"" + name + "\"\\s*:\\s*(-?\\d+)")
      val m = p.matcher(s); require(m.find(), s"missing $name"); m.group(1).toLong
    }
    def optLongField(name: String): Option[Long] = {
      val p = java.util.regex.Pattern.compile("\"" + name + "\"\\s*:\\s*(null|-?\\d+)")
      val m = p.matcher(s); require(m.find(), s"missing $name")
      if (m.group(1) == "null") None else Some(m.group(1).toLong)
    }
    val arrP = java.util.regex.Pattern.compile("\"partitionRows\"\\s*:\\s*\\[([^\\]]*)\\]")
    val am = arrP.matcher(s); require(am.find(), "missing partitionRows")
    val partRows =
      am.group(1).split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(_.toLong)
    val metP = java.util.regex.Pattern.compile("\"metrics\"\\s*:\\s*\\{([^}]*)\\}")
    val mm = metP.matcher(s)
    val metrics: Map[String, Double] =
      if (!mm.find() || mm.group(1).trim.isEmpty) Map.empty
      else mm.group(1).split(",").map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble
      }.toMap
    SnapshotMeta(table, longField("snapshotId"), optLongField("parentId"),
      longField("step"), longField("rows"), longField("numPartitions").toInt,
      partRows, metrics)
  }
}
