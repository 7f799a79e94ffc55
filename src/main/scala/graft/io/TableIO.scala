package graft.io

import java.nio.charset.StandardCharsets

import scala.util.Try

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
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
  *     HEAD                               // hint file: current snapshot id
  * }}}
  *
  * All metadata I/O goes through the Hadoop [[FileSystem]] API resolved from
  * the table path's scheme, so checkpoint/resume works on any Hadoop-
  * compatible store (local `file:`, HDFS, S3A) — the same substrate the
  * parquet data side already uses.
  *
  * Commit protocol (Iceberg `HadoopTableOperations` semantics):
  * the atomic rename of `manifest-<id>.json` IS the commit point. Snapshot
  * ids are dense (`parent + 1`), and a rename onto an existing manifest is
  * refused loudly — two racing writers cannot silently clobber each other's
  * snapshot (single-writer is the supported protocol; the `require` turns a
  * race into an error instead of corruption). `HEAD` is a best-effort hint
  * only: readers probe forward from it (or from 0) for the newest committed
  * manifest, so a crash between the manifest rename and the HEAD swap — or a
  * lost HEAD file — costs nothing but a few existence probes. A writer that
  * crashes before the manifest rename leaves only an orphaned data dir,
  * never a torn table; the next commit reuses the id and overwrites the
  * orphan's data (mode overwrite) before publishing its own manifest.
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

  private def hadoopConf: Configuration =
    SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  private def fsOf(table: String): FileSystem =
    new Path(table).getFileSystem(hadoopConf)

  private def manifestDir(table: String): Path = new Path(table, "manifests")
  private def manifestPath(table: String, id: Long): Path =
    new Path(manifestDir(table), s"manifest-$id.json")
  private def headFile(table: String): Path = new Path(table, "HEAD")
  private def dataDir(table: String, id: Long): Path =
    new Path(table, f"data/snap-$id%06d")

  private def writeString(fs: FileSystem, p: Path, s: String): Unit = {
    val out = fs.create(p, true)
    try out.write(s.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readString(fs: FileSystem, p: Path): String = {
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf)
    finally in.close()
    new String(buf, StandardCharsets.UTF_8)
  }

  /** Commit `df` as snapshot `step` of `table`. Returns the meta written.
    * Atomicity: parquet lands in a snapshot-private dir, the manifest is
    * written to a temp file and atomically renamed — that rename is the
    * commit point; HEAD is then swapped as a reader hint. Single-writer
    * protocol: a concurrent commit of the same snapshot id fails loudly.
    */
  def commit(
      df: DataFrame,
      table: String,
      step: Long,
      metrics: Map[String, Double] = Map.empty): SnapshotMeta = {
    val parent = currentSnapshot(table).map(_.snapshotId)
    commitAt(df, table, parent.map(_ + 1).getOrElse(0L), parent, step, metrics)
  }

  /** Commit at a pre-resolved snapshot id (the tail of [[commit]], exposed
    * package-private so the concurrent-commit guard is testable). */
  private[io] def commitAt(
      df: DataFrame,
      table: String,
      id: Long,
      parent: Option[Long],
      step: Long,
      metrics: Map[String, Double]): SnapshotMeta = {
    val fs = fsOf(table)
    // guard BEFORE touching the data dir: if this id is already committed, a
    // concurrent writer won the race — failing here keeps its snapshot's
    // data intact (the snap-<id> dir below is about to be overwritten)
    require(!fs.exists(manifestPath(table, id)),
      s"concurrent commit detected: snapshot $id of $table already exists")
    val dir = dataDir(table, id)
    df.write.mode("overwrite").parquet(dir.toString)

    // per-partition row counts = lineage metrics for skew diagnosis on
    // resume, read from the parquet FOOTERS (exact per-file record
    // counts): with checkpointEvery=1 a full read-back-and-count of every
    // snapshot would roughly double checkpoint I/O on the iteration path,
    // while footers are a metadata tail read per file. One file per
    // write task, listed in name order — the same per-partition
    // granularity the old spark_partition_id() scan produced.
    val conf = fs.getConf
    val partFiles = fs.listStatus(dir)
      .filter(_.getPath.getName.startsWith("part-"))
      .sortBy(_.getPath.getName)
    val partRows = partFiles.toSeq.map { f =>
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromStatus(f, conf))
      try r.getRecordCount finally r.close()
    }
    val rows = partRows.sum

    val meta = SnapshotMeta(table, id, parent, step, rows,
      partRows.length, partRows, metrics)

    fs.mkdirs(manifestDir(table))
    val tmp = new Path(manifestDir(table), s"manifest-$id.json.tmp")
    writeString(fs, tmp, renderJson(meta))
    val dst = manifestPath(table, id)
    // the commit point: refuse to clobber a concurrently committed snapshot
    require(!fs.exists(dst),
      s"concurrent commit detected: snapshot $id of $table already exists")
    require(fs.rename(tmp, dst), s"manifest rename failed for $dst")
    // best-effort hint swap — readers recover via manifest probing if a
    // crash lands in the delete/rename window
    val headTmp = new Path(table, "HEAD.tmp")
    writeString(fs, headTmp, id.toString)
    fs.delete(headFile(table), false)
    fs.rename(headTmp, headFile(table))
    meta
  }

  /** Latest committed snapshot meta, or None for a fresh/absent table.
    * Reads the HEAD hint if present, then probes forward over the dense id
    * space for manifests committed after the hint was written (crash-window
    * recovery); a missing HEAD falls back to a manifest listing. */
  def currentSnapshot(table: String): Option[SnapshotMeta] = {
    val fs = fsOf(table)
    val head = headFile(table)
    val hinted: Option[Long] =
      if (fs.exists(head)) Try(readString(fs, head).trim.toLong).toOption
      else None
    hinted match {
      case Some(h) =>
        var id = h
        while (fs.exists(manifestPath(table, id + 1))) id += 1
        // a corrupt/too-high HEAD (or pruned manifests) must not hide older
        // committed snapshots — fall back to the listing before concluding
        // the table is empty
        readManifest(table, id).orElse(history(table).lastOption)
      case None => history(table).lastOption
    }
  }

  def readManifest(table: String, id: Long): Option[SnapshotMeta] = {
    val fs = fsOf(table)
    val p = manifestPath(table, id)
    if (!fs.exists(p)) None
    else Some(parseJson(table, readString(fs, p)))
  }

  /** All committed snapshots, oldest first (the lineage chain). */
  def history(table: String): Seq[SnapshotMeta] = {
    val fs = fsOf(table)
    val dir = manifestDir(table)
    if (!fs.exists(dir)) Seq.empty
    else
      fs.listStatus(dir).toSeq
        .map(_.getPath.getName)
        .collect { case s if s.startsWith("manifest-") && s.endsWith(".json") =>
          s.stripPrefix("manifest-").stripSuffix(".json").toLong
        }
        .sorted.flatMap(readManifest(table, _))
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
