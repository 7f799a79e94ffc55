package graft.io

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.graph.{PageRank, Referee}

/** Snapshot commits, lineage chains, and mid-iteration resume (north rule:
  * "resumable from checkpoint with per-partition lineage + metrics").
  */
class TableIOSpec extends SparkSpec {
  import spark.implicits._

  test("commit / read / history round-trip with lineage") {
    val dir = tmpDir("tableio")
    val df1 = Seq((1L, 0.5), (2L, 0.5)).toDF("vid", "rank")
    val m0 = TableIO.commit(df1, dir, step = 0, Map("delta" -> 1.0))
    assert(m0.snapshotId == 0L && m0.parentId.isEmpty && m0.rows == 2L)

    val df2 = Seq((1L, 0.3), (2L, 0.7)).toDF("vid", "rank")
    val m1 = TableIO.commit(df2, dir, step = 1, Map("delta" -> 0.2))
    assert(m1.snapshotId == 1L && m1.parentId.contains(0L))

    val (meta, back) = TableIO.read(spark, dir).get
    assert(meta.snapshotId == 1L && meta.step == 1L)
    assert(back.as[(Long, Double)].collect().toMap == Map(1L -> 0.3, 2L -> 0.7))

    val h = TableIO.history(dir)
    assert(h.map(_.snapshotId) == Seq(0L, 1L))
    assert(h.last.metrics("delta") == 0.2)
    assert(h.forall(_.partitionRows.sum == 2L), "per-partition lineage rows")
  }

  test("metadata I/O runs on the Hadoop FileSystem API (file:-scheme table)") {
    // explicit scheme: the same code path a cluster uses for hdfs:// / s3a://
    val dir = "file://" + tmpDir("tableio_scheme")
    val m0 = TableIO.commit(Seq((1L, 1.0)).toDF("vid", "rank"), dir, step = 0)
    val m1 = TableIO.commit(Seq((1L, 2.0)).toDF("vid", "rank"), dir, step = 1)
    assert(m0.snapshotId == 0L && m1.parentId.contains(0L))
    val (meta, back) = TableIO.read(spark, dir).get
    assert(meta.snapshotId == 1L)
    assert(back.as[(Long, Double)].collect().toSeq == Seq((1L, 2.0)))
    assert(TableIO.history(dir).map(_.step) == Seq(0L, 1L))
  }

  test("HEAD is a hint: stale or lost HEAD recovers from manifests") {
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)

    // stale HEAD (crash between manifest rename and HEAD swap): reader
    // probes forward over the dense id space and sees the newer commit
    val dir = tmpDir("tableio_stale")
    TableIO.commit(Seq((1L, 1.0)).toDF("vid", "rank"), dir, step = 0)
    TableIO.commit(Seq((1L, 2.0)).toDF("vid", "rank"), dir, step = 1)
    val head = new org.apache.hadoop.fs.Path(dir, "HEAD")
    val out = fs.create(head, true)
    out.write("0".getBytes("UTF-8")); out.close() // wind the hint back
    assert(TableIO.currentSnapshot(dir).map(_.snapshotId) == Some(1L))

    // lost HEAD entirely: falls back to the manifest listing
    fs.delete(head, false)
    assert(TableIO.currentSnapshot(dir).map(_.snapshotId) == Some(1L))
    // and the next commit chains correctly off the recovered snapshot
    val m2 = TableIO.commit(Seq((1L, 3.0)).toDF("vid", "rank"), dir, step = 2)
    assert(m2.snapshotId == 2L && m2.parentId.contains(1L))

    // corrupt HEAD pointing ABOVE any committed manifest (or manifests
    // pruned below the hint): the forward probe finds nothing at the hint —
    // must fall back to the listing, not silently report an empty table
    val out2 = fs.create(head, true)
    out2.write("99".getBytes("UTF-8")); out2.close()
    assert(TableIO.currentSnapshot(dir).map(_.snapshotId) == Some(2L))
  }

  test("a racing writer cannot silently clobber a committed snapshot") {
    val dir = tmpDir("tableio_race")
    TableIO.commit(Seq((1L, 1.0)).toDF("vid", "rank"), dir, step = 0)
    TableIO.commit(Seq((1L, 2.0)).toDF("vid", "rank"), dir, step = 1)
    // writer A resolved parent=0 → id=1, but writer B committed id=1 in the
    // TOCTOU window: A's manifest publish must fail loudly, not overwrite
    intercept[IllegalArgumentException] {
      TableIO.commitAt(Seq((9L, 9.0)).toDF("vid", "rank"), dir,
        id = 1L, parent = Some(0L), step = 1L, metrics = Map.empty)
    }
    // B's snapshot survives intact
    val (meta, back) = TableIO.read(spark, dir).get
    assert(meta.snapshotId == 1L)
    assert(back.as[(Long, Double)].collect().toSeq == Seq((1L, 2.0)))
  }

  test("PageRank checkpoints every superstep and resumes mid-iteration") {
    val dir = tmpDir("prckpt")
    val edges = Referee.zipf(200, 800, 11L).toDF("src", "dst")

    // full run for ground truth
    val full = PageRank.run(spark, edges, maxIters = 10)
      .ranks.as[(Long, Double)].collect().toMap

    // partial run: 4 supersteps, checkpointed
    val dirA = tmpDir("prckptA")
    PageRank.run(spark, edges, maxIters = 4, checkpointTable = dirA)
    val hist = TableIO.history(dirA)
    assert(hist.map(_.step) == Seq(0L, 1L, 2L, 3L), "one snapshot per superstep")
    assert(hist.forall(_.metrics.contains("delta")), "metrics recorded")
    assert(hist.forall(_.metrics.contains("superstepSecs")))

    // resume from snapshot and finish: identical result to the full run
    val resumed = PageRank.run(spark, edges, maxIters = 10, checkpointTable = dirA)
      .ranks.as[(Long, Double)].collect().toMap
    assert(resumed.keySet == full.keySet)
    full.foreach { case (v, r) =>
      assert(math.abs(resumed(v) - r) < 1e-9, s"vid=$v")
    }
    // lineage chain is contiguous after resume
    val hist2 = TableIO.history(dirA)
    assert(hist2.map(_.step) == (0L until hist2.size.toLong))
    assert(hist2.sliding(2).forall {
      case Seq(a, b) => b.parentId.contains(a.snapshotId)
      case _ => true
    })
  }
}
