package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `BINARY` columns with typed metadata, processed in batches via
  * `mapPartitions` (the JVM analogue of `mapInPandas` batch processing —
  * decode libraries are absent in this container, so the decode itself is a
  * clearly-marked deterministic STUB; the Spark-side plumbing — schema,
  * batch shape, partitioning, pruning — is real and tested).
  *
  * Design rules encoded here:
  *  - binary payloads NEVER pass through a shuffle: all media transforms are
  *    narrow (mapPartitions), and any aggregation runs on extracted features
  *  - metadata (mime, width, height, duration) travels as ordinary columns
  *    so Catalyst can prune/filter without touching bytes
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta_w", IntegerType, nullable = true),
    StructField("meta_h", IntegerType, nullable = true),
    StructField("meta_ms", IntegerType, nullable = true)))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("mime", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** STUB decode: a real deployment plugs an image/audio codec in here
    * (javacv / TwelveMonkeys / ffmpeg via mapInPandas on PySpark). The stub
    * derives a deterministic 8-dim "feature" from payload bytes so every
    * downstream operator (batching, schema, partition behavior, ANN join)
    * is exercised end-to-end with stable expected values. */
  private[pipeline] def stubDecodeFeature(payload: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        f(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
    }
    f
  }

  /** Batched feature extraction: one pass per partition, reusing a decode
    * "context" per batch exactly like a Pandas-UDF batch would. Narrow
    * transformation — no shuffle, payloads stay where they are. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "mime", "payload").rdd.mapPartitions { it =>
      // per-partition decoder context would be initialized here (stubbed)
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row(r.getLong(0), r.getString(1),
          if (payload == null) 0 else payload.length,
          stubDecodeFeature(payload).toSeq)
      }
    }
    spark.createDataFrame(out, featureSchema)
  }

  /** Deterministic frame sampling for video-shaped payloads: every
    * `stride`-th 256-byte block becomes one "frame" row. Generator-shaped
    * (UDF + explode) — the Spark plumbing for a real frame sampler. */
  def sampleFrames(media: DataFrame, stride: Int): DataFrame = {
    val frames = udf { (payload: Array[Byte]) =>
      if (payload == null) Seq.empty[(Int, Int)]
      else {
        val n = payload.length / 256
        (0 until n by stride).map(i => (i, math.min(256, payload.length - i * 256)))
      }
    }
    media.select(col("media_id"),
        explode(frames(col("payload"))).as("frame"))
      .select(col("media_id"), col("frame._1").as("frame_idx"),
        col("frame._2").as("frame_bytes"))
  }

  /** Synthesize a deterministic media table for tests/benchmarks. */
  def synthesize(spark: org.apache.spark.sql.SparkSession, n: Long,
      partitions: Int = 8): DataFrame = {
    import spark.implicits._
    val mimes = Seq("image/png", "audio/wav", "video/mp4")
    spark.range(0, n, 1, partitions).as[Long].map { i =>
      val len = 64 + (graft.ingest.Pages.mix(i) & 0x3ff).toInt
      val payload = Array.tabulate[Byte](len)(j =>
        (graft.ingest.Pages.mix(i * 1000003L + j) & 0xff).toByte)
      (i, mimes((i % 3).toInt), payload,
        if (i % 3 == 0) 64 else 0, if (i % 3 == 0) 64 else 0,
        if (i % 3 != 0) 1000 else 0)
    }.toDF("media_id", "mime", "payload", "meta_w", "meta_h", "meta_ms")
  }
}
