package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video payloads as opaque
  * `BINARY` columns with typed metadata, processed in batches via
  * `mapPartitions` (the JVM analogue of `mapInPandas` batch processing).
  *
  * Image decode is REAL: `javax.imageio.ImageIO` ships in the stock JDK
  * and reads PNG/JPEG/GIF/BMP with no external jar, so image rows yield
  * true width/height and a pixel-derived feature. Only audio/video decode
  * remains a clearly-marked deterministic STUB — those codecs genuinely
  * are absent offline (no javax.sound MP3/AAC, no ffmpeg).
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
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** Real image decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP). Returns
    * (width, height, 8-dim pixel feature) or None if the payload is not a
    * decodable image. Feature: mean R, G, B, luma over the full frame plus
    * mean luma of the four quadrants, all in [0, 1] — deterministic pure
    * functions of the decoded pixels (PNG is lossless, so these values are
    * independent of encoder details).
    *
    * Accumulation is INTEGER (luma scaled by 1000: 299r + 587g + 114b), so
    * partial sums are exact and order-independent — the result is
    * bit-replayable by any engine that can sum integers and divide doubles
    * in the same order (the mm_features DuckDB oracle does exactly that). */
  private[pipeline] def decodeImage(payload: Array[Byte]): Option[(Int, Int, Array[Float])] = {
    if (payload == null) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      if (img == null) return None
      val w = img.getWidth
      val h = img.getHeight
      if (w <= 0 || h <= 0) return None
      var sr = 0L; var sg = 0L; var sb = 0L
      val quad = new Array[Long](4) // Σ(299r + 587g + 114b) per quadrant
      val quadN = new Array[Long](4)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val r = (rgb >> 16) & 0xff
          val g = (rgb >> 8) & 0xff
          val b = rgb & 0xff
          sr += r; sg += g; sb += b
          val luma1000 = 299L * r + 587L * g + 114L * b
          val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
          quad(q) += luma1000; quadN(q) += 1
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val f = new Array[Float](8)
      f(0) = (sr.toDouble / n / 255.0).toFloat
      f(1) = (sg.toDouble / n / 255.0).toFloat
      f(2) = (sb.toDouble / n / 255.0).toFloat
      f(3) = ((299L * sr + 587L * sg + 114L * sb).toDouble / 1000.0 / n / 255.0).toFloat
      var q = 0
      while (q < 4) {
        f(4 + q) =
          if (quadN(q) == 0) 0.0f
          else (quad(q).toDouble / 1000.0 / quadN(q) / 255.0).toFloat
        q += 1
      }
      Some((w, h, f))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** STUB decode for audio/video only: no offline codec exists in this
    * container (javax.sound handles WAV but not MP3/AAC; no ffmpeg). The
    * stub derives a deterministic 8-dim "feature" from payload bytes so
    * every downstream operator (batching, schema, partition behavior, ANN
    * join) is exercised end-to-end with stable expected values. A real
    * deployment plugs javacv/ffmpeg in here.
    *
    * Lane sums are exact integers (byte values per `i % 8` lane), divided
    * once at the end — order-independent and SQL-replayable, like
    * `decodeImage`. */
  private[pipeline] def stubDecodeFeature(payload: Array[Byte]): Array[Float] = {
    val lanes = new Array[Long](8)
    if (payload != null) {
      var i = 0
      while (i < payload.length) {
        lanes(i % 8) += (payload(i) & 0xff)
        i += 1
      }
    }
    val f = new Array[Float](8)
    var k = 0
    while (k < 8) { f(k) = (lanes(k).toDouble / 255.0).toFloat; k += 1 }
    f
  }

  /** Batched feature extraction: one pass per partition, reusing a decode
    * "context" per batch exactly like a Pandas-UDF batch would. Narrow
    * transformation — no shuffle, payloads stay where they are. Image rows
    * get REAL decoded width/height + pixel features; audio/video rows get
    * the stub feature and null dimensions. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val out = media.select("media_id", "mime", "payload").rdd.mapPartitions { it =>
      // per-partition decoder context: ImageIO plugin lookup is cached by
      // the JVM; a real audio/video codec would be initialized here
      it.map { r =>
        val mime = r.getString(1)
        val payload = r.getAs[Array[Byte]]("payload")
        val nBytes = if (payload == null) 0 else payload.length
        val decoded = if (mime.startsWith("image/")) decodeImage(payload) else None
        decoded match {
          case Some((w, h, f)) =>
            Row(r.getLong(0), mime, nBytes, w, h, f.toSeq)
          case None =>
            Row(r.getLong(0), mime, nBytes, null, null,
              stubDecodeFeature(payload).toSeq)
        }
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

  /** Deterministic RGB test image: pixel (x, y) of image `i` is a pure
    * function of (i, x, y) via the splitmix mix. Real PNG bytes. */
  private[pipeline] def synthesizePng(i: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val m = graft.ingest.Pages.mix(i * 1000003L + y.toLong * 131L + x)
        img.setRGB(x, y, (m & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Synthesize a deterministic media table for tests/benchmarks: image
    * rows carry REAL PNG payloads (decodable by extractFeatures), audio/
    * video rows carry deterministic byte noise for the stub path. */
  def synthesize(spark: org.apache.spark.sql.SparkSession, n: Long,
      partitions: Int = 8): DataFrame = {
    import spark.implicits._
    val mimes = Seq("image/png", "audio/wav", "video/mp4")
    spark.range(0, n, 1, partitions).as[Long].map { i =>
      val mime = mimes((i % 3).toInt)
      if (i % 3 == 0) {
        val w = 4 + (graft.ingest.Pages.mix(i) & 0x7).toInt
        val h = 4 + (graft.ingest.Pages.mix(i + 1) & 0x7).toInt
        (i, mime, synthesizePng(i, w, h), w, h, 0)
      } else {
        val len = 64 + (graft.ingest.Pages.mix(i) & 0x3ff).toInt
        val payload = Array.tabulate[Byte](len)(j =>
          (graft.ingest.Pages.mix(i * 1000003L + j) & 0xff).toByte)
        (i, mime, payload, 0, 0, 1000)
      }
    }.toDF("media_id", "mime", "payload", "meta_w", "meta_h", "meta_ms")
  }
}
