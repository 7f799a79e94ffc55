package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Defaults are sized for the sandbox (local[N], one JVM) but every knob is
  * chosen for cluster semantics: AQE on (runtime skew-join splitting +
  * coalescing), shuffle partitions sized to the parallelism level rather than
  * the Spark default of 200, UTC timestamps.
  */
object GraftSession {

  def local(cores: Int, shufflePartitions: Int = -1): SparkSession = {
    val sp = if (shufflePartitions > 0) shufflePartitions else math.max(cores, 8)
    builder(s"local[$cores]", sp).getOrCreate()
  }

  /** REAL multi-executor session: `local-cluster[n, coresPerWorker, memMB]`
    * launches n separate executor JVMs (own heaps, own GC) — the faithful
    * sandbox stand-in for an n-executor cluster, used for the N-vs-4N
    * scaling evidence. Application classes are shipped to executors via
    * `spark.executor.extraClassPath` (no jar packaging needed locally). */
  def localCluster(workers: Int, coresPerWorker: Int, memMB: Int,
      shufflePartitions: Int = 32): SparkSession = {
    val classDirs = Seq(
      "/root/repo/target/scala-2.13/classes",
      "/root/repo/target/scala-2.13/test-classes").mkString(":")
    builder(s"local-cluster[$workers,$coresPerWorker,$memMB]", shufflePartitions)
      .config("spark.executor.memory", s"${memMB}m")
      .config("spark.executor.extraClassPath", classDirs)
      .getOrCreate()
  }

  private def builder(master: String, shufflePartitions: Int) =
    SparkSession
      .builder()
      .master(master)
      .appName("graft")
      // native-function SQL surface (graft_fingerprint64 & co); on a real
      // cluster the same class goes on spark.sql.extensions
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
}
