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
    SparkSession
      .builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", sp.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
  }
}
