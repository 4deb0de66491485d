package graft
import org.apache.spark.sql.SparkSession

/** Dev microbenchmark: time one SparkEntry query N times in one JVM —
  * `runMain graft.TimeOne <queryName> <sfDir> <reps>`. Same session
  * config as Bench.
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, reps) = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.graft.collapseRollupExplode", "true")
      .config("spark.graft.vecDotRewrite.assumeNoNullElements", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.entry(spark).count() // warmup
    (1 to reps.toInt).foreach { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"== rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
