package graft

import org.apache.spark.sql.SparkSession

/** Dev scratch main for plan inspection / micro-timing. Not part of the
  * driver contract.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.001"
    val q = SparkEntry.queries("q19_rollup_explode")(spark, d)
    println(q.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
