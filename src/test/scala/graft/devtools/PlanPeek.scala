package graft

import org.apache.spark.sql.SparkSession

/** Dev: print executed-plan strings for named queries (plan-audit authoring). */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    args.foreach { name =>
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, d)
        .queryExecution.executedPlan.toString())
    }
    spark.stop()
  }
}
