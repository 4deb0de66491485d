package graft

import org.apache.spark.sql.SparkSession

/** Dev: decompose the per-query floor of sub-second bench queries into
  * plan time (analyze+optimize+physical) vs execution time, steady
  * state (3rd rep) — is the floor scheduler, optimizer, or execution?
  */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.graft.collapseRollupExplode", "true")
      .config("spark.graft.vecDotRewrite.assumeNoNullElements", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val names = if (args.nonEmpty) args.toSeq else Seq(
      "q01_agg_sum", "q04_any_flag", "q13_topk", "q22_text_tokens",
      "q41_union_years", "q57_langid", "q66_kmv_distinct",
      "q113_weighted_median", "q170_ab_srm", "q181_dataset_card")
    // warmup
    SparkEntry.entry(spark).count()
    println(f"| query | plan_ms | exec_ms | total_ms |")
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      var planMs = 0.0; var execMs = 0.0; var totMs = 0.0
      (1 to 3).foreach { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        val df = fn(spark, d)
        df.queryExecution.executedPlan // force analyze+optimize+plan
        val t1 = System.nanoTime()
        df.count()
        val t2 = System.nanoTime()
        planMs = (t1 - t0) / 1e6; execMs = (t2 - t1) / 1e6
        totMs = (t2 - t0) / 1e6
      }
      println(f"| $n | $planMs%.0f | $execMs%.0f | $totMs%.0f |")
    }
    spark.stop()
  }
}
