package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: isolate where q206_exact_quantiles spends time vs the
  * structurally similar q199_roc_auc — same (g, v) support agg, same
  * groupedCumBelow kernel, different tail. Times each stage's action
  * separately on sf0.1 orders.
  */
object QuantTime {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    def t[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"== $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }
    val orders = spark.read.parquet(s"$d/orders.parquet")
    orders.count() // warm FS
    (1 to 3).foreach { i =>
      spark.catalog.clearCache()
      println(s"-- round $i")
      t("rocAuc total") {
        graft.ext.Stats.rocAucByGroup(orders, "o_orderpriority",
          expr("cast(round(o_totalprice * 100, 0) AS bigint)"),
          col("o_orderstatus") === "F").collect()
      }
      spark.catalog.clearCache()
      t("exactQuantiles total") {
        graft.ext.Stats.exactQuantilesByGroup(orders, "o_orderpriority",
          expr("cast(round(o_totalprice * 100, 0) AS bigint)"),
          Seq(10000L, 250000L, 500000L, 750000L, 990000L)).collect()
      }
      spark.catalog.clearCache()
      // stage split for exactQuantiles: build (count job) vs read
      val support = t("  support build+count (inside call)") {
        val df = graft.ext.Stats.exactQuantilesByGroup(orders,
          "o_orderpriority",
          expr("cast(round(o_totalprice * 100, 0) AS bigint)"),
          Seq(500000L))
        df
      }
      t("  final action") { support.collect() }
    }
    spark.stop()
  }
}
