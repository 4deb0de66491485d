package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

/** Dev: scale curve of [[graft.ext.Stats.rocAucByGroup]]'s grouped
  * two-phase prefix sums vs DISTINCT-SCORE SUPPORT size at fixed
  * corpus size — the same dimension DriftProbe sweeps for the drift
  * operators: a per-group `Window.partitionBy(g).orderBy(s)` funnels
  * each group's whole support through ONE task, so its wall grows
  * with support/|groups| no matter the parallelism; the two-phase
  * (g, bucket)-partitioned path re-parallelizes it. Both paths are
  * exact integer arithmetic, so the probe also asserts bit-equal
  * outputs at every size.
  *
  * `Test/runMain graft.RankProbe [supports...]`
  * (default 100000 1000000 10000000).
  */
object RankProbe {
  def main(args: Array[String]): Unit = {
    val supports = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(100000L, 1000000L, 10000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = 10000000L // 10M rows, 2 groups
    def frame(s: Long) = spark.range(corpus).select(
      (col("id") % 2).cast("string").as("g"),
      (col("id") % s).as("sc"),
      (pmod(xxhash64(col("id")), lit(100)) <
        // label rate drifts with the score so AUC is non-trivial
        (lit(20) + (col("id") % s) * 60 / s)).as("lab"))
    def run(s: Long, maxSingle: Long): (Seq[(String, Long)], Double) = {
      val t0 = System.nanoTime()
      val rows = graft.ext.Stats.rocAucByGroup(frame(s), "g",
          col("sc"), col("lab"), maxSingleTask = maxSingle)
        .collect()
        .map(r => (r.getString(0), r.getLong(3))).sortBy(_._1).toSeq
      (rows, (System.nanoTime() - t0) / 1e9)
    }
    run(1000L, 0L); run(1000L, Long.MaxValue) // warm both paths
    println("| support_per_group | auc_ppm(g0,g1) | two_phase_sec " +
      "| single_window_sec |")
    supports.foreach { s =>
      val (a, tTwo) = run(s, 0L)
      val (b, tOne) = run(s, Long.MaxValue)
      assert(a == b, s"paths disagree at support $s: $a vs $b")
      println(f"| $s | ${a.map(_._2).mkString(",")} | $tTwo%.2f " +
        f"| $tOne%.2f |")
    }
    spark.stop()
  }
}
