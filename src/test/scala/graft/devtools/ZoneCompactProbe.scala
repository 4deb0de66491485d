package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: wall-clock of [[graft.ext.Layout.zoneCompact]] vs the NUMBER of
  * independent overlap components. The round-7 serial loop paid one
  * scheduler-floor latency per component, so many small components —
  * the realistic 100 TB daily-append shape — made compaction
  * throughput-limited by component COUNT, not data volume. The round-8
  * concurrent rewrite should make wall-clock grow far slower than
  * component count (bounded by the 8-thread pool, ~ceil(K/8) batches
  * of floor latency instead of K).
  *
  * Construction: K well-separated value clusters, each one base zone
  * plus one overlapping appended file -> exactly K two-file components.
  *
  * `Test/runMain graft.ZoneCompactProbe [componentCounts...]`
  * (default 4 16 32).
  */
object ZoneCompactProbe {
  /** `meta` mode: wall-clock of the OVERLAP DETECTION alone vs zone
    * COUNT — a fabricated sidecar of n disjoint zones (plus data-dir
    * stub so the no-op branch returns before touching any file), so
    * the measurement is the pure metadata path the round-8 verdict
    * flagged as O(n²). With the round-9 sweep this must stay sort-
    * bound: 100k zones in well under a second where the pair loop
    * was 5×10⁹ comparisons.
    *
    * `Test/runMain graft.ZoneCompactProbe meta [zoneCounts...]`
    * (default 10000 100000 1000000).
    */
  def metaMain(counts: Seq[Int]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_zcm")
    println("| zones | detect_sec |")
    println("|---|---|")
    counts.foreach { n =>
      val path = s"$work/t$n"
      new java.io.File(path).mkdirs()
      (0 until n).map(i => (s"file:$path/part-$i.parquet",
          i.toLong * 10L, i.toLong * 10L + 5L, 100L))
        .toDF("file", "mn", "mx", "rows")
        .coalesce(1).write.mode("overwrite").parquet(path + ".zones")
      val t0 = System.nanoTime()
      graft.ext.Layout.zoneCompact(spark, path, "x", rowsPerFile = 100L)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"| $n | $sec%.2f |")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("meta")) {
      metaMain(if (args.length > 1) args.tail.map(_.toInt).toSeq
        else Seq(10000, 100000, 1000000))
      return
    }
    val ks = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(4, 16, 32)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val work = java.nio.file.Files.createTempDirectory("graft_zcp")
    println("| components | files_before | files_after | sec |")
    println("|---|---|---|---|")
    ks.foreach { k =>
      val path = s"$work/t$k"
      // K clusters at x in [i*10000, i*10000+1000), one zone each
      val base = (0 until k).flatMap(i =>
        (0 until 500).map(j => (i * 1000L + j, i * 10000L + j * 2L)))
        .toDF("id", "x")
      graft.ext.Layout.zoneWrite(base, "x", k, path)
      // one overlapping append per cluster (K appends -> K components)
      (0 until k).foreach { i =>
        graft.ext.Layout.zoneAppend(
          (0 until 20).map(j => (900000L + i * 100L + j,
            i * 10000L + 500L + j)).toDF("id", "x"), "x", 1, path)
      }
      val before = spark.read.parquet(path + ".zones").count()
      val t0 = System.nanoTime()
      graft.ext.Layout.zoneCompact(spark, path, "x", rowsPerFile = 600L)
      val sec = (System.nanoTime() - t0) / 1e9
      val after = spark.read.parquet(path + ".zones").count()
      // sanity: converged and nothing lost
      val zones = spark.read.parquet(path + ".zones")
        .select("mn", "mx").collect().map(r => (r.getLong(0), r.getLong(1)))
      zones.foreach { a => zones.foreach { b =>
        if (a != b) require(a._2 < b._1 || a._1 > b._2,
          s"zones overlap after compact: $a $b") } }
      require(spark.read.parquet(path).count() == k * 520L)
      println(f"| $k | $before | $after | $sec%.2f |")
    }
    spark.stop()
  }
}
