package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev: scale curve of the two-phase [[graft.ext.Stats.numericDrift]]
  * and ksDrift vs DISTINCT-VALUE SUPPORT size at FIXED corpus size —
  * the dimension the round-8 verdict flagged: the old partition-less
  * window put the whole support on one task, so its wall grew with
  * the support no matter the parallelism. The probe holds the corpus
  * at 3M rows per side and sweeps the support (v = id % S), timing
  * the round-9 bucketed form against an inline replay of the
  * pre-round-9 single-window form.
  *
  * `Test/runMain graft.DriftProbe [supports...]`
  * (default 100000 1000000 3000000).
  */
object DriftProbe {

  /** The pre-round-9 global-window form, kept here as the contrast
    * baseline (one partition-less window over the merged support).
    */
  private def naiveDrift(a: DataFrame, b: DataFrame): Long = {
    import org.apache.spark.sql.expressions.Window
    val d = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
    val ca = a.groupBy("v").agg(count(lit(1)).as("na"))
    val cb = b.groupBy("v").agg(count(lit(1)).as("nb"))
    val merged = ca.join(cb, Seq("v"), "full_outer")
      .na.fill(0L, Seq("na", "nb"))
    val wOrd = Window.orderBy("v")
    val wc = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    merged
      .withColumn("__ca", sum(col("na")).over(wc))
      .withColumn("__cb", sum(col("nb")).over(wc))
      .withColumn("__nat", sum(col("na")).over(wAll))
      .withColumn("__nbt", sum(col("nb")).over(wAll))
      .withColumn("__gap", lead(col("v"), 1).over(wOrd) - col("v"))
      .filter(col("__gap").isNotNull)
      .agg(sum(abs(d(col("__ca")) * d(col("__nbt")) -
        d(col("__cb")) * d(col("__nat"))) * d(col("__gap"))).as("s"),
        max(col("__nat")).as("na"), max(col("__nbt")).as("nb"))
      .selectExpr("cast(s div (cast(na as decimal(38,0)) * nb) as long)")
      .collect().head.getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val supports = if (args.nonEmpty) args.map(_.toLong).toSeq
      else Seq(100000L, 1000000L, 3000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val corpus = 3000000L
    // JVM/codegen warmup so the first table row is not session startup
    graft.ext.Stats.numericDrift(
      spark.range(1000).toDF("v"), spark.range(1000).toDF("v"),
      col("v")).collect()
    println("| support_per_side | emd | drift_sec | ks_sec | naive_window_sec |")
    println("|---|---|---|---|---|")
    supports.foreach { s =>
      spark.catalog.clearCache()
      // corpus fixed at 3M rows/side (grown only when the requested
      // support exceeds it); support sweeps via modulo. b shifted by
      // +7 -> exact EMD 7 at every support size.
      val rows = math.max(corpus, s)
      val a = spark.range(rows).select((col("id") % s * 2).as("v"))
      val b = spark.range(rows).select((col("id") % s * 2 + 7).as("v"))
      val t0 = System.nanoTime()
      val r = graft.ext.Stats.numericDrift(a, b, col("v")).collect().head
      val s1 = (System.nanoTime() - t0) / 1e9
      require(r.getLong(2) == 7L, s"emd=${r.getLong(2)}")
      spark.catalog.clearCache()
      val t1 = System.nanoTime()
      graft.ext.Stats.ksDrift(a, b, col("v")).collect()
      val s2 = (System.nanoTime() - t1) / 1e9
      spark.catalog.clearCache()
      val t2 = System.nanoTime()
      val nv = naiveDrift(a, b)
      val s3 = (System.nanoTime() - t2) / 1e9
      require(nv == 7L, s"naive emd=$nv")
      println(f"| $s | ${r.getLong(2)} | $s1%.2f | $s2%.2f | $s3%.2f |")
    }
    spark.stop()
  }
}
