package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratch: stage timing of two-phase numericDrift internals. */
object Scratch3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val s = 1000000L
    val a = spark.range(3000000L).select((col("id") % s * 2).as("v"))
    val b = spark.range(3000000L).select((col("id") % s * 2 + 7).as("v"))
    a.count(); b.count()
    def t[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val ca = a.groupBy("v").agg(count(lit(1)).as("na"))
    val cb = b.groupBy("v").agg(count(lit(1)).as("nb"))
    val merged = ca.join(cb, Seq("v"), "full_outer")
      .na.fill(0L, Seq("na", "nb"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("materialize cache (count)") { merged.count() }
    val sp = t("splits on cached") { graft.ext.TwoPhase.splits(merged, "v", 32) }
    val bucketed = merged.withColumn("__b", graft.ext.TwoPhase.bucketCol(col("v"), sp))
    t("summary on cached") {
      bucketed.groupBy("__b").agg(sum("na"), sum("nb"), min("v")).collect() }
    val offDf = (0 until 32).map(i => (i, 0L, 0L)).toDF("__b", "__offa", "__offb")
    val wB = Window.partitionBy("__b").orderBy("v")
    val wBc = wB.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t("final-shaped pass on cached") {
      bucketed.join(broadcast(offDf), Seq("__b"))
        .withColumn("__ca", sum(col("na")).over(wBc) + col("__offa"))
        .withColumn("__cb", sum(col("nb")).over(wBc) + col("__offb"))
        .withColumn("__gap", lead(col("v"), 1).over(wB) - col("v"))
        .filter(col("__gap").isNotNull)
        .agg(count(lit(1))).collect() }
    t("bucketCol eval only (count over bucketed)") {
      bucketed.groupBy("__b").count().collect() }
    t("plain count on cached") { merged.count() }
    t("plain agg sums on cached (no bucket)") {
      merged.agg(sum("na"), sum("nb"), min("v")).collect() }
    val wbArith = expr("width_bucket(v, 0, " + (2*s) + ", 32)")
    t("width_bucket count on cached") {
      merged.withColumn("__b2", wbArith).groupBy("__b2").count().collect() }
    t("summary via width_bucket") {
      merged.withColumn("__b2", wbArith).groupBy("__b2")
        .agg(sum("na"), sum("nb"), min("v")).collect() }
    spark.stop()
  }
}
