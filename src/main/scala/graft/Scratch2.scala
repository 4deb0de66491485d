package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev microbenchmark: where does q37 (simhash near-dups) spend time? */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"== $name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    val docs = Tables.documents(spark, d).select("doc_id", "text")
    // warm
    docs.count()
    time("scan+count")(docs.count())
    time("token explode + md5")(
      docs.select(col("doc_id"),
        explode(array_distinct(split(trim(col("text")), "\\s+"))).as("t"))
        .select(md5(col("t"))).count())
    time("portable sigs (conv parse)")(
      graft.ext.Dedup.simhashSignaturesPortable(docs, "doc_id", "text").count())
    time("fast sigs (xxhash)")(
      graft.ext.Dedup.simhashSignatures(docs, "doc_id", "text").count())
    time("full near-dups portable")(
      graft.ext.Dedup.simhashNearDups(docs, "doc_id", "text", 3, portable = true).count())
    time("full near-dups fast")(
      graft.ext.Dedup.simhashNearDups(docs, "doc_id", "text", 3, portable = false).count())
    // second pass for stability
    time("portable sigs pass2")(
      graft.ext.Dedup.simhashSignaturesPortable(docs, "doc_id", "text").count())
    time("full portable pass2")(
      graft.ext.Dedup.simhashNearDups(docs, "doc_id", "text", 3, portable = true).count())
    spark.stop()
  }
}
