package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    val d = "/root/testdata/sf0.1"
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%7.2f s  rows=$n")
    }
    spark.range(1000).selectExpr("sum(id)").collect() // warmup

    val docs = Tables.documents(spark, d)
    time("scan only")(docs.count())
    val toks = docs.select(col("doc_id"),
      split(trim(col("text")), "\\s+").as("w"))
    time("split only")(toks.select(explode(col("w"))).count())
    val sh = ext.Dedup.shingles(col("text"), 3)
    time("shingle explode")(docs.select(col("doc_id"),
      explode(sh).as("s")).count())
    time("shingle+md5x1")(docs.select(col("doc_id"), explode(sh).as("s"))
      .select(md5(concat(lit("0"), col("s")))).count())
    time("full q26")(queries.ExtQueries.defs("q26_minhash_sig")(spark, d)
      .count())
    time("full q26 again")(queries.ExtQueries.defs("q26_minhash_sig")(spark, d)
      .count())
    spark.stop()
  }
}
