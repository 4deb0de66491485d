package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: is q39's residual 30× cost candidate waste or GENUINE output?
  * Count nearDupMedia's result rows at 1×/10×/30× replication — if
  * true above-threshold pairs grow ~quadratically, the cost is the
  * answer's size (no blocking can emit fewer pairs than exist), not
  * an operator flaw. `sbt "Test/runMain graft.PairGrowthPeek"`
  */
object PairGrowthPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/testdata/sf0.1"
    val az = "abcdefghijklmnopqrstuvwxyz"
    def docs(m: Int) = (0 until m).map { i =>
      val rot = az.drop(i % 26) + az.take(i % 26)
      Tables.documents(spark, base).select(
        (col("doc_id") + i * 10000000L).as("doc_id"),
        translate(regexp_replace(col("text"), "(\\S+)", s"$$1_$i"),
          az, rot).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    Seq(1, 10, 30).foreach { m =>
      val nBits = math.min(21, 8 + math.max(0,
        (math.log(m * 5000 / 5000.0) / math.log(2)).ceil.toInt))
      val out = graft.ext.Multimodal.nearDupMedia(
        graft.ext.Multimodal.syntheticMedia(spark, docs(m)),
        threshold = 0.9, nBits = nBits).count()
      println(s"== m=$m nBits=$nBits out_pairs=$out")
    }
    spark.stop()
  }
}
