package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: why do q39/q62 stay super-linear even with scaled nBits? —
  * measure the sign-RP bucket DISTRIBUTION of the media features at
  * 10× volume, raw vs mean-centered. frameFeature sums positive bytes
  * under fixed weights, so features carry a dominant common component;
  * if the top buckets hold most rows regardless of nBits, pair volume
  * is ~n²/constant and no bit count fixes it — the fix is centering
  * (or any spread transform) before the RP prefilter.
  *
  * `sbt "Test/runMain graft.RpSkewPeek"`
  */
object RpSkewPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val base = "/root/testdata/sf0.1"
    val az = "abcdefghijklmnopqrstuvwxyz"
    val docs = (0 until 10).map { i =>
      val rot = az.drop(i % 26) + az.take(i % 26)
      Tables.documents(spark, base).select(
        (col("doc_id") + i * 10000000L).as("doc_id"),
        translate(regexp_replace(col("text"), "(\\S+)", s"$$1_$i"),
          az, rot).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)
    val feats = graft.ext.Multimodal.extractFeatures(
      graft.ext.Multimodal.syntheticMedia(spark, docs)).toDF()
      .select(col("mediaId") * 100 + col("frameIdx") as "fid",
        col("feature"))
      .localCheckpoint()
    val n = feats.count()
    // mean vector (64 dims) for centering
    val dim = 8 // Multimodal.DecodeKernel.FeatureDim
    val mean = feats.select(
      (0 until dim).map(i => avg(element_at(col("feature"), i + 1))
        .as(s"m$i")): _*).collect().head
    val meanArr = (0 until dim).map(mean.getDouble)
    val centered = feats.select(col("fid"),
      array((0 until dim).map(i =>
        element_at(col("feature"), i + 1) - lit(meanArr(i))
          .cast("float")): _*).cast("array<float>").as("feature"))
    for ((name, df) <- Seq("raw" -> feats, "centered" -> centered);
         bits <- Seq(8, 12)) {
      val hist = df.select(
          graft.ext.Similarity.rpBucket(col("feature"), bits).as("b"))
        .groupBy("b").count().orderBy(desc("count"))
        .limit(5).collect().map(_.getLong(1))
      val distinct = df.select(
          graft.ext.Similarity.rpBucket(col("feature"), bits).as("b"))
        .distinct().count()
      // pair volume = sum over buckets of c^2 (the join's real cost)
      val pairSum = df.select(
          graft.ext.Similarity.rpBucket(col("feature"), bits).as("b"))
        .groupBy("b").count()
        .agg(sum(col("count") * col("count"))).collect().head.getLong(0)
      println(s"$name nBits=$bits n=$n buckets=$distinct " +
        s"top5=${hist.mkString(",")} pairSum=$pairSum")
    }
    spark.stop()
  }
}
