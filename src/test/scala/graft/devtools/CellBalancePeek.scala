package graft

import org.apache.spark.sql.functions._

/** Dev one-off: cell balance AND join candidate volume of flat vs
  * two-level assignment on replicated embeddings — the two
  * denominators of knnJoin's cost.
  */
object CellBalancePeek {
  def main(args: Array[String]): Unit = {
    val spark = EntryKit.session()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args(0)
    val emb = Tables.embeddings(spark, dir)
    val n = emb.count()
    // the graded q84_knn_scaled rule (max(nProbe=3, n/100)) so the
    // decomposition describes the graded row's regime
    val nCells = math.max(3, (n / 100L).toInt)
    val cents = graft.ext.Similarity.seedCentroids(
      emb, "vec_id", "embedding", nCells)
    val kern = graft.functions.IvfFunctions.kernel(cents)
    for ((hier, tag) <- Seq((false, "flat"), (true, "hier"))) {
      val cells = emb.select(col("vec_id"), graft.functions.IvfFunctions
          .cellOf(col("embedding"), kern, hier).as("cell"))
      val sizes = cells.groupBy("cell").count()
        .agg(count(lit(1)).as("used"), max("count").as("max"),
          sum(col("count") * col("count")).as("sumsq")).head()
      val probes = emb.select(col("vec_id").as("q_id"), explode(
          graft.functions.IvfFunctions.probesOf(
            col("embedding"), kern, 3, hier)).as("cell"))
      val t0 = System.nanoTime()
      val cand = probes.join(cells.hint("shuffle_hash"), "cell").count()
      val tj = (System.nanoTime() - t0) / 1e9
      // kernel-only timing: force both columns, no join
      val t1 = System.nanoTime()
      cells.agg(sum("cell")).head()
      val tc = (System.nanoTime() - t1) / 1e9
      println(f"$tag: nCells=$nCells used=${sizes.getLong(0)} " +
        f"max=${sizes.getLong(1)} pairMass=${sizes.getLong(2)} " +
        f"candidates=$cand joinCount=$tj%.2fs cellPass=$tc%.2fs")
    }
    spark.stop()
  }
}
