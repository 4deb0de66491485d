package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: scale behavior of [[graft.ext.Mining.assocRules]] vs BASKET
  * SIZE at a fixed (basket, item) row count — the operator's contract
  * says pair volume is Σ_b s_b(s_b−1): corpus-linear for bounded
  * baskets, quadratic only in the basket dimension the maxBasketSize
  * guard bounds. Synthetic baskets of uniform size s over a shared
  * item domain; at constant total rows n·s, directed pair volume is
  * n·s·(s−1) = rows·(s−1) — the probe asserts that count exactly and
  * prints the wall time tracking it.
  *
  * `Test/runMain graft.MineProbe [sizes...]` (default 4 16 64).
  */
object MineProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
      else Seq(4, 16, 64)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = 2000000L // fixed (basket, item) row count
    // basket b holds s distinct items from a 10·s-item domain
    // (basket residue picks the block, so supports are dense)
    def frame(s: Int) = spark.range(rows).select(
      expr(s"id div $s").as("b"),
      expr(s"id % $s + ((id div $s) % 10) * $s").as("i"))
    frame(4).count() // warm
    println("| basket_size | baskets | pairs | expect_pairs | sec |")
    sizes.foreach { s =>
      val t0 = System.nanoTime()
      val pairs = graft.ext.Mining.assocRules(frame(s), "b", "i",
          minSupport = 1, maxBasketSize = s)
        .agg(sum(col("sup_pair"))).collect().head.getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      val expect = rows * (s - 1)
      assert(pairs == expect, s"pairs $pairs != expected $expect")
      println(f"| $s | ${rows / s} | $pairs | $expect | $sec%.2f |")
    }
    spark.stop()
  }
}
