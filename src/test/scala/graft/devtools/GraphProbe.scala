package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev: MEASURED scaling of the iterative graph operators (BFS, label
  * propagation, PageRank, k-core, earliest-arrival) — after the r7/r8
  * probes covered the dedup joins and at-rest indexes, these are the
  * last operator family whose 100 TB behavior rests on the plan
  * argument "a bounded number of rounds, each one hash join + agg over
  * the edge table". This probe replicates the q131/q136/q93/q119/q146
  * edge graph m× with shifted node ids (m disjoint copies — density
  * and diameter constant, the realistic scale-up) and records the time
  * curve; whole-graph ops should grow ~linearly in edges, and
  * fixed-source BFS/reach should grow at most linearly (each round
  * still scans the full edge table to join the frontier).
  *
  * `Test/runMain graft.GraphProbe [multipliers...]` (default 1 3 10).
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 3, 10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val work = java.nio.file.Files.createTempDirectory("graft_graph")

    // the graded bipartite customer-supplier edge set (q131 shape),
    // with per-replica node-id shifts -> m disjoint identical copies
    def replicateEdges(m: Int): String = {
      val out = s"$work/edges_x$m"
      val base = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d), col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"),
          datediff(col("l_shipdate"), lit("1970-01-01")).as("t"))
      (0 until m).map { i =>
        base.select((col("src") + i * 10000000L).as("src"),
          (col("dst") + i * 10000000L).as("dst"), col("t"))
      }.reduce(_ unionByName _)
        .repartition(32)
        .write.mode("overwrite").parquet(out)
      out
    }
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    println("| mult | op | edges | out_rows | sec |")
    println("|---|---|---|---|---|")
    mults.foreach { m =>
      val e = spark.read.parquet(replicateEdges(m))
      val nE = e.count()
      import spark.implicits._
      // fixed two-source BFS (replica 0 only — growing haystack,
      // constant query)
      val sources = Seq(3L, 5L).toDF("node")
      locally {
        val (out, s) = time(graft.ext.Graph.bfsHops(
          e, "src", "dst", sources, rounds = 4).count())
        println(f"| ${m}x | bfs(2src,4r) | $nE | $out | $s%.2f |")
      }
      locally {
        val (out, s) = time(graft.ext.Graph.labelPropagation(
          e, "src", "dst", rounds = 4, packedArgmax = true).count())
        println(f"| ${m}x | lpa(4r) | $nE | $out | $s%.2f |")
      }
      locally {
        val w = e.groupBy("src", "dst").agg(count(lit(1)).as("w"))
        val (out, s) = time(graft.ext.Graph.pageRank(
          w, "src", "dst", "w", iters = 8).count())
        println(f"| ${m}x | pagerank(8i) | $nE | $out | $s%.2f |")
      }
      locally {
        val (out, s) = time(graft.ext.Graph.kcore(
          e, "src", "dst", k = 25, rounds = 8).count())
        println(f"| ${m}x | kcore(25,8r) | $nE | $out | $s%.2f |")
      }
      locally {
        val (out, s) = time(graft.ext.Graph.earliestArrival(
          e, "src", "dst", "t", sources, rounds = 4).count())
        println(f"| ${m}x | reach(2src,4r) | $nE | $out | $s%.2f |")
      }
    }
    try ProbeUtil.deleteRecursively(work)
    catch { case _: Throwable => () }
    spark.stop()
  }
}
