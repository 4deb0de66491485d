package graft

import org.apache.spark.sql.functions._

/** Dev: STAGE-DECOMPOSED cost of q136 (labelPropagation on the
  * bipartite trade graph) at 1×/10× — the r13 verdict flagged a 3.2×
  * driver/builder min-of-3 spread (12.19 vs 3.81 s) with no code
  * change on its path; like Q36Probe for the r12 q36 swing, this
  * records an attribution of q136's seconds to its stages so a real
  * regression can never hide inside host noise:
  *
  *   E  edge build  — lineitem⋈orders projection → undirected
  *                    distinct → symmetrize (the one wide input pass)
  *   R1..R4         — per-sweep cost: edge⋈labels join, (node, label)
  *                    count with map-side combine, packed-argmax
  *                    hash aggregate (the q136 path, packedArgmax —
  *                    no window, no sort)
  *
  * plus the volume counters that make attribution meaningful
  * (symmetric edges, nodes, per-round (node, label) counted rows —
  * the shuffle volume of each sweep). The probe re-implements the
  * sweep body with the exact expressions of
  * [[graft.ext.Graph.labelPropagation]] (packed variant) so each
  * round can be forced separately; labelPropagation itself compiles
  * all four sweeps into one plan with no per-round action — timed
  * here as `full_s` for the cross-check (full ≈ E + ΣR minus the
  * per-round action overhead).
  *
  * min-of-2 interleaved passes per stage (the bench discipline);
  * 10× replicates edges with per-replica node-id offsets — disjoint
  * communities, so per-node degree and label-mixing stay constant
  * while volume grows (the same constant-density discipline as
  * Q36Probe's suffixed docs).
  *
  * `Test/runMain graft.Q136Probe [mults...]` (default 1 10).
  */
object Q136Probe {
  def main(args: Array[String]): Unit = {
    val mults = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(1, 10)
    val spark = EntryKit.session()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"

    def time(f: () => Unit): Double = {
      val ts = (0 until 2).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }

    println("| mult | edges_sym | nodes | e_s | r1_rows | r1_s | " +
      "r2_rows | r2_s | r3_rows | r3_s | r4_rows | r4_s | full_s |")
    println("|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    mults.foreach { m =>
      // q136's exact edge projection, replicated with disjoint id spaces
      val base = Tables.lineitem(spark, d)
        .join(Tables.orders(spark, d),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst"))
      val off = 100000000L
      val e = (0 until m).map(i =>
        base.select((col("src") + i * off).as("src"),
          (col("dst") + i * off).as("dst")))
        .reduce(_ unionByName _)
      // materialize the edge input so stage E times the BUILD, not the
      // replication union
      val ePath = java.nio.file.Files
        .createTempDirectory("graft_q136probe").toString + s"/e_x$m"
      e.repartition(32).write.mode("overwrite").parquet(ePath)
      val edges = spark.read.parquet(ePath)

      // ---- stage E: undirected distinct + symmetrize ----
      def symDf = {
        val und = edges.filter(col("src") =!= col("dst"))
          .select(least(col("src"), col("dst")).as("u"),
            greatest(col("src"), col("dst")).as("v"))
          .distinct()
        und.union(und.select(col("v"), col("u")))
      }
      var nSym = 0L
      val tE = time(() => { nSym = symDf.count() })
      val sym = symDf.localCheckpoint()
      val nNodes = sym.select(col("u").as("node")).distinct().count()

      // ---- per-sweep decomposition (the packedArgmax body) ----
      val half = 1L << 31
      val packed = s"CASE WHEN label < 0L OR label >= ${half}L THEN " +
        "raise_error('out of range') " +
        s"ELSE __c * ${half}L + (${half - 1}L - label) END"
      var labels = sym.select(col("u").as("node")).distinct()
        .withColumn("label", col("node")).localCheckpoint()
      val roundCells = (1 to 4).map { _ =>
        val counted = sym
          .join(labels.withColumnRenamed("node", "u"), "u")
          .groupBy(col("v").as("node"), col("label"))
          .agg(count(lit(1)).as("__c"))
        var nCounted = 0L
        val tR = time(() => { nCounted = counted.count() })
        val next = counted
          .groupBy(col("node"))
          .agg(max(expr(packed)).as("__p"))
          .select(col("node"),
            expr(s"${half - 1}L - (__p % ${half}L)").as("label"))
        labels = next.localCheckpoint()
        f"$nCounted | $tR%.2f"
      }

      // ---- the full operator as the bench runs it ----
      val tFull = time(() => {
        graft.ext.Graph.labelPropagation(edges, "src", "dst",
          rounds = 4, packedArgmax = true).count(); ()
      })
      println(s"| $m | $nSym | $nNodes | " + f"$tE%.2f | " +
        roundCells.mkString(" | ") + f" | $tFull%.2f |")
    }
    spark.stop()
  }
}
