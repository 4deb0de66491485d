package graft

import org.apache.spark.sql.functions._

/** Round-10 regression pins: reliable-checkpoint mode for the
  * iterative operators (Pin), and the kmvJaccard all-pairs guard.
  */
class Round10Spec extends SparkSpec {
  import spark.implicits._

  /** Run `body` with a reliable checkpoint dir set on the shared
    * session, restoring the unset state after — Pin switches every
    * iterative operator to `Dataset.checkpoint()` for the duration.
    * Returns (result, number of checkpoint files written) so callers
    * can assert the reliable path actually engaged.
    */
  private def withReliableCheckpoints[A](body: => A): (A, Long) = {
    val dir = java.nio.file.Files
      .createTempDirectory("ckpt10").toString
    spark.sparkContext.setCheckpointDir(dir)
    try {
      val a = body
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
        .filter(p => java.nio.file.Files.isRegularFile(p))
        .count()
      (a, files)
    } finally {
      // Option(null) -> None: restores the "no checkpoint dir" state
      spark.sparkContext.setCheckpointDir(null)
    }
  }

  // ---- Pin: reliable-checkpoint mode, results identical ----

  test("pageRank under a session checkpoint dir writes reliable " +
      "checkpoint files and ranks byte-identically to local mode") {
    val rnd = new scala.util.Random(101)
    val edges = (0 until 400)
      .map(_ => (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong, 1L))
      .filter(e => e._1 != e._2)
      .toDF("src", "dst", "w")
    val local = graft.ext.Graph.pageRank(edges, "src", "dst", "w", 6)
      .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(spark.sparkContext.getCheckpointDir.isEmpty,
      "suite precondition: no checkpoint dir on the shared session")
    val (reliable, nFiles) = withReliableCheckpoints {
      graft.ext.Graph.pageRank(edges, "src", "dst", "w", 6)
        .orderBy("node").collect().map(r => (r.getLong(0), r.getLong(1)))
    }
    assert(nFiles > 0, "reliable mode wrote no checkpoint files — " +
      "Pin did not switch to Dataset.checkpoint()")
    assert(reliable.toSeq === local.toSeq)
  }

  test("dedupClusters (distributed path) under a checkpoint dir " +
      "clusters identically to local-checkpoint mode") {
    val rnd = new scala.util.Random(202)
    // chains + a hub: exercises pointer jumping over several rounds
    val pairs = ((0 until 200).map(i => (i.toLong, (i + 1).toLong)) ++
      (0 until 50).map(_ =>
        (500L + rnd.nextInt(40), 500L + rnd.nextInt(40))))
      .filter(p => p._1 != p._2)
      .toDF("id_a", "id_b")
    def run() = graft.ext.Dedup
      .dedupClusters(pairs, localEdgeThreshold = 0)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val local = run()
    val (reliable, nFiles) = withReliableCheckpoints(run())
    assert(nFiles > 0)
    assert(reliable.toSeq === local.toSeq)
  }

  // ---- kmvJaccard: measured all-pairs guard ----

  test("kmvJaccard refuses a group column above maxGroups with a " +
      "loud quadratic-contract error") {
    val df = (0 until 300)
      .map(i => (s"g$i", s"v${i % 40}")).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      graft.ext.Sketches.kmvJaccard(df, "g", col("v"), k = 8,
        maxGroups = 100L).collect()
    }
    assert(e.getMessage.contains("maxGroups"))
    assert(e.getMessage.contains("all-pairs"))
  }

  test("kmvJaccard under the bound (or with the bound raised " +
      "explicitly) still estimates") {
    val df = (0 until 300)
      .map(i => (s"g${i % 3}", s"v${i % 50}")).toDF("g", "v")
    val out = graft.ext.Sketches.kmvJaccard(df, "g", col("v"), k = 32)
    assert(out.count() === 3L) // 3 groups -> 3 unordered pairs
    // identical value sets -> jaccard 1000000 ppm exactly
    val same = (0 until 100).flatMap(i =>
      Seq(("a", s"v$i"), ("b", s"v$i"))).toDF("g", "v")
    val j = graft.ext.Sketches.kmvJaccard(same, "g", col("v"), k = 16,
      maxGroups = 2L).select("jaccard_ppm").collect().head.getLong(0)
    assert(j === 1000000L)
  }
}
