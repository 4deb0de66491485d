package graft

/** Dev: A/B the RocksDB state-store provider against the default
  * HDFS-backed one on EVERY engine-graded streaming replay row — the
  * r12 diagnosis put ~25 s of the bench total on per-micro-batch
  * state-store checkpoint fsync at trivial state sizes, so the
  * hypothesis is that RocksDB + changelog checkpointing cuts the
  * floor. Keep-if: ≥2× on the replay rows with IDENTICAL collected
  * results (the verdict's acceptance rule); otherwise record and
  * reject.
  *
  * Provider is a per-query conf read at stream start, so flipping the
  * session conf between runs is a faithful A/B of what streamReplay
  * would pin. min-of-2 interleaved passes per (query, provider);
  * results compared row-for-row (every graded query total-orders its
  * output).
  *
  * `Test/runMain graft.StateStoreAB [sfDir]` (default sf0.1).
  */
object StateStoreAB {
  def main(args: Array[String]): Unit = {
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = EntryKit.session()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = Seq("q218_stream_interval_join", "q219_stream_dau",
      "q220_stream_transitions", "q224_stream_late_drop",
      "q225_stream_outer_join", "q226_stream_neardup",
      "q227_stream_neardup_refresh", "q228_stream_hll")
    val providers = Seq(
      "hdfs" -> "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
      "rocksdb" -> "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val key = "spark.sql.streaming.stateStore.providerClass"
    val clKey =
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

    def once(q: String): (Double, Seq[String]) = {
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(q)(spark, d).collect()
        .map(_.toString).toSeq
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // interleaved: pass1 all (q, provider), pass2 all (q, provider)
    val samples =
      scala.collection.mutable.Map.empty[(String, String),
        (Double, Seq[String])]
    (0 until 2).foreach { _ =>
      for (q <- qs; (pname, pcls) <- providers) {
        spark.conf.set(key, pcls)
        spark.conf.set(clKey, "true")
        val (t, rows) = once(q)
        val prev = samples.get((q, pname))
        samples((q, pname)) =
          if (prev.exists(_._1 <= t)) prev.get else (t, rows)
        if (prev.exists(_._2 != rows))
          println(s"!! NONDETERMINISTIC $q under $pname")
      }
    }
    println("| query | hdfs_s | rocksdb_s | speedup | identical |")
    println("|---|---|---|---|---|")
    qs.foreach { q =>
      val (th, rh) = samples((q, "hdfs"))
      val (tr, rr) = samples((q, "rocksdb"))
      println(f"| $q | $th%.2f | $tr%.2f | ${th / tr}%.2fx | ${rh == rr} |")
    }
    spark.stop()
  }
}
