package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev: MEASURED scaling of the winnowing fingerprint family
  * (q193/q194) on replicated corpora — the claim to verify is that the
  * winnowed index stays a ~2/(w+1) fraction of the gram volume at
  * every corpus size (the shuffle-reduction the operator exists for),
  * that within-replica match structure is reproduced exactly m-fold
  * (pair count grows linearly, never quadratically), and that wall
  * time tracks corpus size, not pair-space size.
  *
  * Same corpus construction as [[ScaleProbe]]: every token of replica
  * i gets an "_<i>" suffix, so replicas reproduce the original's
  * within-replica shared substrings exactly while sharing (almost) no
  * 20-char grams across replicas — the m× invariant rides in the
  * measurement as a correctness check.
  *
  * `Test/runMain graft.WinnowProbe [width=N]... [multipliers...]`
  * (default widths 32, mults 1 3 10). `width=N` args add shuffle-
  * partition widths to A/B — the r13 verdict's open question is
  * whether the 60× index-stage excess (57 s vs ~33 linear) is the
  * 32-partition spill region (a deployment width knob) or a real
  * algorithmic term; each (width, mult) cell re-times the stages
  * under `spark.sql.shuffle.partitions = width`.
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val (widthArgs, multArgs) = args.partition(_.startsWith("width="))
    val widths =
      if (widthArgs.nonEmpty) widthArgs.map(_.drop(6).toInt).toSeq
      else Seq(32)
    val mults =
      if (multArgs.nonEmpty) multArgs.map(_.toInt).toSeq else Seq(1, 3, 10)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val work = java.nio.file.Files.createTempDirectory("graft_winnow")
    val (g, w) = (20, 8)

    def replicateDocs(m: Int): String = {
      val out = s"$work/docs_x$m"
      val base = Tables.documents(spark, d).select("doc_id", "text")
      (0 until m).map { i =>
        base.select(
          (col("doc_id") + i * 10000000L).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"$$1_$i").as("text"))
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

    println("| width | mult | docs | grams | fingerprints | reduction | " +
      "pairs | sec_index | sec_match |")
    println("|---|---|---|---|---|---|---|---|---|")
    val docPaths = scala.collection.mutable.Map.empty[Int, String]
    for (m <- mults; wd <- widths) {
      spark.conf.set("spark.sql.shuffle.partitions", wd.toString)
      val docs = spark.read.parquet(
        docPaths.getOrElseUpdate(m, replicateDocs(m)))
      val nDocs = docs.count()
      // gram volume = what dupSpans would shuffle
      val grams = docs
        .select(greatest(length(col("text")) - (g - 1), lit(0))
          .cast("long").as("ng"))
        .agg(sum("ng")).collect()(0).getLong(0)
      // r15: width is now an operator parameter (volume-derived by
      // default) — each A/B cell pins it EXPLICITLY so the cell
      // measures width=wd, not whatever the default would derive.
      // The default itself must reproduce the measured 256-width
      // in-memory regime at the r14 A/B's 60× volume:
      require(graft.ext.Dedup.winnowWidthFor(129500000L, 32) >= 256,
        "winnowWidthFor default fell out of the measured 60x regime")
      val (nFp, sIdx) = time(graft.ext.Dedup
        .winnowFingerprints(docs, "doc_id", "text", g, w, width = wd)
        .count())
      val (nPairs, sMatch) = time(graft.ext.Dedup
        .winnowMatches(docs, "doc_id", "text", g, w, minShared = 2L,
          width = wd)
        .count())
      // cross-replica pairs = corpus-construction contamination (the
      // "_i" suffixes are not prefix-free: "_1" is a prefix of "_1x",
      // so long char-grain grams can coincide across those replicas) —
      // attribute them so the operator's own within-replica linearity
      // is readable
      val cross = graft.ext.Dedup
        .winnowMatches(docs, "doc_id", "text", g, w, minShared = 2L,
          width = wd)
        .filter(expr("id_a div 10000000L") =!= expr("id_b div 10000000L"))
        .count()
      println(f"| $wd | ${m}x | $nDocs | $grams | $nFp | " +
        f"${grams.toDouble / nFp}%.1fx | $nPairs | $cross cross | " +
        f"$sIdx%.2f | $sMatch%.2f |")
    }
    spark.stop()
  }
}
