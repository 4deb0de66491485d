package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev: MEASURED storage of the at-rest ANN layouts (r14 verdict
  * item 7 — make the "PQ codes are ~32× smaller than raw vectors"
  * claim an artifact number): write the same embedding table as
  * (a) the raw-vector IVF layout (`writeIvf`: id + d floats per row,
  * cell dirs) and (b) the IVF-PQ layout (`writeIvfPq`: id + m small
  * ints per row, same dirs), and report on-disk parquet bytes, bytes
  * per row, and the ratio. Parquet's own encodings (dictionary/RLE on
  * the tiny code ints) ride on top of the m-vs-d payload cut, so the
  * measured ratio is the DEPLOYED one, not the arithmetic one.
  *
  * `Test/runMain graft.PqStorageProbe [sfDir]` (default sf0.1).
  */
object PqStorageProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val cents = graft.ext.Similarity.seedCentroids(emb, "vec_id",
      "embedding", 16)
    val cbs = graft.ext.Similarity.pqCodebooks(emb, "vec_id",
      "embedding", m = 8, k = 16)
    val work = java.nio.file.Files.createTempDirectory("graft_pqstore")
    graft.ext.Similarity.writeIvf(emb, "vec_id", "embedding",
      s"$work/raw", cents)
    graft.ext.Similarity.writeIvfPq(emb, "vec_id", "embedding",
      s"$work/pq", cents, cbs)
    def bytes(p: String): Long = {
      val root = java.nio.file.Paths.get(p)
      val s = java.nio.file.Files.walk(root)
      try s.filter(f => java.nio.file.Files.isRegularFile(f) &&
          f.getFileName.toString.endsWith(".parquet"))
        .mapToLong(java.nio.file.Files.size).sum()
      finally s.close()
    }
    val (bRaw, bPq) = (bytes(s"$work/raw"), bytes(s"$work/pq"))
    println(s"| layout | rows | parquet_bytes | bytes/row | vs raw |")
    println(s"|---|---|---|---|---|")
    println(f"| writeIvf (id + 64-dim float vector) | $n | $bRaw | " +
      f"${bRaw.toDouble / n}%.1f | 1.0x |")
    println(f"| writeIvfPq (id + 8x16 PQ codes) | $n | $bPq | " +
      f"${bPq.toDouble / n}%.1f | ${bRaw.toDouble / bPq}%.1fx smaller |")
    spark.stop()
  }
}
