package graft

import org.apache.spark.sql.functions._

/** Dev: exercise the two-level (`hier`) IVF assignment IN ITS DESIGN
  * REGIME — clustered embeddings with a large centroid list — and
  * measure the flat/hier crossing point (r12 verdict item: on the
  * near-orthogonal testdata at nlist ≤ 400 the JIT-friendly flat scan
  * always won; the hier path's claimed regime, nlist ≳ 3·10⁴, was
  * never reachable there).
  *
  * Fixture: `nlist` seeded Gaussian-ish cluster centers in 64-dim
  * (deterministic LCG), `rows` vectors each = its center + small
  * noise — the clustered geometry real IVF quantizers run on (faiss
  * quantizer=HNSW/IMI regime). Measured per nlist:
  *   - flat  s: `IvfFunctions.cellOf(v, k)` over all rows (O(nlist·dim)/row)
  *   - hier  s: `cellOf(v, k, hier=true)`   (O(√nlist·dim)/row)
  *   - agree : fraction of rows where hier picks the flat cell —
  *             the approximation contract's measured recall here
  * min-of-2 passes, sum-forced (count() would prune the column).
  *
  * `Test/runMain graft.IvfRegimeProbe [rows] [nlists...]`
  * (default 20000 rows at nlist 1000 10000 30000).
  */
object IvfRegimeProbe {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toInt else 20000
    val nlists =
      if (args.length > 1) args.drop(1).map(_.toInt).toSeq
      else Seq(1000, 10000, 30000)
    val spark = EntryKit.session()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dim = 64

    // deterministic 32-bit LCG → [-1, 1) floats
    def lcg(seed: Long): Iterator[Float] =
      Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
        .drop(1).map(s => ((s >>> 33).toInt / (1 << 30).toFloat) - 1f)

    println("| nlist | rows | flat_s | hier_s | speedup | agree_pct |")
    println("|---|---|---|---|---|---|")
    nlists.foreach { nlist =>
      val centers: Array[Array[Float]] = Array.tabulate(nlist) { c =>
        lcg(c * 1013904223L + 7).take(dim).toArray
      }
      // rows: center + 2% noise, cluster round-robin
      val vecs = (0 until rows).map { i =>
        val c = centers(i % nlist)
        val noise = lcg(i * 2862933555777941757L + 13).take(dim).toArray
        (i.toLong, Array.tabulate(dim)(j => c(j) + 0.02f * noise(j)))
      }
      val df = vecs.toDF("id", "v").repartition(32).cache()
      df.count()
      val kern = graft.functions.IvfFunctions.kernel(centers.toSeq)
      def run(hier: Boolean): (Double, Long) = {
        val cell = graft.functions.IvfFunctions.cellOf(col("v"), kern, hier)
        var chk = 0L
        val ts = (0 until 2).map { _ =>
          val t0 = System.nanoTime()
          chk = df.agg(sum(cell.cast("long"))).collect()(0).getLong(0)
          (System.nanoTime() - t0) / 1e9
        }
        (ts.min, chk)
      }
      val (fs, _) = run(hier = false)
      val (hs, _) = run(hier = true)
      val cf = graft.functions.IvfFunctions.cellOf(col("v"), kern, hier = false)
      val ch = graft.functions.IvfFunctions.cellOf(col("v"), kern, hier = true)
      val agree = df.agg(
        sum(when(cf === ch, 1L).otherwise(0L)).cast("double") / count(lit(1)))
        .collect()(0).getDouble(0)
      println(f"| $nlist | $rows | $fs%.2f | $hs%.2f | " +
        f"${fs / hs}%.2fx | ${agree * 100}%.2f |")
      df.unpersist()
    }
    spark.stop()
  }
}
