package graft

/** Dev: JVM-only isolation of IvfKernel.cellHier vs cell — no Spark.
  * `Test/runMain graft.HierMicro [rows] [nlist]`
  */
object HierMicro {
  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toInt else 20000
    val nlist = if (args.length > 1) args(1).toInt else 10000
    val dim = 64
    def lcg(seed: Long): Iterator[Float] =
      Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L)
        .drop(1).map(s => ((s >>> 33).toInt / (1 << 30).toFloat) - 1f)
    val centers = Array.tabulate(nlist)(c =>
      lcg(c * 1013904223L + 7).take(dim).toArray)
    val k = new graft.functions.IvfKernel(centers)
    val vs = (0 until rows).map { i =>
      val c = centers(i % nlist)
      val noise = lcg(i * 2862933555777941757L + 13).take(dim).toArray
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.tabulate(dim)(j => (c(j) + 0.02f * noise(j)): Any))
    }
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val chk = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.3f s (chk $chk)")
    }
    // warm both paths once — and time the hier lazies' build explicitly
    k.cell(vs.head)
    time("members build (+1 row)") { k.cellHier(vs.head).toLong }
    time("flat x" + rows) { vs.iterator.map(v => k.cell(v).toLong).sum }
    time("hier x" + rows) { vs.iterator.map(v => k.cellHier(v).toLong).sum }
    time("flat2 x" + rows) { vs.iterator.map(v => k.cell(v).toLong).sum }
    time("hier2 x" + rows) { vs.iterator.map(v => k.cellHier(v).toLong).sum }
  }
}
