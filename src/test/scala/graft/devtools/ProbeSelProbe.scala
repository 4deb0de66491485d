package graft

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}

import graft.functions.IvfKernel

/** Dev: micro-decomposition of the per-row probe-selection cost
  * (r14 verdict item 2) — the NEW single-pass bounded selection vs
  * the OLD repeated-scan form (dists array + Boolean mask), at the
  * nCells range the at-rest layouts contemplate. The claim to verify:
  * the new form's per-row cost is the distance pass alone (flat
  * ns/cell as nCells grows 4,096 → 65,536), while the old form adds
  * the O(nProbe·nCells) re-scan + two size-nCells allocations per row
  * and its ns/cell grows with the allocation/GC term.
  *
  * `Test/runMain graft.ProbeSelProbe [nProbe] [rows]`
  * (defaults nProbe=10, rows=2000). No Spark session — this is the
  * kernel itself, exactly what generated code calls per row.
  */
object ProbeSelProbe {
  /** The r14 probes() verbatim — kept here as the A/B baseline. */
  private def oldProbes(kern: IvfKernel, v: ArrayData,
      nProbe: Int): Array[Int] = {
    val d = kern.dists(v)
    val n = math.min(nProbe, d.length)
    val out = new Array[Int](n)
    val taken = new Array[Boolean](d.length)
    var r = 0
    while (r < n) {
      var bi = -1
      var k = 0
      while (k < d.length) {
        if (!taken(k) &&
            (bi < 0 || java.lang.Double.compare(d(k), d(bi)) < 0)) bi = k
        k += 1
      }
      taken(bi) = true
      out(r) = bi
      r += 1
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val nProbe = args.headOption.map(_.toInt).getOrElse(10)
    val rows = args.drop(1).headOption.map(_.toInt).getOrElse(2000)
    val dim = 64
    val rnd = new scala.util.Random(15)
    println("| nCells | impl | ns/row | ns/(row*cell) | checksum |")
    println("|---|---|---|---|---|")
    for (nCells <- Seq(4096, 16384, 65536)) {
      val kern = new IvfKernel(
        Array.fill(nCells)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
      val vs: Array[ArrayData] = Array.fill(rows)(
        new GenericArrayData(Array.fill(dim)(rnd.nextFloat() * 2f - 1f)))
      // warmup both paths (JIT), then time; checksum guards identity
      // and dead-code elimination in one number
      def run(f: ArrayData => Array[Int]): (Double, Long) = {
        var i = 0; while (i < math.min(rows, 200)) { f(vs(i)); i += 1 }
        var sum = 0L
        val t0 = System.nanoTime()
        i = 0
        while (i < rows) {
          val out = f(vs(i))
          var j = 0
          while (j < out.length) { sum += out(j); j += 1 }
          i += 1
        }
        ((System.nanoTime() - t0).toDouble / rows, sum)
      }
      val (tOld, sOld) = run(v => oldProbes(kern, v, nProbe))
      val (tNew, sNew) = run { v =>
        val ad = kern.probes(v, nProbe)
        Array.tabulate(ad.numElements())(ad.getInt)
      }
      require(sOld == sNew, s"probe sets diverged at nCells=$nCells")
      println(f"| $nCells | old | $tOld%.0f | ${tOld / nCells}%.3f | $sOld |")
      println(f"| $nCells | new | $tNew%.0f | ${tNew / nCells}%.3f | $sNew |")
    }
  }
}
