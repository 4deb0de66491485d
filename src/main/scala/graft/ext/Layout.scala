package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: multi-dimensional clustering for data
  * skipping.
  *
  * At 100 TB the dominant query cost is the scan, and the dominant scan
  * saving is skipping files that provably contain no matching rows
  * (parquet footer min/max). A plain sort makes min/max selective on the
  * LEADING sort column only; Z-ORDER (Morton-curve) clustering
  * interleaves the bits of several columns so every output file covers a
  * small hyper-rectangle — min/max stays selective on EACH interleaved
  * column, and point/range predicates on any of them skip most files
  * (the Delta/Iceberg `OPTIMIZE ZORDER BY` operation, re-expressed as a
  * plain repartitionByRange + write).
  */
object Layout {

  /** Morton z-value: bit-interleave the `bits` low bits of two
    * non-negative integer columns (`a` on even bit positions, `b` on
    * odd). Pure codegen'd bit arithmetic — engine-portable, no UDF.
    */
  def zValue(a: Column, b: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))
  }

  /** Z-order clustered write: range-partition on the z-value (one range
    * shuffle — sampled bounds, balanced files) and sort within
    * partitions, so each of the `nFiles` output files covers a compact
    * z-range = a small rectangle in (colA, colB) space. The write drops
    * the helper column; the layout IS the index.
    */
  def zorderWrite(df: DataFrame, colA: String, colB: String, bits: Int,
      nFiles: Int, path: String): Unit =
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
