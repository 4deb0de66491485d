package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Engine-portable approximate sketches.
  *
  * HyperLogLog (`approx_count_distinct`) is the stock Spark answer for
  * cardinality, but its register layout is implementation-specific — no
  * other engine replays it, so a cross-engine pipeline can't audit the
  * number it produced. KMV (k minimum values; Bar-Yossef et al.,
  * RANDOM'02) estimates distinct counts from the k smallest hash
  * coordinates of the value set, and every engine with md5 computes the
  * IDENTICAL sketch — the estimate is reproducible bit-for-bit, not just
  * statistically right (the q66 oracle replays it in DuckDB).
  *
  * Scale shape: the sketch needs the k smallest DISTINCT hashes, and a
  * dedup-on-insert bounded buffer computes that incrementally — so the
  * whole estimate is ONE aggregation pass (k-element partial buffers
  * map-side, k-element merges reduce-side), with no `distinct` shuffle
  * of the raw values. At 100 TB that's the difference between shuffling
  * the corpus and shuffling `groups × k` doubles. Relative error is
  * ~1/sqrt(k-2) (~18% at k=32, ~13% at k=64).
  */
object Sketches {

  /** Bounded KMV buffer: the k smallest distinct hash coordinates, kept
    * sorted ascending. `reduce` is an O(k) skip for the common
    * non-qualifying row; duplicates (same value → same hash) never
    * occupy a second slot, which is exactly the dedup KMV requires.
    */
  class KmvAggregator(k: Int)
      extends Aggregator[Double, Seq[Double], Double] {
    require(k >= 2, "KMV needs k >= 2")

    override def zero: Seq[Double] = Seq.empty

    override def reduce(b: Seq[Double], h: Double): Seq[Double] =
      if (b.contains(h)) b
      else if (b.size < k) (b :+ h).sorted
      else if (h < b.last) (b.init :+ h).sorted
      else b

    override def merge(b1: Seq[Double], b2: Seq[Double]): Seq[Double] =
      (b1 ++ b2).distinct.sorted.take(k)

    /** < k distinct hashes seen → the count is exact; otherwise the
      * classic unbiased estimator (k-1) / h_k.
      */
    override def finish(b: Seq[Double]): Double =
      if (b.size < k) b.size.toDouble else (k - 1).toDouble / b.last

    override def bufferEncoder: Encoder[Seq[Double]] =
      ExpressionEncoder[Seq[Double]]()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Per-group distinct-count estimate: KMV over the md5 coordinate of
    * `value` (see `Sampling.hashCoord` — first 8 md5 hex digits / 2^32).
    * One shuffle on `groupCol`, k-buffer partial aggregation map-side.
    * Null values are ignored, like `approx_count_distinct` (a null
    * would otherwise kill the typed aggregator's non-nullable input);
    * groups whose values are ALL null are absent from the output.
    */
  def kmvDistinct(df: DataFrame, groupCol: String, value: Column,
      k: Int): DataFrame =
    df.filter(value.isNotNull)
      .groupBy(col(groupCol))
      .agg(udaf(new KmvAggregator(k), Encoders.scalaDouble)
        .apply(Sampling.hashCoord(value)).as("est_distinct"))
}
