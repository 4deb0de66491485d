package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Explicit bloom-filter join pruning — the manual form of Spark's
  * `InjectRuntimeFilter` rewrite, exposed as an operator so a pipeline
  * can prune a fact-table shuffle with a filter built from a SMALL
  * (already-reduced) dim side.
  *
  * Scale shape: `fact ⋈ dim` with a selective dim shuffles the entire
  * fact table only to discard most of it at the join. Building a
  * ~1.2 MB bloom over the dim keys (one aggregation producing ONE row)
  * and applying `might_contain` to the fact side BEFORE the exchange
  * drops non-joining fact rows at the scan, so the shuffle carries
  * ~selectivity × |fact| + ε instead of |fact|. At 100 TB the exchange
  * is the bottleneck — this is the difference between shuffling 100 TB
  * and shuffling the ~1% that survives. False positives only ever ADD
  * a stray row to the exchange; the exact join then removes it, so the
  * operator is semantically invisible (q74's oracle is the plain join).
  *
  * Built on Spark's own `BloomFilterAggregate` / `BloomFilterMightContain`
  * (both codegen'd; the same pair `spark.sql.optimizer.runtime.bloomFilter`
  * injects), keyed by `xxhash64` exactly as the injected form is. The
  * serialized filter rides into the probe side as a foldable binary
  * literal — shipped once per task binary, same cost class as a
  * broadcast variable.
  *
  * Reference analog: the reference prunes API-side with
  * `affiliation-query` before anything reaches its joins
  * (src/barrazueta_pipeline_etl_crossref.py:375-384); this is that
  * "filter before you move the data" discipline applied to the shuffle
  * boundary.
  */
object Bloom {

  /** Aggregate `xxhash64(key)` of `dim` into one serialized bloom filter
    * (binary). One pass, mergeable partials, a single row out.
    */
  def buildFilter(dim: DataFrame, key: Column,
      expectedItems: Long = 1000000L, fpp: Double = 0.03): Array[Byte] = {
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(Bridge.expression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val row = dim.select(Bridge.column(agg).as("bf")).head()
    if (row.isNullAt(0)) { // empty dim → empty (rejects-everything) filter
      val out = new java.io.ByteArrayOutputStream()
      BloomFilter.create(1).writeTo(out)
      out.toByteArray
    } else row.getAs[Array[Byte]](0)
  }

  /** `might_contain(filter, xxhash64(key))` as a codegen'd predicate.
    * No false negatives; false-positive rate per `buildFilter`'s fpp.
    */
  def mightContain(filterBytes: Array[Byte], key: Column): Column =
    Bridge.column(new BloomFilterMightContain(
      Literal(filterBytes, BinaryType),
      new XxHash64(Seq(Bridge.expression(key)))))

  /** Inner equi-join `fact ⋈ dim` with the fact side bloom-pruned
    * before the shuffle. Result-identical to the plain join.
    */
  def prunedJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String,
      expectedItems: Long = 1000000L, fpp: Double = 0.03): DataFrame = {
    val bf = buildFilter(dim, dim(dimKey), expectedItems, fpp)
    fact.filter(mightContain(bf, fact(factKey)))
      .join(dim, fact(factKey) === dim(dimKey))
  }
}
