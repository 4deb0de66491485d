package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ML feature preparation over warehouse tables — the encode step a
  * training pipeline runs after curation (reference analog: the flat
  * analysis view's derived columns, which hand-build one feature each;
  * these are the generic encoders).
  *
  * Everything is integer/portable-hash exact: target encodings are
  * integer divisions of integer sums, hash features come from the md5
  * coordinate family every other portable operator here uses — so the
  * features a re-run, a retry, another partitioning, or another engine
  * computes are bit-identical (training-data reproducibility).
  */
object Features {
  /** Leave-one-out target encoding (the standard high-cardinality
    * categorical encoder; LOO removes the row's own target so the
    * feature doesn't leak its label): for each row,
    * (Σ_category target − own target) div (n_category − 1), NULL for
    * singleton categories (no peers — emitting the global mean would
    * leak; the caller imputes).
    *
    * One aggregation on the category key (map-side combine) and one
    * join back — category stats are |categories| rows, so Catalyst
    * broadcasts them; the fact side is never shuffled.
    */
  def targetEncodeLoo(df: DataFrame, idCol: String, catCol: String,
      target: Column): DataFrame = {
    val t = df.select(col(idCol), col(catCol), target.cast("long").as("__t"))
    val stats = t.groupBy(col(catCol))
      .agg(sum(col("__t")).as("__s"), count(lit(1)).as("__n"))
    t.join(stats, catCol)
      .withColumn("loo",
        when(col("__n") > 1L, expr("(__s - __t) div (__n - 1L)")))
      .select(col(idCol), col(catCol), col("loo"))
  }

  /** Feature hashing (the hashing trick, Weinberger et al. '09): each
    * non-null "column=value" pair maps to a bucket in [0, dim) via the
    * first 8 md5 hex digits — no vocabulary table to build, ship, or
    * keep consistent across training runs, which is the point at
    * corpus scale. Output: (id, sorted distinct active bucket list).
    * Pure per-row projection — no shuffle, no state.
    */
  def featureHash(df: DataFrame, idCol: String, cols: Seq[String],
      dim: Int): DataFrame = {
    require(cols.nonEmpty, "featureHash: need at least one column")
    require(dim >= 2, "featureHash: dim must be >= 2")
    val buckets = cols.map { c =>
      when(col(c).isNotNull,
        pmod(conv(substring(md5(concat(lit(c), lit("="),
          col(c).cast("string"))), 1, 8), 16, 10).cast("long"),
          lit(dim.toLong)))
    }
    df.select(col(idCol),
      array_sort(array_distinct(array_compact(array(buckets: _*))))
        .as("features"))
  }
}
