package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

/** At-rest inverted index: the text-retrieval twin of
  * `Similarity.writeBucketed`/`lshTopKAtRest` (vectors) and
  * `Dedup.writeLshIndex` (fuzzy dedup). Build cost is one pass over the
  * corpus, paid once; term lookups then touch only the directories whose
  * bucket matches a probe term's hash — at 100 TB the difference between
  * reading `|probe buckets|/nBuckets` of the index and scanning all of
  * it. The bucket hash is the same portable md5 family the rest of the
  * engine grades through, and is computable driver-side (probe bucket
  * literals come from plain Scala, not a data pass).
  */
object Index {
  /** Driver-side replica of the write-side bucket column: first 8 md5
    * hex digits of the term as an unsigned int, mod nBuckets. MUST stay
    * in lockstep with `writePostings`' `conv(substring(md5(term),1,8),
    * 16, 10) % nBuckets` — asserted by IndexSpec.
    */
  def termBucket(term: String, nBuckets: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(term.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % nBuckets
  }

  /** Build the index: (term, doc_id, tf) rows, directory-partitioned by
    * the term-hash bucket. The groupBy's partial aggregation collapses
    * within-doc repeats map-side; the repartition keeps the write to one
    * file per directory per task wave (same small-files discipline as
    * the other at-rest layouts).
    */
  def writePostings(df: DataFrame, idCol: String, textCol: String,
      path: String, nBuckets: Int = 16): Unit =
    df.select(col(idCol).as("doc_id"),
        explode(TextStats.tokens(col(textCol))).as("term"))
      .groupBy("term", "doc_id").agg(count(lit(1)).as("tf"))
      .withColumn("bucket",
        pmod(conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long"),
          lit(nBuckets.toLong)))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Top-k postings (by tf, doc_id tiebreak) + document frequency for
    * each probe term, reading ONLY the probed bucket directories: the
    * bucket IN-list lands in the scan's `PartitionFilters` (asserted in
    * PLANS.md), the term IN-list in `PushedFilters`. Like
    * `lshTopKAtRest`, the literal type must match the partition column's
    * read-back type or pruning silently degrades to a full scan — so a
    * surprising type fails loudly instead.
    */
  def termLookupAtRest(spark: SparkSession, path: String,
      terms: Seq[String], k: Int, nBuckets: Int = 16): DataFrame = {
    require(terms.nonEmpty, "termLookupAtRest: terms must be non-empty")
    import org.apache.spark.sql.expressions.Window
    val buckets = terms.map(termBucket(_, nBuckets)).distinct
    val all = spark.read.parquet(path)
    val bucketLits: Seq[Any] = all.schema("bucket").dataType match {
      case LongType    => buckets
      case IntegerType => buckets.map(_.toInt)
      case StringType  => buckets.map(_.toString)
      case other => throw new IllegalStateException(
        s"termLookupAtRest: partition column 'bucket' read back as " +
          s"$other; expected long/int/string — pruning contract would " +
          "silently break")
    }
    val byTerm = Window.partitionBy("term")
    val ranked = Window.partitionBy("term")
      .orderBy(col("tf").desc, col("doc_id").asc)
    all.filter(col("bucket").isin(bucketLits: _*))
      .filter(col("term").isin(terms: _*))
      .withColumn("df", count(lit(1)).over(byTerm))
      .withColumn("rank", row_number().over(ranked).cast("long"))
      .filter(col("rank") <= k)
      .select("term", "df", "doc_id", "tf", "rank")
  }
}
