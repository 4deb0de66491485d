package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Within-bucket pair-emission kernels for the dedup operators. The
  * higher-order-function formulation (`flatten(transform(filter(...)))`)
  * interprets a Catalyst expression tree per candidate PAIR — on a dense
  * near-dup corpus that is millions of interpreted evals. These kernels
  * do the same work as one flat JVM loop per bucket row
  * (`CodegenFallback`: one interpreted call per ROW, loop inside).
  * Long-id fast path only; `Dedup` falls back to the lambda shape for
  * non-long keys.
  */
object PairKernel {

  /** All unordered pairs (min, max) of a long-id array — the LSH
    * candidate emission. Output size is exactly the bucket's candidate
    * count, same as the lambda shape.
    */
  def allPairs(ids: ArrayData): ArrayData = {
    val n = ids.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val a = ids.getLong(i)
      var j = i + 1
      while (j < n) {
        val b = ids.getLong(j)
        out(k) =
          if (a <= b) new GenericInternalRow(Array[Any](a, b))
          else new GenericInternalRow(Array[Any](b, a))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Prefix-bucket pairs with PPJoin's POSITIONAL filter (Xiao et al.,
    * WWW'08 §3.2). `ms` is array<struct<id: long, pos: int, sz: int>>,
    * pos = the shared token's 1-based position in the doc's
    * df-ascending shingle order. A pair can only reach the
    * equivalent-overlap bound α = ceil(τ/(1+τ)·(sza+szb)) if
    * 1 + min(sza−pa, szb−pb) ≥ α — tokens left after the shared one,
    * plus the share itself. Sound because both sets are sorted by the
    * SAME total order: at a qualifying pair's FIRST common token no
    * earlier element can be shared, so the bound holds there and the
    * pair is emitted (possibly again via later tokens — the caller's
    * `distinct` already absorbs multi-emission). Frequent shingles sit
    * LATE in the df-ascending prefix (large pos), so exactly the
    * biggest buckets prune hardest — a ~3× candidate cut on the dense
    * bench corpus.
    */
  def ppjPairs(ms: ArrayData, tauNum: Int, tauDen: Int): ArrayData = {
    val n = ms.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val idArr = new Array[Long](n)
    val posArr = new Array[Int](n)
    val szArr = new Array[Int](n)
    var i = 0
    while (i < n) {
      val r = ms.getStruct(i, 3)
      idArr(i) = r.getLong(0)
      posArr(i) = r.getInt(1)
      szArr(i) = r.getInt(2)
      i += 1
    }
    val out = new java.util.ArrayList[Any]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val need = (tauNum.toLong * (szArr(i) + szArr(j)) +
          tauNum + tauDen - 1) / (tauNum + tauDen)
        if (1L + math.min(szArr(i) - posArr(i),
            szArr(j) - posArr(j)) >= need) {
          val a = idArr(i); val b = idArr(j)
          out.add(new GenericInternalRow(Array[Any](
            math.min(a, b), math.max(a, b))))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** SimHash bucket pairs with exact hamming verify and exactly-once
    * emission (emit only when `tbl` is the first block-pair table the
    * two signatures agree on — same rule as the lambda shape in
    * `Dedup.simhashNearDups`). `ms` is array<struct<id: long, sig: long>>.
    */
  def simhashPairs(ms: ArrayData, tbl: Int, maxHamming: Int,
      nBlocks: Int): ArrayData = {
    val n = ms.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val idArr = new Array[Long](n)
    val sigArr = new Array[Long](n)
    var i = 0
    while (i < n) {
      val r = ms.getStruct(i, 2)
      idArr(i) = r.getLong(0)
      sigArr(i) = r.getLong(1)
      i += 1
    }
    val bounds = Array.tabulate(nBlocks + 1)(k => k * 64 / nBlocks)
    def agrees(xor: Long, b: Int): Boolean =
      ((xor >>> bounds(b)) & ((1L << (bounds(b + 1) - bounds(b))) - 1)) == 0
    val out = new java.util.ArrayList[Any]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val xor = sigArr(i) ^ sigArr(j)
        val h = java.lang.Long.bitCount(xor)
        if (h <= maxHamming) {
          // first agreeing table in the (bi < bj) lexicographic order —
          // must match Dedup's pairKeys enumeration exactly
          var t = 0
          var first = -1
          var bi = 0
          while (bi < nBlocks && first < 0) {
            var bj = bi + 1
            while (bj < nBlocks && first < 0) {
              if (agrees(xor, bi) && agrees(xor, bj)) first = t
              t += 1
              bj += 1
            }
            bi += 1
          }
          if (first == tbl) {
            val a = idArr(i)
            val b = idArr(j)
            out.add(new GenericInternalRow(Array[Any](
              math.min(a, b), math.max(a, b), h)))
          }
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

object CosinePairKernel {
  /** Cosine-verified bucket pairs over float embeddings. `ms` is
    * array<struct<id: long, v: array<float>, nrm: double>>; emits
    * struct<id_a, id_b, cosine> for pairs at or above `threshold`.
    * The dot product is the same left-to-right double fold as the
    * VecDot kernel, so scores are bit-identical to the lambda shape.
    */
  def cosinePairs(ms: ArrayData, threshold: Double): ArrayData = {
    val n = ms.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val idArr = new Array[Long](n)
    val vArr = new Array[Array[Float]](n)
    val nrmArr = new Array[Double](n)
    var i = 0
    while (i < n) {
      val r = ms.getStruct(i, 3)
      idArr(i) = r.getLong(0)
      vArr(i) = r.getArray(1).toFloatArray()
      nrmArr(i) = r.getDouble(2)
      i += 1
    }
    val out = new java.util.ArrayList[Any]()
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        val a = vArr(i); val b = vArr(j)
        var s = 0.0
        var k = 0
        val len = math.min(a.length, b.length)
        while (k < len) { s += a(k).toDouble * b(k).toDouble; k += 1 }
        val cos = s / (nrmArr(i) * nrmArr(j))
        if (cos >= threshold) {
          val x = idArr(i); val y = idArr(j)
          out.add(new GenericInternalRow(Array[Any](
            math.min(x, y), math.max(x, y), cos)))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** (array<struct<id,v,nrm>>) → array<struct<id_a, id_b, cosine>>:
  * cosine-verified within-bucket pairs (embedding near-dup stage).
  */
case class CosineBucketPairs(child: Expression, threshold: Double)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("cosine", DoubleType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(in: Any): Any =
    CosinePairKernel.cosinePairs(in.asInstanceOf[ArrayData], threshold)
  override protected def withNewChildInternal(newChild: Expression)
      : CosineBucketPairs = copy(child = newChild)
}

/** (array<struct<id,pos,sz>>) → array<struct<id_a, id_b>>: prefix-bucket
  * pairs surviving PPJoin's positional filter.
  */
case class PpjBucketPairs(child: Expression, tauNum: Int, tauDen: Int)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(in: Any): Any =
    PairKernel.ppjPairs(in.asInstanceOf[ArrayData], tauNum, tauDen)
  override protected def withNewChildInternal(newChild: Expression)
      : PpjBucketPairs = copy(child = newChild)
}

/** array<long> → array<struct<id_a, id_b>>: all unordered within-bucket
  * pairs. Interpreted once per bucket row; the pair loop is plain JVM.
  */
case class LongBucketPairs(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(in: Any): Any =
    PairKernel.allPairs(in.asInstanceOf[ArrayData])
  override protected def withNewChildInternal(newChild: Expression)
      : LongBucketPairs = copy(child = newChild)
}

/** (array<struct<id,sig>>, tbl) → array<struct<id_a, id_b, hamming>>:
  * hamming-verified, exactly-once simhash bucket pairs.
  */
case class SimhashBucketPairs(left: Expression, right: Expression,
    maxHamming: Int, nBlocks: Int)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id_a", LongType, nullable = false),
    StructField("id_b", LongType, nullable = false),
    StructField("hamming", IntegerType, nullable = false))),
    containsNull = false)
  override def nullSafeEval(ms: Any, tbl: Any): Any =
    PairKernel.simhashPairs(ms.asInstanceOf[ArrayData],
      tbl.asInstanceOf[Int], maxHamming, nBlocks)
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SimhashBucketPairs =
    copy(left = newLeft, right = newRight)
}

/** (array<string>, array<string>) → int: |A ∩ B| via one hash set — the
  * set-similarity verify kernel. `size(array_intersect(a, b))` walks an
  * interpreted expression tree AND materializes the intersection array
  * per pair; at ~100k candidate pairs x ~50-element shingle sets that
  * was the dominant cost of the whole join (~35µs/pair). One JVM loop
  * per pair, no allocation beyond the probe set. Inputs are treated as
  * sets (callers pass array_distinct'ed shingle arrays).
  */
case class StringIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val (small, big) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = small.numElements()
    val set = new java.util.HashSet[Any](Math.max(4, n * 2))
    var i = 0
    while (i < n) { set.add(small.getUTF8String(i)); i += 1 }
    var cnt = 0
    val m = big.numElements()
    var j = 0
    while (j < m) {
      if (set.contains(big.getUTF8String(j))) cnt += 1
      j += 1
    }
    cnt
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): StringIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** long → long: the base-2 logarithm in µ-bits (units of 2^-10 bit),
  * computed EXACTLY in integer arithmetic — msb for the integer part,
  * ten mantissa-squaring steps (scale 2^30, truncating shift per step)
  * for the ten fraction bits. The recurrence is pure 64-bit ops, so any
  * engine replays it bit-for-bit (the oracle does, via `bin()` +
  * `list_reduce`); the result is floor(1024·log2(x)) up to 1 µ-bit of
  * defined truncation. This is what lets information-theoretic scores
  * (cross-entropy difference, likelihood ratios) be hash-gradeable:
  * libm `log` differs in last-ulp across engines, this never does.
  * Input must be >= 1 (callers pass counts + 1); null propagates.
  */
case class Log2Mu(child: Expression)
    extends UnaryExpression with CodegenFallback {
  // AbstractDataType (ExpectsInputTypes' vocabulary) is private[sql]
  // in Spark 4 — declare the contract via checkInputDataTypes so a
  // non-long child fails AT ANALYSIS with a readable message instead
  // of a mid-job ClassCastException
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          s"log2mu requires BIGINT input, got ${child.dataType.sql}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Log2Mu.compute(input.asInstanceOf[Long])
  override protected def withNewChildInternal(
      newChild: Expression): Log2Mu = copy(child = newChild)
}

object Log2Mu {
  final val FracBits = 10
  def compute(x: Long): Long = {
    require(x >= 1, s"log2mu: input must be >= 1, got $x")
    val m = 63 - java.lang.Long.numberOfLeadingZeros(x)
    var mant = if (m <= 30) x << (30 - m) else x >> (m - 30)
    var f = 0L
    var i = 0
    while (i < FracBits) {
      mant = (mant * mant) >> 30
      if (mant >= (1L << 31)) { mant >>= 1; f = f * 2 + 1 }
      else f = f * 2
      i += 1
    }
    (m.toLong << FracBits) | f
  }
}

object PairFunctions {
  def stringIntersectSize(a: Column, b: Column): Column =
    Bridge.column(StringIntersectSize(
      Bridge.expression(a), Bridge.expression(b)))
  def longBucketPairs(ids: Column): Column =
    Bridge.column(LongBucketPairs(Bridge.expression(ids)))
  def ppjBucketPairs(ms: Column, tauNum: Int, tauDen: Int): Column =
    Bridge.column(PpjBucketPairs(Bridge.expression(ms), tauNum, tauDen))
  def cosineBucketPairs(ms: Column, threshold: Double): Column =
    Bridge.column(CosineBucketPairs(Bridge.expression(ms), threshold))
  def simhashBucketPairs(ms: Column, tbl: Column, maxHamming: Int,
      nBlocks: Int): Column =
    Bridge.column(SimhashBucketPairs(Bridge.expression(ms),
      Bridge.expression(tbl), maxHamming, nBlocks))
  def log2Mu(x: Column): Column =
    Bridge.column(Log2Mu(Bridge.expression(x)))
}
