package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic record linkage (Fellegi–Sunter, JASA '69) over
  * structured records — the scoring layer that sits on top of a
  * blocking stage. [[Dedup.sortedNeighborhood]] and the LSH families
  * answer "which TEXT rows look alike"; this answers "are these two
  * STRUCTURED records the same entity", the classic ER decision model
  * (survey §2.4 J8/J9 resolve by exact keys; this is the fuzzy
  * generalization — reference analog: the affiliation label join,
  * PIPE:300-318, which hand-tunes one substring rule).
  *
  * Determinism: the classic formulation sums log2(m/u) likelihood
  * ratios in floating point. Here every field weight is a caller-
  * supplied INTEGER in milli-bits (the caller derives agree/disagree
  * weights from its m/u estimates offline, e.g. round(1000*log2(m/u))),
  * so a pair's score is a plain integer sum — bit-identical on any
  * engine and any partitioning, hence hash-gradeable.
  *
  * Scale shape: candidate generation is sorted-neighborhood — one
  * window shuffle on the block key, exactly (w-1)·n candidate pairs
  * (linear by construction, never a quadratic block self-join); the
  * scoring stage is two id-equi-joins against the narrow attribute
  * projection plus a codegen'd integer CASE sum. Nothing driver-side.
  */
object Linkage {
  /** One comparison field: equal-and-non-null earns `agreeMb`
    * milli-bits, a non-null mismatch costs `disagreeMb` (negative),
    * and a NULL on either side contributes 0 (the FS convention for
    * missing comparisons — no evidence either way).
    */
  final case class FieldWeight(field: String, agreeMb: Long,
      disagreeMb: Long)

  /** Sorted-neighborhood candidate pairs for structured records:
    * within each `blockCol` block, sort by (`orderCol`, id) — a total
    * order — and pair each row with its next `w-1` neighbors.
    * Returns (a_id, b_id). Same kernel as the text variant
    * (Dedup.sortedNeighborhood) minus the token verify.
    */
  def neighborhoodPairs(df: DataFrame, idCol: String, blockCol: String,
      orderCol: String, w: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(w >= 2, "neighborhoodPairs: w must be >= 2")
    val win = Window.partitionBy(col(blockCol))
      .orderBy(col(orderCol).asc, col(idCol).asc)
    val leads = (1 until w).map(i =>
      lead(col(idCol), i).over(win).as(s"__l$i"))
    df.select((col(idCol).as("a_id") +: leads): _*)
      .select(col("a_id"),
        explode(array((1 until w).map(i => col(s"__l$i")): _*)).as("b_id"))
      .filter(col("b_id").isNotNull)
  }

  /** Fellegi–Sunter linkage: neighborhood candidates, per-field
    * agreement weights summed in integer milli-bits, three-way
    * decision by the (upper, lower) thresholds — `link` at or above
    * `upperMb`, `non_link` at or below `lowerMb`, `possible` (the
    * clerical-review band) between.
    * Output: (a_id, b_id, weight_mb, decision).
    */
  def fellegiSunter(df: DataFrame, idCol: String, blockCol: String,
      orderCol: String, w: Int, fields: Seq[FieldWeight],
      upperMb: Long, lowerMb: Long): DataFrame = {
    require(fields.nonEmpty, "fellegiSunter: need at least one field")
    require(upperMb > lowerMb,
      "fellegiSunter: upperMb must exceed lowerMb")
    val pairs = neighborhoodPairs(df, idCol, blockCol, orderCol, w)
    val attrs = df.select(col(idCol) +: fields.map(f => col(f.field)): _*)
    val aSide = attrs.select(col(idCol).as("a_id") +:
      fields.map(f => col(f.field).as(s"__a_${f.field}")): _*)
    val bSide = attrs.select(col(idCol).as("b_id") +:
      fields.map(f => col(f.field).as(s"__b_${f.field}")): _*)
    val weight = fields.map { f =>
      val a = col(s"__a_${f.field}"); val b = col(s"__b_${f.field}")
      when(a.isNull || b.isNull, lit(0L))
        .when(a === b, lit(f.agreeMb))
        .otherwise(lit(f.disagreeMb))
    }.reduce(_ + _)
    pairs.join(aSide, "a_id").join(bSide, "b_id")
      .withColumn("weight_mb", weight)
      .withColumn("decision",
        when(col("weight_mb") >= upperMb, lit("link"))
          .when(col("weight_mb") <= lowerMb, lit("non_link"))
          .otherwise(lit("possible")))
      .select("a_id", "b_id", "weight_mb", "decision")
  }
}
