package graft.ext

import org.apache.spark.sql.types._

/** Shared helpers for the at-rest (partition-directory) index layouts. */
private[ext] object AtRest {

  /** IN-filter literals for a partition column, typed to match the
    * READ-BACK partition type (long/int under inference, string when
    * `spark.sql.sources.partitionColumnTypeInference.enabled` is off)
    * so the IN list lands in `PartitionFilters` untouched by casts —
    * a cast-wrapped column silently degrades directory pruning to a
    * full scan, which at 100 TB is the difference between reading ~14%
    * and 100% of the table. Anything else fails loudly. One shared
    * dispatch for every at-rest probe site: the five hand-copied match
    * blocks this replaces had already drifted in arm order and
    * supported types.
    */
  def partitionLits(op: String, colName: String, dt: DataType,
      values: Seq[Long]): Seq[Any] = dt match {
    case LongType    => values
    case IntegerType => values.map(_.toInt)
    case StringType  => values.map(_.toString)
    case other => throw new IllegalStateException(
      s"$op: partition column '$colName' read back as $other; " +
        "expected long/int/string — pruning contract would silently break")
  }

  /** Parse one partition-column value read back from a row (the query
    * row of an at-rest lookup) — the read side of the same contract.
    */
  def partitionValue(op: String, colName: String, v: Any): Long =
    v match {
      case n: Number => n.longValue()
      case s: String => s.toLong
      case other => throw new IllegalStateException(
        s"$op: partition column '$colName' value ${String.valueOf(other)}" +
          " is neither numeric nor string")
    }
}
