package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling for a training-data pipeline: media
  * (image/audio/video) travels as opaque `binary` columns next to typed
  * metadata, and per-item decode/feature-extraction runs as a partition-
  * local batch transform (`mapPartitions` over a typed Dataset — the Scala
  * analog of `mapInPandas`: one iterator per partition, so per-batch
  * library/model setup amortizes and nothing ever collects to the driver).
  *
  * The actual codec work is STUBBED — this container ships no image/audio
  * libraries — behind `DecodeKernel`, a deterministic fake that derives
  * "features" from the bytes. The Spark-side contract (schemas, batch
  * iteration, partitioning, column pruning) is real and tested; swapping
  * the kernel for javacv/ffmpeg is a one-function change.
  */
object Multimodal {

  /** A media row: raw bytes + typed metadata. */
  case class MediaItem(
      mediaId: Long,
      kind: String, // "image" | "audio" | "video"
      uri: String,
      content: Array[Byte],
      widthPx: Option[Int],
      heightPx: Option[Int],
      durationMs: Option[Long])

  /** Decoded/extracted features, one row per media item (plus one row per
    * sampled frame for video).
    */
  case class MediaFeatures(
      mediaId: Long,
      kind: String,
      frameIdx: Int,
      byteLen: Long,
      contentHash: Long,
      feature: Array[Float])

  /** STUB decode kernel — deterministic fake standing in for a real codec.
    * Real implementation would decode `content` (e.g. via javacv) and
    * produce an embedding / resized image / PCM frame. The fake derives a
    * fixed-width feature from a rolling hash of the bytes so tests are
    * exact and re-runs reproducible.
    */
  object DecodeKernel {
    val FeatureDim = 8

    def contentHash(bytes: Array[Byte]): Long = {
      var h = 1125899906842597L
      var i = 0
      while (i < bytes.length) { h = 31 * h + bytes(i); i += 1 }
      h
    }

    /** ??? in spirit: the real decoder goes here. */
    def fakeFeature(bytes: Array[Byte], frame: Int): Array[Float] = {
      val h = contentHash(bytes) + frame * 0x9E3779B97F4A7C15L
      Array.tabulate(FeatureDim)(i =>
        (((h >>> (i * 8)) & 0xFF).toInt - 128) / 128.0f)
    }

    /** Portable stub feature: digit i of md5(bytes ++ ":frame") hex,
      * affinely mapped as (digit - 7.5) / 8 — the range [-15/16, +15/16]
      * in exact 1/8 steps. Every value is a dyadic rational, so
      * float/double arithmetic over it is bit-identical in any engine —
      * DuckDB replays it as
      * `(strpos('0123456789abcdef', substr(md5(text || ':f'), i+1, 1)) - 8.5) / 8.0`,
      * which is what makes the media near-dup query oracle-checkable.
      */
    def portableFeature(bytes: Array[Byte], frame: Int): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.update(bytes)
      md.update(s":$frame".getBytes("UTF-8"))
      val hex = md.digest().take((FeatureDim + 1) / 2)
        .map(b => f"$b%02x").mkString
      Array.tabulate(FeatureDim)(i =>
        ((Character.digit(hex.charAt(i), 16) - 7.5) / 8.0).toFloat)
    }

    /** Frames to sample: 1 for still media, duration-based for video. */
    def frameCount(kind: String, durationMs: Option[Long]): Int =
      if (kind == "video") math.max(1,
        (durationMs.getOrElse(0L) / 1000L).toInt.min(16))
      else 1
  }

  /** Decode + feature-extract, one partition at a time. Batch shape: the
    * iterator is consumed lazily — constant memory per partition — and
    * per-partition setup (the `kernelReady` line) runs once, which is
    * where a real codec would load its native libs / model weights.
    */
  def extractFeatures(items: Dataset[MediaItem],
      portable: Boolean = false): Dataset[MediaFeatures] = {
    import items.sparkSession.implicits._
    items.mapPartitions { it =>
      val kernelReady = true // real codec: load native libs once here
      require(kernelReady)
      val feature: (Array[Byte], Int) => Array[Float] =
        if (portable) DecodeKernel.portableFeature
        else DecodeKernel.fakeFeature
      it.flatMap { m =>
        val frames = DecodeKernel.frameCount(m.kind, m.durationMs)
        (0 until frames).iterator.map { f =>
          MediaFeatures(m.mediaId, m.kind, f, m.content.length.toLong,
            DecodeKernel.contentHash(m.content),
            feature(m.content, f))
        }
      }
    }
  }

  /** Exact-duplicate media detection over the binary column — same
    * hash-groupBy shape as text dedup (content hash computed scan-side).
    */
  def exactMediaDups(df: DataFrame, idCol: String,
      contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)

  /** Near-duplicate media via the ANN path: extract features, then reuse
    * the embedding near-dup operator — multimodal dedup composes from the
    * same primitives as text/embedding dedup. The sign-RP bucket
    * prefilter (`nBits`, default 8) keeps the pair join equi-keyed —
    * identical features always share a bucket, so true duplicates are
    * never lost and the join never degenerates to all-pairs.
    */
  def nearDupMedia(items: Dataset[MediaItem], threshold: Double,
      nBits: Int = 8, portable: Boolean = false): DataFrame = {
    val feats = extractFeatures(items, portable)
      .filter(col("frameIdx") === 0)
      .select(col("mediaId"), col("feature"))
    Dedup.embeddingNearDups(feats, "mediaId", "feature", threshold, nBits)
  }

  /** Synthesize a deterministic media table from the documents corpus
    * (bytes = UTF-8 of the text) — the test substrate in a container with
    * no real media files.
    */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(
      col("doc_id").as("mediaId"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      concat(lit("mem://doc/"), col("doc_id")).as("uri"),
      encode(col("text"), "UTF-8").as("content"),
      when(col("doc_id") % 3 === 0, (col("n_chars") % 1920).cast("int"))
        .as("widthPx"),
      when(col("doc_id") % 3 === 0, (col("n_chars") % 1080).cast("int"))
        .as("heightPx"),
      when(col("doc_id") % 3 === 2, col("n_chars") * 100).as("durationMs"))
      .as[MediaItem]
  }
}
