package graft.ext

import org.apache.spark.sql.DataFrame

/** Lineage pinning for iterative operators, with an opt-in
  * fault-tolerant form.
  *
  * Iterative loops (PageRank, k-core, BFS, connected components) must
  * cut lineage every round or the plan grows with the iteration count.
  * `localCheckpoint` does that with executor-local blocks — the right
  * default at local[32] and for short jobs — but those blocks have NO
  * recompute path: on a real cluster, losing one executor mid-run kills
  * an hour-long PageRank at round 40 with no way back.
  *
  * The fault-tolerant form is the standard Spark knob, not a bespoke
  * one: set a checkpoint directory on the context
  * (`spark.sparkContext.setCheckpointDir("hdfs://…/ckpt")`) and every
  * [[Pin.apply]] becomes a RELIABLE `Dataset.checkpoint()` — blocks
  * are written to that (replicated) filesystem, so a lost executor
  * re-reads instead of dying. No signature changes anywhere: the choice
  * rides on the session, exactly like GraphX's checkpointing does.
  * Results are identical either way (Round10Spec pins pageRank and
  * dedupClusters byte-equal under both modes).
  *
  * Cleanup: local checkpoint blocks are released eagerly by the
  * operators' `freeCheckpoint` discipline; reliable checkpoint FILES
  * outlive the run — enable
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` or manage
  * the directory's lifecycle (e.g. a per-job subdir deleted on
  * completion), as with any Spark reliable checkpoint.
  */
private[graft] object Pin {
  /** Materialize `df` and cut its lineage: reliable
    * `Dataset.checkpoint()` when the session has a checkpoint dir,
    * `localCheckpoint()` otherwise. Both forms are eager.
    */
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
}
