package graft.operators

import org.apache.spark.sql.DataFrame

/** Execution helpers shared across operator implementations. */
object Exec {

  /** Eager materialization barrier — the single policy for every
    * "compute once, read many times / truncate lineage" frame in the
    * engine (q56 chunks, q61 term frequencies, q80 survivors, q86
    * positions, the BPE vocab rounds, the q60 component loop): when the
    * session has a checkpoint directory configured
    * (`setCheckpointDir` — a cluster deployment sets one as a matter
    * of course), use the RELIABLE checkpoint, whose blocks live on the
    * cluster FS and survive executor loss / dynamic-allocation
    * decommission; otherwise the faster executor-memory
    * localCheckpoint (single-JVM local mode loses blocks only by dying
    * entirely). LlmPipelineSpec pins result-identity across both modes.
    *
    * Reliable-checkpoint FILES are not garbage-collected by Spark
    * (`unpersist()` leaves them, and
    * `spark.cleaner.referenceTracking.cleanCheckpoints` defaults to
    * false) — a loop that materializes every round would leak one copy
    * of its frame per round onto the cluster FS. Loops therefore pair
    * each round's materialization with [[release]] of the previous
    * round (the Bpe.train / q60 pattern): at most ONE round's files are
    * live at any time, and only the final round's remain after the
    * loop — the result itself.
    */
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)

  /** Free a [[materialize]]d frame that no later computation will read:
    * deletes its reliable-checkpoint directory from the cluster FS (the
    * files Spark itself never reclaims) and unpersists the underlying
    * RDD's blocks (local-checkpoint storage — `Dataset.unpersist` only
    * clears cache-manager entries, not RDD-level checkpoint blocks).
    * The frame is unusable afterwards; call it only once the NEXT
    * round is durably materialized, never on a frame you return.
    * Frames not produced by [[materialize]] fall back to a plain
    * `unpersist` and are left intact.
    */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case l: org.apache.spark.sql.execution.LogicalRDD =>
      l.rdd.getCheckpointFile.foreach { ckDir =>
        val p = new org.apache.hadoop.fs.Path(ckDir)
        val fs = p.getFileSystem(
          df.sparkSession.sessionState.newHadoopConf())
        fs.delete(p, true)
      }
      l.rdd.unpersist(blocking = false)
    case _ =>
      df.unpersist()
  }
}
