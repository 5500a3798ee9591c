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
    */
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}
