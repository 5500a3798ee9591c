package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Cross-RUN exact content dedup — the incremental edge of the dedup
  * family: q27 dedups within a corpus, Streams.streamingContentDedup
  * dedups within a watermark window, and this store dedups a new batch
  * against EVERYTHING ingested in prior runs (the "have we ever seen
  * this document" check a continuously-fed training corpus needs).
  *
  * The store is a plain parquet directory of (content_hash) rows,
  * appended once per committed batch — append-only, no merge, so a
  * batch commit is one atomic-enough parquet write (readers tolerate
  * the in-progress `_temporary` dir; a crashed append leaves no
  * `_SUCCESS`-less data files visible to Spark's committer output).
  * Periodic Layout.compact keeps the file count flat; at 100 TB the
  * store is bucketed by hash at rest (Layout.writeBucketed) so the
  * anti-join plans off the bucketed scan with no store-side exchange.
  *
  * Two-phase by design: [[newUnique]] answers "which rows are new";
  * [[recordHashes]] marks them seen. Callers persist the survivors
  * FIRST and record hashes after — a crash between the two re-delivers
  * (at-least-once) instead of silently dropping a batch that was never
  * persisted (the failure mode of a fused check-and-record).
  */
object DedupStore {

  /** Hash column the store keys on — ONE definition with q27/q80
    * (LlmPipeline.contentHash): md5 of whitespace/case-normalized text.
    */
  private def hashOf(textCol: String) =
    graft.queries.LlmPipeline.contentHash(col(textCol))

  private def storeHashes(spark: org.apache.spark.sql.SparkSession,
      storePath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.parquet(storePath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("content_hash",
          org.apache.spark.sql.types.StringType))))
  }

  /** Rows of `docs` never seen before: within-batch duplicates collapse
    * to the min-`idCol` keeper (re-deliveries inside one batch), then
    * the keepers anti-join the store on the content hash. Both steps
    * shuffle on the hash — the same content-bucketed movement as q27;
    * nothing touches the driver.
    */
  def newUnique(docs: DataFrame, textCol: String, idCol: String,
      storePath: String): DataFrame = {
    require(!docs.columns.exists(_.equalsIgnoreCase("__content_hash")),
      "DedupStore reserves the column name __content_hash")
    val hashed = docs.withColumn("__content_hash", hashOf(textCol))
    val keepers = hashed
      .withColumn("__keeper", min(col(idCol)).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("__content_hash")))
      .filter(col(idCol) === col("__keeper"))
      .drop("__keeper")
    keepers
      .join(storeHashes(docs.sparkSession, storePath)
          .select(col("content_hash").as("__content_hash")),
        Seq("__content_hash"), "left_anti")
      .drop("__content_hash")
  }

  /** Mark `docs` seen: append their content hashes to the store. Call
    * AFTER the survivors are durably persisted (see class doc). One
    * parquet append of a hash-only projection — bytes written scale
    * with the batch, never the store.
    */
  def recordHashes(docs: DataFrame, textCol: String,
      storePath: String): Unit =
    docs.select(hashOf(textCol).as("content_hash")).distinct()
      .write.mode(SaveMode.Append).parquet(storePath)
}
