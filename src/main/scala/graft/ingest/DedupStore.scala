package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Cross-RUN exact content dedup — the incremental edge of the dedup
  * family: q27 dedups within a corpus, Streams.streamingContentDedup
  * dedups within a watermark window, and this store dedups a new batch
  * against EVERYTHING ingested in prior runs (the "have we ever seen
  * this document" check a continuously-fed training corpus needs).
  *
  * The store is a plain parquet directory of (content_hash) rows,
  * appended once per committed batch — append-only, no merge, so a
  * batch commit is one parquet write. Periodic Layout.compact keeps the
  * file count flat. The anti-join shuffles both sides on the hash; to
  * make that exchange-free at 100 TB the store must live in the session
  * catalog as a table bucketed by content_hash (Layout.writeBucketed +
  * spark.table) — a PATH-read parquet store like this one always plans
  * a store-side shuffle, which is still one narrow (hash-only) column.
  *
  * Two-phase by design: [[newUnique]] answers "which rows are new";
  * [[recordHashes]] marks them seen. Callers persist the survivors
  * FIRST and record hashes after — a crash between the two re-delivers
  * (at-least-once) instead of silently dropping a batch that was never
  * persisted (the failure mode of a fused check-and-record).
  */
object DedupStore {

  private val storeSchema =
    StructType(Seq(StructField("content_hash", StringType)))

  /** Hash column the store keys on — ONE definition with q27/q80
    * (LlmPipeline.contentHash): md5 of whitespace/case-normalized text.
    * Null text coalesces to the empty string first (the
    * streamingContentDedup contract): a null-text document HAS content
    * — empty — and all empty-content rows are duplicates of each other;
    * md5(null) would be a null key that no anti-join can ever match, so
    * null-text docs would re-deliver as "new" forever.
    */
  private def hashOf(textCol: String) =
    graft.queries.LlmPipeline.contentHash(coalesce(col(textCol), lit("")))

  private def storeHashes(spark: org.apache.spark.sql.SparkSession,
      storePath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // explicit schema: a store dir that exists but holds no readable
    // data files yet (crashed first append = only _temporary/_SUCCESS)
    // must degrade to an EMPTY store, not an un-inferable-schema error
    // that wedges every later batch
    if (fs.exists(p)) spark.read.schema(storeSchema).parquet(storePath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], storeSchema)
  }

  /** Rows of `docs` never seen before, with the computed `content_hash`
    * as an extra output column (so [[recordHashes]] — and any audit —
    * can reuse it without re-running this plan): within-batch
    * duplicates collapse to one keeper per hash (the min-`idCol` row;
    * null ids order last, and an all-null-id group still keeps exactly
    * one row rather than vanishing), then the keepers anti-join the
    * store on the hash. Both steps shuffle on the hash — the same
    * content-bucketed movement as q27; nothing touches the driver.
    */
  def newUnique(docs: DataFrame, textCol: String, idCol: String,
      storePath: String): DataFrame = {
    for (reserved <- Seq("content_hash", "__rn"))
      require(!docs.columns.exists(_.equalsIgnoreCase(reserved)),
        s"DedupStore reserves the column name $reserved")
    val hashed = docs.withColumn("content_hash", hashOf(textCol))
    // row_number, not a min-window + equality filter: a null-id row
    // never satisfies `id === min(id)` (null comparison), so an
    // all-null-id group would silently disappear from the output —
    // neither returned nor recorded. rank 1 always exists.
    val keepers = hashed
      .withColumn("__rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("content_hash")
          .orderBy(col(idCol).asc_nulls_last)))
      .filter(col("__rn") === 1)
      .drop("__rn")
    keepers.join(storeHashes(docs.sparkSession, storePath),
      Seq("content_hash"), "left_anti")
  }

  /** Mark `docs` seen: append their content hashes to the store. Call
    * AFTER the survivors are durably persisted (see class doc), ideally
    * on the persisted read-back. Reuses a `content_hash` column when
    * the frame carries one ([[newUnique]]'s output does) — recomputing
    * from `textCol` would re-run the caller's whole upstream plan,
    * including the store scan, a second time. One parquet append of a
    * hash-only projection — bytes written scale with the batch, never
    * the store.
    */
  def recordHashes(docs: DataFrame, textCol: String,
      storePath: String): Unit = {
    val hashes =
      if (docs.columns.contains("content_hash")) docs.select("content_hash")
      else docs.select(hashOf(textCol).as("content_hash"))
    // materialize BEFORE the append: a caller that passes newUnique's
    // lazy output straight in has storePath in its plan, and an append
    // whose input plan scans the directory being appended would bank on
    // the file listing resolving before new files land. The checkpoint
    // pins the batch's hashes first, so the store scan can never
    // overlap the store append.
    val mat = hashes.distinct().localCheckpoint(true)
    try mat.write.mode(SaveMode.Append).parquet(storePath)
    finally mat.unpersist()
  }

  /** Maintenance: rewrite the store to one row per hash. At-least-once
    * re-delivery after a crash (the two-phase contract above) re-appends
    * hashes the store already holds — the anti-join stays CORRECT, but
    * without this pass the store's row count (and so its scan cost and
    * shuffle width) grows past the unique-hash count forever, and
    * [[graft.layout.Layout.compact]] alone merges files without
    * dropping the duplicate rows. Same crash-safe atomic directory swap
    * as compact (shared machinery); schedule it with the file-count
    * compaction, e.g. nightly. Returns (filesBefore, filesAfter);
    * missing/never-written store is a no-op.
    */
  def compactStore(spark: org.apache.spark.sql.SparkSession,
      storePath: String, targetFileBytes: Long = 128L << 20): (Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) return (0, 0)
    graft.layout.Layout.rewriteInPlace(spark, storePath,
      targetFileBytes)(_.distinct())
  }
}
