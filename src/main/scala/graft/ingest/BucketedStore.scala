package graft.ingest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Shared catalog-table machinery of the bucketed store forms —
  * DedupStore (content_hash), NearDupStore (band_key, sig), SpanStore
  * (window hashes through DedupStore's table shape). One
  * implementation of the lifecycle invariants every bucketed store
  * needs, parameterized by schema and bucket column:
  *
  *  - idempotent CREATE with crash recovery run first (a compaction
  *    that died between DROP and RENAME leaves only the staging
  *    table; entry-time recovery renames it back before any check);
  *  - staging-table + catalog-rename compaction (the directory-swap
  *    protocol cannot apply — the catalog owns the table location);
  *    single maintenance writer assumed, exactly as Layout.compact;
  *  - the in-table `_bloom` sidecar (underscore-prefixed, ignored by
  *    every parquet reader, retired automatically by compaction's
  *    swap), built over the bucket column via DedupStore's sidecar
  *    format.
  */
private[ingest] object BucketedStore {

  def stagingOf(table: String): String = table + "_compact_stage"

  /** Repair a compaction crash: staging exists, table gone → the DROP
    * committed but the RENAME did not; finish it.
    */
  def recoverSwap(spark: SparkSession, table: String): Unit = {
    val staging = stagingOf(table)
    if (spark.catalog.tableExists(staging) &&
        !spark.catalog.tableExists(table))
      spark.sql(s"ALTER TABLE $staging RENAME TO $table")
  }

  /** Idempotent create (recovery first; an existing table — and its
    * bucket count — wins).
    */
  def ensure(spark: SparkSession, table: String, buckets: Int,
      schema: StructType, bucketCol: String): Unit = {
    recoverSwap(spark, table)
    if (!spark.catalog.tableExists(table))
      graft.layout.Layout.writeBucketed(
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema),
        table, buckets, bucketCol)
  }

  def bucketsOf(spark: SparkSession, table: String): Int =
    spark.sessionState.catalog
      .getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .bucketSpec.map(_.numBuckets)
      .getOrElse(throw new IllegalStateException(
        s"store table $table is not bucketed — create it with " +
          "the store's ensureBucketedStore"))

  def tableLocation(spark: SparkSession,
      table: String): org.apache.hadoop.fs.Path =
    new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table)).location)

  /** Rewrite to one row per distinct store row via the staging-table
    * swap. Returns (rowsBefore, rowsAfter). `transform` runs on top of
    * the distinct during the staging write — the stores' retraction
    * hook (tombstoned rows are dropped here, and the old table
    * directory's `_tombstones` goes down with the DROP half of the
    * swap, which is what physically clears applied tombstones).
    */
  def compact(spark: SparkSession, table: String, bucketCol: String,
      transform: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame = identity): (Long, Long) = {
    recoverSwap(spark, table)
    if (!spark.catalog.tableExists(table)) return (0L, 0L)
    val b = bucketsOf(spark, table)
    val staging = stagingOf(table)
    spark.sql(s"DROP TABLE IF EXISTS $staging") // stale pre-drop leftover
    val before = spark.table(table).count()
    graft.layout.Layout.writeBucketed(
      transform(spark.table(table).distinct()), staging, b, bucketCol)
    // store-level metadata (e.g. SpanStore's recorded stride) is a
    // property of the DATA and must ride the swap: copy graft.*
    // properties onto staging BEFORE the drop, so even a crash between
    // drop and rename (repaired by recoverSwap) installs a table that
    // still carries them
    val props = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .properties.filter(_._1.startsWith("graft."))
    if (props.nonEmpty) {
      val kv = props.map { case (k, v) => s"'$k' = '$v'" }.mkString(", ")
      spark.sql(s"ALTER TABLE $staging SET TBLPROPERTIES ($kv)")
    }
    val after = spark.table(staging).count()
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $staging RENAME TO $table")
    (before, after)
  }

  /** Build/replace the in-table `_bloom` sidecar over `col` — the
    * SHARDED form (per-shard filters built executor-side into an
    * in-table `_bloom.d-<uuid>` generation directory; see
    * [[graft.functions.BloomShards]] for why the single driver-built
    * filter had to go). Returns rows covered (0 = empty store, sidecar
    * removed).
    */
  def buildBloomSidecar(spark: SparkSession, table: String, col: String,
      fpp: Double, numShards: Int = 0): Long = {
    val loc = tableLocation(spark, table)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val files = DedupStore.storeDataFiles(fs, loc)
    val side = new org.apache.hadoop.fs.Path(loc, "_bloom")
    if (files.isEmpty) { DedupStore.removeSidecar(fs, side); return 0L }
    DedupStore.buildShardedSidecar(spark, spark.table(table), col, fs,
      side, files, numShards, fpp)
  }
}
