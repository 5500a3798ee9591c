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
    *
    * Tombstones appended DURING the compaction survive it (the family
    * contract): the `_tombstones` file list is snapshotted at entry,
    * and any file not in that snapshot when the swap is about to DROP
    * the old directory is COPIED into the staging table's own
    * `_tombstones` first, so a retraction racing the staging write
    * stays live for the next compaction instead of being destroyed
    * unapplied. Copy, not move: before the DROP the staging table is
    * still the discardable side (a crash leaves it to be torn down as
    * a stale pre-drop leftover), so the original file must keep being
    * the durable copy until the DROP itself removes it. The transform's
    * own tombstone read lists files at staging-write time — a superset
    * of the entry snapshot (tombstone files are only ever deleted by
    * compaction) — so a late file may be both applied AND preserved,
    * which is harmless: it masks rows already gone until the next
    * compaction clears it.
    */
  def compact(spark: SparkSession, table: String, bucketCol: String,
      transform: org.apache.spark.sql.DataFrame =>
        org.apache.spark.sql.DataFrame = identity): (Long, Long) = {
    recoverSwap(spark, table)
    if (!spark.catalog.tableExists(table)) return (0L, 0L)
    val b = bucketsOf(spark, table)
    val staging = stagingOf(table)
    spark.sql(s"DROP TABLE IF EXISTS $staging") // stale pre-drop leftover
    val loc = tableLocation(spark, table)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val tombDir = new org.apache.hadoop.fs.Path(loc, "_tombstones")
    val tombSnap = DedupStore.storeDataFiles(fs, tombDir)
      .map(_.getName).toSet
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
    // late-retraction rescue: copy tombstone files appended since the
    // entry snapshot into the staging directory so the DROP below
    // cannot destroy an unapplied takedown (doc comment above)
    val late = DedupStore.storeDataFiles(fs, tombDir)
      .filterNot(f => tombSnap.contains(f.getName))
    if (late.nonEmpty) {
      val stagingTomb = new org.apache.hadoop.fs.Path(
        tableLocation(spark, staging), "_tombstones")
      fs.mkdirs(stagingTomb)
      val conf = spark.sessionState.newHadoopConf()
      late.foreach { f =>
        require(org.apache.hadoop.fs.FileUtil.copy(fs, f, fs,
          new org.apache.hadoop.fs.Path(stagingTomb, f.getName),
          false, true, conf),
          s"compact: could not preserve late tombstone $f")
      }
    }
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
