package graft.ingest

import org.apache.spark.sql.SparkSession

/** Operational statistics + maintenance signals for the incremental-
  * dedup store family ([[DedupStore]], [[NearDupStore]], [[SpanStore]],
  * both path and bucketed-catalog forms).
  *
  * The family's maintenance contract is spread across scaladocs:
  * compaction reclaims at-least-once re-deliveries AND physically
  * applies tombstones; "a tombstone backlog near the broadcast ceiling
  * is the signal to compact"; "rebuild the bloom sidecar on the
  * compaction schedule" because fresh appends ride the residual join
  * until then. This object turns those contracts into a REPORT an
  * operator (or a scheduler) can act on — one pure-metadata pass:
  * driver-side file listings only, no Spark job, no store scan, so it
  * is safe to call at any frequency against a store of any size.
  *
  * `compactionDue` fires when the tombstone backlog passes half the
  * [[DedupStore.tombstoneBroadcastCeiling]] (compact BEFORE probes
  * fall off the broadcast plan, not after) or the data file count
  * passes `maxDataFiles`. `sidecarStale` fires when residual bytes —
  * appends the bloom filter does not cover — pass `maxResidualShare`
  * of the store (the bloom prune erodes as the residual grows; a
  * missing sidecar on a non-empty store is 100% residual by
  * definition and reports stale).
  */
object StoreStats {

  /** One snapshot of a store's physical + maintenance state.
    * `hashForm`/`stride` echo the persisted recording discipline
    * ([[HashForm]]; the stride is meaningful for span stores and
    * reads 1 — the recorded-nothing default — elsewhere).
    */
  final case class Stats(
      dataFiles: Int, dataBytes: Long,
      tombstoneFiles: Int, tombstoneBytes: Long,
      broadcastCeilingBytes: Long,
      sidecarPresent: Boolean, coveredFiles: Int,
      residualFiles: Int, residualBytes: Long,
      hashForm: String, stride: Int,
      compactionDue: Boolean, sidecarStale: Boolean)

  /** Residual share above which the sidecar counts as stale. */
  private val MaxResidualShare = 0.25

  private def build(spark: SparkSession,
      fs: org.apache.hadoop.fs.FileSystem,
      store: org.apache.hadoop.fs.Path,
      tombDir: org.apache.hadoop.fs.Path,
      manifest: org.apache.hadoop.fs.Path,
      hashForm: String, stride: Int, maxDataFiles: Int): Stats = {
    val data = DedupStore.storeDataFileStatuses(fs, store)
    val tomb = DedupStore.storeDataFileStatuses(fs, tombDir)
    val dataBytes = data.map(_.getLen).sum
    val tombBytes = tomb.map(_.getLen).sum
    // a sidecar counts as present only if its generation directory
    // still resolves — same liveness rule the probes apply
    val sidecar = DedupStore.readSidecar(fs, manifest).filter { sc =>
      fs.exists(new org.apache.hadoop.fs.Path(
        fs.makeQualified(manifest).getParent, sc.shardDirName))
    }
    val covered = sidecar.fold(Set.empty[String])(_.covered)
    val coveredLive = data.count(st => covered.contains(st.getPath.getName))
    val residual =
      data.filterNot(st => covered.contains(st.getPath.getName))
    val residualBytes = residual.map(_.getLen).sum
    val ceiling = DedupStore.tombstoneBroadcastCeiling(spark)
    Stats(
      dataFiles = data.size, dataBytes = dataBytes,
      tombstoneFiles = tomb.size, tombstoneBytes = tombBytes,
      broadcastCeilingBytes = ceiling,
      sidecarPresent = sidecar.isDefined, coveredFiles = coveredLive,
      residualFiles = residual.size, residualBytes = residualBytes,
      hashForm = hashForm, stride = stride,
      compactionDue =
        tombBytes > ceiling / 2 || data.size > maxDataFiles,
      sidecarStale = data.nonEmpty && (sidecar.isEmpty ||
        residualBytes.toDouble > MaxResidualShare * dataBytes))
  }

  /** Stats for a PATH-form store ([[DedupStore]]/[[NearDupStore]]/
    * [[SpanStore]] `storePath` — they share the layout: data files +
    * `.tombstones` + `.bloom` + `.hashform`/`.stride` siblings).
    */
  def path(spark: SparkSession, storePath: String,
      maxDataFiles: Int = 256): Stats = {
    val store = new org.apache.hadoop.fs.Path(storePath)
    val fs = store.getFileSystem(spark.sessionState.newHadoopConf())
    build(spark, fs, store, DedupStore.tombstonesPath(storePath),
      DedupStore.sidecarPath(storePath),
      HashForm.storedPath(spark, storePath),
      SpanStore.storedStride(spark, storePath), maxDataFiles)
  }

  /** Stats for a BUCKETED-catalog store table (any of the family —
    * `_tombstones`/`_bloom` live inside the table directory; the hash
    * form is read from whichever `graft.*.hashform` property the
    * owning store recorded, and the span stride from its property).
    */
  def bucketed(spark: SparkSession, table: String,
      maxDataFiles: Int = 256): Stats = {
    val loc = BucketedStore.tableLocation(spark, table)
    val fs = loc.getFileSystem(spark.sessionState.newHadoopConf())
    val props = spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(table))
      .properties
    val form = props.collectFirst {
      case (k, v) if k.startsWith("graft.") && k.endsWith(".hashform") => v
    }.getOrElse(HashForm.Md5)
    val stride = props.get("graft.span.stride").map(_.toInt).getOrElse(1)
    build(spark, fs, loc,
      DedupStore.bucketedTombstonesDir(spark, table),
      new org.apache.hadoop.fs.Path(loc, "_bloom"),
      form, stride, maxDataFiles)
  }
}
