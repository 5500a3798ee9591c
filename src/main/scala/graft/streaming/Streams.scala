package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.Tables
import graft.ingest.{Ingest, Warehouse}

/** Structured Streaming port of the reference's poll loop (reference:
  * etl/app.py:253-278, operator O1 in SURVEY.md §2.1) plus the event-time
  * windowed aggregation committed in SURVEY.md §2.3.
  *
  * Design (SURVEY.md §7.1): every transformation is the same pure
  * `DataFrame => DataFrame` code the batch path runs — streaming is only
  * the source (`readStream` file source) and the sink (`foreachBatch` →
  * `Warehouse.ingestStreamBatch`). `Trigger.AvailableNow` makes one poll
  * cycle = one bounded run over all unseen files (the faithful port of a
  * single `main()` loop iteration); `Trigger.ProcessingTime` would run
  * the loop forever at the reference's POLLING_INTERVAL.
  *
  * Scale posture: the file-source checkpoint (maxFilesPerTrigger
  * partitionable) replaces the reference's per-file metadata SELECTs;
  * state in the windowed aggregation is bounded by the watermark, so a
  * 1000-executor streaming job ages out old windows instead of growing
  * state forever.
  */
object Streams {

  /** Router glob per entity (O11, etl/app.py:238-243), CASE-INSENSITIVE
    * via per-letter bracket classes — the batch router lowercases the
    * basename, and a case-sensitive glob would silently never read
    * `Clients_mai.csv` (no stream, no status row, no signal). `~$…`
    * lock artifacts still match (a leading `[!~]` class would wrongly
    * consume the first letter of an unprefixed name), so O2 is enforced
    * by the row-level filename filter below.
    */
  /** `.csv` suffix is part of the glob: the streaming leg is a CSV file
    * source, and a bare `*token*` would also sweep up `.xlsx` deliveries
    * (first-class on the BATCH path via graft.ingest.Xlsx since r6) and
    * shred their zip bytes through the CSV parser. xlsx belongs on
    * `Warehouse.pollOnce`; Spark's file source cannot parse it.
    */
  private def ciGlob(token: String): String =
    "*" + token.map(c => s"[${c.toLower}${c.toUpper}]").mkString +
      "*.[cC][sS][vV]"
  private val entityGlob: Map[String, String] = Map(
    "clients" -> ciGlob("client"), "produits" -> ciGlob("produit"),
    "ventes" -> ciGlob("vente"))

  /** Raw (pre-coercion) schema: CSV files arrive untyped, like pandas'
    * permissive read (SURVEY.md §1.2) — declared strings, cast later by
    * `Ingest.coerceToContract`.
    */
  private def rawSchema(entity: String): StructType =
    StructType(Tables.requiredColumns(entity)
      .map(StructField(_, StringType)))

  /** O1 — unbounded directory source for one entity: file stream with
    * the router as a pathGlobFilter and the `~$` lock-file filter (O2)
    * applied on the per-row filename. Files matching a HIGHER-priority
    * entity token are excluded so a name like `clients_ventes.csv`
    * routes to exactly one stream — mirroring the batch router's
    * first-match if/else (Ingest.entityFor; reference
    * etl/app.py:238-243).
    *
    * Documented divergence from the batch path: a streaming CSV source
    * must use a DECLARED schema, which Spark maps to CSV columns
    * POSITIONALLY (enforceSchema) — the producer contract is
    * "contract-ordered columns". The batch path reads names from the
    * header and tolerates reordered/extra columns; header-reordered
    * files belong on that path.
    */
  def entityStream(spark: SparkSession, watchDir: String,
      entity: String): DataFrame = {
    // Batch-router parity: tokens earlier in the entityFor chain win.
    val higherPriority: Map[String, Seq[String]] = Map(
      "clients" -> Nil, "produits" -> Seq("client"),
      "ventes" -> Seq("client", "produit"))
    val base = element_at(split(input_file_name(), "/"), -1)
    val excluded = higherPriority(entity)
      .map(tok => lower(base).contains(tok))
      .foldLeft(lit(false))(_ || _)
    spark.readStream
      .format("csv")
      .option("header", "true")
      .option("enforceSchema", "true") // positional mapping, see scaladoc
      .option("pathGlobFilter", entityGlob(entity))
      .schema(rawSchema(entity))
      .load(watchDir)
      // Captured HERE because the hidden _metadata column resolves only
      // on the source relation — inside foreachBatch the micro-batch
      // DataFrame no longer exposes it. Warehouse.ingestStreamBatch uses
      // these for per-file status rows (O13) with real mtimes; the
      // coercion step drops them from the appended data.
      .withColumn("__source_file", input_file_name())
      .withColumn("__file_mtime", col("_metadata.file_modification_time"))
      .filter(!Ingest.isLockFile(input_file_name())) // O2
      .filter(!excluded) // O11 first-match routing
  }


  /** Wire one entity stream into the warehouse: every micro-batch runs
    * the shared validate→coerce→enrich→dedupe→FK-check→append pipeline.
    * One call = one poll cycle (AvailableNow drains all unseen files and
    * stops); the checkpoint is the incremental-processing state (O3).
    */
  def ingestQuery(wh: Warehouse, stream: DataFrame, entity: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .queryName(s"ingest_$entity")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        wh.ingestStreamBatch(entity, batch); ()
      }
      .start()

  /** One full poll cycle over a watch directory, dimensions before facts
    * (the FK ordering hazard, SURVEY.md §2.1): start + drain the three
    * entity streams sequentially.
    */
  def pollAvailableNow(spark: SparkSession, wh: Warehouse,
      watchDir: String, checkpointRoot: String): Unit =
    Seq("clients", "produits", "ventes").foreach { entity =>
      ingestQuery(wh, entityStream(spark, watchDir, entity), entity,
        s"$checkpointRoot/$entity").awaitTermination()
    }

  /** Streaming exact dedup — the streaming form of the O9/q27 dedup
    * family: state-store-backed `dropDuplicatesWithinWatermark` keeps
    * one state row per key only until the event-time watermark passes
    * it, so (unlike plain streaming dropDuplicates) state is bounded at
    * 100 TB/day ingest rates. Re-deliveries inside the watermark window
    * are dropped; later ones are the at-least-once tail the batch
    * anti-join (O9) catches downstream.
    */
  def streamingDedup(df: DataFrame, keys: Seq[String], eventTimeCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame =
    df.withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keys)

  /** Streaming CONTENT dedup — keys on the winnowing fingerprint of the
    * whitespace/case-normalized text (the native `min_gram_md5` kernel:
    * signature kernels are stateless per-row expressions, so they run
    * unchanged inside a streaming plan), bounded by the watermark like
    * [[streamingDedup]]. Formatting variants of the same content
    * collapse to one row at ingest — the streaming edge of the q27/q36
    * dedup family. Documents shorter than one gram fall back to an
    * md5 of the normalized text (a NULL fingerprint key would collapse
    * ALL short docs into one, since dropDuplicates treats nulls as
    * equal). NULL text is normalized to the empty string FIRST —
    * deliberately: a null-text document has empty content, so all
    * null/empty-text rows are exact content duplicates of each other
    * and collapse to one keeper, same as any other identical-content
    * group (without the coalesce, lower(null) would propagate to a
    * null key and the collapse would happen silently via the
    * null-keys-are-equal quirk instead of by contract).
    */
  def streamingContentDedup(df: DataFrame, textCol: String,
      eventTimeCol: String,
      watermarkDelay: String = "10 minutes"): DataFrame = {
    // The synthetic key is dropped from the output; a real column of
    // the same name would be silently destroyed — refuse instead (same
    // contract as Layout.saltedJoin's reserved column).
    // Case-insensitive: Spark's default resolver would let withColumn
    // REPLACE a differently-cased real column right past an exact-case
    // check.
    require(!df.columns.exists(_.equalsIgnoreCase("__content_fp")),
      "streamingContentDedup reserves the column name __content_fp")
    graft.functions.Functions.register(df.sparkSession)
    val norm =
      s"trim(regexp_replace(lower(coalesce($textCol, '')), '\\\\s+', ' '))"
    streamingDedup(
      df.withColumn("__content_fp", expr(
        s"coalesce(min_gram_md5($norm, 8), concat('short:', md5($norm)))")),
      Seq("__content_fp"), eventTimeCol, watermarkDelay)
      .drop("__content_fp")
  }

  /** Streamed CROSS-RUN content dedup — the glue that makes
    * [[graft.ingest.DedupStore]] consumable from a stream: every
    * micro-batch runs the two-phase check-persist-record cycle against
    * the store, writing each batch's survivors to its own
    * `batch=<id>` subdirectory of `outDir` (readable as one table —
    * Spark exposes `batch` as a partition column).
    *
    * Delivery semantics, per crash window (foreachBatch replays are
    * at-least-once):
    *  - survivors in `outDir` are EXACTLY-ONCE: a replayed batch id
    *    that already has its `_SUCCESS` marker is not rewritten (a
    *    replay AFTER the store recorded the hashes would recompute an
    *    EMPTY survivor set and overwrite data with nothing), and a
    *    half-written directory (no marker) is recomputed from the
    *    unchanged store and overwritten cleanly;
    *  - store hash rows are AT-LEAST-ONCE: hashes are recorded from the
    *    committed survivor directory (the persisted read-back the
    *    DedupStore contract asks for), re-recorded on replay — never
    *    lost, duplicates reclaimed by DedupStore.compactStore.
    * Within-batch + cross-batch + cross-RESTART duplicates all collapse;
    * StreamingSpec drives the crash matrix. `outDir` + `checkpointDir`
    * are ONE unit (batch ids name the subdirectories): reset both or
    * neither — a fresh checkpoint against a populated outDir sees old
    * batch directories as committed, which is exactly what makes a
    * full-history replay a no-op instead of a data loss.
    */
  def dedupThroughStore(docs: DataFrame, textCol: String, idCol: String,
      storePath: String, outDir: String, checkpointDir: String,
      maintenanceEvery: Int = 0): StreamingQuery =
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "dedup_through_store",
      maintenanceEvery = maintenanceEvery,
      maintain = spark => maintainIfDue(
        graft.ingest.StoreStats.path(spark, storePath),
        { graft.ingest.DedupStore.compactStore(spark, storePath); () },
        Some(() => { graft.ingest.DedupStore
          .buildBloomSidecar(spark, storePath); () })))(
      // the bloom-aware check is a strict superset: identical answers
      // with no sidecar (IngestSpec/PropertySpec equality laws), and
      // micro-batches skip the store history once an operator has built
      // one (DedupStore.buildBloomSidecar on the compaction schedule —
      // or inline: `maintenanceEvery` > 0 lets the appender run its own
      // maintenance every N batches when the StoreStats signals fire,
      // so a year-long feed self-maintains without an external
      // scheduler)
      batch => graft.ingest.DedupStore
        .newUniqueWithBloom(batch, textCol, idCol, storePath),
      committed => graft.ingest.DedupStore
        .recordHashes(committed, textCol, storePath))

  /** Inline self-maintenance for the store-backed cycles, driven by
    * the [[graft.ingest.StoreStats]] signals the reports were built to
    * feed: compaction when `compactionDue` (the tombstone backlog is
    * approaching the broadcast ceiling, or file-count pressure), a
    * sidecar rebuild when `sidecarStale` (residual share past 25%) —
    * and always after a compaction, whose rewritten file names void
    * the old sidecar's coverage. Stores without a path-form sidecar
    * pass None and only compact.
    */
  private def maintainIfDue(stats: => graft.ingest.StoreStats.Stats,
      compact: => Unit, rebuildSidecar: Option[() => Unit]): Unit = {
    val s = stats
    if (s.compactionDue) {
      compact
      rebuildSidecar.foreach(_.apply())
    } else if (s.sidecarStale) rebuildSidecar.foreach(_.apply())
  }

  /** [[dedupThroughStore]] against the BUCKETED catalog store
    * ([[graft.ingest.DedupStore.ensureBucketedStore]]) — identical
    * delivery semantics; the per-micro-batch anti-join plans zero
    * exchanges on the ever-growing store side, which is the form that
    * holds up when the stream has been running for a year. The table
    * is created on first use (`buckets` sizes it then; an existing
    * table's bucket count wins).
    */
  def dedupThroughBucketedStore(docs: DataFrame, textCol: String,
      idCol: String, table: String, outDir: String,
      checkpointDir: String, buckets: Int = 32,
      maintenanceEvery: Int = 0): StreamingQuery = {
    graft.ingest.DedupStore.ensureBucketedStore(
      docs.sparkSession, table, buckets)
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "dedup_through_bucketed_store",
      maintenanceEvery = maintenanceEvery,
      maintain = spark => maintainIfDue(
        graft.ingest.StoreStats.bucketed(spark, table),
        { graft.ingest.DedupStore.compactBucketedStore(spark, table); () },
        Some(() => { graft.ingest.DedupStore
          .buildBloomSidecarBucketed(spark, table); () })))(
      // bloom-aware for the same reason as dedupThroughStore; the
      // bucketed sidecar lives in the table directory and retires with
      // compaction's swap, so the stream needs no coordination
      batch => graft.ingest.DedupStore
        .newUniqueBucketedWithBloom(batch, textCol, idCol, table),
      committed => graft.ingest.DedupStore
        .recordHashesBucketed(committed, textCol, table))
  }

  /** The shared micro-batch cycle of the store-backed dedup sinks:
    * check (`newUnique*` / `newNearUnique`) → persist survivors
    * exactly-once into `batch=<id>` → record at-least-once from the
    * committed read-back. See [[dedupThroughStore]] for the
    * delivery-semantics contract; `check`/`record` inject the store
    * form and `committedSchema` maps the input schema to the survivor
    * schema (a batch with zero survivors commits a data-file-less
    * directory that schema inference cannot read, so the read-back
    * schema must be explicit).
    */
  private def dedupThroughStoreWith(docs: DataFrame, textCol: String,
      outDir: String, checkpointDir: String, queryName: String,
      committedSchema: org.apache.spark.sql.types.StructType =>
        org.apache.spark.sql.types.StructType =
        _.add("content_hash", org.apache.spark.sql.types.StringType),
      maintenanceEvery: Int = 0,
      maintain: SparkSession => Unit = _ => (),
      // batch-id-aware check override (the observed full-stack form
      // writes its yield frame keyed by batch id); when set, `check`
      // is ignored. Runs only on UNCOMMITTED batches, like `check`.
      checkWithId: Option[(DataFrame, Long) => DataFrame] = None)(
      check: DataFrame => DataFrame,
      record: DataFrame => Unit): StreamingQuery =
    docs.writeStream
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val target = new org.apache.hadoop.fs.Path(outDir, s"batch=$batchId")
        val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
        val committed = fs.exists(
          new org.apache.hadoop.fs.Path(target, "_SUCCESS"))
        if (!committed) {
          val fresh = checkWithId.map(_(batch, batchId))
            .getOrElse(check(batch))
            .localCheckpoint(true) // one evaluation feeds the write
          try fresh.write.mode("overwrite").parquet(target.toString)
          finally fresh.unpersist()
        }
        // record from the COMMITTED read-back
        record(
          spark.read.schema(committedSchema(batch.schema))
            .parquet(target.toString))
        // r14 inline self-maintenance: AFTER the record step (so the
        // just-recorded batch counts toward the signals), every
        // `maintenanceEvery` batches. The single-writer assumption the
        // stores already document makes this safe: the appender IS the
        // writer, so running compaction between its own batches can
        // never race an append. A replayed committed batch still
        // reaches here — maintenance is idempotent (signals re-check).
        if (maintenanceEvery > 0 && (batchId + 1) % maintenanceEvery == 0)
          maintain(spark)
        ()
      }
      .start()

  /** Streamed CROSS-RUN NEAR dedup — [[dedupThroughStore]]'s cycle over
    * [[graft.ingest.NearDupStore]]: every micro-batch drops documents
    * that near-duplicate ANY previously recorded document (band-key
    * equi-join + ≥8/16 signature verification), persists survivors
    * exactly-once into `batch=<id>`, and records their banded
    * signatures at-least-once from the committed read-back. Survivor
    * rows keep the input schema unchanged (no hash column is added).
    * Within-micro-batch near-dups are NOT collapsed here — that is the
    * q28/q60 pipeline's job; compose [[streamingContentDedup]] upstream
    * for exact within-stream dups. Same replay matrix as the exact
    * forms: committed batch directories are skipped, so a full-history
    * replay after checkpoint loss is a no-op.
    */
  def nearDedupThroughStore(docs: DataFrame, textCol: String,
      idCol: String, storePath: String, outDir: String,
      checkpointDir: String, maintenanceEvery: Int = 0): StreamingQuery =
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "near_dedup_through_store", committedSchema = identity,
      maintenanceEvery = maintenanceEvery,
      maintain = spark => maintainIfDue(
        graft.ingest.StoreStats.path(spark, storePath),
        { graft.ingest.NearDupStore.compactStore(spark, storePath); () },
        Some(() => { graft.ingest.NearDupStore
          .buildBloomSidecar(spark, storePath); () })))(
      // bloom-aware like the exact/span cycles (r14 closed the family
      // asymmetry — the path-form near store now has a sidecar too)
      batch => graft.ingest.NearDupStore
        .newNearUniqueWithBloom(batch, textCol, idCol, storePath),
      committed => graft.ingest.NearDupStore
        .recordSignatures(committed, textCol, idCol, storePath))

  /** Streamed CROSS-RUN PERCEPTUAL IMAGE dedup — [[dedupThroughStore]]'s
    * cycle keyed on [[graft.multimodal.Multimodal.aHash64]] instead of
    * text: every micro-batch's images decode through the production
    * path, fingerprint to the 64-bit perceptual hash (hex-packed into
    * `__phash`), and the EXACT store machinery runs unchanged on that
    * column — so a re-encoded, block-upscaled, or sub-bit-brightness
    * copy of anything EVER ingested drops, across batches, restarts,
    * and runs, with the store family's whole contract (two-phase
    * crash-safe records, Bloom sidecars, compaction, exactly-once
    * survivors / at-least-once records) inherited rather than rebuilt.
    * Undecodable payloads cannot be fingerprinted and DROP at the gate
    * (the [[graft.multimodal.Multimodal.decodeImages]] posture — audit
    * by anti-joining survivors against the feed). Within-batch copies
    * collapse on the hash (min-id keeper), like the text cycle.
    */
  def imageDedupThroughStore(media: DataFrame, idCol: String,
      storePath: String, outDir: String, checkpointDir: String,
      maintenanceEvery: Int = 0): StreamingQuery =
    mediaDedupThroughStore(media, idCol, storePath, outDir,
      checkpointDir, "image_dedup_through_store", maintenanceEvery)(
      batch => graft.multimodal.Multimodal.aHash64(
        graft.multimodal.Multimodal.decodeImages(batch)))

  /** [[imageDedupThroughStore]]'s audio flank — the same store cycle
    * keyed on [[graft.multimodal.Multimodal.audioHash64]], so a
    * re-encoded or volume-normalized copy of any recording ever
    * ingested drops cross-run (the loudness-invariance the energy-
    * profile hash guarantees).
    */
  def audioDedupThroughStore(media: DataFrame, idCol: String,
      storePath: String, outDir: String, checkpointDir: String,
      maintenanceEvery: Int = 0): StreamingQuery =
    mediaDedupThroughStore(media, idCol, storePath, outDir,
      checkpointDir, "audio_dedup_through_store", maintenanceEvery)(
      batch => graft.multimodal.Multimodal.audioHash64(batch))

  /** The media CURATION FEED — [[curationFeedThroughStores]]'s staging
    * for media columns: every micro-batch fingerprints ONCE (decode +
    * perceptual hash, the expensive step — its band columns ride the
    * row from then on), checks the EXACT store first (byte-identical
    * and perceptually-identical copies collapse on the hex-packed
    * hash), the survivors against the NEAR store
    * ([[graft.ingest.MediaNearStore]]: band candidate join + Hamming
    * ≤ 3 verify — the mildly-retouched/requantized variants whose
    * hash moves a bit or three), and what remains lands exactly-once
    * with BOTH stores recorded at-least-once from the committed
    * read-back's own band columns (no re-decode). Undecodable
    * payloads drop at the fingerprint join. Inline self-maintenance
    * (`maintenanceEvery`) compacts both stores and rebuilds their
    * sidecars on the StoreStats signals, like the text feeds.
    */
  def imageCurationFeedThroughStores(media: DataFrame, idCol: String,
      exactStorePath: String, nearStorePath: String, outDir: String,
      checkpointDir: String, maintenanceEvery: Int = 0): StreamingQuery =
    mediaCurationFeed(media, idCol, exactStorePath, nearStorePath,
      outDir, checkpointDir, "image_curation_feed", maintenanceEvery)(
      batch => graft.multimodal.Multimodal.aHash64(
        graft.multimodal.Multimodal.decodeImages(batch)))

  /** [[imageCurationFeedThroughStores]]'s audio flank (energy-profile
    * hash — loudness-invariant exact stage, Hamming-banded near
    * stage).
    */
  def audioCurationFeedThroughStores(media: DataFrame, idCol: String,
      exactStorePath: String, nearStorePath: String, outDir: String,
      checkpointDir: String, maintenanceEvery: Int = 0): StreamingQuery =
    mediaCurationFeed(media, idCol, exactStorePath, nearStorePath,
      outDir, checkpointDir, "audio_curation_feed", maintenanceEvery)(
      batch => graft.multimodal.Multimodal.audioHash64(batch))

  /** [[imageCurationFeedThroughStores]] with the q129 QUALITY GATE
    * staged FIRST — quality → exact → near, in increasing per-payload
    * cost beyond the shared decode, off ONE
    * [[graft.multimodal.Multimodal.imageProfile]] pass (hash bands and
    * quality facts from a single plane walk — at 100 TB the decode is
    * the cost and must not run per stage). Gate rejects drop before
    * any store probe and are never recorded (the
    * [[qualityGatedCurationFeed]] posture: rejects are not "seen"; a
    * later resubmission under relaxed thresholds is judged afresh).
    * Thresholds default to q129's.
    */
  def imageCurationFeedGated(media: DataFrame, idCol: String,
      exactStorePath: String, nearStorePath: String, outDir: String,
      checkpointDir: String, maintenanceEvery: Int = 0,
      minDim: Int = 8, maxAspectFp: Long = 4000000L,
      minBrightFp: Long = 100000L, maxBrightFp: Long = 900000L,
      minDistinct: Long = 16L): StreamingQuery =
    mediaCurationFeed(media, idCol, exactStorePath, nearStorePath,
      outDir, checkpointDir, "image_curation_feed_gated",
      maintenanceEvery,
      gate = imageQualityGate(minDim, maxAspectFp, minBrightFp,
        maxBrightFp, minDistinct))(
      batch => graft.multimodal.Multimodal.imageProfile(
        graft.multimodal.Multimodal.decodeImages(batch)))

  /** The q129 rule as a batch gate over an `imageProfile`d frame —
    * ONE definition for the path and bucketed gated feeds.
    */
  private def imageQualityGate(minDim: Int, maxAspectFp: Long,
      minBrightFp: Long, maxBrightFp: Long,
      minDistinct: Long): DataFrame => DataFrame =
    df => df.filter(
        least(col("width"), col("height")) >= minDim &&
          expr("(greatest(width, height) * 1000000L) div " +
            "least(width, height)") <= maxAspectFp &&
          expr("(px_sum * 1000000L) div (255L * width * height)")
            .between(minBrightFp, maxBrightFp) &&
          col("n_distinct") >= minDistinct)
      .drop("width", "height", "px_sum", "n_distinct")

  /** The q130 rule as a batch gate over an `audioProfile`d frame. */
  private def audioQualityGate(minDurationMs: Long, maxClipFp: Long,
      minMeanEnergy: Long): DataFrame => DataFrame =
    df => df.filter(
        expr("(n_samples * 1000L) div sample_rate") >= minDurationMs &&
          expr("(n_clipped * 1000000L) div n_samples") <= maxClipFp &&
          expr("energy div n_samples") >= minMeanEnergy)
      .drop("sample_rate", "n_samples", "n_clipped", "energy")

  /** [[imageCurationFeedGated]]'s audio flank — q130's gate (duration,
    * clip ratio, silence floor) staged before the exact/near stores,
    * off one [[graft.multimodal.Multimodal.audioProfile]] PCM walk.
    */
  def audioCurationFeedGated(media: DataFrame, idCol: String,
      exactStorePath: String, nearStorePath: String, outDir: String,
      checkpointDir: String, maintenanceEvery: Int = 0,
      minDurationMs: Long = 100L, maxClipFp: Long = 10000L,
      minMeanEnergy: Long = 10000L): StreamingQuery =
    mediaCurationFeed(media, idCol, exactStorePath, nearStorePath,
      outDir, checkpointDir, "audio_curation_feed_gated",
      maintenanceEvery,
      gate = audioQualityGate(minDurationMs, maxClipFp,
        minMeanEnergy))(
      batch => graft.multimodal.Multimodal.audioProfile(batch))

  /** [[imageCurationFeedGated]] against BUCKETED catalog tables —
    * the quality → exact → near staging (one fused decode) with both
    * stores' probes planning zero store-side exchanges; the gated
    * matrix closed along the store-form axis. Gate semantics are
    * [[imageCurationFeedGated]]'s verbatim (shared definition):
    * rejects drop before any store probe and are never recorded.
    */
  def imageCurationFeedGatedBucketed(media: DataFrame, idCol: String,
      exactTable: String, nearTable: String, outDir: String,
      checkpointDir: String, buckets: Int = 32,
      maintenanceEvery: Int = 0, minDim: Int = 8,
      maxAspectFp: Long = 4000000L, minBrightFp: Long = 100000L,
      maxBrightFp: Long = 900000L,
      minDistinct: Long = 16L): StreamingQuery =
    mediaCurationFeedBucketed(media, idCol, exactTable, nearTable,
      outDir, checkpointDir, "image_curation_feed_gated_bucketed",
      buckets, maintenanceEvery,
      gate = imageQualityGate(minDim, maxAspectFp, minBrightFp,
        maxBrightFp, minDistinct))(
      batch => graft.multimodal.Multimodal.imageProfile(
        graft.multimodal.Multimodal.decodeImages(batch)))

  /** [[imageCurationFeedGatedBucketed]]'s audio flank. */
  def audioCurationFeedGatedBucketed(media: DataFrame, idCol: String,
      exactTable: String, nearTable: String, outDir: String,
      checkpointDir: String, buckets: Int = 32,
      maintenanceEvery: Int = 0, minDurationMs: Long = 100L,
      maxClipFp: Long = 10000L,
      minMeanEnergy: Long = 10000L): StreamingQuery =
    mediaCurationFeedBucketed(media, idCol, exactTable, nearTable,
      outDir, checkpointDir, "audio_curation_feed_gated_bucketed",
      buckets, maintenanceEvery,
      gate = audioQualityGate(minDurationMs, maxClipFp,
        minMeanEnergy))(
      batch => graft.multimodal.Multimodal.audioProfile(batch))

  private def mediaCurationFeed(media: DataFrame, idCol: String,
      exactStorePath: String, nearStorePath: String, outDir: String,
      checkpointDir: String, queryName: String, maintenanceEvery: Int,
      gate: DataFrame => DataFrame = identity)(
      hashOf: DataFrame => DataFrame): StreamingQuery = {
    val it = org.apache.spark.sql.types.IntegerType
    dedupThroughStoreWith(media, "__phash", outDir, checkpointDir,
      queryName,
      committedSchema = _
        .add("band0", it).add("band1", it).add("band2", it)
        .add("band3", it)
        .add("__phash", org.apache.spark.sql.types.StringType)
        .add("content_hash", org.apache.spark.sql.types.StringType),
      maintenanceEvery = maintenanceEvery,
      maintain = spark => {
        maintainIfDue(
          graft.ingest.StoreStats.path(spark, exactStorePath),
          { graft.ingest.DedupStore
            .compactStore(spark, exactStorePath); () },
          Some(() => { graft.ingest.DedupStore
            .buildBloomSidecar(spark, exactStorePath); () }))
        maintainIfDue(
          graft.ingest.StoreStats.path(spark, nearStorePath),
          { graft.ingest.MediaNearStore
            .compactStore(spark, nearStorePath); () },
          Some(() => { graft.ingest.MediaNearStore
            .buildBloomSidecar(spark, nearStorePath); () }))
      })(
      batch => {
        val hs = hashOf(batch
            .select(col(idCol).as("media_id"), col("content")))
          .withColumnRenamed("media_id", "__hid")
          .withColumn("__phash",
            concat(lpad(hex(col("band3")), 4, "0"),
              lpad(hex(col("band2")), 4, "0"),
              lpad(hex(col("band1")), 4, "0"),
              lpad(hex(col("band0")), 4, "0")))
        val withBands = gate(
          batch.join(hs, batch(idCol) <=> hs("__hid")).drop("__hid"))
        val exactSurvivors = graft.ingest.DedupStore
          .newUniqueWithBloom(withBands, "__phash", idCol,
            exactStorePath)
        graft.ingest.MediaNearStore.newNearUniqueWithBloom(
          exactSurvivors, idCol,
          exactSurvivors.select(col(idCol).as("media_id"),
            col("band0"), col("band1"), col("band2"), col("band3")),
          nearStorePath)
      },
      committed => {
        graft.ingest.DedupStore
          .recordHashes(committed, "__phash", exactStorePath)
        graft.ingest.MediaNearStore.recordHashes(
          committed.select(col(idCol).as("media_id"), col("band0"),
            col("band1"), col("band2"), col("band3")), nearStorePath)
      })
  }

  /** [[imageCurationFeedThroughStores]] against BUCKETED catalog
    * tables — the year-of-recording form for media: the exact probe's
    * anti-join and the near store's band candidate join both plan
    * zero exchanges on their ever-growing store sides (`__phash` and
    * `band_key` as the at-rest bucket keys, LayoutSpec-pinned), both
    * bloom-aware; same one-decode staging and replay matrix as the
    * path form.
    */
  def imageCurationFeedThroughBucketedStores(media: DataFrame,
      idCol: String, exactTable: String, nearTable: String,
      outDir: String, checkpointDir: String, buckets: Int = 32,
      maintenanceEvery: Int = 0): StreamingQuery =
    mediaCurationFeedBucketed(media, idCol, exactTable, nearTable,
      outDir, checkpointDir, "image_curation_feed_bucketed", buckets,
      maintenanceEvery)(
      batch => graft.multimodal.Multimodal.aHash64(
        graft.multimodal.Multimodal.decodeImages(batch)))

  /** [[imageCurationFeedThroughBucketedStores]]'s audio flank. */
  def audioCurationFeedThroughBucketedStores(media: DataFrame,
      idCol: String, exactTable: String, nearTable: String,
      outDir: String, checkpointDir: String, buckets: Int = 32,
      maintenanceEvery: Int = 0): StreamingQuery =
    mediaCurationFeedBucketed(media, idCol, exactTable, nearTable,
      outDir, checkpointDir, "audio_curation_feed_bucketed", buckets,
      maintenanceEvery)(
      batch => graft.multimodal.Multimodal.audioHash64(batch))

  /** [[mediaCurationFeed]] with both stores as bucketed catalog
    * tables — probes, records, sidecars, compaction, and the inline
    * maintenance signals all through the bucketed forms; the
    * fingerprint staging (one decode, hex-packed `__phash`, band
    * columns riding the row) is the path form's, verbatim.
    */
  /** Streamed CROSS-RUN PERCEPTUAL NEAR dedup for images —
    * [[nearDedupThroughStore]]'s cycle over
    * [[graft.ingest.MediaNearStore]]: every micro-batch fingerprints
    * ONCE, drops images within Hamming ≤ 3 of ANY previously recorded
    * hash (band candidate join + exact bitwise verify), persists
    * survivors exactly-once, and records their bands at-least-once
    * from the committed read-back's own hash columns (no re-decode).
    * The near-only flank of the staged feeds — for pipelines that run
    * their exact stage elsewhere. Undecodable payloads cannot be
    * fingerprinted and DROP at the fingerprint join (the staged
    * feeds' posture — audit by anti-joining survivors).
    */
  def imageNearDedupThroughStore(media: DataFrame, idCol: String,
      storePath: String, outDir: String, checkpointDir: String,
      maintenanceEvery: Int = 0): StreamingQuery =
    mediaNearDedupThroughStore(media, idCol, storePath, outDir,
      checkpointDir, "image_near_dedup_through_store",
      maintenanceEvery)(
      batch => graft.multimodal.Multimodal.aHash64(
        graft.multimodal.Multimodal.decodeImages(batch)))

  /** [[imageNearDedupThroughStore]]'s audio flank (energy-profile
    * hash — loudness-invariant).
    */
  def audioNearDedupThroughStore(media: DataFrame, idCol: String,
      storePath: String, outDir: String, checkpointDir: String,
      maintenanceEvery: Int = 0): StreamingQuery =
    mediaNearDedupThroughStore(media, idCol, storePath, outDir,
      checkpointDir, "audio_near_dedup_through_store",
      maintenanceEvery)(
      batch => graft.multimodal.Multimodal.audioHash64(batch))

  /** [[imageNearDedupThroughStore]]'s VIDEO flank — the container-
    * derived size-profile fingerprint
    * ([[graft.multimodal.Multimodal.videoHash64]]: a KB-scale stsz box
    * walk, NO bitstream decode), so a re-muxed or re-stamped copy of
    * an already-ingested clip — byte-different container, identical
    * sample table — is dropped cross-run exactly like a re-encoded
    * image or re-mastered recording (StreamingSpec plants one). This
    * closes the media near-dup matrix's video hole; only bitstream-
    * level perceptual hashing remains behind the external-decoder
    * boundary.
    */
  def videoNearDedupThroughStore(media: DataFrame, idCol: String,
      storePath: String, outDir: String, checkpointDir: String,
      maintenanceEvery: Int = 0): StreamingQuery =
    mediaNearDedupThroughStore(media, idCol, storePath, outDir,
      checkpointDir, "video_near_dedup_through_store",
      maintenanceEvery)(
      batch => graft.multimodal.Multimodal.videoHash64(batch))

  private def mediaNearDedupThroughStore(media: DataFrame,
      idCol: String, storePath: String, outDir: String,
      checkpointDir: String, queryName: String, maintenanceEvery: Int)(
      hashOf: DataFrame => DataFrame): StreamingQuery = {
    val it = org.apache.spark.sql.types.IntegerType
    dedupThroughStoreWith(media, idCol, outDir, checkpointDir,
      queryName,
      committedSchema = _
        .add("band0", it).add("band1", it).add("band2", it)
        .add("band3", it),
      maintenanceEvery = maintenanceEvery,
      maintain = spark => maintainIfDue(
        graft.ingest.StoreStats.path(spark, storePath),
        { graft.ingest.MediaNearStore
          .compactStore(spark, storePath); () },
        Some(() => { graft.ingest.MediaNearStore
          .buildBloomSidecar(spark, storePath); () })))(
      batch => {
        val hs = hashOf(batch
            .select(col(idCol).as("media_id"), col("content")))
          .withColumnRenamed("media_id", "__hid")
        val withBands =
          batch.join(hs, batch(idCol) <=> col("__hid")).drop("__hid")
        graft.ingest.MediaNearStore.newNearUniqueWithBloom(
          withBands, idCol,
          withBands.select(col(idCol).as("media_id"), col("band0"),
            col("band1"), col("band2"), col("band3")), storePath)
      },
      committed => graft.ingest.MediaNearStore.recordHashes(
        committed.select(col(idCol).as("media_id"), col("band0"),
          col("band1"), col("band2"), col("band3")), storePath))
  }

  /** The VIDEO curation feed — the modality's staged form now that
    * container metadata is REAL (q131/q132): the q132 quality gate
    * FIRST (one KB-scale ISO BMFF walk per payload — unparseable,
    * too-short, absurd-duration, tiny, extreme-aspect containers drop
    * before anything else), then the EXACT content store (md5 of the
    * payload bytes hex-packed into `__vhash` — byte-identical
    * re-uploads collapse cross-run with the store family's whole
    * contract). No perceptual NEAR stage: without bitstream decode
    * there is no plane to hash — the documented external-decoder
    * boundary; a deployment with a decoder slots
    * [[graft.ingest.MediaNearStore]] here exactly as the image feed
    * does. Gate rejects drop before the store probe and are never
    * recorded (the gated-feed posture: a resubmission under relaxed
    * thresholds is judged afresh).
    */
  def videoCurationFeedGated(media: DataFrame, idCol: String,
      storePath: String, outDir: String, checkpointDir: String,
      maintenanceEvery: Int = 0, minDurationMs: Long = 1000L,
      maxDurationMs: Long = 14400000L, minDim: Int = 64,
      maxAspectFp: Long = 4000000L): StreamingQuery =
    dedupThroughStoreWith(media, "__vhash", outDir, checkpointDir,
      "video_curation_feed_gated",
      committedSchema = _
        .add("__vhash", org.apache.spark.sql.types.StringType)
        .add("content_hash", org.apache.spark.sql.types.StringType),
      maintenanceEvery = maintenanceEvery,
      maintain = spark => maintainIfDue(
        graft.ingest.StoreStats.path(spark, storePath),
        { graft.ingest.DedupStore.compactStore(spark, storePath); () },
        Some(() => { graft.ingest.DedupStore
          .buildBloomSidecar(spark, storePath); () })))(
      batch => {
        val meta = graft.multimodal.Multimodal
          .parseVideoMeta(batch
            .select(col(idCol).as("media_id"), col("content")))
          .toDF()
          .withColumnRenamed("media_id", "__mid")
        val gated = batch
          .join(meta, batch(idCol) <=> col("__mid"))
          // the q132 rule; aspect guarded against poisoned/zero dims
          // (ANSI division) exactly like the registry query
          .withColumn("__aspect_fp",
            when(col("width") > 0 && col("height") > 0,
              expr("(greatest(width, height) * 1000000L) div " +
                "least(width, height)")).otherwise(lit(-1L)))
          .filter(col("timescale") > 0 &&
            col("duration_ms").between(minDurationMs, maxDurationMs) &&
            least(col("width"), col("height")) >= minDim &&
            col("__aspect_fp").between(0L, maxAspectFp))
          .drop("__mid", "timescale", "duration", "duration_ms",
            "width", "height", "__aspect_fp")
          .withColumn("__vhash", md5(col("content")))
        graft.ingest.DedupStore.newUniqueWithBloom(gated, "__vhash",
          idCol, storePath)
      },
      committed => graft.ingest.DedupStore
        .recordHashes(committed, "__vhash", storePath))

  /** The q132 rule as a batch gate over a `videoProfile`d frame — ONE
    * definition for the path and bucketed staged video feeds.
    * Unparseable containers never reach the gate (the profile kernel
    * drops them), so only the threshold legs live here.
    */
  private def videoQualityGate(minDurationMs: Long, maxDurationMs: Long,
      minDim: Int, maxAspectFp: Long): DataFrame => DataFrame =
    df => df
      // aspect guarded against poisoned/zero dims (ANSI division)
      // exactly like the registry query and the byte-exact feed — an
      // audio-only track's tkhd carries width = height = 0, and a
      // reordered conjunct must never divide by it
      .withColumn("__aspect_fp",
        when(col("width") > 0 && col("height") > 0,
          expr("(greatest(width, height) * 1000000L) div " +
            "least(width, height)")).otherwise(lit(-1L)))
      .filter(
        col("duration_ms").between(minDurationMs, maxDurationMs) &&
          least(col("width"), col("height")) >= minDim &&
          col("__aspect_fp").between(0L, maxAspectFp))
      .drop("timescale", "duration_ms", "width", "height", "__aspect_fp")

  /** The staged VIDEO curation feed with a real NEAR stage — the
    * [[imageCurationFeedGated]] shape on the video pillar, now that
    * the container-derived fingerprint exists: quality gate (q132's
    * metadata rule) → EXACT store (the hex-packed size-profile hash —
    * byte-identical re-uploads AND re-muxed copies collapse) → NEAR
    * store (banded Hamming ≤ 3 — the re-edited cut whose profile
    * moved a bit or three), all off ONE
    * [[graft.multimodal.Multimodal.videoProfile]] pass (two KB-scale
    * box walks per payload; no bitstream is ever decoded — the feed
    * prices a 100 TB crawl's video column at container-walk cost).
    * [[videoCurationFeedGated]] remains the byte-exact form for
    * deployments that want md5-of-payload semantics.
    */
  def videoCurationFeedGatedNear(media: DataFrame, idCol: String,
      exactStorePath: String, nearStorePath: String, outDir: String,
      checkpointDir: String, maintenanceEvery: Int = 0,
      minDurationMs: Long = 1000L, maxDurationMs: Long = 14400000L,
      minDim: Int = 64, maxAspectFp: Long = 4000000L): StreamingQuery =
    mediaCurationFeed(media, idCol, exactStorePath, nearStorePath,
      outDir, checkpointDir, "video_curation_feed_gated_near",
      maintenanceEvery,
      gate = videoQualityGate(minDurationMs, maxDurationMs, minDim,
        maxAspectFp))(
      batch => graft.multimodal.Multimodal.videoProfile(batch))

  /** [[videoCurationFeedGatedNear]] against BUCKETED catalog tables —
    * the video column of the gated bucketed matrix (zero store-side
    * exchanges on both probes, the image/audio flanks' posture).
    */
  def videoCurationFeedGatedNearBucketed(media: DataFrame,
      idCol: String, exactTable: String, nearTable: String,
      outDir: String, checkpointDir: String, buckets: Int = 32,
      maintenanceEvery: Int = 0, minDurationMs: Long = 1000L,
      maxDurationMs: Long = 14400000L, minDim: Int = 64,
      maxAspectFp: Long = 4000000L): StreamingQuery =
    mediaCurationFeedBucketed(media, idCol, exactTable, nearTable,
      outDir, checkpointDir, "video_curation_feed_gated_near_bucketed",
      buckets, maintenanceEvery,
      gate = videoQualityGate(minDurationMs, maxDurationMs, minDim,
        maxAspectFp))(
      batch => graft.multimodal.Multimodal.videoProfile(batch))

  private def mediaCurationFeedBucketed(media: DataFrame, idCol: String,
      exactTable: String, nearTable: String, outDir: String,
      checkpointDir: String, queryName: String, buckets: Int,
      maintenanceEvery: Int,
      gate: DataFrame => DataFrame = identity)(
      hashOf: DataFrame => DataFrame): StreamingQuery = {
    val spark = media.sparkSession
    graft.ingest.DedupStore.ensureBucketedStore(spark, exactTable,
      buckets)
    graft.ingest.MediaNearStore.ensureBucketedStore(spark, nearTable,
      buckets)
    val it = org.apache.spark.sql.types.IntegerType
    dedupThroughStoreWith(media, "__phash", outDir, checkpointDir,
      queryName,
      committedSchema = _
        .add("band0", it).add("band1", it).add("band2", it)
        .add("band3", it)
        .add("__phash", org.apache.spark.sql.types.StringType)
        .add("content_hash", org.apache.spark.sql.types.StringType),
      maintenanceEvery = maintenanceEvery,
      maintain = s2 => {
        maintainIfDue(
          graft.ingest.StoreStats.bucketed(s2, exactTable),
          { graft.ingest.DedupStore
            .compactBucketedStore(s2, exactTable); () },
          Some(() => { graft.ingest.DedupStore
            .buildBloomSidecarBucketed(s2, exactTable); () }))
        maintainIfDue(
          graft.ingest.StoreStats.bucketed(s2, nearTable),
          { graft.ingest.MediaNearStore
            .compactBucketedStore(s2, nearTable); () },
          Some(() => { graft.ingest.MediaNearStore
            .buildBloomSidecarBucketed(s2, nearTable); () }))
      })(
      batch => {
        val hs = hashOf(batch
            .select(col(idCol).as("media_id"), col("content")))
          .withColumnRenamed("media_id", "__hid")
          .withColumn("__phash",
            concat(lpad(hex(col("band3")), 4, "0"),
              lpad(hex(col("band2")), 4, "0"),
              lpad(hex(col("band1")), 4, "0"),
              lpad(hex(col("band0")), 4, "0")))
        val withBands = gate(
          batch.join(hs, batch(idCol) <=> hs("__hid")).drop("__hid"))
        val exactSurvivors = graft.ingest.DedupStore
          .newUniqueBucketedWithBloom(withBands, "__phash", idCol,
            exactTable)
        graft.ingest.MediaNearStore.newNearUniqueBucketedWithBloom(
          exactSurvivors, idCol,
          exactSurvivors.select(col(idCol).as("media_id"),
            col("band0"), col("band1"), col("band2"), col("band3")),
          nearTable)
      },
      committed => {
        graft.ingest.DedupStore
          .recordHashesBucketed(committed, "__phash", exactTable)
        graft.ingest.MediaNearStore.recordHashesBucketed(
          committed.select(col(idCol).as("media_id"), col("band0"),
            col("band1"), col("band2"), col("band3")), nearTable)
      })
  }

  /** The shared media cycle: fingerprint the batch with `hashOf`
    * ((media_id, content) → (media_id, band0..band3)), hex-pack the
    * bands into `__phash` (band3 high — the canonical 16-hex-digit
    * spelling), and run the exact-store dedup cycle on that column.
    * The store is hash-agnostic by design: `__phash` plays the text
    * role, so probes, records, sidecars, and compaction are the
    * SAME code paths IngestSpec already laws.
    */
  private def mediaDedupThroughStore(media: DataFrame, idCol: String,
      storePath: String, outDir: String, checkpointDir: String,
      queryName: String, maintenanceEvery: Int)(
      hashOf: DataFrame => DataFrame): StreamingQuery =
    dedupThroughStoreWith(media, "__phash", outDir, checkpointDir,
      queryName,
      committedSchema = _
        .add("__phash", org.apache.spark.sql.types.StringType)
        .add("content_hash", org.apache.spark.sql.types.StringType),
      maintenanceEvery = maintenanceEvery,
      maintain = spark => maintainIfDue(
        graft.ingest.StoreStats.path(spark, storePath),
        { graft.ingest.DedupStore.compactStore(spark, storePath); () },
        Some(() => { graft.ingest.DedupStore
          .buildBloomSidecar(spark, storePath); () })))(
      batch => {
        val hs = hashOf(batch
            .select(col(idCol).as("media_id"), col("content")))
          .select(col("media_id").as("__hid"),
            concat(lpad(hex(col("band3")), 4, "0"),
              lpad(hex(col("band2")), 4, "0"),
              lpad(hex(col("band1")), 4, "0"),
              lpad(hex(col("band0")), 4, "0")).as("__phash"))
        graft.ingest.DedupStore.newUniqueWithBloom(
          batch.join(hs, batch(idCol) <=> hs("__hid")).drop("__hid"),
          "__phash", idCol, storePath)
      },
      committed => graft.ingest.DedupStore
        .recordHashes(committed, "__phash", storePath))

  /** Streamed CROSS-RUN SPAN dedup — the cycle over
    * [[graft.ingest.SpanStore]]: every micro-batch drops documents
    * whose recycled-text share against ANY previously recorded text
    * reaches `maxDupShare` (the passage-mashup case the exact and near
    * cycles both miss), persists survivors exactly-once into
    * `batch=<id>`, and records their window hashes at-least-once from
    * the committed read-back. Same replay matrix as the sibling
    * cycles: committed batch directories are skipped, so full-history
    * replay after checkpoint loss is a no-op.
    */
  def spanDedupThroughStore(docs: DataFrame, textCol: String,
      idCol: String, storePath: String, outDir: String,
      checkpointDir: String, maxDupShare: Double = 0.5,
      maintenanceEvery: Int = 0): StreamingQuery =
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "span_dedup_through_store", committedSchema = identity,
      maintenanceEvery = maintenanceEvery,
      maintain = spark => maintainIfDue(
        graft.ingest.StoreStats.path(spark, storePath),
        { graft.ingest.SpanStore.compactStore(spark, storePath); () },
        Some(() => { graft.ingest.SpanStore
          .buildBloomSidecar(spark, storePath); () })))(
      // bloom-aware for the same reason as dedupThroughStore: identical
      // answers with no sidecar, and micro-batches skip the store
      // history once an operator builds one (SpanStore.buildBloomSidecar
      // on the compaction schedule — this store is the family's largest)
      batch => graft.ingest.SpanStore
        .newSpanUniqueWithBloom(batch, textCol, idCol, storePath,
          maxDupShare),
      committed => graft.ingest.SpanStore
        .recordWindows(committed, textCol, idCol, storePath))

  /** Streamed CROSS-RUN CDC-chunk dedup — [[spanDedupThroughStore]]'s
    * cycle over [[graft.ingest.CdcChunkStore]]: every micro-batch drops
    * documents whose content-defined-chunk recycled share vs ALL
    * history reaches `maxDupShare`, persists survivors exactly-once
    * into `batch=<id>`, and records their chunk hashes at-least-once
    * from the committed read-back. The insertion-robust streaming form:
    * an edited re-submission of recorded text still matches history
    * chunk-for-chunk past the edit (where the fixed-window span store
    * pays ~1 row per character for the same robustness, this store pays
    * ~1 per 16 tokens). Same replay matrix as the family: committed
    * batch directories are skipped, so a full-history replay after
    * checkpoint loss is a no-op.
    */
  def cdcChunkDedupThroughStore(docs: DataFrame, textCol: String,
      idCol: String, storePath: String, outDir: String,
      checkpointDir: String, maxDupShare: Double = 0.5,
      maintenanceEvery: Int = 0): StreamingQuery =
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "cdc_chunk_dedup_through_store", committedSchema = identity,
      maintenanceEvery = maintenanceEvery,
      maintain = spark => maintainIfDue(
        graft.ingest.StoreStats.path(spark, storePath),
        { graft.ingest.CdcChunkStore.compactStore(spark, storePath); () },
        Some(() => { graft.ingest.CdcChunkStore
          .buildBloomSidecar(spark, storePath); () })))(
      batch => graft.ingest.CdcChunkStore
        .newChunkUniqueWithBloom(batch, textCol, idCol, storePath,
          maxDupShare),
      committed => graft.ingest.CdcChunkStore
        .recordChunks(committed, textCol, idCol, storePath))

  /** [[cdcChunkDedupThroughStore]] against the BUCKETED chunk-store
    * table — identical delivery semantics; the per-micro-batch chunk
    * semi-join plans zero exchanges on the ever-growing chunk history.
    * Bloom-aware like the siblings.
    */
  def cdcChunkDedupThroughBucketedStore(docs: DataFrame, textCol: String,
      idCol: String, table: String, outDir: String,
      checkpointDir: String, maxDupShare: Double = 0.5,
      buckets: Int = 32, maintenanceEvery: Int = 0): StreamingQuery = {
    graft.ingest.CdcChunkStore.ensureBucketedStore(
      docs.sparkSession, table, buckets)
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "cdc_chunk_dedup_through_bucketed_store", committedSchema = identity,
      maintenanceEvery = maintenanceEvery,
      maintain = spark => maintainIfDue(
        graft.ingest.StoreStats.bucketed(spark, table),
        { graft.ingest.CdcChunkStore.compactBucketedStore(spark, table)
          () },
        Some(() => { graft.ingest.CdcChunkStore
          .buildBloomSidecarBucketed(spark, table); () })))(
      batch => graft.ingest.CdcChunkStore
        .newChunkUniqueBucketedWithBloom(batch, textCol, idCol, table,
          maxDupShare),
      committed => graft.ingest.CdcChunkStore
        .recordChunksBucketed(committed, textCol, idCol, table))
  }

  /** [[nearDedupThroughStore]] against the BUCKETED band-store table —
    * identical delivery semantics; the per-micro-batch band candidate
    * join plans zero exchanges on the ever-growing signature history.
    * Bloom-aware like the siblings.
    */
  def nearDedupThroughBucketedStore(docs: DataFrame, textCol: String,
      idCol: String, table: String, outDir: String,
      checkpointDir: String, buckets: Int = 32,
      maintenanceEvery: Int = 0): StreamingQuery = {
    graft.ingest.NearDupStore.ensureBucketedStore(
      docs.sparkSession, table, buckets)
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "near_dedup_through_bucketed_store", committedSchema = identity,
      maintenanceEvery = maintenanceEvery,
      maintain = spark => maintainIfDue(
        graft.ingest.StoreStats.bucketed(spark, table),
        { graft.ingest.NearDupStore.compactBucketedStore(spark, table); () },
        Some(() => { graft.ingest.NearDupStore
          .buildBloomSidecarBucketed(spark, table); () })))(
      batch => graft.ingest.NearDupStore
        .newNearUniqueBucketedWithBloom(batch, textCol, idCol, table),
      committed => graft.ingest.NearDupStore
        .recordSignaturesBucketed(committed, textCol, idCol, table))
  }

  /** [[spanDedupThroughStore]] against the BUCKETED span-store table —
    * identical delivery semantics; the per-micro-batch window semi-join
    * plans zero exchanges on the ever-growing store side (the form that
    * holds up when the stream has been recording for a year). Bloom-
    * aware like the siblings; the in-table sidecar retires with
    * compaction's swap.
    */
  def spanDedupThroughBucketedStore(docs: DataFrame, textCol: String,
      idCol: String, table: String, outDir: String,
      checkpointDir: String, maxDupShare: Double = 0.5,
      buckets: Int = 32, maintenanceEvery: Int = 0): StreamingQuery = {
    graft.ingest.SpanStore.ensureBucketedStore(
      docs.sparkSession, table, buckets)
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "span_dedup_through_bucketed_store", committedSchema = identity,
      maintenanceEvery = maintenanceEvery,
      maintain = spark => maintainIfDue(
        graft.ingest.StoreStats.bucketed(spark, table),
        { graft.ingest.SpanStore.compactBucketedStore(spark, table); () },
        Some(() => { graft.ingest.SpanStore
          .buildBloomSidecarBucketed(spark, table); () })))(
      batch => graft.ingest.SpanStore
        .newSpanUniqueBucketedWithBloom(batch, textCol, idCol, table,
          maxDupShare),
      committed => graft.ingest.SpanStore
        .recordWindowsBucketed(committed, textCol, idCol, table))
  }

  /** Stream-stream interval join — the streaming form of the q23 as-of
    * attribution: each purchase joins signups of the same user within
    * the preceding `lookback`. Both sides carry watermarks and the join
    * condition bounds event time on BOTH ends, so Spark can age out
    * buffered state (unbounded stream-stream joins otherwise buffer
    * forever). Expects `left` with (user_id, ts, …) and `right` with
    * (user_id, ts, …); right columns come back `r_`-prefixed.
    */
  def intervalJoinStreams(left: DataFrame, right: DataFrame,
      lookback: String = "1 hour",
      watermarkDelay: String = "10 minutes"): DataFrame = {
    val l = left.withWatermark("ts", watermarkDelay)
    val r0 = right.columns.foldLeft(right) { (df, c) =>
      df.withColumnRenamed(c, s"r_$c")
    }
    val r = r0.withWatermark("r_ts", watermarkDelay)
    l.join(r, expr(
      s"user_id = r_user_id AND " +
        s"r_ts BETWEEN ts - INTERVAL $lookback AND ts"))
      .drop("r_user_id")
  }

  /** Stream-static dimension enrichment — the streaming form of the
    * fact⋈dim star join the reference's FK indexes exist for
    * (init-db/init.sql:58-59): every micro-batch of the fact stream
    * joins the static dimension snapshot. The dimension side is
    * stateless (re-planned per batch, so a refreshed dim path is picked
    * up on restart) and explicitly broadcast — per-batch join work is
    * map-side only, no shuffle of the stream and NO streaming state at
    * all (unlike a stream-stream join there is nothing to buffer).
    * Inner by default; left_outer keeps unmatched facts (the streaming
    * analog of the O10 orphan check routing them onward with null dim
    * columns instead of failing the batch).
    */
  def enrichStream(facts: DataFrame, dim: DataFrame, key: String,
      joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left_outer").contains(joinType),
      s"enrichStream: unsupported join type $joinType")
    facts.join(broadcast(dim), Seq(key), joinType)
  }

  /** Event-time tumbling-window aggregation with a watermark (SURVEY.md
    * §2.3 streaming commitment). Pure: in a streaming query the watermark
    * bounds state and admits late data up to `watermarkDelay`; in a batch
    * query `withWatermark` is a documented no-op and the result is
    * oracle-checkable (q38). total_value sums as DECIMAL then casts to
    * double so the result is order-independent (cross-engine exact).
    */
  /** Input/output rows for stateful sessionization. */
  final case class SessionEvent(user_id: Long, event_id: Long,
      ts: java.sql.Timestamp)
  final case class SessionAgg(startMs: Long, endMs: Long, n: Long)
  final case class UserSession(user_id: Long,
      session_start: java.sql.Timestamp, session_end: java.sql.Timestamp,
      n_events: Long)

  /** Gap-based sessionization with CUSTOM state —
    * `flatMapGroupsWithState` over per-user `GroupState` (the stateful
    * operator the windowed-agg API can't express: sessions have dynamic,
    * data-dependent extents). A session closes when the next event is
    * > `gapSec` after the last, or when the event-time watermark passes
    * the open session's end + gap (EventTimeTimeout) — so state is
    * bounded: one small SessionAgg per ACTIVE user, aged out by the
    * watermark, never a growing buffer of events. Batch q22 computes the
    * same sessions via lag/sum windows; this is the streaming form.
    */
  def sessionizeStream(events: Dataset[SessionEvent], gapSec: Long,
      watermarkDelay: String = "10 minutes"): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapSec * 1000L

    def close(userId: Long, s: SessionAgg): UserSession =
      UserSession(userId, new java.sql.Timestamp(s.startMs),
        new java.sql.Timestamp(s.endMs), s.n)

    def fn(userId: Long, it: Iterator[SessionEvent],
        state: GroupState[SessionAgg]): Iterator[UserSession] = {
      if (state.hasTimedOut) {
        val out = Iterator(close(userId, state.get))
        state.remove()
        out
      } else {
        // Micro-batch delivery order is arbitrary: establish event time.
        val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
        var cur = state.getOption
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur = cur match {
            case Some(s) if t - s.endMs <= gapMs =>
              Some(SessionAgg(s.startMs, math.max(s.endMs, t), s.n + 1))
            case Some(s) =>
              out += close(userId, s)
              Some(SessionAgg(t, t, 1))
            case None => Some(SessionAgg(t, t, 1))
          }
        }
        cur.foreach { s =>
          state.update(s)
          state.setTimeoutTimestamp(s.endMs + gapMs)
        }
        out.iterator
      }
    }

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Input/output rows for the stateful streamed funnel. */
  final case class FunnelEvent(user_id: Long, event_type: String,
      ts: java.sql.Timestamp)
  final case class FunnelAgg(anchors: Seq[Long], buf: Seq[(String, Long)],
      lastMs: Long)
  final case class FunnelProgress(user_id: Long, reached: Long,
      anchors: Seq[java.sql.Timestamp])

  /** Streamed conversion FUNNEL — q134's windowed min-chain as custom
    * per-user `flatMapGroupsWithState` state, emitted when the user
    * goes quiet (`quietSec` of event time, aged by the watermark).
    * The chain is NOT cell-wise mergeable — an earlier step-1 event
    * arriving late can shift the window and invalidate an already-
    * chosen step-2 anchor — so per-batch snapshot merging (the sketch
    * loop) would be WRONG here; instead events BUFFER in state until
    * the watermark passes them (no earlier event can then arrive), at
    * which point they fold irreversibly into the anchor chain in
    * ascending event-time order (greedy first-qualifying ≡ the batch
    * min-chain) and leave the buffer. State per user is therefore
    * bounded by the watermark delay — anchors (≤ steps) + only the
    * not-yet-final events — never the user's history. Same contract
    * as [[sessionizeStream]]: events later than the watermark delay
    * are dropped by the watermark operator; a user who returns after
    * their timeout starts a fresh chain (append-mode, no retraction).
    * With every event inside the delay, the emitted anchors are
    * EXACTLY the batch q134 chain — the StreamingSpec parity law.
    */
  def funnelStream(events: Dataset[FunnelEvent], steps: Seq[String],
      windowSec: Long = 86400L, quietSec: Long = 3600L,
      watermarkDelay: String = "10 minutes"): Dataset[FunnelProgress] = {
    import events.sparkSession.implicits._
    val winUs = windowSec * 1000000L
    val stepArr = steps.toIndexedSeq
    val stepSet = steps.toSet

    def micros(t: java.sql.Timestamp): Long =
      t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    def toTs(us: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }
    // Greedy first-qualifying extension over ascending event time ≡ the
    // batch min-chain (each anchor is the MIN qualifying timestamp
    // because no earlier event can still qualify once time has passed).
    def fold(anchors: List[Long], evs: Seq[(String, Long)]): List[Long] = {
      var a = anchors
      evs.sortBy(e => (e._2, e._1)).foreach { case (tp, t) =>
        val k = a.length
        if (k < stepArr.length && tp == stepArr(k) &&
            (k == 0 || (t > a.last && t <= a.last + winUs)))
          a = a :+ t
      }
      a
    }
    def emit(userId: Long, s: FunnelAgg): FunnelProgress = {
      val a = fold(s.anchors.toList, s.buf)
      FunnelProgress(userId, a.length.toLong, a.map(toTs))
    }

    def fn(userId: Long, it: Iterator[FunnelEvent],
        state: GroupState[FunnelAgg]): Iterator[FunnelProgress] = {
      if (state.hasTimedOut) {
        val out = Iterator(emit(userId, state.get))
        state.remove()
        out
      } else {
        val fresh = it.filter(e => stepSet.contains(e.event_type))
          .map(e => (e.event_type, micros(e.ts))).toSeq
        if (fresh.isEmpty && state.getOption.isEmpty)
          return Iterator.empty // no funnel-step events: keep no state
        val prev = state.getOption.getOrElse(FunnelAgg(Nil, Nil, 0L))
        val wmUs = state.getCurrentWatermarkMs() * 1000L
        val (fin, pending) = (prev.buf ++ fresh).partition(_._2 < wmUs)
        val anchors = fold(prev.anchors.toList, fin)
        val lastMs = math.max(prev.lastMs,
          if (fresh.isEmpty) 0L else fresh.map(_._2).max / 1000L)
        state.update(FunnelAgg(anchors, pending, lastMs))
        // never behind the watermark (Spark rejects a stale timeout)
        state.setTimeoutTimestamp(math.max(lastMs + quietSec * 1000L,
          state.getCurrentWatermarkMs() + 1L))
        Iterator.empty
      }
    }

    // non-step events can never anchor: drop them between the watermark
    // and the shuffle — every event still advances the clock (a stream
    // of only non-step traffic keeps aging state out), but only step
    // rows pay the exchange
    events.withWatermark("ts", watermarkDelay)
      .filter(e => stepSet.contains(e.event_type))
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Incrementally-maintained FUNNEL progress — [[funnelStream]]'s
    * emitted chains folded into a per-user snapshot on the versioned
    * loop, so the funnel family gains the maintained form retention
    * (q135) already has. The composition is sound because emissions
    * are FINAL at emission (the watermark argument: a chain leaves
    * state only once no earlier event can still arrive), so the
    * snapshot merge needs no retraction — per user, MAX(reached)
    * across emissions, which is idempotent (replay no-op) and
    * monotone. A user who returns after their quiet timeout starts a
    * fresh chain ([[funnelStream]]'s documented append contract); the
    * snapshot then carries their DEEPEST chain, which matches the
    * batch q134/q139 single-chain answer exactly when each user's
    * events fall in one quiet period (the StreamingSpec parity law) —
    * the one-shot-vs-maintained contract of every maintainer here.
    * State is one row per funnel-active user — never events.
    */
  def maintainFunnelProgress(events: Dataset[FunnelEvent],
      steps: Seq[String], path: String, checkpointDir: String,
      windowSec: Long = 86400L, quietSec: Long = 3600L,
      watermarkDelay: String = "10 minutes"): StreamingQuery =
    maintainMergedSnapshot(
      funnelStream(events, steps, windowSec, quietSec, watermarkDelay)
        .toDF().select(col("user_id"), col("reached")),
      path, checkpointDir, "funnel_progress")(
      batch => batch.groupBy("user_id")
        .agg(max("reached").as("reached")),
      (prev, cur) => prev.unionByName(cur)
        .groupBy("user_id").agg(max("reached").as("reached")))

  /** q139's funnel-by-segment derived from the latest
    * [[maintainFunnelProgress]] snapshot — the dimensional breakdown
    * at READ time against a broadcast dimension (the
    * [[retentionFromSnapshot]] pattern: cohorting/segmenting is never
    * frozen into the maintained state, so a corrected dimension row
    * re-segments every user on the next read). `dim` carries
    * (`user_id`, `segmentCol`); counts and conversion percentages are
    * q139's expressions verbatim. Segments none of whose users ever
    * produced a funnel-step event have no emissions in the snapshot —
    * the left join back to the dimension's distinct segment values
    * coalesces them to all-zero rows, so the snapshot's row set
    * matches what a consumer diffing against a batch-style report
    * over the full dimension expects (both frames enumerate every
    * segment).
    */
  def funnelSegmentsFromSnapshot(spark: SparkSession, path: String,
      dim: DataFrame, segmentCol: String): DataFrame = {
    val snap = readMergedSnapshot(spark, path, "funnel progress")
    val counts = snap.join(broadcast(dim), "user_id")
      .groupBy(segmentCol)
      .agg(
        sum(when(col("reached") >= 1L, 1L).otherwise(0L)).as("n_step1"),
        sum(when(col("reached") >= 2L, 1L).otherwise(0L)).as("n_step2"),
        sum(when(col("reached") >= 3L, 1L).otherwise(0L)).as("n_step3"))
    // null-safe enumeration join (the family convention): a NULL
    // segment is one identity — a plain using-column join would never
    // match NULL to NULL and silently zero out that group's real counts
    val segs = dim.select(col(segmentCol)).distinct()
    segs
      .join(counts.withColumnRenamed(segmentCol, "__seg"),
        segs(segmentCol) <=> col("__seg"), "left_outer")
      .select(segs(segmentCol),
        coalesce(col("n_step1"), lit(0L)).as("n_step1"),
        coalesce(col("n_step2"), lit(0L)).as("n_step2"),
        coalesce(col("n_step3"), lit(0L)).as("n_step3"))
      // an enumerated segment with no step-1 population has no defined
      // conversion rate: NULL, never a DIV 0 (ANSI) or NaN
      .withColumn("conv2_pct",
        when(col("n_step1") > 0L,
          (col("n_step2") * 100)
            .cast(org.apache.spark.sql.types.DoubleType) /
            col("n_step1").cast(org.apache.spark.sql.types.DoubleType)))
      .withColumn("conv3_pct",
        when(col("n_step1") > 0L,
          (col("n_step3") * 100)
            .cast(org.apache.spark.sql.types.DoubleType) /
            col("n_step1").cast(org.apache.spark.sql.types.DoubleType)))
      .orderBy(segmentCol)
  }

  /** Incrementally-maintained RFM inputs — q144's per-customer facts
    * on the versioned-snapshot loop: all three sufficient statistics
    * are cell-wise mergeable (last order = MAX of event-time micros,
    * frequency = SUM of counts, monetary = SUM of per-batch exact
    * DECIMAL-cent sums — longs add exactly under any batch split), so
    * the facts ride the retention pattern. Quintile CUTS are never
    * frozen into state: [[rfmFromSnapshot]] re-derives them from the
    * maintained facts at read time — a new whale re-scores everyone's
    * m_score on the next read, exactly as batch q144 would.
    */
  def maintainRfmInputs(orders: DataFrame, path: String,
      checkpointDir: String): StreamingQuery =
    maintainMergedSnapshot(orders, path, checkpointDir, "rfm_inputs")(
      batch => batch.groupBy(col("o_custkey").as("user_id"))
        .agg(max(unix_micros(col("o_orderdate"))).as("last_us"),
          count(lit(1)).as("freq"),
          (sum(col("o_totalprice")
            .cast(org.apache.spark.sql.types.DecimalType(18, 2))) * 100)
            .cast(org.apache.spark.sql.types.LongType).as("cents")),
      (prev, cur) => prev.unionByName(cur)
        .groupBy("user_id")
        .agg(max("last_us").as("last_us"), sum("freq").as("freq"),
          sum("cents").as("cents")))

  /** q144's RFM segmentation derived from the latest
    * [[maintainRfmInputs]] snapshot — bit-identical to the batch query
    * over every order fed so far (StreamingSpec law): the recency
    * anchor is the snapshot's own max order time (≡ the corpus max),
    * and the scoring is q144's OWN definition
    * ([[graft.queries.CoreAnalytics.scoreRfm]] — one set of quintile
    * rules for batch and stream).
    */
  def rfmFromSnapshot(spark: SparkSession, path: String): DataFrame = {
    val snap = readMergedSnapshot(spark, path, "rfm inputs")
    val mx = snap.agg(max("last_us").as("mx_us"))
    val rfm = snap.crossJoin(broadcast(mx))
      .select(col("user_id").as("c_custkey"),
        datediff(to_date(timestamp_micros(col("mx_us"))),
          to_date(timestamp_micros(col("last_us"))))
          .cast(org.apache.spark.sql.types.LongType).as("recency_days"),
        col("freq").as("frequency"),
        col("cents").as("monetary_cents"))
      .transform(graft.operators.Exec.materialize)
    graft.queries.CoreAnalytics.scoreRfm(rfm)
  }

  /** Incrementally-maintained RETENTION inputs — q135's cohort matrix
    * kept fresh at ingest. The contrast with [[funnelStream]] is the
    * point: the funnel min-chain is not mergeable, but retention's
    * sufficient statistics ARE — per-user first signup (a MIN: stored
    * negated so the whole table merges under one MAX) and per-(user,
    * purchase-week) latest purchase timestamp (a MAX that witnesses
    * "∃ purchase in this week at/after any signup time resolved
    * LATER") — so it rides the versioned-snapshot loop with cell-wise
    * max-merge and the derived matrix is EXACT under ANY batch split
    * or arrival order, no watermark caveat: a late-arriving earlier
    * signup re-cohorts the user at read time because cohorting is
    * derived from the maintained minimum, never frozen per batch.
    * Table rows: (user_id, kind 'su'|'pw', wk = µs of the purchase
    * week start | 0, v = −signup-µs | max purchase µs). State is one
    * row per user plus one per active (user, week) — ≪ events.
    */
  def maintainRetentionInputs(events: DataFrame, path: String,
      checkpointDir: String): StreamingQuery =
    maintainMergedSnapshot(events, path, checkpointDir,
      "retention_inputs")(
      batch => {
        val su = batch.filter(col("event_type") === "signup")
          .select(col("user_id"), lit("su").as("kind"),
            lit(0L).as("wk"), (-unix_micros(col("ts"))).as("v"))
        val pw = batch.filter(col("event_type") === "purchase")
          .select(col("user_id"), lit("pw").as("kind"),
            unix_micros(date_trunc("week", col("ts"))).as("wk"),
            unix_micros(col("ts")).as("v"))
        su.unionByName(pw)
          .groupBy("user_id", "kind", "wk").agg(max("v").as("v"))
      },
      (prev, cur) => prev.unionByName(cur)
        .groupBy("user_id", "kind", "wk").agg(max("v").as("v")))

  /** q135's retention matrix derived from the latest
    * [[maintainRetentionInputs]] snapshot — bit-identical to running
    * the batch query over every event fed so far (StreamingSpec law).
    * Week offsets divide exactly: UTC week starts are 7·86400 s apart.
    */
  def retentionFromSnapshot(spark: SparkSession, path: String): DataFrame = {
    val snap = readMergedSnapshot(spark, path, "retention inputs")
    val su = snap.filter(col("kind") === "su")
      .select(col("user_id"), (-col("v")).as("fs_us"))
      .withColumn("cohort_us", unix_micros(
        date_trunc("week", timestamp_micros(col("fs_us")))))
    val cells = snap.filter(col("kind") === "pw")
      .select(col("user_id"), col("wk"), col("v"))
      .join(su, "user_id")
      .filter(col("v") >= col("fs_us"))
      .groupBy(col("cohort_us"),
        ((col("wk") - col("cohort_us")) / lit(604800000000L))
          .cast(org.apache.spark.sql.types.LongType).as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
    val sz = su.groupBy("cohort_us")
      .agg(count(lit(1)).as("cohort_users"))
    cells.join(broadcast(sz), "cohort_us")
      .withColumn("retention_pct",
        (col("active_users") * 100)
          .cast(org.apache.spark.sql.types.DoubleType) /
          col("cohort_users")
            .cast(org.apache.spark.sql.types.DoubleType))
      .select(timestamp_micros(col("cohort_us")).as("cohort_week"),
        col("week_offset"), col("active_users"), col("cohort_users"),
        col("retention_pct"))
      .orderBy("cohort_week", "week_offset")
  }

  /** Incrementally-maintained hourly event counts — q138's input kept
    * fresh at ingest, completing the analytics-maintenance triptych:
    * the funnel chain is non-mergeable (buffered watermark fold), the
    * retention inputs merge under MIN/MAX, and these counts merge under
    * plain ADDITION — the file source's exactly-once batch tracking
    * means each event lands in exactly one batch, so per-batch hour
    * counts sum. Table rows: (event_type, hour_us, n_events); KB-scale
    * at any corpus size (types × hours).
    */
  def maintainHourlyCounts(events: DataFrame, path: String,
      checkpointDir: String): StreamingQuery =
    maintainMergedSnapshot(events, path, checkpointDir,
      "hourly_counts")(
      batch => batch
        .groupBy(col("event_type"),
          unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
        .agg(count(lit(1)).as("n_events")),
      (prev, cur) => prev.unionByName(cur)
        .groupBy("event_type", "hour_us")
        .agg(sum("n_events").as("n_events")))

  /** q138's anomaly report derived from the latest
    * [[maintainHourlyCounts]] snapshot — bit-identical to the batch
    * query over every event fed so far (StreamingSpec law). ONE shared
    * rule: the trailing-median spike test lives here and q138 delegates
    * to it, so the streamed and batch forms cannot drift.
    */
  def anomaliesFromSnapshot(spark: SparkSession, path: String): DataFrame =
    hourlyAnomalies(readMergedSnapshot(spark, path, "hourly counts")
      .select(col("event_type"),
        timestamp_micros(col("hour_us")).as("hour_ts"),
        col("n_events")))

  /** The q138 spike rule over a (event_type, hour_ts, n_events) frame:
    * exact median of the previous 24 observed hours, ≥ 2× flags,
    * cold-start withheld. The window runs on the KB-scale aggregate.
    */
  def hourlyAnomalies(hourly: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy("hour_ts")
      .rowsBetween(-24, -1)
    hourly
      .withColumn("med_prev", expr("percentile(n_events, 0.5D)").over(w))
      .withColumn("n_prev", count(lit(1)).over(w))
      .filter(col("n_prev") === 24L &&
        col("n_events").cast(org.apache.spark.sql.types.DoubleType)
          >= lit(2.0) * col("med_prev"))
      .withColumn("spike_ratio",
        col("n_events").cast(org.apache.spark.sql.types.DoubleType) /
          col("med_prev"))
      .select("event_type", "hour_ts", "n_events", "med_prev",
        "spike_ratio")
      .orderBy("event_type", "hour_ts")
  }

  /** The SEASONAL spike rule over the same hourly-counts shape —
    * q145's flank of [[hourlyAnomalies]]: the trailing-24h median
    * flags a Monday 9am surge on a site whose Mondays always surge,
    * so each hour is judged against the exact median of its own
    * HOUR-OF-WEEK slot's previous 2 observations instead (the weekly
    * seasonality every traffic series carries; a 2-deep lookback
    * because the driver corpus spans ~4 weeks — the frame constant is
    * the only thing to widen on a longer series). The slot is epoch
    * arithmetic — (µs DIV 3600000000) % 168 — NOT a calendar dow/hod
    * pair, so both engines agree without touching locale/week
    * conventions. Cold-start slots (< 2 prior weeks) are withheld.
    * Still runs on the KB-scale (type × hour) aggregate; partitions =
    * type × 168 slots — corpus-size-independent. Serves identically
    * from the [[maintainHourlyCounts]] snapshot
    * ([[seasonalAnomaliesFromSnapshot]]).
    */
  def seasonalAnomalies(hourly: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("slot")).orderBy("hour_ts")
      .rowsBetween(-2, -1)
    hourly
      .withColumn("slot",
        expr("(unix_micros(hour_ts) div 3600000000) % 168"))
      .withColumn("med_seasonal",
        expr("percentile(n_events, 0.5D)").over(w))
      .withColumn("n_prev", count(lit(1)).over(w))
      .filter(col("n_prev") === 2L &&
        col("n_events").cast(org.apache.spark.sql.types.DoubleType)
          >= lit(2.0) * col("med_seasonal"))
      .withColumn("spike_ratio",
        col("n_events").cast(org.apache.spark.sql.types.DoubleType) /
          col("med_seasonal"))
      .select("event_type", "hour_ts", "n_events", "slot",
        "med_seasonal", "spike_ratio")
      .orderBy("event_type", "hour_ts")
  }

  /** q145 served from the latest [[maintainHourlyCounts]] snapshot —
    * same shared rule, so the stream cannot drift from the batch
    * query (the anomaliesFromSnapshot pattern).
    */
  def seasonalAnomaliesFromSnapshot(spark: SparkSession,
      path: String): DataFrame =
    seasonalAnomalies(
      readMergedSnapshot(spark, path, "hourly counts")
        .select(col("event_type"),
          timestamp_micros(col("hour_us")).as("hour_ts"),
          col("n_events")))

  /** Incrementally-maintained NEAR-DUP SIGNATURES — q60's clustering
    * input kept fresh at ingest: each micro-batch runs the minhash
    * kernel ONCE over its documents (the expensive text pass) and the
    * (doc_id, sig, band-key) rows merge under DISTINCT UNION
    * (idempotent — re-delivered documents and full replays are free).
    * CLUSTER LABELS are deliberately NOT maintained incrementally:
    * like PageRank ([[maintainEdges]]), connected components is a
    * global fixed point — a single new document can merge two old
    * clusters, so any frozen per-batch label is retroactively wrong;
    * the serving pattern is the retrain one — fold signatures cheaply
    * forever, derive labels on a schedule from the snapshot
    * ([[nearDupClustersFromSnapshot]]: band equi-join + signature
    * verify + the checkpointed CC loop, all over the maintained
    * 16-long signatures — the corpus text is never re-read).
    */
  def maintainNearDupSignatures(docs: DataFrame, textCol: String,
      idCol: String, path: String,
      checkpointDir: String): StreamingQuery =
    maintainMergedSnapshot(docs, path, checkpointDir, "neardup_sigs")(
      batch => {
        graft.functions.Functions.register(batch.sparkSession)
        graft.queries.LlmPipeline.minhashedOf(
          batch.select(col(idCol).as("doc_id"), col(textCol).as("text")))
          .select("doc_id", "sig", "bk")
      },
      (prev, cur) => prev.unionByName(cur).distinct())

  /** q60's near-dup cluster report derived from the latest
    * [[maintainNearDupSignatures]] snapshot — bit-identical to the
    * batch query over every document fed so far (StreamingSpec law;
    * q28's band join, verify rule, and CC epilogue are the SAME
    * definitions — `minhashPairsFromSignatures` / `nearDupClustersOf`
    * — so the maintained form can never drift from the query it
    * serves).
    */
  def nearDupClustersFromSnapshot(spark: SparkSession,
      path: String): DataFrame =
    graft.queries.LlmPipeline.nearDupClustersOf(
      graft.queries.LlmPipeline.minhashPairsFromSignatures(
        readMergedSnapshot(spark, path, "near-dup signatures")))

  /** Incrementally-maintained LINK-GRAPH edge table — the input of
    * [[graft.operators.LinkRank]] kept fresh at ingest: per-batch
    * (src, dst) pairs merge under DISTINCT UNION (idempotent, so
    * at-least-once replay and re-crawled duplicate edges are free).
    * Ranks are NOT maintained incrementally — PageRank is a global
    * fixed point, so the serving pattern is the retrain one (the
    * AnnIndex doctrine): fold edges cheaply forever, re-run
    * [[linkRankFromSnapshot]] on a schedule. Edge rows ≪ events at any
    * scale that has a crawl graph worth ranking.
    */
  def maintainEdges(edges: DataFrame, path: String,
      checkpointDir: String): StreamingQuery =
    maintainMergedSnapshot(edges, path, checkpointDir, "link_edges")(
      batch => batch.select(col("src"), col("dst")).distinct(),
      (prev, cur) => prev.unionByName(cur).distinct())

  /** [[graft.operators.LinkRank]] over the latest [[maintainEdges]]
    * snapshot (nodes = every edge endpoint) — bit-identical to a
    * one-shot train over all edges ever fed, however they were
    * micro-batched (StreamingSpec law; the trainer is deterministic
    * and the edge set is order-free).
    */
  def linkRankFromSnapshot(spark: SparkSession, path: String,
      iters: Int, dampingPct: Int = 85): DataFrame =
    linkRankFromSnapshotConverged(spark, path, maxIters = iters,
      tolFp = 0L, dampingPct = dampingPct)._1

  /** [[linkRankFromSnapshot]] with the CONVERGENCE stop — the form a
    * scheduled production retrain actually runs (a fixed iteration
    * budget either wastes rounds after the fixed point or stops short
    * on a deep graph; `LinkRank.trainConverged` stops when the
    * largest per-node movement drops below `tolFp`, capped at
    * `maxIters`). Returns (ranks, rounds run, converged) so the
    * retrain log can record how hard the graph was — and, when the
    * cap was hit, whether the chain had actually settled there or the
    * iteration budget needs raising (the flag is evaluated on the
    * final round too).
    */
  def linkRankFromSnapshotConverged(spark: SparkSession, path: String,
      maxIters: Int, tolFp: Long,
      dampingPct: Int = 85): (DataFrame, Int, Boolean) = {
    val e = readMergedSnapshot(spark, path, "link edges")
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    graft.operators.LinkRank.trainConverged(nodes, e, maxIters, tolFp,
      dampingPct)
  }

  /** Incrementally-maintained (term, document-frequency) stats table —
    * the side input of the lexical-search ranking (LlmPipeline q61),
    * kept fresh AT INGEST instead of recomputed from the corpus per
    * query. Each micro-batch counts each term's distinct documents
    * WITHIN the batch and merges additively; the file source's
    * exactly-once tracking means an appended document belongs to
    * exactly one batch, so per-batch df values add. Tokenization is
    * LlmPipeline.toksE — the SAME expression q61 ranks with, shared so
    * the stats can never drift from their consumer.
    *
    * Durability contract (foreachBatch is at-least-once, and a plain
    * overwrite would have a delete-then-rewrite crash window):
    * each merge commits to a fresh `batch=<id>` subdirectory — the
    * previous version is untouched until the new one has its _SUCCESS
    * marker, and only then are older versions pruned. A REPLAYED batch
    * id (restart before the streaming commit log recorded it) finds
    * its own committed directory, or recomputes the merge from the
    * still-present previous version — never a double count, never a
    * reset. Readers take [[readTermStats]] = latest committed version.
    * One maintaining query per statsPath (same single-writer contract
    * as the warehouse control table).
    *
    * Scale: the merge shuffles only the vocabulary (≪ corpus), written
    * with normal parallelism — no single-task coalesce.
    */
  def maintainTermStats(docs: DataFrame, statsPath: String,
      checkpointDir: String): StreamingQuery =
    maintainMergedSnapshot(docs, statsPath, checkpointDir, "term_stats")(
      batch => {
        graft.functions.Functions.register(batch.sparkSession)
        batch
        .select(col("doc_id"),
          explode(expr(graft.queries.LlmPipeline.toksE)).as("term"))
        .distinct() // df counts documents, not occurrences
        .groupBy("term").agg(count(lit(1)).as("df"))
      },
      (prev, cur) => prev.unionByName(cur)
        .groupBy("term").agg(sum(col("df")).as("df")))

  /** Incrementally-maintained [[graft.operators.CountMin]] sketch —
    * the streaming face of the q114 heavy-hitter path: each
    * micro-batch folds into the committed cell grid by CELL-WISE
    * ADDITION (the sketch's defining mergeability), so the live
    * frequency answer is one broadcast-sized read away at any corpus
    * size and the corpus is never re-scanned. Same versioned
    * `batch=<id>` commit protocol and replay idempotence as the
    * (term, df) store; read the current sketch with [[readTermStats]]
    * (the snapshot-resolution rule is shared).
    */
  def maintainCountMin(keys: DataFrame, keyCol: String,
      sketchPath: String, checkpointDir: String): StreamingQuery =
    maintainMergedSnapshot(keys, sketchPath, checkpointDir, "count_min")(
      batch => graft.operators.CountMin.build(batch, keyCol),
      (prev, cur) => graft.operators.CountMin.merge(prev, cur))

  /** Incrementally-maintained [[graft.operators.QuantileSketch]]
    * histogram — the streaming face of the q115 percentile path:
    * micro-batches fold into the committed per-group histogram by
    * cell-wise addition, so live p50/p90/p99 (or any ntile cut) read
    * off a KB-scale snapshot at any corpus size — the streaming
    * replacement for every global percentile window. Same commit
    * protocol as the other maintained snapshots; read with
    * [[readTermStats]] and answer with `QuantileSketch.quantiles`.
    */
  def maintainQuantileHistogram(values: DataFrame, valueCol: String,
      groupCols: Seq[String], histPath: String,
      checkpointDir: String): StreamingQuery =
    maintainMergedSnapshot(values, histPath, checkpointDir,
      "quantile_histogram")(
      batch => graft.operators.QuantileSketch
        .build(batch, valueCol, groupCols),
      (prev, cur) => graft.operators.QuantileSketch
        .merge(prev, cur, groupCols))

  /** Incrementally-maintained term OCCURRENCE counts — the flank of
    * [[maintainTermStats]] (which keeps DOCUMENT frequency) that the
    * drift monitor consumes: (term, n) merged across micro-batches by
    * cell-wise addition on the shared versioned-snapshot loop. Two
    * such snapshots — two crawl dates, two sources, two pipelines —
    * feed [[termDriftBetween]].
    */
  def maintainTermCounts(docs: DataFrame, statsPath: String,
      checkpointDir: String): StreamingQuery =
    maintainMergedSnapshot(docs, statsPath, checkpointDir,
      "term_counts")(
      batch => {
        graft.functions.Functions.register(batch.sparkSession)
        batch
          .select(explode(expr(graft.queries.LlmPipeline.toksE))
            .as("term"))
          .groupBy("term").agg(count(lit(1)).as("n"))
      },
      (prev, cur) => prev.unionByName(cur)
        .groupBy("term").agg(sum(col("n")).as("n")))

  /** Unigram-LM vocabulary trained from the latest
    * [[maintainTermCounts]] snapshot — the maintainer→serving loop
    * closed for the SECOND tokenizer family ([[graft.operators.Ulm]];
    * the same posture as the quality model's snapshot form): a
    * scheduled tokenizer retrain reads the KB-scale (term, n)
    * snapshot, never the corpus, and lands BIT-IDENTICAL to batch-
    * training over everything the maintainer has seen, because every
    * Ulm step (seed, ilog2 scores, Viterbi-EM) is a pure function of
    * the word-frequency table and the snapshot IS that table —
    * [[maintainTermCounts]]'s tokenization is `LlmPipeline.toksE`,
    * the same `\w+` lowercase rule [[graft.operators.Bpe.wordFreq]]
    * applies (StreamingSpec pins the equality).
    */
  def ulmVocabFromSnapshot(spark: SparkSession, statsPath: String,
      maxLen: Int = 4, maxVocab: Int = 256,
      emRounds: Int = 2): Seq[(String, Long)] =
    graft.operators.Ulm.trainFromWordFreq(
      readTermStats(spark, statsPath)
        .select(col("term").as("word"), col("n").as("freq")),
      maxLen, maxVocab, emRounds)

  /** Term-frequency drift between two MAINTAINED snapshots — the form
    * q117's docstring promises ("two snapshot dates in production"):
    * the per-term two-sample χ² in 1e-6 fixed point, q117's arithmetic
    * VERBATIM (pinned IEEE chain, exact floor, ≥ 20-occurrence rare-
    * term guard, empty-cohort filter), over the latest committed
    * versions of two [[maintainTermCounts]] paths. When the two
    * snapshots were maintained over q117's even/odd doc cohorts, the
    * report is BIT-IDENTICAL to the registry query — StreamingSpec
    * pins the law. Totals broadcast; top-20 lowers to
    * TakeOrderedAndProject; the snapshots are vocabulary-sized, so
    * the whole report reads KBs-to-MBs at any corpus size.
    */
  def termDriftBetween(spark: SparkSession, pathA: String,
      pathB: String): DataFrame = {
    import org.apache.spark.sql.types.DoubleType
    // no q61 barrier here: the double reference re-reads two
    // VOCABULARY-SIZED snapshot files, not a corpus plan — cheaper
    // than barrier bookkeeping
    val counts = readTermStats(spark, pathA)
      .select(col("term"), col("n").as("n_a"))
      .join(readTermStats(spark, pathB)
        .select(col("term"), col("n").as("n_b")), Seq("term"),
        "full_outer")
      .select(col("term"), coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"))
    val tot = counts.agg(sum(col("n_a")).as("tot_a"),
      sum(col("n_b")).as("tot_b"))
    val nT = (col("n_a") + col("n_b")).cast(DoubleType)
    val bigN = (col("tot_a") + col("tot_b")).cast(DoubleType)
    val ea = nT * col("tot_a").cast(DoubleType) / bigN
    val eb = nT * col("tot_b").cast(DoubleType) / bigN
    val da = col("n_a").cast(DoubleType) - ea
    val db = col("n_b").cast(DoubleType) - eb
    counts.crossJoin(broadcast(tot))
      .filter(col("tot_a") > 0L && col("tot_b") > 0L)
      .filter(col("n_a") + col("n_b") >= 20L)
      .select(col("term"), col("n_a"), col("n_b"),
        floor((da * da / ea + db * db / eb) * lit(1000000d))
          .as("chi2_fp"))
      .orderBy(desc("chi2_fp"), col("term"))
      .limit(20)
  }

  /** Incrementally-maintained bigram-LM count table — the streaming
    * face of q113's TRAINING half, closing the last registry family
    * without a streaming form: a count-based LM is its (w1, w2, c2)
    * bigram-occurrence table, which merges across micro-batches by
    * cell-wise ADDITION exactly like the count-min/quantile sketches,
    * so the quality model trains continuously and the corpus is never
    * re-scanned. History counts c1 and the vocabulary both DERIVE from
    * the snapshot (c1 = the w1 marginal; vocab = |w1 ∪ w2| — the q113
    * derivations verbatim), so the snapshot alone is the whole model.
    * Same versioned `batch=<id>` commit protocol and replay idempotence
    * as the sibling snapshots; score against it with [[scoreLm]].
    */
  def maintainBigramLm(docs: DataFrame, statsPath: String,
      checkpointDir: String): StreamingQuery =
    maintainMergedSnapshot(docs, statsPath, checkpointDir, "bigram_lm")(
      batch => bigramCounts(batch),
      (prev, cur) => prev.unionByName(cur)
        .groupBy("w1", "w2").agg(sum(col("c2")).as("c2")))

  /** (w1, w2, c2) bigram-occurrence counts of a document frame — the
    * q113 derivation (shared `\w+` lowercase tokenization, adjacent
    * pairs via one zip_with, map-side-combined count).
    */
  private def bigramCounts(docs: DataFrame): DataFrame = {
    // r21: per-doc counts via the native tok_bigram_counts kernel
    // (the q113 form) — the exchange now carries per-doc bigram TYPES
    // (pre-counted in-row) instead of every occurrence; Σ of per-doc
    // counts ≡ the occurrence count, bit-for-bit.
    graft.functions.Functions.register(docs.sparkSession)
    docs
      .select(expr(graft.queries.LlmPipeline.toksE).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(explode(expr("tok_bigram_counts(toks)")).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"),
        col("bg.n_occ").as("n_occ"))
      .groupBy("w1", "w2").agg(sum(col("n_occ")).as("c2"))
  }

  /** Score documents against the latest committed bigram-LM snapshot —
    * q113's exact arithmetic (integer ilog2 scores, 1e-6 fixed-point
    * floor-mean) with the MODEL read from [[maintainBigramLm]]'s
    * snapshot instead of trained in-query: when the snapshot was
    * maintained over the same corpus, the output is BIT-IDENTICAL to
    * q113's (doc_id, n_bigrams, ll_sum, ll_mean_fp) — StreamingSpec
    * pins the law, the streaming analog of the q113 oracle. Bigrams
    * absent from the snapshot (possible when scoring unseen documents)
    * drop from the mean — the standard open-vocabulary trade; score
    * the training corpus itself for the exact form.
    */
  def scoreLm(docs: DataFrame, statsPath: String): DataFrame =
    scoreLmAgainst(docs, readTermStats(docs.sparkSession, statsPath))

  /** [[scoreLm]] against an explicit (w1, w2, c2) frame. */
  def scoreLmAgainst(docs: DataFrame, c2: DataFrame): DataFrame = {
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val voc = c2.select(col("w1").as("w"))
      .union(c2.select(col("w2")))
      .agg(countDistinct(col("w")).as("vocab"))
    def ilog2(c: org.apache.spark.sql.Column) = length(bin(c)) - lit(1)
    val sc = c2.join(c1, "w1").crossJoin(broadcast(voc))
      .select(col("w1"), col("w2"),
        (ilog2(col("c2") + lit(1L)) -
          ilog2(col("c1") + col("vocab"))).cast("long").as("score"))
    // r21: map-only per-doc bigram counting via tok_bigram_counts —
    // same rows as the explode + (doc_id, w1, w2) hash aggregate
    // (the q113 change, mirrored so the streamed-≡-batch law holds
    // by construction)
    graft.functions.Functions.register(docs.sparkSession)
    val bgc = docs
      .select(col("doc_id"), expr(graft.queries.LlmPipeline.toksE)
        .as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"),
        explode(expr("tok_bigram_counts(toks)")).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"),
        col("bg.w2").as("w2"), col("bg.n_occ").as("n_occ"))
    bgc.join(sc, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum(col("n_occ") * col("score")).as("ll_sum"),
        sum(col("n_occ")).as("n_bigrams"))
      .select(col("doc_id"), col("n_bigrams"), col("ll_sum"),
        floor((col("ll_sum") * lit(1000000L)).cast("double") /
          col("n_bigrams").cast("double")).as("ll_mean_fp"))
  }

  /** Incrementally-maintained model-based QUALITY CLASSIFIER — the
    * streaming face of q110's training half, closing the last trained
    * artifact without a maintainer: the model's sufficient statistics
    * are per-feature integer class counts plus the class doc totals
    * ([[graft.operators.QualityModel.countsOf]] — ≤ dims+1 rows, KBs),
    * which merge across micro-batches by CELL-WISE ADDITION exactly
    * like the count-min/quantile/bigram snapshots, so the classifier
    * retrains continuously and the corpus is never re-scanned. Labels
    * are the stateless per-row Gopher rule (q54/q110's weak
    * supervisor, one shared definition), so a batch's labels equal the
    * one-shot corpus labels by construction. Weights DERIVE from the
    * snapshot ([[qualityWeights]]) — bit-identical to batch training
    * on the union corpus (StreamingSpec pins the law). Same versioned
    * `batch=<id>` commit protocol and replay idempotence as the
    * sibling snapshots.
    */
  def maintainQualityModel(docs: DataFrame, statsPath: String,
      checkpointDir: String,
      dims: Int = graft.queries.LlmPipeline.QualityDims): StreamingQuery =
    maintainMergedSnapshot(docs, statsPath, checkpointDir,
      "quality_model")(
      batch => graft.operators.QualityModel.countsOf(
        graft.queries.LlmPipeline.qualityLabeledOf(batch), "toks", "y",
        dims),
      (prev, cur) => graft.operators.QualityModel.mergeCounts(prev, cur))

  /** The fitted weights of the latest committed
    * [[maintainQualityModel]] snapshot — (fid, n_pos, n_neg,
    * weight_fp), BIT-IDENTICAL to `QualityModel.train` over every
    * document the stream has committed (the stats are the model; the
    * weight map is closed-form). No barrier: the double reference
    * inside `weightsOf` re-reads a KB-scale snapshot file, not a
    * corpus plan (the termDriftBetween rationale).
    */
  def qualityWeights(spark: SparkSession, statsPath: String): DataFrame =
    graft.operators.QualityModel.weightsOf(
      readTermStats(spark, statsPath))

  /** Score documents with the streamed quality model — q111's exact
    * arithmetic (floor-mean of distinct-feature weights, learned
    * class-centroid-midpoint threshold) with the WEIGHTS read from the
    * [[maintainQualityModel]] snapshot instead of trained in-query;
    * the threshold calibrates on the scoring frame's own heuristic
    * labels (q111's own posture — it thresholds the frame it scores).
    * Scoring the corpus the stream was fed is BIT-IDENTICAL to q111 —
    * StreamingSpec pins the law. For the literal-model serving /
    * gating form, collect the snapshot weights
    * (`QualityModel.collectWeights(qualityWeights(…), dims)`) into
    * [[qualityGatedCurationFeed]].
    */
  def scoreQuality(docs: DataFrame, statsPath: String,
      dims: Int = graft.queries.LlmPipeline.QualityDims): DataFrame = {
    import graft.operators.QualityModel
    val labeled = graft.queries.LlmPipeline.qualityLabeledOf(docs)
    val w = qualityWeights(docs.sparkSession, statsPath)
    QualityModel.scoreWithThreshold(labeled, "toks", w,
      QualityModel.threshold(labeled, "toks", "y", w, dims), dims)
  }

  /** Streamed training-mix export — the WRITE half of
    * [[graft.operators.CorpusExport]] for a continuously-fed corpus:
    * every micro-batch runs through the SAME deterministic per-million
    * keep-thresholds and disjoint-hash shard assignment
    * ([[graft.operators.CorpusExport.selectAndShard]], shared
    * verbatim), lands exactly-once in `outDir/data/batch=<id>/shard=N/`
    * (the `batch=<id>` + `_SUCCESS` commit protocol of
    * [[dedupThroughStore]] — committed batches skip on replay), and
    * the per-group manifest accumulates in
    * `outDir/_export_manifest/batch=<id>` via the versioned-snapshot
    * protocol of [[maintainTermStats]] (merged from the COMMITTED
    * data read-back, previous version retained for concurrent
    * readers). Because selection is per-row content-addressed, the
    * streamed export over ANY micro-batching of a corpus selects
    * exactly the one-shot [[graft.operators.CorpusExport.materialize]]
    * document set into the same shards — including the nested-sample
    * property: raising a threshold later keeps every already-exported
    * row eligible. Read the manifest with [[readExportManifest]].
    */
  def exportMixStream(docs: DataFrame, groupCol: String, idCol: String,
      thresholds: Seq[(String, Long)], outDir: String,
      checkpointDir: String, numShards: Int = 16): StreamingQuery =
    exportStreamWith(docs, groupCol, thresholds, outDir, checkpointDir,
      "corpus_export")(
      batch => graft.operators.CorpusExport
        .selectAndShard(batch, groupCol, idCol, thresholds, numShards))

  /** [[exportMixStream]] with
    * [[graft.operators.CorpusExport.selectAndShardWeighted]]'s
    * per-document quality/authority/dedup-weight scaling — the same
    * batching-invariance argument holds verbatim (selection is
    * per-row deterministic in (id, group, weight, thresholds), so any
    * micro-batching lands the batch operator's exact document set;
    * StreamingSpec pins it), and the manifest protocol is shared.
    */
  def exportMixStreamWeighted(docs: DataFrame, groupCol: String,
      idCol: String, weightPpmCol: String,
      thresholds: Seq[(String, Long)], outDir: String,
      checkpointDir: String, numShards: Int = 16): StreamingQuery =
    // own query name: a session can run a plain and a weighted export
    // concurrently without a duplicate-active-query-name failure
    exportStreamWith(docs, groupCol, thresholds, outDir, checkpointDir,
      "corpus_export_weighted")(
      batch => graft.operators.CorpusExport.selectAndShardWeighted(
        batch, groupCol, idCol, weightPpmCol, thresholds, numShards))

  private def exportStreamWith(docs: DataFrame, groupCol: String,
      thresholds: Seq[(String, Long)], outDir: String,
      checkpointDir: String, queryName: String)(
      select: DataFrame => DataFrame): StreamingQuery =
    docs.writeStream
      .queryName(queryName)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val dataDir = new org.apache.hadoop.fs.Path(
          s"$outDir/data", s"batch=$batchId")
        val fs = dataDir.getFileSystem(spark.sessionState.newHadoopConf())
        if (!fs.exists(
            new org.apache.hadoop.fs.Path(dataDir, "_SUCCESS"))) {
          fs.delete(dataDir, true) // partial leftovers from a crash
          select(batch)
            .repartition(col("shard"))
            .write.partitionBy("shard").parquet(dataDir.toString)
        }
        // manifest: accumulated from the COMMITTED read-back (what
        // landed, not what the plan promised), versioned-snapshot
        // protocol — replayed committed batches skip, the previous
        // version is retained for concurrent readers
        val mroot = new org.apache.hadoop.fs.Path(
          s"$outDir/_export_manifest")
        val mtarget = new org.apache.hadoop.fs.Path(mroot,
          s"batch=$batchId")
        val committedM = committedVersions(fs, mroot)
        if (!committedM.contains(batchId)) {
          val th = thresholds.toDF("group", "threshold_ppm")
          // explicit schema: a zero-survivor batch commits a
          // data-file-less directory schema inference cannot read
          val landed = spark.read
            .schema(batch.schema.add("shard",
              org.apache.spark.sql.types.LongType))
            .parquet(dataDir.toString)
            .groupBy(col(groupCol).cast("string").as("group"))
            .agg(count(lit(1)).as("n_selected"))
            .join(broadcast(th), Seq("group"), "right_outer")
            .select(col("group"), col("threshold_ppm"),
              coalesce(col("n_selected"), lit(0L)).as("n_selected"))
          val merged = committedM.filter(_ < batchId).sorted.lastOption
            match {
              case Some(v) => landed.unionByName(
                  spark.read.parquet(new org.apache.hadoop.fs.Path(
                    mroot, s"batch=$v").toString))
                .groupBy("group", "threshold_ppm")
                .agg(sum(col("n_selected")).as("n_selected"))
              case None => landed
            }
          fs.delete(mtarget, true)
          merged.coalesce(1).write.parquet(mtarget.toString)
          committedVersions(fs, mroot).filter(_ < batchId - 1).foreach(
            v => fs.delete(new org.apache.hadoop.fs.Path(
              mroot, s"batch=$v"), true))
        }
        ()
      }
      .start()

  /** Latest committed (group, threshold_ppm, n_selected) manifest of a
    * streamed export — cumulative over every committed batch.
    */
  def readExportManifest(spark: SparkSession,
      outDir: String): DataFrame =
    readTermStats(spark, s"$outDir/_export_manifest")

  /** The shared versioned-snapshot maintenance loop behind
    * [[maintainTermStats]], [[maintainCountMin]], and
    * [[maintainQuantileHistogram]]: per batch,
    * aggregate the micro-batch (`perBatch`), merge it with the latest
    * snapshot committed BEFORE this batch (`mergeWith` — a replay of
    * batch N must not merge into N's own output), and commit to
    * `batch=<id>` (_SUCCESS = commit point), retaining the
    * immediately-previous version for concurrent readers. Replayed
    * already-committed batches skip the snapshot write — exactly-once
    * snapshots on an at-least-once stream — but the batch is still
    * CONSUMED (an empty foreachPartition pass): a maintainer whose
    * streaming plan carries a stateful operator (the funnel fold)
    * must commit its state stores on EVERY micro-batch, and Spark
    * validates exactly that; for stateless sources the extra pass
    * costs one scan of an already-bounded micro-batch.
    */
  private def maintainMergedSnapshot(src: DataFrame, path: String,
      checkpointDir: String, name: String)(
      perBatch: DataFrame => DataFrame,
      mergeWith: (DataFrame, DataFrame) => DataFrame): StreamingQuery =
    src.writeStream
      .queryName(name)
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val root = new org.apache.hadoop.fs.Path(path)
        val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
        val target = new org.apache.hadoop.fs.Path(root, s"batch=$batchId")
        val committed = committedVersions(fs, root)
        if (!committed.contains(batchId)) { // replayed & committed → skip
          val batchDf = perBatch(batch)
          val prev = committed.filter(_ < batchId).sorted.lastOption
          val merged = prev match {
            case Some(v) =>
              mergeWith(spark.read
                .parquet(new org.apache.hadoop.fs.Path(root, s"batch=$v")
                  .toString), batchDf)
            case None => batchDf
          }
          fs.delete(target, true) // partial leftovers from a crash
          merged.write.parquet(target.toString) // _SUCCESS = commit
          // retain the immediately-previous committed version: a reader
          // that resolved it as latest just before this commit can still
          // finish its scan (single-writer, but readers are concurrent)
          committedVersions(fs, root).filter(_ < batchId - 1).foreach(v =>
            fs.delete(new org.apache.hadoop.fs.Path(root, s"batch=$v"),
              true))
        } else {
          // skip the write but DRAIN the batch: a stateful upstream
          // commits its state stores only when every partition's
          // iterator is exhausted, even on a replayed batch
          batch.foreachPartition((it: Iterator[Row]) => it.foreach(_ => ()))
        }
        ()
      }
      .start()

  /** Latest committed (term, df) snapshot maintained by
    * [[maintainTermStats]]; empty schema-less read errors are the
    * caller's signal that no batch has committed yet.
    */
  def readTermStats(spark: SparkSession, statsPath: String): DataFrame =
    readMergedSnapshot(spark, statsPath, "term stats")

  /** Latest committed `batch=<id>` snapshot under `path` (the
    * [[maintainMergedSnapshot]] layout); errors when nothing committed.
    */
  private def readMergedSnapshot(spark: SparkSession, path: String,
      what: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val latest = committedVersions(fs, root).sorted.lastOption
      .getOrElse(throw new IllegalArgumentException(
        s"no committed $what under $path"))
    spark.read.parquet(
      new org.apache.hadoop.fs.Path(root, s"batch=$latest").toString)
  }

  private def committedVersions(fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path): Seq[Long] =
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch="))
      .filter(st => fs.exists(
        new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
      .map(_.getPath.getName.stripPrefix("batch=").toLong)

  /** Streamed CURATION FEED — the full continuously-fed-corpus loop,
    * q80's streaming analog: every micro-batch is checked against the
    * cross-run EXACT store first (formatting variants of anything ever
    * ingested collapse on the content hash), the survivors against the
    * cross-run NEAR store (paraphrase-grade variants of history drop on
    * verified banded signatures), and what remains lands exactly-once
    * in `batch=<id>` directories with BOTH stores recorded
    * at-least-once from the committed read-back. Same replay matrix as
    * the single-store cycles; within-batch NEAR dups are the q28/q60
    * pipeline's job (exact within-batch dups DO collapse — newUnique
    * keeps one keeper per hash). Survivor rows carry the exact store's
    * `content_hash` column, which the record step reuses rather than
    * recomputing the upstream plan.
    */
  def curationFeedThroughStores(docs: DataFrame, textCol: String,
      idCol: String, exactStorePath: String, nearStorePath: String,
      outDir: String, checkpointDir: String): StreamingQuery =
    // no maintenanceEvery here: Scala forbids default arguments on two
    // overloads of one name, and the 3-store form is the full one —
    // compose the span stage (or pass an empty span store) to get
    // inline self-maintenance
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "curation_feed_through_stores")(
      batch => graft.ingest.NearDupStore.newNearUniqueWithBloom(
        graft.ingest.DedupStore
          .newUnique(batch, textCol, idCol, exactStorePath),
        textCol, idCol, nearStorePath),
      committed => {
        graft.ingest.DedupStore
          .recordHashes(committed, textCol, exactStorePath)
        graft.ingest.NearDupStore
          .recordSignatures(committed, textCol, idCol, nearStorePath)
      })

  /** [[curationFeedThroughStores]] (3-store form) behind the
    * model-based quality GATE: the literal-model filter
    * (operators.QualityModel.keepGood — weights and threshold as plan
    * literals, stateless per-row projection, no join/state/watermark)
    * runs FIRST, before any store probe, extending the
    * cheapest-check-first staging one stage earlier: a document the
    * model rejects never prices a store lookup, and — deliberately —
    * is never RECORDED either (rejects are not "seen"; a later
    * re-submission after a model retrain gets judged afresh). The
    * model is trained offline (batch QualityModel.train/threshold)
    * and its integers are pinned for the life of the stream — the
    * same pin-at-start posture as indexIngestStream's centroids;
    * retrain → restart the stream (or rotate via the versioned
    * lifecycle).
    */
  def qualityGatedCurationFeed(docs: DataFrame, textCol: String,
      idCol: String, denseWeights: Seq[Long], thFp: Long, dims: Int,
      exactStorePath: String, nearStorePath: String,
      spanStorePath: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    curationFeedThroughStores(
      graft.operators.QualityModel.keepGood(docs, textCol,
        denseWeights, thFp, dims),
      textCol, idCol, exactStorePath, nearStorePath, spanStorePath,
      outDir, checkpointDir)

  /** [[qualityGatedCurationFeed]] with the MODEL resolved from the
    * latest committed [[maintainQualityModel]] snapshot at stream
    * start — the maintainer→serving loop closed: weights derive from
    * the snapshot (bit-identical to batch-training on everything the
    * maintainer has seen — the StreamingSpec law), the threshold
    * calibrates on a caller-supplied labeled CALIBRATION frame
    * against those weights (the q111 posture: a held-out or recent
    * slice in production; the training corpus for the exact-parity
    * form), and both pin as plan literals for the stream's life. The
    * literal gate is a stateless PRE-SINK projection — it cannot swap
    * literals mid-stream, so rotation = restart (or the LM feed's
    * in-cycle gate, which can refresh); that is the documented trade
    * for a gate with zero per-batch model cost.
    */
  def qualityGatedCurationFeedFromSnapshot(docs: DataFrame,
      textCol: String, idCol: String, qualityStatsPath: String,
      calibration: DataFrame, exactStorePath: String,
      nearStorePath: String, spanStorePath: String, outDir: String,
      checkpointDir: String,
      dims: Int = graft.queries.LlmPipeline.QualityDims): StreamingQuery = {
    val spark = docs.sparkSession
    // no barrier: both references re-read a KB-scale snapshot file,
    // not a corpus plan (the termDriftBetween rationale)
    val w = qualityWeights(spark, qualityStatsPath)
    val dense = graft.operators.QualityModel.collectWeights(w, dims)
    val thFp = graft.operators.QualityModel
      .threshold(graft.queries.LlmPipeline.qualityLabeledOf(calibration),
        "toks", "y", w, dims)
      .collect()(0).getLong(0)
    qualityGatedCurationFeed(docs, textCol, idCol, dense, thFp, dims,
      exactStorePath, nearStorePath, spanStorePath, outDir,
      checkpointDir)
  }

  /** [[curationFeedThroughStores]] (2-store form) behind the streamed
    * BIGRAM-LM gate — the CCNet composition closed end to end in
    * streaming: documents whose [[scoreLm]] fixed-point mean falls
    * below `minLlMeanFp` (derive the cut from q113's q115-histogram
    * boundaries — e.g. drop the tail tercile) are rejected BEFORE any
    * store probe, and like the linear-model gate their rejects are
    * never recorded (a re-submission after the LM improves gets judged
    * afresh). The MODEL is the latest [[maintainBigramLm]] snapshot,
    * read and PINNED at stream start (the centroid / QualityModel
    * pin-at-start posture — a concurrently-maintained snapshot must
    * not drift the gate mid-batch). The MODEL-REFRESH leg:
    * `modelRefreshEvery` > 0 re-resolves the latest COMMITTED snapshot
    * every N processed batches — the old barrier is released, the new
    * snapshot materialized, and gating continues against the fresher
    * model, so a year-long feed tracks a concurrently-maintained LM
    * without restarts. Refresh points count PROCESSED (uncommitted)
    * batches, so gating is at-least-once-consistent across replays:
    * a replayed committed batch skips the gate entirely (its
    * survivors are already committed), and the stores' delivery
    * matrix is unchanged. Each pin holds ONE barrier at a time — not
    * the per-batch accumulation the r13 leak fix outlawed; the
    * returned thunk releases the CURRENT one after
    * `awaitTermination()` if the session lives on. Documents with
    * fewer than two tokens are unscorable and drop at the gate (the
    * CCNet reading: no perplexity, no admission). The gate itself
    * runs INSIDE the micro-batch cycle: unlike the stateless
    * literal-model filter it aggregates per-document bigrams, which a
    * streaming frame cannot express pre-sink.
    */
  def lmGatedCurationFeed(docs: DataFrame, textCol: String,
      idCol: String, statsPath: String, minLlMeanFp: Long,
      exactStorePath: String, nearStorePath: String, outDir: String,
      checkpointDir: String, maintenanceEvery: Int = 0,
      modelRefreshEvery: Int = 0): (StreamingQuery, () => Unit) = {
    val spark = docs.sparkSession
    val model = new java.util.concurrent.atomic.AtomicReference[DataFrame](
      graft.operators.Exec.materialize(readTermStats(spark, statsPath)))
    val processed = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "lm_gated_curation_feed",
      maintenanceEvery = maintenanceEvery,
      maintain = twoStoreMaintain(exactStorePath, nearStorePath))(
      batch => {
        refreshPinnedModel(model, batch.sparkSession, statsPath,
          processed.getAndIncrement(), modelRefreshEvery)
        val kept = scoreLmAgainst(
            batch.select(col(idCol).as("doc_id"),
              col(textCol).as("text")), model.get())
          .filter(col("ll_mean_fp") >= minLlMeanFp)
          .select(col("doc_id").as("__lm_keep_id"))
        val gated = batch.join(kept,
          batch(idCol) <=> kept("__lm_keep_id"), "left_semi")
        twoStoreCheck(textCol, idCol, exactStorePath,
          nearStorePath)(gated)
      },
      twoStoreRecord(textCol, idCol, exactStorePath, nearStorePath))
    (q, () => graft.operators.Exec.release(model.get()))
  }

  /** [[curationFeedThroughStores]] (2-store form) behind the
    * BENCHMARK-CONTAMINATION gate — the one standing curation stage
    * every production pretraining feed runs that the dedup stores
    * cannot express: documents sharing ≥ `minSharedGrams` distinct
    * 3-word shingles with the registered benchmark set
    * ([[graft.ingest.ContaminationStore]] — q53's gram rule, ONE
    * kernel definition) are dropped BEFORE any dedup-store probe.
    * Staging rationale: the gate is a per-row kernel + a semi-join
    * whose store side is broadcast-scale BY DESIGN (a held-out
    * benchmark is KB–GB of grams at any corpus size), so it is the
    * cheapest store-backed check in the chain — and uniquely, its
    * verdict is INDEPENDENT of feed history: a contaminated document
    * must drop on every run even if the feed has never admitted
    * anything, which is why it cannot ride the exact/near stores'
    * "seen" semantics. Rejects are dropped, never recorded anywhere
    * (the quality-gate doctrine: a resubmission after a benchmark
    * RETRACTION is judged afresh against the then-live store).
    * The contamination store is READ-ONLY here — registration
    * ([[graft.ingest.ContaminationStore.recordBenchmark]]) is an
    * offline act, so a concurrently registered benchmark takes effect
    * on the next micro-batch without coordination. Inline
    * self-maintenance covers all THREE stores (the contamination
    * store's tombstone backlog from retractions compacts on the same
    * schedule its siblings do).
    */
  def contaminationGatedCurationFeed(docs: DataFrame, textCol: String,
      idCol: String, contamStorePath: String, exactStorePath: String,
      nearStorePath: String, outDir: String, checkpointDir: String,
      maintenanceEvery: Int = 0,
      minSharedGrams: Int = 1): StreamingQuery =
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "contamination_gated_curation_feed",
      maintenanceEvery = maintenanceEvery,
      maintain = s2 => {
        maintainIfDue(
          graft.ingest.StoreStats.path(s2, contamStorePath),
          { graft.ingest.ContaminationStore
            .compactStore(s2, contamStorePath); () },
          Some(() => { graft.ingest.ContaminationStore
            .buildBloomSidecar(s2, contamStorePath); () }))
        twoStoreMaintain(exactStorePath, nearStorePath)(s2)
      })(
      batch => twoStoreCheck(textCol, idCol, exactStorePath,
        nearStorePath)(
        graft.ingest.ContaminationStore.newCleanWithBloom(
          batch, textCol, idCol, contamStorePath, minSharedGrams)),
      twoStoreRecord(textCol, idCol, exactStorePath, nearStorePath))

  /** [[curationFeedThroughStores]] (2-store form) behind the
    * CROSS-MODAL alignment gate — the CLIP-score filter as a feed
    * stage: each arriving row carries BOTH modality vectors (the
    * caller's upstream pairing join, co-partitionable by the shared
    * id at any scale), and rows whose caption↔image cosine falls
    * below `minAlignment` drop BEFORE any store probe
    * ([[graft.multimodal.CrossModal.keepAligned]] — a stateless
    * per-row native-codegen filter, so like the literal quality gate
    * it composes pre-sink: no join, no state, no watermark, zero
    * per-batch model cost). A pair with an UNDEFINED score (missing
    * modality, dimension mismatch — NULL; zero-norm degenerate — NaN,
    * explicitly guarded) is misaligned by definition and drops the
    * same way. Rejects are dropped, never recorded (the
    * gate doctrine: a re-scraped caption for the same image is judged
    * afresh). Dedup keys on the text side: `textCol` is the caption —
    * the media content dedups through its own gated media feeds.
    */
  def crossModalGatedCurationFeed(docs: DataFrame, textCol: String,
      idCol: String, captionVecCol: String, imageVecCol: String,
      minAlignment: Double, exactStorePath: String,
      nearStorePath: String, outDir: String, checkpointDir: String,
      maintenanceEvery: Int = 0): StreamingQuery =
    dedupThroughStoreWith(
      graft.multimodal.CrossModal.keepAligned(docs, captionVecCol,
        imageVecCol, minAlignment),
      textCol, outDir, checkpointDir,
      "crossmodal_gated_curation_feed",
      maintenanceEvery = maintenanceEvery,
      maintain = twoStoreMaintain(exactStorePath, nearStorePath))(
      twoStoreCheck(textCol, idCol, exactStorePath, nearStorePath),
      twoStoreRecord(textCol, idCol, exactStorePath, nearStorePath))

  /** [[curationFeedThroughStores]] (2-store form) behind the
    * URL/DOMAIN BLOCKLIST gate — stage #1 of every production
    * web-curation pipeline (listed domains drop before any content
    * work prices them): rows whose `keyCol` (the extracted domain —
    * the caller's projection, q55's derivation) is ON the standing
    * blocklist drop BEFORE any dedup probe, via
    * [[graft.ingest.DedupStore.newUnseenWithBloom]] — the membership
    * probe that preserves row multiplicity (every doc of an unlisted
    * domain survives; a blocklist is a content-hash store whose
    * recorded keys are domains, so the gate is ZERO new machinery and
    * inherits normalization ≈ case-insensitive domain matching,
    * bloom pruning, retraction = un-listing, compaction). Like the
    * contamination gate its verdict is history-INDEPENDENT (the list
    * is maintained offline; a domain listed mid-stream takes effect
    * next micro-batch) and rejects are never recorded anywhere.
    * Inline maintenance covers all three stores.
    */
  def blocklistGatedCurationFeed(docs: DataFrame, textCol: String,
      idCol: String, keyCol: String, blocklistStorePath: String,
      exactStorePath: String, nearStorePath: String, outDir: String,
      checkpointDir: String, maintenanceEvery: Int = 0): StreamingQuery =
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "blocklist_gated_curation_feed",
      maintenanceEvery = maintenanceEvery,
      maintain = s2 => {
        maintainIfDue(
          graft.ingest.StoreStats.path(s2, blocklistStorePath),
          { graft.ingest.DedupStore
            .compactStore(s2, blocklistStorePath); () },
          Some(() => { graft.ingest.DedupStore
            .buildBloomSidecar(s2, blocklistStorePath); () }))
        twoStoreMaintain(exactStorePath, nearStorePath)(s2)
      })(
      batch => twoStoreCheck(textCol, idCol, exactStorePath,
        nearStorePath)(
        graft.ingest.DedupStore.newUnseenWithBloom(
          batch, keyCol, blocklistStorePath)),
      twoStoreRecord(textCol, idCol, exactStorePath, nearStorePath))

  /** The exact+near maintenance block every 2-store gated feed shares
    * — ONE definition (the compact+bloom pairing cannot drift between
    * feed legs; it was copied verbatim in four of them before r18).
    */
  private def twoStoreMaintain(exactStorePath: String,
      nearStorePath: String)(s2: SparkSession): Unit = {
    maintainIfDue(
      graft.ingest.StoreStats.path(s2, exactStorePath),
      { graft.ingest.DedupStore.compactStore(s2, exactStorePath); () },
      Some(() => { graft.ingest.DedupStore
        .buildBloomSidecar(s2, exactStorePath); () }))
    maintainIfDue(
      graft.ingest.StoreStats.path(s2, nearStorePath),
      { graft.ingest.NearDupStore
        .compactStore(s2, nearStorePath); () },
      Some(() => { graft.ingest.NearDupStore
        .buildBloomSidecar(s2, nearStorePath); () }))
  }

  /** The exact → near probe chain of the 2-store feeds. */
  private def twoStoreCheck(textCol: String, idCol: String,
      exactStorePath: String, nearStorePath: String)(
      batch: DataFrame): DataFrame =
    graft.ingest.NearDupStore.newNearUniqueWithBloom(
      graft.ingest.DedupStore.newUniqueWithBloom(
        batch, textCol, idCol, exactStorePath),
      textCol, idCol, nearStorePath)

  /** The committed-read-back recording of the 2-store feeds. */
  private def twoStoreRecord(textCol: String, idCol: String,
      exactStorePath: String, nearStorePath: String)(
      committed: DataFrame): Unit = {
    graft.ingest.DedupStore
      .recordHashes(committed, textCol, exactStorePath)
    graft.ingest.NearDupStore
      .recordSignatures(committed, textCol, idCol, nearStorePath)
  }

  /** The ULM perplexity gate as a batch transform — ONE definition
    * shared by [[ulmGatedCurationFeed]] and the full-stack feeds (the
    * gate and the stack that composes it can never drift apart): keep
    * rows whose [[graft.operators.Ulm.scoreDocs]] 1e-6 fixed-point
    * mean Viterbi log-likelihood per piece clears `minLlMeanFp`.
    * Zero-token rows are unscorable and drop (no perplexity, no
    * admission). The vocab is plan literals (the Viterbi fold's map
    * literal) — no join against any model frame; the one join is the
    * id-keyed semi against the row's own score.
    */
  private def ulmScoreGate(textCol: String, idCol: String,
      vocab: Seq[(String, Long)], minLlMeanFp: Long,
      maxLen: Int = 4)(batch: DataFrame): DataFrame = {
    val kept = graft.operators.Ulm.scoreDocs(
        batch.select(col(idCol).as("doc_id"),
          col(textCol).as("text")), "text", vocab, maxLen)
      .filter(col("ll_mean_fp") >= minLlMeanFp)
      .select(col("doc_id").as("__ulm_keep_id"))
    batch.join(kept, batch(idCol) <=> kept("__ulm_keep_id"),
      "left_semi")
  }

  /** The EIGHT stage functions of the full-stack feeds — blocklist →
    * (optional main-content extraction) → language → contamination →
    * quality → lm_score → exact → near → span — as ONE labelled list
    * (labels = [[graft.operators.CurationOutcome]], q150's outcome
    * vocabulary): the path and bucketed forms differ only in the
    * three injected dedup-leg functions, so the stage chain and its
    * observability labels cannot drift between them, or between the
    * plain fold (one composed plan — today's feed path) and the
    * observed per-stage run ([[observedStageRun]]).
    */
  private def fullStackStageFns(textCol: String, idCol: String,
      keyCol: String, blocklistStorePath: String,
      lidModels: Seq[(String, Seq[Long])], lidDims: Int,
      keepLangSet: Set[String], contamStorePath: String,
      denseWeights: Seq[Long], thFp: Long, dims: Int,
      ulmVocab: Seq[(String, Long)], minLlMeanFp: Long,
      ulmMaxLen: Int, minSharedGrams: Int,
      extractMainContent: Boolean,
      exactCheck: DataFrame => DataFrame,
      nearCheck: DataFrame => DataFrame,
      spanCheck: DataFrame => DataFrame)
      : Seq[(String, DataFrame => DataFrame)] = {
    val O = graft.operators.CurationOutcome
    Seq(
      // the CONTENT-EXTRACTION stage sits between the (text-free)
      // domain gate and the LID gate — exactly where a web pipeline
      // runs it: everything downstream judges the MAIN content, so
      // boilerplate can neither carry a page through a gate nor
      // poison a dedup store (nav-only variants hash identical).
      // Extraction drops no rows, so it folds into the blocklist
      // stage for yield accounting.
      O.Blocklisted -> { b: DataFrame =>
        val blocked = graft.ingest.DedupStore.newUnseenWithBloom(
          b, keyCol, blocklistStorePath)
        if (extractMainContent)
          graft.operators.MainContent.extract(blocked, textCol)
        else blocked
      },
      O.Language -> ((b: DataFrame) => graft.operators.LangId
        .keepLangs(b, textCol, lidModels, lidDims, keepLangSet)),
      O.Contaminated -> ((b: DataFrame) => graft.ingest
        .ContaminationStore.newCleanWithBloom(b, textCol, idCol,
          contamStorePath, minSharedGrams)),
      O.Quality -> ((b: DataFrame) => graft.operators.QualityModel
        .keepGood(b, textCol, denseWeights, thFp, dims)),
      O.LmScore -> ((b: DataFrame) => ulmScoreGate(textCol, idCol,
        ulmVocab, minLlMeanFp, ulmMaxLen)(b)),
      O.ExactDup -> exactCheck,
      O.NearDup -> nearCheck,
      O.SpanDup -> spanCheck)
  }

  /** The q46 content-addressed sampling slot in [0, 100) keyed on the
    * id column — md5, NOT rand(): the sampled reject log is stable
    * across reruns, partitionings, and replays.
    */
  private def sampleSlotExpr(idCol: String): Column =
    expr(s"cast(conv(substring(md5(cast($idCol as string)), 1, 15), " +
      "16, 10) as bigint) % 100")

  /** Per-batch OBSERVED run of the eight-stage chain — the feed's
    * per-stage yield observability (the StoreStats posture: a small
    * metadata frame beside the data, never a re-run of the batch
    * audit over the corpus): fold the stages with a materialization
    * barrier per stage, count each boundary, and write beside the
    * commit
    *
    *   `yieldDir/yields/batch=<id>`  — (batch_id, outcome, n_docs):
    *     one row per [[graft.operators.CurationOutcome]] drop stage
    *     with the documents that stage dropped this batch, plus the
    *     `kept` row with the batch's survivors — so cumulative
    *     streamed yields are the same GROUP BY outcome report as the
    *     batch q150 decision log (StreamingSpec pins the equality);
    *   `yieldDir/rejects/batch=<id>` — (doc_id, stage, text): the
    *     content-addressed sample of each stage's rejects
    *     (`rejectSampleSlots` of 100 q46 md5 slots, never rand()),
    *     written only when sampling is on — the "show me example
    *     documents the language gate dropped today" answer.
    *
    * Exactly-once per batch id with replay-no-op, inherited from the
    * cycle: this runs only on UNCOMMITTED batches (a replayed
    * committed batch skips check entirely, so yields are neither
    * recomputed nor double-counted), and a crash between the yield
    * write and the data commit replays into an identical overwrite —
    * the stages are deterministic and the crashed attempt recorded
    * nothing, so the store state they judge against is unchanged.
    * Cost: one materialization barrier + count per stage on the
    * MICRO-BATCH (not the corpus) — the observed form trades the
    * single fused plan for per-stage visibility; leave `yieldDir`
    * unset to keep today's one-plan path. Barrier lifecycle: every
    * intermediate barrier releases before returning; the FINAL
    * barrier is the frame the cycle commits, so it parks in
    * `pending` (one per stream) and releases at the NEXT call — a
    * one-micro-batch-deep deferral, so barrier storage is bounded by
    * one batch however long the stream runs.
    */
  private def observedStageRun(
      stages: Seq[(String, DataFrame => DataFrame)],
      idCol: String, textCol: String, yieldDir: String,
      rejectSampleSlots: Int,
      pending: scala.collection.mutable.ArrayBuffer[DataFrame])(
      batch: DataFrame, batchId: Long): DataFrame = {
    val spark = batch.sparkSession
    import spark.implicits._
    pending.foreach(graft.operators.Exec.release)
    pending.clear()
    val barriers = scala.collection.mutable.ArrayBuffer[DataFrame]()
    var cur = graft.operators.Exec.materialize(batch)
    barriers += cur
    var curN = cur.count()
    val yields = scala.collection.mutable.ArrayBuffer[(Long, String, Long)]()
    val rejectParts = scala.collection.mutable.ArrayBuffer[DataFrame]()
    for ((label, f) <- stages) {
      val next = graft.operators.Exec.materialize(f(cur))
      val nextN = next.count()
      yields += ((batchId, label, curN - nextN))
      if (rejectSampleSlots > 0 && nextN != curN)
        rejectParts += cur
          .join(next.select(col(idCol)), Seq(idCol), "left_anti")
          .filter(sampleSlotExpr(idCol) < rejectSampleSlots)
          .select(col(idCol).as("doc_id"), lit(label).as("stage"),
            col(textCol).cast(org.apache.spark.sql.types.StringType)
              .as("text"))
      barriers += next
      cur = next
      curN = nextN
    }
    yields += ((batchId, graft.operators.CurationOutcome.Kept, curN))
    yields.toSeq.toDF("batch_id", "outcome", "n_docs")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$yieldDir/yields/batch=$batchId")
    if (rejectSampleSlots > 0)
      rejectParts.reduceOption(_.union(_))
        .map(_.coalesce(1))
        // an all-kept batch still writes a READABLE empty frame
        // (repartition(1) forces one part file carrying the schema)
        .getOrElse(spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              batch.schema(idCol).dataType),
            org.apache.spark.sql.types.StructField("stage",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("text",
              org.apache.spark.sql.types.StringType))))
          .repartition(1))
        .write.mode("overwrite")
        .parquet(s"$yieldDir/rejects/batch=$batchId")
    // every intermediate barrier is consumed (counts + reject writes
    // above); the survivors frame returns to the cycle's commit and
    // releases at the next call (see the lifecycle note above)
    barriers.dropRight(1).foreach(graft.operators.Exec.release)
    pending += cur
    cur
  }

  /** Read back a feed's cumulative yield frame — one row per
    * [[graft.operators.CurationOutcome]] label with total documents
    * across all observed batches (the `GROUP BY outcome` report the
    * batch q150 log answers corpus-wide, here from the per-batch
    * metadata alone).
    */
  def readCurationYields(spark: SparkSession,
      yieldDir: String): DataFrame =
    spark.read.parquet(s"$yieldDir/yields")
      .groupBy("outcome")
      .agg(org.apache.spark.sql.functions.sum("n_docs").as("n_docs"))

  /** [[curationFeedThroughStores]] (2-store form) behind the LEARNED
    * LANGUAGE-ID gate — CCNet's stage #2 (bucket the crawl by learned
    * LID before any content work): documents whose
    * [[graft.operators.LangId.predictLiteral]] language falls outside
    * `keepLangs` drop BEFORE any store probe. The gate is stateless
    * per-row end to end (K plan-literal weight vectors, Generate
    * barriers, in-projection argmax — the literal quality gate's
    * posture), so it composes PRE-SINK: no join, no state, no
    * watermark interaction, zero per-batch model cost. Models train
    * OFFLINE on labeled data ([[graft.operators.LangId.train]] +
    * collectModels) and pin as plan literals for the stream's life
    * (rotation = restart, the pin-at-start posture). Rejects are
    * dropped, never recorded (a document resubmitted after a model
    * retrain — or under a widened keep-set — is judged afresh);
    * documents with no features drop at the gate.
    */
  def lidGatedCurationFeed(docs: DataFrame, textCol: String,
      idCol: String, models: Seq[(String, Seq[Long])], dims: Int,
      keepLangs: Set[String], exactStorePath: String,
      nearStorePath: String, outDir: String, checkpointDir: String,
      maintenanceEvery: Int = 0): StreamingQuery =
    dedupThroughStoreWith(
      graft.operators.LangId.keepLangs(docs, textCol, models, dims,
        keepLangs),
      textCol, outDir, checkpointDir, "lid_gated_curation_feed",
      maintenanceEvery = maintenanceEvery,
      maintain = twoStoreMaintain(exactStorePath, nearStorePath))(
      twoStoreCheck(textCol, idCol, exactStorePath, nearStorePath),
      twoStoreRecord(textCol, idCol, exactStorePath, nearStorePath))

  /** [[curationFeedThroughStores]] (2-store form) behind the
    * UNIGRAM-LM perplexity gate — the CCNet "filter by LM score under
    * the target-domain tokenizer" loop closed over the ULM family:
    * documents whose [[graft.operators.Ulm.scoreDocs]] 1e-6
    * fixed-point mean Viterbi log-likelihood per piece falls below
    * `minLlMeanFp` drop BEFORE any store probe (derive the cut from
    * q152's score distribution — e.g. the q115-histogram tail
    * tercile, the q113/lmGated doctrine), and rejects are never
    * recorded (a resubmission after the vocab improves is judged
    * afresh). The MODEL is the unigram-LM vocabulary trained from the
    * latest [[maintainTermCounts]] snapshot at stream start
    * ([[ulmVocabFromSnapshot]] — the maintainer→serving loop: the
    * retrain reads the KB-scale (term, n) snapshot, never the
    * corpus), pinned as a plain driver-side Seq — unlike the bigram
    * gate there is NO DataFrame pin to barrier-manage, the vocab IS
    * plan literals (the Viterbi fold's map literal), so the refresh
    * leg (`modelRefreshEvery` > 0) just re-trains from the latest
    * committed snapshot every N processed batches and swaps the
    * reference; gating is at-least-once-consistent across replays
    * exactly as the bigram form (a replayed committed batch skips the
    * gate entirely). Documents with zero tokens are unscorable and
    * drop at the gate (no perplexity, no admission). The gate runs
    * inside the micro-batch cycle (it aggregates per-document piece
    * scores — a streaming frame cannot express that pre-sink).
    */
  def ulmGatedCurationFeed(docs: DataFrame, textCol: String,
      idCol: String, statsPath: String, minLlMeanFp: Long,
      exactStorePath: String, nearStorePath: String, outDir: String,
      checkpointDir: String, maintenanceEvery: Int = 0,
      modelRefreshEvery: Int = 0, maxLen: Int = 4, maxVocab: Int = 256,
      emRounds: Int = 2): StreamingQuery = {
    val spark = docs.sparkSession
    val vocab = new java.util.concurrent.atomic.AtomicReference[
      Seq[(String, Long)]](
      ulmVocabFromSnapshot(spark, statsPath, maxLen, maxVocab, emRounds))
    val processed = new java.util.concurrent.atomic.AtomicLong(0L)
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "ulm_gated_curation_feed",
      maintenanceEvery = maintenanceEvery,
      maintain = twoStoreMaintain(exactStorePath, nearStorePath))(
      batch => {
        val n = processed.getAndIncrement()
        if (modelRefreshEvery > 0 && n > 0 && n % modelRefreshEvery == 0)
          vocab.set(ulmVocabFromSnapshot(batch.sparkSession, statsPath,
            maxLen, maxVocab, emRounds))
        twoStoreCheck(textCol, idCol, exactStorePath, nearStorePath)(
          ulmScoreGate(textCol, idCol, vocab.get(), minLlMeanFp,
            maxLen)(batch))
      },
      twoStoreRecord(textCol, idCol, exactStorePath, nearStorePath))
  }

  /** The FULL production curation stack as ONE streamed feed — every
    * gate and store staged in the order a production pretraining
    * pipeline runs them (CCNet's order; the q150 decision-log order):
    *
    *   blocklist → language → contamination → quality → lm_score →
    *   exact → near → span
    *
    * Staging rationale, stage by stage: the blocklist membership probe
    * is the cheapest check (one broadcast-scale anti-join on the
    * domain key) and history-INDEPENDENT, so it runs first — a listed
    * domain's documents never price anything else; the learned
    * LANGUAGE gate is next (CCNet's stage #2: bucket the crawl by LID
    * before any content work — [[graft.operators.LangId.keepLangs]],
    * K plan-literal weight vectors, stateless per-row, no-confidence
    * rejects drop); the contamination gate follows (per-row gram
    * kernel + a Bloom-pruned broadcast semi-join against the KB–GB
    * benchmark store), also history-independent; the literal-model
    * quality gate is a stateless per-row projection (zero per-batch
    * model cost, weights and threshold pinned at stream start — the
    * [[qualityGatedCurationFeed]] posture); the LM-SCORE gate closes
    * CCNet's loop ([[ulmScoreGate]] — the ULM vocab rides as plan
    * literals, `minLlMeanFp` pinned at stream start: deriving the cut
    * per batch would make admission depend on batch boundaries; q150
    * derives the same cut corpus-wide via its histogram rule); then
    * the three dedup stores in increasing per-document cost exactly
    * as [[curationFeedThroughStores]] stages them. Every gate's
    * rejects are dropped and NEVER recorded anywhere (a stage's
    * reject cannot poison any later stage's history — re-submission
    * after a benchmark retraction, an un-listing, a model retrain, or
    * a widened keep-set is judged afresh); only documents that clear
    * ALL EIGHT stages commit, and the three dedup stores record
    * at-least-once from the committed read-back. The blocklist and
    * contamination stores are READ-ONLY here (maintained offline; a
    * mid-stream listing or registration takes effect next
    * micro-batch); both models train OFFLINE (LID on labeled data via
    * [[graft.operators.LangId.train]]+collectModels, the ULM vocab
    * from the maintained term-counts snapshot via
    * [[ulmVocabFromSnapshot]]) and pin for the stream's life (rotation
    * = restart, the pin-at-start posture). The MULTIMODAL branch of
    * the stack is the cross-modal (CLIP-score) alignment gate — a
    * paired image/caption feed runs [[crossModalGatedCurationFeed]]'s
    * leg in place of the text LM gate; it stays a separate feed
    * because its input grain is the PAIR, not the document. Inline
    * self-maintenance covers all five stores on one schedule. Same
    * exactly-once commit + replay matrix as every feed in the family:
    * a replayed committed batch skips gates and stores entirely.
    * `extractMainContent` inserts the
    * [[graft.operators.MainContent.extract]] boilerplate-removal
    * stage between the (text-free) domain gate and the LID gate — the
    * web-pipeline position: every later gate and store judges the
    * MAIN content, so two pages differing only in nav/footer dedup as
    * exact copies (the StreamingSpec boilerplate-invariance law).
    * `yieldDir` turns on per-stage OBSERVABILITY: each batch writes
    * its (outcome, n_docs) yield frame — q150's label vocabulary —
    * and (with `rejectSampleSlots` > 0) a content-addressed sample of
    * each stage's rejects beside the commit; see [[observedStageRun]]
    * for the exactly-once/replay contract and [[readCurationYields]]
    * for the cumulative report.
    */
  def fullStackCurationFeed(docs: DataFrame, textCol: String,
      idCol: String, keyCol: String, blocklistStorePath: String,
      lidModels: Seq[(String, Seq[Long])], lidDims: Int,
      keepLangSet: Set[String], contamStorePath: String,
      denseWeights: Seq[Long], thFp: Long, dims: Int,
      ulmVocab: Seq[(String, Long)], minLlMeanFp: Long,
      exactStorePath: String, nearStorePath: String,
      spanStorePath: String, outDir: String, checkpointDir: String,
      maintenanceEvery: Int = 0, minSharedGrams: Int = 1,
      ulmMaxLen: Int = 4,
      extractMainContent: Boolean = false,
      yieldDir: Option[String] = None,
      rejectSampleSlots: Int = 0): StreamingQuery = {
    val stageFns = fullStackStageFns(textCol, idCol, keyCol,
      blocklistStorePath, lidModels, lidDims, keepLangSet,
      contamStorePath, denseWeights, thFp, dims, ulmVocab,
      minLlMeanFp, ulmMaxLen, minSharedGrams, extractMainContent,
      b => graft.ingest.DedupStore.newUniqueWithBloom(
        b, textCol, idCol, exactStorePath),
      b => graft.ingest.NearDupStore.newNearUniqueWithBloom(
        b, textCol, idCol, nearStorePath),
      b => graft.ingest.SpanStore.newSpanUniqueWithBloom(
        b, textCol, idCol, spanStorePath))
    val pendingRelease =
      scala.collection.mutable.ArrayBuffer[DataFrame]()
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "full_stack_curation_feed",
      maintenanceEvery = maintenanceEvery,
      maintain = s2 => {
        maintainIfDue(
          graft.ingest.StoreStats.path(s2, blocklistStorePath),
          { graft.ingest.DedupStore
            .compactStore(s2, blocklistStorePath); () },
          Some(() => { graft.ingest.DedupStore
            .buildBloomSidecar(s2, blocklistStorePath); () }))
        maintainIfDue(
          graft.ingest.StoreStats.path(s2, contamStorePath),
          { graft.ingest.ContaminationStore
            .compactStore(s2, contamStorePath); () },
          Some(() => { graft.ingest.ContaminationStore
            .buildBloomSidecar(s2, contamStorePath); () }))
        twoStoreMaintain(exactStorePath, nearStorePath)(s2)
        maintainIfDue(
          graft.ingest.StoreStats.path(s2, spanStorePath),
          { graft.ingest.SpanStore
            .compactStore(s2, spanStorePath); () },
          Some(() => { graft.ingest.SpanStore
            .buildBloomSidecar(s2, spanStorePath); () }))
      },
      checkWithId = yieldDir.map(yd =>
        observedStageRun(stageFns, idCol, textCol, yd,
          rejectSampleSlots, pendingRelease) _))(
      batch => stageFns.foldLeft(batch) { case (d, (_, f)) => f(d) },
      committed => {
        graft.ingest.DedupStore
          .recordHashes(committed, textCol, exactStorePath)
        graft.ingest.NearDupStore
          .recordSignatures(committed, textCol, idCol, nearStorePath)
        graft.ingest.SpanStore
          .recordWindows(committed, textCol, idCol, spanStorePath)
      })
  }

  /** [[fullStackCurationFeed]] against BUCKETED dedup tables — the
    * year-of-recording form of the flagship composition: the three
    * ever-growing dedup stores ride the bucketed catalog (zero
    * store-side exchanges on every probe, plan-asserted in
    * LayoutSpec's family laws), while the blocklist and contamination
    * gates stay on their PATH stores deliberately — both are
    * broadcast-scale at any corpus size BY DESIGN (a domain list is
    * KB–MB, a held-out benchmark KB–GB of grams), so a bucketed form
    * would buy nothing and cost a catalog table each (the r17
    * contamination-store disposition) — and the two learned gates
    * (LID, ULM LM-score) are PLAN LITERALS with no store at all. Same
    * staging order, same rejects-never-recorded law, same replay
    * matrix, and same `yieldDir` observability leg
    * ([[observedStageRun]] — shared stage list, shared labels) as the
    * path form.
    */
  def fullStackCurationFeedBucketed(docs: DataFrame, textCol: String,
      idCol: String, keyCol: String, blocklistStorePath: String,
      lidModels: Seq[(String, Seq[Long])], lidDims: Int,
      keepLangSet: Set[String], contamStorePath: String,
      denseWeights: Seq[Long], thFp: Long, dims: Int,
      ulmVocab: Seq[(String, Long)], minLlMeanFp: Long,
      exactTable: String, nearTable: String,
      spanTable: String, outDir: String, checkpointDir: String,
      buckets: Int = 32, maintenanceEvery: Int = 0,
      minSharedGrams: Int = 1, ulmMaxLen: Int = 4,
      extractMainContent: Boolean = false,
      yieldDir: Option[String] = None,
      rejectSampleSlots: Int = 0): StreamingQuery = {
    val spark = docs.sparkSession
    graft.ingest.DedupStore.ensureBucketedStore(spark, exactTable,
      buckets)
    graft.ingest.NearDupStore.ensureBucketedStore(spark, nearTable,
      buckets)
    graft.ingest.SpanStore.ensureBucketedStore(spark, spanTable,
      buckets)
    val stageFns = fullStackStageFns(textCol, idCol, keyCol,
      blocklistStorePath, lidModels, lidDims, keepLangSet,
      contamStorePath, denseWeights, thFp, dims, ulmVocab,
      minLlMeanFp, ulmMaxLen, minSharedGrams, extractMainContent,
      b => graft.ingest.DedupStore.newUniqueBucketedWithBloom(
        b, textCol, idCol, exactTable),
      b => graft.ingest.NearDupStore.newNearUniqueBucketedWithBloom(
        b, textCol, idCol, nearTable),
      b => graft.ingest.SpanStore.newSpanUniqueBucketedWithBloom(
        b, textCol, idCol, spanTable))
    val pendingRelease =
      scala.collection.mutable.ArrayBuffer[DataFrame]()
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "full_stack_curation_feed_bucketed",
      maintenanceEvery = maintenanceEvery,
      maintain = s2 => {
        maintainIfDue(
          graft.ingest.StoreStats.path(s2, blocklistStorePath),
          { graft.ingest.DedupStore
            .compactStore(s2, blocklistStorePath); () },
          Some(() => { graft.ingest.DedupStore
            .buildBloomSidecar(s2, blocklistStorePath); () }))
        maintainIfDue(
          graft.ingest.StoreStats.path(s2, contamStorePath),
          { graft.ingest.ContaminationStore
            .compactStore(s2, contamStorePath); () },
          Some(() => { graft.ingest.ContaminationStore
            .buildBloomSidecar(s2, contamStorePath); () }))
        maintainIfDue(
          graft.ingest.StoreStats.bucketed(s2, exactTable),
          { graft.ingest.DedupStore
            .compactBucketedStore(s2, exactTable); () },
          Some(() => { graft.ingest.DedupStore
            .buildBloomSidecarBucketed(s2, exactTable); () }))
        maintainIfDue(
          graft.ingest.StoreStats.bucketed(s2, nearTable),
          { graft.ingest.NearDupStore
            .compactBucketedStore(s2, nearTable); () },
          Some(() => { graft.ingest.NearDupStore
            .buildBloomSidecarBucketed(s2, nearTable); () }))
        maintainIfDue(
          graft.ingest.StoreStats.bucketed(s2, spanTable),
          { graft.ingest.SpanStore
            .compactBucketedStore(s2, spanTable); () },
          Some(() => { graft.ingest.SpanStore
            .buildBloomSidecarBucketed(s2, spanTable); () }))
      },
      checkWithId = yieldDir.map(yd =>
        observedStageRun(stageFns, idCol, textCol, yd,
          rejectSampleSlots, pendingRelease) _))(
      batch => stageFns.foldLeft(batch) { case (d, (_, f)) => f(d) },
      committed => {
        graft.ingest.DedupStore
          .recordHashesBucketed(committed, textCol, exactTable)
        graft.ingest.NearDupStore
          .recordSignaturesBucketed(committed, textCol, idCol, nearTable)
        graft.ingest.SpanStore
          .recordWindowsBucketed(committed, textCol, idCol, spanTable)
      })
  }

  /** The model-refresh policy of [[lmGatedCurationFeed]], extracted so
    * the adoption semantics are directly testable: when due (`every`
    * > 0, n > 0, n % every == 0), re-resolve the LATEST COMMITTED
    * snapshot under `statsPath`, materialize it, swap it into the pin,
    * and release the previous barrier — one live barrier at any time
    * (the loop-release discipline of Exec.materialize's scaladoc). Not
    * due → the pin is untouched.
    */
  private[graft] def refreshPinnedModel(
      model: java.util.concurrent.atomic.AtomicReference[DataFrame],
      spark: SparkSession, statsPath: String, n: Long,
      every: Int): Unit =
    if (every > 0 && n > 0 && n % every == 0) {
      val fresh = graft.operators.Exec.materialize(
        readTermStats(spark, statsPath))
      graft.operators.Exec.release(model.getAndSet(fresh))
    }

  /** [[curationFeedThroughStores]] with the SPAN store as a third
    * stage: exact → near → span, in increasing per-document cost, so
    * the window scan only prices documents that already survived the
    * cheaper checks. Survivors clear ALL THREE histories (whole-doc
    * copies, paraphrases, and passage mashups), and all three stores
    * record at-least-once from the committed read-back.
    */
  def curationFeedThroughStores(docs: DataFrame, textCol: String,
      idCol: String, exactStorePath: String, nearStorePath: String,
      spanStorePath: String, outDir: String,
      checkpointDir: String, maintenanceEvery: Int = 0): StreamingQuery =
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "curation_feed_through_stores",
      maintenanceEvery = maintenanceEvery,
      maintain = spark => {
        maintainIfDue(
          graft.ingest.StoreStats.path(spark, exactStorePath),
          { graft.ingest.DedupStore
            .compactStore(spark, exactStorePath); () },
          Some(() => { graft.ingest.DedupStore
            .buildBloomSidecar(spark, exactStorePath); () }))
        maintainIfDue(
          graft.ingest.StoreStats.path(spark, nearStorePath),
          { graft.ingest.NearDupStore
            .compactStore(spark, nearStorePath); () },
          Some(() => { graft.ingest.NearDupStore
            .buildBloomSidecar(spark, nearStorePath); () }))
        maintainIfDue(
          graft.ingest.StoreStats.path(spark, spanStorePath),
          { graft.ingest.SpanStore
            .compactStore(spark, spanStorePath); () },
          Some(() => { graft.ingest.SpanStore
            .buildBloomSidecar(spark, spanStorePath); () }))
      })(
      batch => graft.ingest.SpanStore.newSpanUniqueWithBloom(
        graft.ingest.NearDupStore.newNearUniqueWithBloom(
          graft.ingest.DedupStore
            .newUniqueWithBloom(batch, textCol, idCol, exactStorePath),
          textCol, idCol, nearStorePath),
        textCol, idCol, spanStorePath),
      committed => {
        graft.ingest.DedupStore
          .recordHashes(committed, textCol, exactStorePath)
        graft.ingest.NearDupStore
          .recordSignatures(committed, textCol, idCol, nearStorePath)
        graft.ingest.SpanStore
          .recordWindows(committed, textCol, idCol, spanStorePath)
      })

  /** The 3-store curation feed against BUCKETED catalog tables — the
    * year-of-recording form: all three probes (exact anti-join, band
    * candidate join, window semi-join) plan zero exchanges on their
    * ever-growing store sides, all three bloom-aware. Same exact →
    * near → span staging and replay matrix as the path form.
    */
  def curationFeedThroughBucketedStores(docs: DataFrame, textCol: String,
      idCol: String, exactTable: String, nearTable: String,
      spanTable: String, outDir: String, checkpointDir: String,
      buckets: Int = 32, maintenanceEvery: Int = 0): StreamingQuery = {
    val spark = docs.sparkSession
    graft.ingest.DedupStore.ensureBucketedStore(spark, exactTable, buckets)
    graft.ingest.NearDupStore.ensureBucketedStore(spark, nearTable, buckets)
    graft.ingest.SpanStore.ensureBucketedStore(spark, spanTable, buckets)
    dedupThroughStoreWith(docs, textCol, outDir, checkpointDir,
      "curation_feed_through_bucketed_stores",
      maintenanceEvery = maintenanceEvery,
      maintain = s2 => {
        maintainIfDue(
          graft.ingest.StoreStats.bucketed(s2, exactTable),
          { graft.ingest.DedupStore
            .compactBucketedStore(s2, exactTable); () },
          Some(() => { graft.ingest.DedupStore
            .buildBloomSidecarBucketed(s2, exactTable); () }))
        maintainIfDue(
          graft.ingest.StoreStats.bucketed(s2, nearTable),
          { graft.ingest.NearDupStore
            .compactBucketedStore(s2, nearTable); () },
          Some(() => { graft.ingest.NearDupStore
            .buildBloomSidecarBucketed(s2, nearTable); () }))
        maintainIfDue(
          graft.ingest.StoreStats.bucketed(s2, spanTable),
          { graft.ingest.SpanStore
            .compactBucketedStore(s2, spanTable); () },
          Some(() => { graft.ingest.SpanStore
            .buildBloomSidecarBucketed(s2, spanTable); () }))
      })(
      batch => graft.ingest.SpanStore.newSpanUniqueBucketedWithBloom(
        graft.ingest.NearDupStore.newNearUniqueBucketedWithBloom(
          graft.ingest.DedupStore
            .newUniqueBucketedWithBloom(batch, textCol, idCol, exactTable),
          textCol, idCol, nearTable),
        textCol, idCol, spanTable),
      committed => {
        graft.ingest.DedupStore
          .recordHashesBucketed(committed, textCol, exactTable)
        graft.ingest.NearDupStore
          .recordSignaturesBucketed(committed, textCol, idCol, nearTable)
        graft.ingest.SpanStore
          .recordWindowsBucketed(committed, textCol, idCol, spanTable)
      })
  }

  /** Streaming IVF-index maintenance — the freshness leg of the
    * trainer → index → serve lifecycle ([[graft.operators.KMeans]] →
    * [[graft.operators.AnnIndex]]): each micro-batch of new embeddings
    * (`vec_id`, `v` array<double>) is assigned to its nearest centroid
    * and APPENDED into the index's `cid=<n>` partition directories, so
    * queries running [[graft.operators.AnnIndex.topK]] against the same
    * path see new vectors as soon as their batch commits — no rebuild,
    * no read-side change, the probe's partition pruning is untouched.
    * Centroids stay fixed between retrains (standard IVF operation;
    * retrain + [[graft.operators.AnnIndex.writeIndex]] when drift
    * warrants, exactly like the sidecar-rebuild cadence of DedupStore).
    * Appends are idempotent per Spark's streaming-sink contract only at
    * the file level — a replayed batch re-appends its rows, so pair a
    * periodic `Layout.rewriteInPlace(indexDir)(_.dropDuplicates("vec_id"))`
    * run against the INDEX ROOT with the retrain schedule if exact-once
    * listing matters downstream: rewriteInPlace recurses into the
    * `cid=<n>` partition leaves (each with its own crash-safe swap), and
    * a replayed vector re-appends into the same `cid` leaf by
    * construction — single-assignment rule — so the per-leaf
    * `dropDuplicates("vec_id")` is exactly the global one.
    */
  def indexIngestStream(embeddings: DataFrame,
      centroids: Seq[(Int, Array[Double])], indexDir: String,
      checkpointDir: String): StreamingQuery =
    embeddings.writeStream
      .queryName("ivf_index_ingest")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.operators.AnnIndex.assignByCosine(batch, centroids)
          .write.mode("append").partitionBy("cid").parquet(indexDir)
        ()
      }
      .start()

  /** [[indexIngestStream]] against a VERSIONED index root
    * ([[graft.operators.AnnIndex.writeIndexVersioned]]): each
    * micro-batch resolves the CURRENT generation and ITS stored
    * centroids, then appends under that generation — so the stream
    * keeps feeding whichever generation a retrain has installed, with
    * assignment always consistent with the centroids that define the
    * generation's lists (the triple can never mix).
    *
    * Strand guard: a retrain concurrent with an IN-FLIGHT batch would
    * leave that batch's rows in the predecessor generation (the
    * retrain snapshotted vectors before they landed) — and once the
    * NEXT retrain GC'd that generation the rows would vanish
    * permanently, with nothing ever noticing. So after the append the
    * batch RE-READS the manifest and FAILS if the generation changed
    * mid-batch: the checkpoint never commits, the restart replays the
    * batch against the newly-installed generation, and the stranded
    * predecessor copy is GC'd with its generation (it was never
    * served — only the current generation is). Appending twice is the
    * family's at-least-once posture; q40/q85-style probes dedup
    * nothing because the replayed rows land in the SAME (vec_id, v)
    * identity the maintenance `rewriteInPlace(dropDuplicates)` pass
    * reclaims. An install landing after this check but before the
    * checkpoint commit can still strand (vanishingly narrow window);
    * production deployments additionally quiesce the appender around
    * retrains — the family's single-maintenance-writer posture.
    *
    * Lloyd-stats leg: when the generation was built with
    * `lloydStats = true`, each batch also folds its
    * [[graft.operators.KMeans.statsOf]] cells into the generation's
    * maintained `_lloyd` frame
    * ([[graft.operators.AnnIndex.foldLloydStats]] — exactly-once per
    * batch id), so the distortion-triggered retrain can take
    * [[graft.operators.AnnIndex.retrainFromStats]] and skip the
    * update step's corpus scans entirely. A generation without seeded
    * stats makes the fold a no-op — the lifecycle is opt-in.
    */
  def indexIngestStreamVersioned(embeddings: DataFrame, root: String,
      checkpointDir: String,
      maintenanceEvery: Int = 0): StreamingQuery =
    embeddings.writeStream
      .queryName("ivf_index_ingest_versioned")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val gen = appendVersionedBatch(batch, root)
        // fold AFTER the strand guard: a swapped-mid-batch append has
        // already thrown, so stats only ever fold into the generation
        // the rows actually serve from. Exactly-once per batch id;
        // no-op for generations built without lloydStats (opt-in).
        graft.operators.AnnIndex.foldLloydStats(batch.sparkSession,
          root, gen, batchId, batch)
        if (maintenanceEvery > 0 &&
            (batchId + 1) % maintenanceEvery == 0)
          maintainIndexIfDue(batch.sparkSession, root)
      }
      .start()

  /** Inline self-maintenance for the versioned-index appenders — the
    * [[graft.operators.IndexStats]] signals consumed the way the
    * store cycles consume StoreStats (see [[dedupThroughStore]]):
    * `vacuumDue` → [[graft.operators.AnnIndex.vacuumRetracted]] (the
    * retraction backlog is approaching the broadcast ceiling —
    * physically drop it BEFORE probes fall off the broadcast plan),
    * then `sidecarRebuildDue` re-checked on the POST-vacuum state →
    * [[graft.operators.AnnIndex.buildPqSidecar]] (a vacuum installs a
    * sidecar-less generation; a growing residual erodes the codes-only
    * serving path the same way a stale bloom erodes the store probe).
    * Runs AFTER the batch's append + strand guard, on the appender's
    * own thread — the single-writer argument of the store cycles. The
    * distortion-triggered RETRAIN stays operator-scheduled
    * ([[graft.operators.IndexStats.retrainDue]] with an
    * operator-chosen threshold): it refits the whole index and has no
    * universal "due" constant to self-trigger on — though with the
    * maintained Lloyd stats its update step is a KB-scale read
    * ([[graft.operators.AnnIndex.retrainFromStats]]), so "whole
    * index" now prices as the rebuild pass alone. The sidecar rebuild
    * only fires when the generation ever had one (or a vacuum just
    * dropped one): a deliberately float-only index must not sprout a
    * PQ sidecar because a maintenance pass ran.
    */
  private def maintainIndexIfDue(spark: SparkSession,
      root: String): Unit = {
    val IS = graft.operators.IndexStats
    val A = graft.operators.AnnIndex
    val s0 = IS.stats(spark, root)
    val vacuumed = s0.vacuumDue
    if (vacuumed) A.vacuumRetracted(spark, root)
    val s1 = if (vacuumed) IS.stats(spark, root) else s0
    // rebuild when due AND the pq path is in use: the current
    // generation has (or the pre-vacuum one had) a committed sidecar
    if (s1.sidecarRebuildDue && (s1.pqPresent || s0.pqPresent))
      A.buildPqSidecar(spark, root)
  }

  /** One micro-batch of [[indexIngestStreamVersioned]], factored out so
    * the strand guard is testable: resolve the generation ONCE, assign
    * with THAT generation's centroids, append under it, then re-read
    * the manifest and fail if a swap landed mid-batch (the scaladoc
    * above). `postWriteProbe` is a test seam — it runs inside the
    * guard's detection window (after the append, before the re-check),
    * where a deterministic spec can inject the racing retrain.
    */
  private[graft] def appendVersionedBatch(batch: DataFrame, root: String,
      postWriteProbe: () => Unit = () => ()): String = {
    val spark = batch.sparkSession
    val gen0 = graft.operators.AnnIndex
      .currentGeneration(spark, root)
      .getOrElse(throw new IllegalStateException(
        s"no installed generation at $root"))
    val cents = graft.operators.AnnIndex
      .readCentroidsOf(spark, root, gen0)
    graft.operators.AnnIndex.assignByCosine(batch, cents)
      .write.mode("append").partitionBy("cid")
      .parquet(s"$root/$gen0")
    postWriteProbe()
    val gen1 = graft.operators.AnnIndex.currentGeneration(spark, root)
    if (gen1 != Some(gen0))
      throw new IllegalStateException(
        s"index generation swapped mid-batch ($gen0 -> " +
          s"${gen1.getOrElse("<none>")}): failing the batch so the " +
          "replay re-appends into the installed generation")
    gen0
  }

  /** [[indexIngestStreamVersioned]] with a SEMANTIC DEDUP GATE — the
    * streaming form of SemDeDup (q112) against the serving index:
    * each micro-batch is probed against the pinned generation
    * ([[graft.operators.AnnIndex.semanticDedupProbeOf]], cosine ≥
    * `tau` within `nprobe` lists) and only vectors with NO live
    * indexed near-duplicate are appended. Within-batch copies are
    * resolved FIRST by the q112 rule (lower vec_id wins at ≥ `tau`),
    * paired over the UNION of each vector's top-`nprobe` lists — the
    * same probe window as the cross-run gate, so two near-duplicates
    * arriving in one micro-batch that straddle a centroid boundary
    * are still paired (r13 paired top-1 lists only, which the r13
    * advice flagged: a boundary-straddling pair could both append).
    * The residual recall gap is the gate's own documented one: a true
    * pair sharing NO list within `nprobe` — the same trade the
    * cross-run probe makes. Gate and
    * append both run against the generation pinned at batch start;
    * the strand guard then fails the batch if a retrain swapped
    * mid-batch, so replay re-gates against the installed generation —
    * survivors exactly-once, drops at-least-once, like every other
    * streamed dedup cycle here.
    */
  def semanticDedupIngestStream(embeddings: DataFrame, root: String,
      checkpointDir: String, tau: Double, nprobe: Int = 2,
      rerankC: Int = 8, maintenanceEvery: Int = 0): StreamingQuery =
    embeddings.writeStream
      .queryName("ivf_index_ingest_semantic_dedup")
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendVersionedBatchDeduped(batch, root, tau, nprobe, rerankC)
        if (maintenanceEvery > 0 &&
            (batchId + 1) % maintenanceEvery == 0)
          maintainIndexIfDue(batch.sparkSession, root)
      }
      .start()

  /** One micro-batch of [[semanticDedupIngestStream]], factored out
    * for the same testability as [[appendVersionedBatch]]. Three
    * passes over the micro-batch (within-batch pairing, index probe,
    * assignment append) — batch-scale work; the index side is read
    * once, pruned to the probed `cid=` partitions.
    */
  private[graft] def appendVersionedBatchDeduped(batch: DataFrame,
      root: String, tau: Double, nprobe: Int, rerankC: Int = 8,
      postWriteProbe: () => Unit = () => ()): Unit = {
    val A = graft.operators.AnnIndex
    val spark = batch.sparkSession
    val gen0 = A.currentGeneration(spark, root)
      .getOrElse(throw new IllegalStateException(
        s"no installed generation at $root"))
    val cents = A.readCentroidsOf(spark, root, gen0)
    // both per-batch barriers release together in the one finally —
    // the Exec loop contract (barriers must not accumulate across
    // micro-batches)
    val barriers = scala.collection.mutable.ListBuffer[DataFrame]()
    def barrier(df: DataFrame): DataFrame = {
      val m = df.transform(graft.operators.Exec.materialize)
      barriers += m; m
    }
    try {
      // within-batch first: q112's rule — the lower id wins at ≥ tau —
      // paired over the UNION of each vector's top-nprobe lists (the
      // cross-run probe's own window; top-1-only pairing missed
      // boundary-straddling pairs, the r13 advice gap). Materialized
      // for the batch's lifetime: the pair join references it twice and
      // the probed-cid collect below walks it once more.
      val probed = barrier(
        A.probeByCosine(batch.select("vec_id", "v"), cents, nprobe))
      val a = probed.select(col("vec_id").as("vec_a"), col("cid"),
        col("v").as("v_a"))
      val b = probed.select(col("vec_id").as("vec_b"), col("cid"),
        col("v").as("v_b"))
      val inBatchDups = a.join(b, "cid")
        .filter(col("vec_a") < col("vec_b"))
        .filter(expr("cosine_sim(v_a, v_b)") >= tau)
        .select(col("vec_b").as("vec_id")).distinct()
      // the batch's probed lists — ≤ k rows by construction (the
      // vacuumRetracted collect-bound argument); a re-delivered id
      // lands in its ARGMAX list (deterministic assignment), which the
      // probed set contains (rn = 1 ⊆ rn ≤ nprobe), so the id guard
      // below may prune its scan to these partitions
      val batchCids = probed.select("cid").distinct()
        .collect().map(_.getInt(0)).toSeq
      // id-level replay guard: the probe reads an id self-match as
      // re-delivery (not a duplicate), which is right for AUDITING but
      // would let an at-least-once re-delivery (wiped checkpoint, crash
      // between the parquet append and the streaming commit) append the
      // same vec_id twice. Ids already in the pinned generation never
      // re-append — the anti-join reads one column of the PROBED `cid=`
      // partitions only (partition prune + columnar prune; r13 scanned
      // the whole generation's id column, a per-batch cost that grew
      // with index size — the r13 advice item. A DedupStore-backed id
      // set is the same structure with a bloom sidecar when even the
      // pruned scan is too much). MATERIALIZED for the batch's lifetime
      // and RELEASED after the append (the Exec loop contract): the
      // gate and the survivor join reference this frame several times,
      // and its plan carries the two anti-joins above.
      val batchSurvivors = barrier(batch.select("vec_id", "v")
        .join(inBatchDups, Seq("vec_id"), "left_anti")
        .join(spark.read.parquet(s"$root/$gen0")
            .filter(col("cid").isin(batchCids: _*)).select("vec_id"),
          Seq("vec_id"), "left_anti"))
      // then the cross-run gate against the pinned generation — served
      // from the PQ codes when the generation has a sidecar
      // (candidates never read the float column; exact re-rank bounds
      // the float reads), falling back to the float probe otherwise
      val kept = A.semanticDedupProbePqOf(spark, root, gen0,
          batchSurvivors, tau, nprobe, rerankC)
        .filter(!col("is_dup")).select("vec_id")
      val survivors = batchSurvivors.join(kept, "vec_id")
      A.assignByCosine(survivors, cents)
        .write.mode("append").partitionBy("cid")
        .parquet(s"$root/$gen0")
    } finally {
      barriers.foreach(graft.operators.Exec.release)
    }
    postWriteProbe()
    val gen1 = A.currentGeneration(spark, root)
    if (gen1 != Some(gen0))
      throw new IllegalStateException(
        s"index generation swapped mid-batch ($gen0 -> " +
          s"${gen1.getOrElse("<none>")}): failing the batch so the " +
          "replay re-gates and re-appends against the installed " +
          "generation")
  }

  def windowedEventCounts(events: DataFrame,
      watermarkDelay: String = "30 minutes",
      windowWidth: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowWidth), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 6))).cast(DoubleType)
          .as("total_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n_events"), col("total_value"))
}
