package graft.ingest

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType, StringType,
  StructField, StructType}

/** Cross-RUN NEAR dedup — the MinHash edge of the incremental-dedup
  * family: [[DedupStore]] answers "have we ever seen exactly this
  * content", this store answers "have we ever seen something LIKE it"
  * (reworded boilerplate, re-crawled pages with edited footers, light
  * paraphrases — the duplicates that survive an exact hash).
  *
  * The store holds one row per (band_key, sig) of every recorded
  * document: the LSH band keys of the 16-perm minhash signature
  * (q28's exact derivation — `LlmPipeline.minhashedOf`, ONE definition)
  * plus the full signature for precise verification. A new batch is
  * signed once (native kernel, no shuffle), its band keys equi-join the
  * store — per-band locality, never all-pairs — and candidates are
  * VERIFIED by signature agreement ≥ 8/16 positions (est. Jaccard
  * ≥ 0.5, q28's own threshold), so a lone band collision cannot flag a
  * false near-dup. Two-phase like DedupStore: persist survivors first,
  * [[recordSignatures]] after — a crash re-delivers instead of
  * dropping.
  *
  * Contract edges: documents under 3 tokens have no shingles, hence no
  * signature — they are never flagged and never recorded here. Compose
  * with [[DedupStore]] (exact hash first) to catch those, as q80's
  * pipeline stages do within a corpus. Within-batch near-dups are the
  * q28/q60 pipeline's job; this store only compares against HISTORY.
  * At 100 TB the band_key is the store's at-rest bucket key — the
  * bucketed-catalog and Bloom-sidecar accelerations of DedupStore apply
  * here unchanged (same join shape, wider key).
  */
object NearDupStore {

  private val storeSchema = StructType(Seq(
    StructField("band_key", StringType),
    StructField("sig", ArrayType(LongType))))

  /** Signature agreement count between two 16-long arrays — the q28
    * match statistic (n_match ≥ 8 ⇔ est. Jaccard ≥ 0.5).
    */
  private def agreement(a: String, b: String) = expr(
    s"aggregate(zip_with($a, $b, (x, y) -> if(x <=> y, 1, 0)), " +
      "0, (acc, m) -> acc + m)")

  /** (doc_id, sig, bk) band rows of `docs` via the shared q28
    * derivation; `idCol`/`textCol` renamed into the kernel's expected
    * shape first.
    */
  private def banded(docs: DataFrame, textCol: String,
      idCol: String): DataFrame = {
    graft.functions.Functions.register(docs.sparkSession)
    graft.queries.LlmPipeline.minhashedOf(
      docs.select(col(idCol).as("doc_id"), col(textCol).as("text")))
  }

  private def storeBands(spark: org.apache.spark.sql.SparkSession,
      storePath: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(storePath)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p)) spark.read.schema(storeSchema).parquet(storePath)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], storeSchema)
  }

  /** Rows of `docs` that do NOT near-duplicate any recorded document:
    * sign (one kernel pass), equi-join band keys against the store,
    * verify candidates by ≥ `minAgree`/16 signature positions, anti-join
    * the flagged ids. Returns the original rows/columns of survivors.
    *
    * The anti-join is NULL-SAFE (`<=>`): a null id is one identity,
    * exactly as [[DedupStore]]'s keepers treat it (null ids group
    * together, keep one). Consequence: if ANY null-id document in the
    * batch near-duplicates history, EVERY null-id row is flagged —
    * null carries no distinguishing information, so all-or-none is the
    * only consistent reading. Pipelines that need per-document
    * precision should supply real ids (the DedupStore contract).
    */
  def newNearUnique(docs: DataFrame, textCol: String, idCol: String,
      storePath: String, minAgree: Int = 8): DataFrame = {
    val bands = banded(docs, textCol, idCol)
    val store = storeBands(docs.sparkSession, storePath)
      .withColumnRenamed("sig", "stored_sig")
    val nearSeen = bands
      .join(store, bands("bk") === store("band_key"))
      .filter(agreement("sig", "stored_sig") >= minAgree)
      .select(col("doc_id").as("__flagged_id")).distinct()
    docs.join(nearSeen, docs(idCol) <=> nearSeen("__flagged_id"),
      "left_anti")
  }

  /** Mark `docs` as seen: append their (band_key, sig) rows. Call AFTER
    * survivors are durably persisted (two-phase contract — see class
    * doc), ideally on the persisted read-back. The pre-append
    * localCheckpoint pins the batch's bands before the append job could
    * scan the directory it extends (DedupStore's self-scan guard).
    * At-least-once re-records append duplicate rows; [[compactStore]]
    * reclaims them.
    */
  def recordSignatures(docs: DataFrame, textCol: String, idCol: String,
      storePath: String): Unit = {
    val rows = banded(docs, textCol, idCol)
      .select(col("bk").as("band_key"), col("sig")).distinct()
      .localCheckpoint(true)
    try rows.write.mode(SaveMode.Append).parquet(storePath)
    finally rows.unpersist()
  }

  /** Maintenance: one row per (band_key, sig) — reclaims at-least-once
    * re-deliveries, same machinery as DedupStore.compactStore.
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
