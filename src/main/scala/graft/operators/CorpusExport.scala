package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Training-mix materializer — the WRITE half of the mixing math the
  * query registry reports: q74 computes the importance weight each
  * group (language, source, …) needs to hit a uniform target mix;
  * this operator applies those weights as deterministic per-group
  * keep-rates and writes the re-balanced corpus as sharded parquet, so
  * "materialize the training set" is one call instead of a hand-rolled
  * job per run.
  *
  * Selection is CONTENT-ADDRESSED, never `rand()` — the q46/q58 slot
  * convention (md5 of the id, leading 15 hex digits) at per-million
  * granularity: the same corpus exports the same document set on every
  * rerun, any partitioning, any engine, and a group sampled at 10% is
  * a SUBSET of the same group sampled at 20% (nested samples — the
  * property that makes scaling a mix up reuse everything already
  * exported). Shard assignment uses a DISJOINT slice of the hash
  * (digits 17–31), so shard and selection are independent.
  *
  * Scale posture: one narrow per-group count agg, a broadcast of the
  * (group, keep-threshold) frame into the selection filter — the scan
  * side never shuffles to be sampled — and one `repartition(shard)`
  * exchange that IS the output layout (numShards files of even
  * expected size). The per-group manifest is a second narrow agg over
  * the selected rows, written beside the data: an export without a
  * record of what produced it is not reproducible.
  */
object CorpusExport {

  /** Per-million content-addressed slot of `idCol` — q46's spelling at
    * 10⁴× finer granularity (q46's percent slot = this div 10000).
    */
  private def selectionSlot(idCol: String) =
    expr(s"cast(conv(substring(md5(cast($idCol as string)), 1, 15), " +
      "16, 10) as bigint) % 1000000")

  /** Shard slot from the DISJOINT hash slice (hex digits 17–31). */
  private def shardSlot(idCol: String, numShards: Int) =
    expr(s"cast(conv(substring(md5(cast($idCol as string)), 17, 15), " +
      s"16, 10) as bigint) % $numShards")

  /** Deterministic per-group keep-thresholds (in slots-per-million)
    * for a UNIFORM target mix at output rate `rate`: group g keeps
    * min(1, rate · n_total / (n_groups · n_g)) of its documents —
    * exactly q74's importance weight scaled by `rate`, capped where a
    * small group cannot supply its uniform share. Driver-side over the
    * per-group counts (group cardinality is langs/sources — bounded by
    * design, like every centroid/codebook collect in this library).
    */
  def uniformMixThresholds(docs: DataFrame, groupCol: String,
      rate: Double): Seq[(String, Long)] = {
    require(rate > 0 && rate <= 1, s"rate must be in (0, 1], got $rate")
    val counts = docs.groupBy(groupCol).agg(count(lit(1)).as("n"))
      .collect().map(r => (String.valueOf(r.get(0)), r.getLong(1))).toSeq
    val total = counts.map(_._2).sum
    val g = counts.size
    counts.map { case (grp, n) =>
      val p = math.min(1.0, rate * total / (g.toDouble * n))
      (grp, math.round(p * 1000000).min(1000000))
    }
  }

  /** The selection + shard assignment shared VERBATIM by the one-shot
    * [[materialize]] and the streamed
    * [[graft.streaming.Streams.exportMixStream]] — both paths are
    * per-row deterministic in (id, group, thresholds), which is
    * exactly why a streamed export over any micro-batching of a corpus
    * lands the same document set in the same shards as one batch call
    * (StreamingSpec pins the equivalence). Returns the input columns
    * plus `shard`.
    */
  private[graft] def selectAndShard(docs: DataFrame, groupCol: String,
      idCol: String, thresholds: Seq[(String, Long)],
      numShards: Int): DataFrame =
    selectAndShardCore(docs, groupCol, idCol, thresholds, numShards,
      col("__threshold_ppm"))

  /** [[selectAndShard]] with PER-DOCUMENT weight scaling — the
    * "sample by quality × authority × dedup-weight" materialization a
    * pretraining run actually performs: `weightPpmCol` carries a
    * per-million weight per document (q122's soft-dedup weights, the
    * q34/q123 quality score in 1e-6 fixed point, a LinkRank-derived
    * authority — or any fixed-point PRODUCT of them: ppm weights
    * compose by (a·b) DIV 1e6), and a document keeps iff
    * `slot < min(1e6, (group threshold × weight) DIV 1e6)` — exactly
    * the group rate scaled per document, floor-exact. The slot
    * convention is UNCHANGED, so every deterministic-export property
    * survives weighting: rerun/engine/partition stability, and nesting
    * along BOTH axes — raising a group's rate or any document's
    * weight only ever ADDS documents (OperatorsSpec pins both).
    * Σ weight·rate / 1e12 over a group IS its expected keep fraction —
    * the effective-size arithmetic of q122, applied at the export
    * boundary.
    */
  private[graft] def selectAndShardWeighted(docs: DataFrame,
      groupCol: String, idCol: String, weightPpmCol: String,
      thresholds: Seq[(String, Long)], numShards: Int): DataFrame =
    selectAndShardCore(docs, groupCol, idCol, thresholds, numShards,
      least(lit(1000000L),
        expr(s"(__threshold_ppm * $weightPpmCol) div 1000000")))

  private def selectAndShardCore(docs: DataFrame, groupCol: String,
      idCol: String, thresholds: Seq[(String, Long)], numShards: Int,
      effectivePpm: org.apache.spark.sql.Column): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    for (reserved <- Seq("__slot", "shard"))
      require(!docs.columns.exists(_.equalsIgnoreCase(reserved)),
        s"CorpusExport reserves the column name $reserved")
    val spark = docs.sparkSession
    import spark.implicits._
    val th = thresholds.toDF("__grp", "__threshold_ppm")
    docs
      .withColumn("__slot", selectionSlot(idCol))
      .join(broadcast(th),
        col(groupCol).cast("string") === col("__grp"))
      .filter(col("__slot") < effectivePpm)
      .drop("__grp", "__slot", "__threshold_ppm")
      .withColumn("shard", shardSlot(idCol, numShards))
  }

  /** Materialize the mix: select deterministically by the per-group
    * thresholds, assign shards from the disjoint hash slice, write
    * `outDir/data/shard=N/` parquet plus a per-group manifest at
    * `outDir/_export_manifest`. Returns the manifest frame (group,
    * threshold_ppm, n_selected). All input columns are carried into
    * the export; reserved column names `__slot`/`shard` are refused.
    */
  def materialize(docs: DataFrame, groupCol: String, idCol: String,
      thresholds: Seq[(String, Long)], outDir: String,
      numShards: Int = 16): DataFrame =
    materializeCore(
      selectAndShard(docs, groupCol, idCol, thresholds, numShards),
      groupCol, thresholds, outDir)

  /** [[uniformMixThresholds]] + [[materialize]] in one call — export a
    * uniform-target mix at output rate `rate`.
    */
  def materializeUniformMix(docs: DataFrame, groupCol: String,
      idCol: String, outDir: String, rate: Double,
      numShards: Int = 16): DataFrame =
    materialize(docs, groupCol, idCol,
      uniformMixThresholds(docs, groupCol, rate), outDir, numShards)

  /** [[materialize]] with [[selectAndShardWeighted]]'s per-document
    * weight scaling — same layout (`outDir/data/shard=N/` + the
    * per-group manifest), the weight column carried into the export
    * like every other input column, so a consumer can re-derive the
    * effective sampling rate of anything it reads.
    */
  def materializeWeighted(docs: DataFrame, groupCol: String,
      idCol: String, weightPpmCol: String,
      thresholds: Seq[(String, Long)], outDir: String,
      numShards: Int = 16): DataFrame =
    materializeCore(
      selectAndShardWeighted(docs, groupCol, idCol, weightPpmCol,
        thresholds, numShards),
      groupCol, thresholds, outDir)

  /** The write + manifest protocol shared by [[materialize]] and
    * [[materializeWeighted]] — one commit path, so the manifest
    * schema and read-back-what-landed rule cannot drift between the
    * plain and weighted exports.
    */
  private def materializeCore(selected: DataFrame, groupCol: String,
      thresholds: Seq[(String, Long)], outDir: String): DataFrame = {
    val spark = selected.sparkSession
    import spark.implicits._
    val th = thresholds.toDF("__grp", "__threshold_ppm")
    selected.repartition(col("shard"))
      .write.mode(SaveMode.Overwrite).partitionBy("shard")
      .parquet(s"$outDir/data")
    // manifest: achieved per-group counts + the thresholds that
    // produced them, read back from the written data (what landed on
    // disk, not what the plan promised)
    val manifest = spark.read.parquet(s"$outDir/data")
      .groupBy(col(groupCol).cast("string").as("group"))
      .agg(count(lit(1)).as("n_selected"))
      .join(broadcast(th.select(col("__grp").as("group"),
        col("__threshold_ppm").as("threshold_ppm"))), Seq("group"),
        "right_outer")
      .select(col("group"),
        col("threshold_ppm").cast(LongType),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"))
    manifest.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/_export_manifest")
    spark.read.parquet(s"$outDir/_export_manifest")
  }
}
