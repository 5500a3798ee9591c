package graft.layout

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Physical-layout levers for the 100 TB posture — the two standard
  * answers to "this join shuffles too much":
  *
  *  - '''Bucketing''' (co-located joins): persist both join sides
  *    bucketed by the join key with the same bucket count; Spark's
  *    bucketed-scan planning then satisfies the join's required
  *    HashClusteredDistribution straight off the files — NO exchange on
  *    either side, at any data size. This is the parquet analog of the
  *    reference's B-tree join-key indexes (init-db/init.sql:63-66): a
  *    one-time layout cost paid at write amortized over every
  *    subsequent join/aggregate on that key. The ingest path's
  *    keys-only dedup projection (Warehouse.keyProjection) names this
  *    as its bucketing candidate; `writeBucketed` is that path.
  *
  *  - '''Salting''' (skew): when one key value carries a disproportion
  *    of rows (the web-crawl "one domain is 10% of the corpus" case), a
  *    plain key-shuffle sends the whole hot key to one task. Prepending
  *    a deterministic salt in [0, S) to the BIG side's key and
  *    replicating the SMALL side S× spreads the hot key over S tasks.
  *    AQE's skew-join handling (on by default) splits oversized
  *    partitions post-shuffle and is the first lever to reach for;
  *    explicit salting remains the deterministic fallback when a single
  *    KEY (not partition) is hot enough to overwhelm one task's join
  *    buffer, which AQE cannot subdivide further.
  */
object Layout {

  /** Persist `df` bucketed (and sorted) by `key` into `buckets` files
    * per partition via the session catalog — both sides of a co-located
    * join must use the SAME key and bucket count. Overwrites.
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
      key: String, moreKeys: String*): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key, moreKeys: _*)
      .sortBy(key, moreKeys: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Inner equi-join with a salted key: `left` is the BIG/skewed side
    * (salt derived deterministically from xxhash64 of the whole row —
    * reproducible across retries/reruns, unlike rand()); `right` is the
    * replicated side (S copies). Result is row-identical to
    * `left.join(right, key)` — salting only changes the shuffle
    * distribution. `right` grows S×, so pick S ≈ (hot-key rows /
    * rows-per-task), not hundreds. `left` must not contain MapType
    * columns (xxhash64 cannot hash maps; analysis fails loud).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // The synthetic column is dropped from the output; a real column of
    // the same name would be silently destroyed — refuse instead.
    // Case-insensitive to match Spark's default column resolution.
    require(!(left.columns ++ right.columns)
        .exists(_.equalsIgnoreCase("__graft_salt")),
      "saltedJoin reserves the column name __graft_salt")
    val saltCol = pmod(
      xxhash64(left.columns.toIndexedSeq.map(col): _*), lit(salts))
    val l = left.withColumn("__graft_salt", saltCol)
    val r = right.withColumn("__graft_salt",
      explode(array((0 until salts).map(s => lit(s)): _*)))
    l.join(r, Seq(key, "__graft_salt")).drop("__graft_salt")
  }
}
