package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Independent SQL-builtin reference implementations of the native
  * text-signature kernels (graft.functions.TextSignatures): the
  * explode-based pipelines built from md5/conv/regexp_extract_all and
  * groupBy aggregates — a genuinely different computation path
  * (Spark built-ins vs Java MessageDigest + java.util.regex) used by
  * FunctionsSpec (real corpus) and PropertySpec (generated strings) to
  * pin value-identity. Inputs: a (doc_id, text) frame.
  */
object SignatureRefs {

  val toksE = "regexp_extract_all(lower(text), '\\\\w+', 0)"
  def hash60(s: String): String =
    s"cast(conv(substring(md5($s), 1, 15), 16, 10) as bigint)"

  /** (doc_id, shingle) — 3-word shingles via lead windows. */
  def shingleRows(docs: DataFrame): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    docs.select(col("doc_id"), posexplode(expr(toksE)).as(Seq("pos", "tok")))
      .withColumn("t1", lead("tok", 1).over(w))
      .withColumn("t2", lead("tok", 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("shingle"))
  }

  /** (doc_id, ref_sig) — explode+groupBy minhash signature. */
  def minhashRef(docs: DataFrame): DataFrame = {
    val ts = graft.functions.TextSignatures
    val aggs = ts.MhAB.zipWithIndex.map { case ((a, b), k) =>
      min(expr(s"($a * h + $b) % ${ts.MhP}")).as(s"m$k")
    }
    shingleRows(docs)
      .withColumn("h", expr(s"${hash60("shingle")} % ${ts.MhP}"))
      .groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
      .withColumn("ref_sig",
        array((0 until ts.MinhashK).map(k => col(s"m$k")): _*))
      .select("doc_id", "ref_sig")
  }

  /** (doc_id, ref_sh) — explode+vote simhash. */
  def simhashRef(docs: DataFrame): DataFrame = {
    val tok = docs.select(col("doc_id"), explode(expr(toksE)).as("tok"))
      .withColumn("h", expr(hash60("tok")))
    val votes = (0 until 60).map { i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"s$i")
    }
    val recomb = (0 until 60).map { i =>
      when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    tok.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), recomb.cast("long").as("ref_sh"))
  }

  /** (doc_id, ref_shd) — sorted distinct shingle-hash sets. */
  def shingleSetRef(docs: DataFrame): DataFrame =
    shingleRows(docs)
      .withColumn("h", expr(hash60("shingle")))
      .groupBy("doc_id")
      .agg(sort_array(collect_set(col("h"))).as("ref_shd"))

  /** (doc_id, ref_fp) — gram-explode min(md5) fingerprint over the RAW
    * text column (callers pre-normalize if needed).
    */
  def fingerprintRef(docs: DataFrame, gramLen: Int): DataFrame =
    docs.filter(length(col("text")) >= gramLen)
      .select(col("doc_id"), explode(expr(
        s"transform(sequence(1, length(text) - ${gramLen - 1}), " +
          s"i -> substring(text, i, $gramLen))")).as("gram"))
      .groupBy("doc_id").agg(min(md5(col("gram"))).as("ref_fp"))
}
