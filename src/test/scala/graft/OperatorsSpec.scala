package graft

import org.apache.spark.sql.functions._

/** Gates for the standalone library operators (graft.operators) whose
  * correctness is defined against an independent in-memory reference
  * implementation rather than the DuckDB oracle (iterative algorithms
  * whose unrolled SQL would be the same code in another syntax).
  */
class OperatorsSpec extends SparkSuite {

  /** Reference greedy left-to-right BPE merge — the semantics
    * Bpe.mergeExpr must match ("aaa" + (a,a) → ["aa","a"]).
    */
  private def refApply(syms: Vector[String], a: String,
      b: String): Vector[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    for (s <- syms) {
      if (out.nonEmpty && out.last == a && s == b)
        out(out.length - 1) = a + b
      else out += s
    }
    out.toVector
  }

  /** Reference BPE trainer over an in-memory word-freq map, with the
    * identical (count desc, pair lexicographic) tie-break.
    */
  private def refTrain(freq: Map[String, Long],
      n: Int): Seq[(String, String)] = {
    var vocab: Seq[(Vector[String], Long)] =
      freq.toSeq.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val merges =
      scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.size < n) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1)
        counts((syms(i), syms(i + 1))) += f
      if (counts.isEmpty) continue = false
      else {
        val ((a, b), c) = counts.toSeq
          .minBy { case ((x, y), m) => (-m, x, y) }
        if (c < 2) continue = false
        else {
          merges += ((a, b))
          vocab = vocab.map { case (s, f) => (refApply(s, a, b), f) }
        }
      }
    }
    merges.toSeq
  }

  test("BPE training matches the reference implementation " +
    "merge-for-merge; encode applies the learned rules exactly") {
    val docs = Tables.load(spark, sf, "documents")
    val freq = graft.operators.Bpe.wordFreq(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val got = graft.operators.Bpe.train(docs, "text", 15)
    val want = refTrain(freq, 15)
    assert(got === want)
    assert(got.size === 15, "corpus supports at least 15 merges")
    // encode = the same greedy rewrite per rule, in training order
    val sample = freq.keys.toSeq.sorted.take(50)
    import spark.implicits._
    val enc = graft.operators.Bpe
      .encode(sample.toDF("word"), "word", got)
      .collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toVector).toMap
    for (w <- sample) {
      var syms = w.map(_.toString).toVector
      for ((a, b) <- got) syms = refApply(syms, a, b)
      assert(enc(w) === syms, s"word $w")
      assert(enc(w).mkString === w, s"pieces must reconstruct $w")
    }
    // corpus-scale encoding: per-document pieces concatenate to the
    // document's own lowercase token stream (word order preserved
    // through the distinct-word factoring and position join)
    val sub = Tables.load(spark, sf, "documents").limit(20)
    val perDoc = graft.operators.Bpe.encodeDocs(sub, "text", got)
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val toks = sub.selectExpr("doc_id",
      "regexp_extract_all(lower(text), '\\\\w+', 0) as t")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(perDoc.keySet === toks.keySet.filter(toks(_).nonEmpty))
    for ((id, pieces) <- perDoc)
      assert(pieces.mkString === toks(id).mkString,
        s"doc $id pieces must spell its token stream")
  }
}
