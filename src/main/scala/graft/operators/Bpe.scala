package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING — the real iterative merge loop, not just the
  * one-step pair statistic (q71). Classic byte-pair encoding factors
  * through the WORD-FREQUENCY table: pair counts depend only on
  * (distinct word, count), so the corpus is scanned ONCE for the
  * word-freq aggregation and every merge round after that runs over the
  * vocabulary frame — |V| rows (millions at web scale), not corpus
  * rows. Per round: a weighted adjacent-pair aggregate (map-side
  * combined), a driver argmax of ONE row (count desc, then lexicographic
  * pair — fully deterministic), and a per-row greedy left-to-right
  * merge rewrite of the symbol arrays. The vocab frame is
  * re-materialized each round ([[Exec.materialize]] — reliable
  * checkpoint on clusters, localCheckpoint locally) so the plan never
  * grows with the merge count — N rounds are N short jobs, the exact
  * shape of the q60 label-propagation loop — and the previous round is
  * [[Exec.release]]d as each new round lands, so an N-merge training
  * run holds at most ONE round's checkpoint files on the cluster FS,
  * not N copies of the vocab frame.
  *
  * Symbols start as single characters (no end-of-word marker — a
  * documented simplification; add one by appending a sentinel to
  * `word` before [[train]] if needed). The greedy rewrite matches the
  * reference semantics pinned by OperatorsSpec: for merge (a,a) the
  * string "aaa" becomes ["aa","a"], left to right.
  */
object Bpe {

  /** (word, freq) over the shared `\w+` lowercase tokenization — one
    * corpus scan, hash agg.
    */
  def wordFreq(docs: DataFrame, textCol: String): DataFrame = {
    graft.functions.Functions.register(docs.sparkSession)
    docs.select(explode(expr(s"word_toks($textCol)")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
  }

  private def lit_(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Greedy left-to-right merge of adjacent (a, b) into a+b over a
    * symbol array, as a single fold expression (codegen'd; no UDF).
    */
  private def mergeExpr(a: String, b: String): org.apache.spark.sql.Column =
    expr(
      s"""aggregate(syms, cast(array() as array<string>), (acc, s) ->
         | if(size(acc) > 0 AND element_at(acc, -1) = ${lit_(a)}
         |      AND s = ${lit_(b)},
         |    concat(slice(acc, 1, size(acc) - 1),
         |           array(${lit_(a + b)})),
         |    concat(acc, array(s))))""".stripMargin)

  /** Learn `nMerges` merge rules from the corpus. Stops early when no
    * pair occurs at least twice. Returns the ordered rule list —
    * exactly what a tokenizer ships.
    */
  def train(docs: DataFrame, textCol: String,
      nMerges: Int): Seq[(String, String)] = {
    var vf = wordFreq(docs, textCol)
      .withColumn("syms", expr(
        "transform(sequence(1, char_length(word), 1), " +
          "i -> substring(word, i, 1))"))
      .select("syms", "freq")
      .transform(Exec.materialize)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    try {
      var continue = true
      while (continue && merges.size < nMerges) {
        val top = vf
          .filter(size(col("syms")) >= 2) // fully-merged words drop out
          .select(col("freq"), explode(expr(
            "transform(sequence(1, size(syms) - 1, 1), i -> " +
              "struct(element_at(syms, i) as a, " +
              "element_at(syms, i + 1) as b))")).as("p"))
          .groupBy(col("p.a").as("a"), col("p.b").as("b"))
          .agg(sum(col("freq")).as("n"))
          .orderBy(desc("n"), col("a"), col("b"))
          .limit(1).collect()
        if (top.isEmpty || top(0).getAs[Long]("n") < 2L) continue = false
        else {
          val (a, b) = (top(0).getAs[String]("a"), top(0).getAs[String]("b"))
          merges += ((a, b))
          val next = Exec.materialize(
            vf.withColumn("syms", mergeExpr(a, b)))
          Exec.release(vf) // prev round's blocks AND checkpoint files
          vf = next
        }
      }
    } finally Exec.release(vf)
    merges.toSeq
  }

  /** Encode words with an ordered rule list: each rule applied with the
    * same greedy rewrite, in training order — the standard BPE encode.
    * Returns (word, pieces array<string>). N rules = N column rewrites
    * folded into one projection; for corpus-scale encoding use
    * [[encodeDocs]], which applies this to the DISTINCT-word table and
    * joins back (the same factoring as training).
    */
  def encode(words: DataFrame, wordCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val init = words.withColumn("syms", expr(
      s"transform(sequence(1, char_length($wordCol), 1), " +
        s"i -> substring($wordCol, i, 1))"))
    merges.foldLeft(init) { case (df, (a, b)) =>
      df.withColumn("syms", mergeExpr(a, b))
    }.withColumnRenamed("syms", "pieces")
  }

  /** Corpus-scale encoding, factored like training: the N-rule rewrite
    * chain runs once per DISTINCT word (|V| rows), then joins back to
    * the exploded corpus positions and reassembles per-document piece
    * sequences in token order — a 100 TB corpus pays |V| rewrites plus
    * one hash join on the word, never per-occurrence rewriting.
    * Returns (doc_id, pieces) with pieces flattened across the
    * document's words in order.
    */
  def encodeDocs(docs: DataFrame, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    graft.functions.Functions.register(docs.sparkSession)
    val pos = docs.select(col("doc_id"), posexplode(expr(
      s"word_toks($textCol)"))
      .as(Seq("pos", "word")))
    val encoded = encode(pos.select("word").distinct(), "word", merges)
    pos.join(encoded, "word")
      .groupBy("doc_id")
      .agg(expr("flatten(transform(array_sort(" +
        "collect_list(struct(pos, pieces))), p -> p.pieces))")
        .as("pieces"))
  }
}
