package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** UNIGRAM-LM tokenizer training (the SentencePiece family's other
  * half, beside [[Bpe]]): a vocabulary of substring PIECES with
  * log-probability scores, trained by EM over the corpus and served by
  * Viterbi segmentation (each word split into the highest-scoring
  * piece sequence). BPE builds its vocab bottom-up by merging; the
  * unigram model starts from an over-complete substring seed and
  * PRUNES — the two production tokenizer families, now both first-class.
  *
  * Determinism contract (the q113 ilog2 doctrine): piece scores are
  * INTEGER log-likelihoods — score(p) = ilog2(count(p)+1) −
  * ilog2(total+|V|), ilog2 = bit-length−1, no libm anywhere — and the
  * EM is HARD (Viterbi-EM): the E-step assigns every word its single
  * best segmentation under the current scores with a TOTAL tie order
  * (higher score, then fewer pieces, then longest-first piece), the
  * M-step recounts pieces from those segmentations and rescores. Every
  * step is integer-exact and replayable on any engine/partitioning —
  * the same reasoning that keeps q113/q136 oracle-green. (Soft EM's
  * float posteriors would be reduce-order-dependent; hard EM is the
  * standard deterministic variant and converges to a segmentation
  * fixed point.)
  *
  * Factoring (the [[Bpe]] shape): everything trains through the
  * (distinct word, freq) table — one corpus scan for [[Bpe.wordFreq]],
  * then every EM round runs over |V| word rows, never corpus rows. The
  * vocabulary is the MODEL: KB-scale, collected to the driver each
  * round (the centroid/codebook doctrine) and re-embedded as a plan
  * literal map, so segmentation is one codegen'd fold per word — no
  * join, no UDF, no state. Corpus-scale encoding segments the DISTINCT
  * words and joins back ([[encodeDocs]]), so 100 TB pays |V| folds
  * plus one hash join on the word.
  *
  * Coverage: the vocab always retains every single character seen at
  * train time (SentencePiece's character-coverage floor), so any
  * trainable word is segmentable. At encode time an UNSEEN character
  * falls back to one-char pieces at `unkScore` = (min vocab score) − 1
  * — strictly worse than any known piece, so it never displaces one.
  */
object Ulm {

  private def lit_(s: String): String =
    "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

  /** Integer log2 (bit-length − 1) of a nonnegative long column —
    * q113's ilog2, the module's only "log".
    */
  private def ilog2(c: Column): Column =
    (length(bin(c)) - lit(1)).cast(LongType)

  /** (piece, n) seed statistics: every substring of length 1..`maxLen`
    * of every distinct word, weighted by word frequency — the
    * over-complete candidate pool the unigram model prunes. One hash
    * agg over |V| × O(len·maxLen) generated rows.
    */
  def seedCounts(docs: DataFrame, textCol: String,
      maxLen: Int): DataFrame = {
    require(maxLen >= 1, s"maxLen must be >= 1, got $maxLen")
    seedCounts0(Bpe.wordFreq(docs, textCol), maxLen)
  }

  /** ilog2 scores over a (piece, n) count frame: score = ilog2(n+1) −
    * ilog2(Σn + |V|) — shared by the seed audit (q148) and every EM
    * round (ONE definition, so the audit can never drift from the
    * trainer).
    */
  def scored(counts: DataFrame): DataFrame = {
    val tot = counts.agg(sum("n").as("t"), count(lit(1)).as("v"))
    counts.crossJoin(broadcast(tot))
      .select(col("piece"), col("n"),
        (ilog2(col("n") + lit(1L)) - ilog2(col("t") + col("v")))
          .as("score_fp"))
  }

  /** The Viterbi fold over one word column: `best(i)` = the optimal
    * (score, pieces, cut) for the length-i prefix, maximizing score,
    * then minimizing piece count, then preferring the LONGEST final
    * piece (smallest cut) — a total order, so the DP is deterministic.
    * Pure codegen'd expression (nested aggregate/transform, a map
    * literal for the vocab — no UDF); pieces reconstruct by walking
    * the cut chain backward, ≤ len steps.
    */
  private def viterbiExprs(wordCol: String, vocab: Seq[(String, Long)],
      maxLen: Int): (String, String) = {
    require(vocab.nonEmpty, "empty vocabulary")
    val unk = vocab.map(_._2).min - 1L
    val mapLit = "map(" + vocab.map { case (p, s) =>
      s"${lit_(p)}, ${s}L" }.mkString(", ") + ")"
    // score of the candidate piece word[j..i] (1-based, inclusive):
    // vocab lookup, unknown single chars at unkScore, else invalid
    def sc = s"""coalesce(element_at($mapLit,
                |   substring($wordCol, j, i - j + 1)),
                | if(i = j, ${unk}L, cast(null as bigint)))""".stripMargin
    // the empty word (possible through the public segment/encodeDocs
    // entry points; internal callers feed \w+ words) short-circuits:
    // sequence(1, 0, 1) would throw Spark's illegal-boundaries error,
    // and its answer is trivially the empty segmentation
    val best =
      s"""if(char_length($wordCol) = 0,
         | array(named_struct('s', 0L, 'np', 0L, 'cut', 0)),
         | aggregate(sequence(1, char_length($wordCol), 1),
         | array(named_struct('s', 0L, 'np', 0L, 'cut', 0)),
         | (acc, i) -> concat(acc, array(
         |   aggregate(sequence(greatest(1, i - ${maxLen - 1}), i, 1),
         |     cast(null as struct<s: bigint, np: bigint, cut: int>),
         |     (b, j) -> if($sc is null OR element_at(acc, j).s is null, b,
         |       if(b is null
         |          OR element_at(acc, j).s + $sc > b.s
         |          OR (element_at(acc, j).s + $sc = b.s
         |              AND element_at(acc, j).np + 1L < b.np)
         |          OR (element_at(acc, j).s + $sc = b.s
         |              AND element_at(acc, j).np + 1L = b.np
         |              AND j - 1 < b.cut),
         |         named_struct('s', element_at(acc, j).s + $sc,
         |                      'np', element_at(acc, j).np + 1L,
         |                      'cut', j - 1),
         |         b)))))))""".stripMargin
    val pieces =
      s"""if(char_length($wordCol) = 0,
         | cast(array() as array<string>),
         | aggregate(sequence(1, char_length($wordCol), 1),
         | named_struct('pos', char_length($wordCol),
         |              'ps', cast(array() as array<string>)),
         | (st, x) -> if(st.pos <= 0, st,
         |   named_struct(
         |     'pos', element_at(__ulm_best, st.pos + 1).cut,
         |     'ps', concat(st.ps, array(substring($wordCol,
         |       element_at(__ulm_best, st.pos + 1).cut + 1,
         |       st.pos - element_at(__ulm_best, st.pos + 1).cut))))),
         | st -> reverse(st.ps)))""".stripMargin
    (best, pieces)
  }

  /** (…, pieces) — Viterbi segmentation of `wordCol` under `vocab`.
    * The DP table materializes behind a Generate barrier (the
    * kernel-barrier pattern: the reconstruction walk references it
    * ~3× per step, and a plain alias would re-run the whole fold per
    * reference). A word whose every segmentation hits an invalid
    * piece cannot occur (single chars are always scorable), so
    * `pieces` is total.
    */
  def segment(words: DataFrame, wordCol: String,
      vocab: Seq[(String, Long)], maxLen: Int): DataFrame = {
    val (best, pieces) = viterbiExprs(wordCol, vocab, maxLen)
    words
      .select(col("*"), explode(array(expr(best))).as("__ulm_best"))
      .withColumn("pieces", expr(pieces))
      .drop("__ulm_best")
  }

  /** (…, score_fp, n_pieces) — the Viterbi-optimal segmentation's
    * TOTAL score and piece count of `wordCol` under `vocab`, read
    * straight from the DP's final cell (no piece reconstruction).
    * Same fold, same tie order, same unk fallback as [[segment]] —
    * ONE Viterbi definition, so a score can never disagree with the
    * segmentation it prices. The empty word scores (0, 0).
    */
  def segmentStats(words: DataFrame, wordCol: String,
      vocab: Seq[(String, Long)], maxLen: Int): DataFrame = {
    val (best, _) = viterbiExprs(wordCol, vocab, maxLen)
    words
      .select(col("*"), explode(array(expr(best))).as("__ulm_best"))
      .withColumn("score_fp",
        expr(s"element_at(__ulm_best, char_length($wordCol) + 1).s"))
      .withColumn("n_pieces",
        expr(s"element_at(__ulm_best, char_length($wordCol) + 1).np"))
      .drop("__ulm_best")
  }

  /** Per-document LM score under the unigram-LM tokenizer — the q113
    * mean-ll shape with ULM pieces in place of bigrams: ll_sum = the
    * sum of each word occurrence's Viterbi-optimal total score,
    * n_pieces = the total pieces emitted, ll_mean_fp =
    * floor(10^6 · ll_sum / n_pieces) (1e-6 fixed point per piece —
    * length-invariant, the mean-not-sum rationale; every step integer
    * or exact-floor, so the score is oracle-exact). This is the
    * CCNet-shaped "perplexity under the target-domain tokenizer+LM"
    * statistic the ULM trainer's scores induce. Factored through
    * DISTINCT words (the class doctrine — the Viterbi fold runs once
    * per distinct word, never per occurrence); the join back to the
    * occurrence stream is word-keyed and Catalyst sizes it (the
    * distinct-word side is vocabulary-scale). Documents with no
    * tokens are unscorable and get no row (the q113 < 2-bigram rule's
    * analog).
    */
  def scoreDocs(docs: DataFrame, textCol: String,
      vocab: Seq[(String, Long)], maxLen: Int = 4): DataFrame = {
    graft.functions.Functions.register(docs.sparkSession)
    val words = docs.select(col("doc_id"), explode(expr(
      s"word_toks($textCol)")).as("word"))
    val stats = segmentStats(words.select("word").distinct(), "word",
      vocab, maxLen)
    words.join(stats, "word")
      .groupBy("doc_id")
      .agg(sum("n_pieces").as("n_pieces"), sum("score_fp").as("ll_sum"))
      .select(col("doc_id"), col("n_pieces"), col("ll_sum"),
        floor((col("ll_sum") * lit(1000000L)).cast(DoubleType)
          / col("n_pieces").cast(DoubleType)).cast(LongType)
          .as("ll_mean_fp"))
  }

  /** One hard-EM round: segment the distinct-word table under the
    * current scores, recount pieces from the chosen segmentations
    * (weighted by word freq), keep the `maxVocab` highest-count pieces
    * PLUS every single character (coverage floor), rescore. Unused
    * pieces get no row — that is the pruning.
    */
  private def emRound(wordFreq: DataFrame, vocab: Seq[(String, Long)],
      maxLen: Int, maxVocab: Int): DataFrame = {
    val counts = segment(wordFreq, "word", vocab, maxLen)
      .select(col("freq"), explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(sum("freq").as("n"))
    selectVocab(counts, maxVocab)
  }

  /** Top-`maxVocab` pieces by (count desc, piece asc) UNION every
    * single-character piece in `counts` (the coverage floor), scored.
    */
  private def selectVocab(counts: DataFrame, maxVocab: Int): DataFrame =
    scored(
      counts.orderBy(desc("n"), col("piece")).limit(maxVocab)
        .unionByName(counts.filter(char_length(col("piece")) === 1))
        .groupBy("piece").agg(max("n").as("n")))

  private def collectVocab(df: DataFrame): Seq[(String, Long)] =
    df.select("piece", "score_fp").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toSeq

  /** Train a unigram-LM tokenizer: seed from substring statistics,
    * then `emRounds` hard-EM refine/prune rounds. Returns the final
    * (piece, score_fp) vocabulary, piece-sorted. The word-freq table
    * materializes once and feeds every round; each round's model is a
    * KB-scale driver collect (the centroid doctrine) — nothing
    * corpus-sized ever leaves the cluster.
    */
  def train(docs: DataFrame, textCol: String, maxLen: Int = 4,
      maxVocab: Int = 256, emRounds: Int = 2): Seq[(String, Long)] =
    trainFromWordFreq(Bpe.wordFreq(docs, textCol), maxLen, maxVocab,
      emRounds)

  /** [[train]] from an already-built (word, freq) frame — the form the
    * maintainer→serving loop uses (`Streams.ulmVocabFromSnapshot`
    * feeds the latest maintained term-counts snapshot here, so a
    * scheduled tokenizer retrain reads KB of counts, never the
    * corpus). Training on a maintained snapshot is bit-identical to
    * training on everything the maintainer has seen BECAUSE every
    * step is a pure function of the (word, freq) table — the
    * StreamingSpec law.
    */
  def trainFromWordFreq(wordFreq: DataFrame, maxLen: Int = 4,
      maxVocab: Int = 256, emRounds: Int = 2): Seq[(String, Long)] = {
    require(emRounds >= 0, s"emRounds must be >= 0, got $emRounds")
    val wf = Exec.materialize(wordFreq)
    try {
      var vocab = collectVocab(
        selectVocab(seedCounts0(wf, maxLen), maxVocab))
      var r = 0
      while (r < emRounds) {
        vocab = collectVocab(emRound(wf, vocab, maxLen, maxVocab))
        r += 1
      }
      vocab
    } finally Exec.release(wf)
  }

  /** [[seedCounts]] over an already-built word-freq frame (shared by
    * [[train]], which holds the frame across rounds).
    */
  private def seedCounts0(wordFreq: DataFrame, maxLen: Int): DataFrame =
    wordFreq
      .select(col("freq"), explode(expr(
        s"""flatten(transform(sequence(1, char_length(word), 1), i ->
           | transform(sequence(1,
           |     least($maxLen, char_length(word) - i + 1), 1),
           |   l -> substring(word, i, l))))""".stripMargin)).as("piece"))
      .groupBy("piece").agg(sum("freq").as("n"))

  /** Corpus-scale encoding, factored exactly like [[Bpe.encodeDocs]]:
    * segment the DISTINCT words (|V| Viterbi folds), join back to the
    * exploded corpus positions, reassemble per-document piece
    * sequences in token order. Returns (doc_id, pieces).
    */
  def encodeDocs(docs: DataFrame, textCol: String,
      vocab: Seq[(String, Long)], maxLen: Int = 4): DataFrame = {
    graft.functions.Functions.register(docs.sparkSession)
    val pos = docs.select(col("doc_id"), posexplode(expr(
      s"word_toks($textCol)"))
      .as(Seq("pos", "word")))
    val enc = segment(pos.select("word").distinct(), "word", vocab,
      maxLen)
    pos.join(enc, "word")
      .groupBy("doc_id")
      .agg(expr("flatten(transform(array_sort(" +
        "collect_list(struct(pos, pieces))), p -> p.pieces))")
        .as("pieces"))
  }
}
