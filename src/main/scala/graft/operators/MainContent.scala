package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** MAIN-CONTENT (boilerplate) extraction — the production stage between
  * fetch and language-ID in every web-curation pipeline the engine
  * models (CCNet/RefinedWeb/FineWeb all run a trafilatura/jusText-class
  * extractor before any text statistic): split a page into LINES,
  * score each line by the three signals the jusText family decides
  * on — token mass, LINK DENSITY, and STOPWORD DENSITY — then apply
  * jusText's context smoothing to the short band. The rule is
  * deterministic integer arithmetic end to end (the q52 no-libm
  * doctrine); per line:
  *
  *  - BOILERPLATE if anchor-text chars reach half the plain chars
  *    (`linkc · 2 >= plain_chars` — link density dominates every other
  *    signal, as in jusText);
  *  - CONTENT if ≥ `minTokens` word tokens (the long band — accepted
  *    without the stopword test; jusText's `stopwords_low` gate is
  *    applied to the SHORT band here, the corpus-calibration knob for
  *    the synthetic low-stopword test corpus);
  *  - NEAR-CONTENT if ≥ `nearTokens` tokens AND stopword density
  *    ≥ 25% (`nstop · 4 >= ntok`, the q34/q35 stopword list) — a
  *    short line that reads like prose;
  *  - BOILERPLATE otherwise.
  *
  * Context smoothing (jusText's short-block rule, exact form): a
  * NEAR-CONTENT line is kept iff BOTH its neighbouring lines are
  * CONTENT — a short sentence between two paragraphs belongs to the
  * body; the same sentence against a nav block does not. No model, no
  * corpus statistics — the stateless per-row form, so it composes
  * PRE-SINK in a streaming feed and costs zero shuffle at any scale
  * (codegen regex + HOFs in one projection; each derived array rides a
  * Generate barrier so its several consumers share one evaluation —
  * the tokenized lesson).
  *
  * Reference anchor: jusText (Pomikálek 2011) and trafilatura's
  * precision profile reduce, at their core, to exactly these per-block
  * signals (link density, length, stopword density, neighbour
  * context). q153 is the oracle-checked audit; [[extract]] is the feed
  * stage (swap a page's text for its extracted main content, all
  * other columns untouched).
  */
object MainContent {

  /** The q34/q35 stopword list — ONE list across the quality family. */
  private val Stopwords = Seq("the", "a", "and", "of", "to")
  private def stopSetSql: String = Stopwords.map(w => s"'$w'").mkString(", ")

  /** Per-line (plain, linkc, toks) struct array of `textCol`: lines
    * split on '\n'; `plain` = tags → space, whitespace collapse, trim;
    * `linkc` = total chars of anchor INNER text — the `(\s[^>]*)?`
    * group admits attribute-free `<a>` anchors (nested markup inside
    * an anchor still truncates at the first inner tag — the documented
    * regex-not-parser limitation, shared with the oracle); `toks` =
    * the plain line's word tokens.
    */
  private def lineStatsSql(textCol: String): String =
    s"""transform(
       | transform(split($textCol, '\\n'), l -> named_struct(
       |  'plain', trim(regexp_replace(regexp_replace(l,
       |    '<[^>]+>', ' '), '\\\\s+', ' ')),
       |  'linkc', aggregate(
       |    regexp_extract_all(l, '<a(\\\\s[^>]*)?>([^<]*)</a>', 2),
       |    0L, (a, x) -> a + char_length(x)))),
       | x -> named_struct('plain', x.plain, 'linkc', x.linkc,
       |  'toks', regexp_extract_all(x.plain, '\\\\w+', 0)))"""
      .stripMargin

  /** First-pass 3-way class per line: 2 = CONTENT, 1 = NEAR-CONTENT,
    * 0 = BOILERPLATE. Link density is checked first (an empty line has
    * 0 ≥ 0 chars and falls here too); the short band carries the
    * integer stopword-density test.
    */
  private def classSql(minTokens: Int, nearTokens: Int): String =
    s"""transform(__mc_st, x -> CASE
       | WHEN x.linkc * 2 >= char_length(x.plain) THEN 0
       | WHEN size(x.toks) >= $minTokens THEN 2
       | WHEN size(x.toks) >= $nearTokens AND size(filter(x.toks,
       |   t -> lower(t) IN ($stopSetSql))) * 4 >= size(x.toks) THEN 1
       | ELSE 0 END)""".stripMargin

  /** Second pass — context smoothing over the class array: CONTENT
    * lines are kept; a NEAR-CONTENT line is kept iff both neighbours
    * (in raw line order, boilerplate included) are CONTENT. Lambda
    * index `i` is 0-based; `element_at` is 1-based.
    */
  private def contentFilterSql: String =
    s"""filter(__mc_st, (x, i) ->
       | element_at(__mc_cls, i + 1) = 2 OR (
       |  element_at(__mc_cls, i + 1) = 1 AND i > 0
       |  AND i + 2 <= size(__mc_cls)
       |  AND element_at(__mc_cls, i) = 2
       |  AND element_at(__mc_cls, i + 2) = 2))""".stripMargin

  /** `docs` with `__mc_st` (all lines), `__mc_cls` (per-line class),
    * and `__mc_cs` (kept lines) behind Generate barriers — each array
    * feeds several consumers, and a plain alias would substitute the
    * HOF chain into every reference.
    */
  private def withLineStats(docs: DataFrame, textCol: String,
      minTokens: Int, nearTokens: Int): DataFrame =
    docs
      .select(col("*"),
        explode(array(expr(lineStatsSql(textCol)))).as("__mc_st"))
      .select(col("*"),
        explode(array(expr(classSql(minTokens, nearTokens))))
          .as("__mc_cls"))
      .select(col("*"),
        explode(array(expr(contentFilterSql))).as("__mc_cs"))

  /** The extraction REPORT — one row per document: line counts, the
    * extracted content's char count, and its md5 (the hash the q27
    * dedup key sees post-extraction — boilerplate-invariant dedup is
    * the point of running this before the dedup stores). Column
    * `content` carries the extracted text for downstream stages.
    */
  def report(docs: DataFrame, textCol: String,
      minTokens: Int = 8, nearTokens: Int = 3): DataFrame =
    withLineStats(docs, textCol, minTokens, nearTokens)
      .withColumn("content",
        trim(expr("array_join(transform(__mc_cs, x -> x.plain), ' ')")))
      .select(col("doc_id"),
        size(col("__mc_st")).cast(LongType).as("n_lines"),
        size(col("__mc_cs")).cast(LongType).as("n_content_lines"),
        length(col("content")).cast(LongType).as("content_chars"),
        md5(col("content")).as("content_hash"),
        col("content"))

  /** The FEED stage: swap `textCol` for the extracted main content,
    * every other column untouched. Documents with zero content lines
    * keep an empty string and fall to the later gates naturally (no
    * tokens → no language, no perplexity, no admission). Stateless
    * per-row — composes before the LID gate in
    * [[graft.streaming.Streams.fullStackCurationFeed]].
    */
  def extract(docs: DataFrame, textCol: String,
      minTokens: Int = 8, nearTokens: Int = 3): DataFrame =
    withLineStats(docs, textCol, minTokens, nearTokens)
      .withColumn(textCol,
        trim(expr("array_join(transform(__mc_cs, x -> x.plain), ' ')")))
      .select(docs.columns.map(col): _*)
}
