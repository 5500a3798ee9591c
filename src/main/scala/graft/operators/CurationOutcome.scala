package graft.operators

/** The full-stack curation outcome vocabulary — ONE label set shared
  * by the batch decision log (q150/q116's `outcome` column), the
  * streamed feeds' per-batch yield frames
  * ([[graft.streaming.Streams.fullStackCurationFeed]]'s `yieldDir`
  * leg), and the audits that compare them. A document's outcome is
  * the FIRST stage that dropped it, in the CCNet production order
  * below, or [[Kept]]; per-stage yields are a `GROUP BY` over these
  * labels on either side, so the streamed and batch reports can never
  * drift apart on vocabulary.
  */
object CurationOutcome {
  val Blocklisted = "blocklisted"
  val Language = "language"
  val Contaminated = "contaminated"
  val Quality = "quality"
  val LmScore = "lm_score"
  val ExactDup = "exact_dup"
  val NearDup = "near_dup"
  val SpanDup = "span_dup"
  val Kept = "kept"

  /** Drop-stage labels in production stage order ([[Kept]] excluded). */
  val stages: Seq[String] = Seq(Blocklisted, Language, Contaminated,
    Quality, LmScore, ExactDup, NearDup, SpanDup)
}
