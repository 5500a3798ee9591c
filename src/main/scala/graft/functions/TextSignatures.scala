package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row document-signature kernels as NATIVE codegen'd expressions
  * (SURVEY custom-operator ladder step (b)).
  *
  * Why: the r2 signature pipelines computed minhash / simhash /
  * fingerprints by EXPLODING tokens or n-grams and re-aggregating per
  * doc_id — correct, but the Generate + groupBy puts a shuffle (and a
  * few million generated rows) between the scan and the signature. At
  * 100 TB that shuffle IS the job. A signature is a pure function of
  * one document, so these kernels compute it in one pass per row inside
  * whole-stage codegen: scan → signature, no Generate, no exchange; the
  * only remaining shuffle in a near-dup pipeline is the band-key
  * candidate join, which is the part that genuinely needs data movement.
  *
  * Numerical contract (bit-exact with the DuckDB oracles and with the
  * explode-based forms they replace — gated by FunctionsSpec):
  *  - tokens   = java.util.regex `\w+` over Spark-lowercased text
  *    (identical to `regexp_extract_all(lower(text), '\\w+', 0)`);
  *  - hash60(s) = first 15 hex digits of md5(s) as an unsigned long
  *    (identical to `conv(substring(md5(s), 1, 15), 16, 10)`): the
  *    first 8 digest bytes big-endian, shifted right 4;
  *  - minhash  = min over 3-word shingles of (a_k·(h mod p) + b_k) mod p,
  *    p = 2^31−1 (products < 2^62: exact long arithmetic);
  *  - simhash  = 60 frequency-weighted bit votes over the token multiset,
  *    bit set iff its vote sum is positive;
  *  - fingerprint = lexicographic min of md5 hex over char 8-grams
  *    (ASCII hex: Java String order == UTF8String binary order).
  */
object TextSignatures {
  val MhP = 2147483647L // 2^31 - 1 (Mersenne prime)
  val MinhashK = 16     // signature width
  val Bands = 4         // LSH bands (rows per band = 4)
  val MhAB: IndexedSeq[(Long, Long)] = (0 until MinhashK).map { k =>
    (((k + 1) * 2654435761L) % MhP, ((k + 1) * 2246822519L) % MhP)
  }
  private val mhA = MhAB.map(_._1).toArray
  private val mhB = MhAB.map(_._2).toArray

  private val tokenPattern = Pattern.compile("\\w+")
  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }
  private val Hex = "0123456789abcdef".toCharArray

  private def tokenize(text: UTF8String): java.util.ArrayList[String] = {
    // UTF8String.toLowerCase is what Spark's lower() evaluates — using
    // it keeps the kernel identical to the SQL form on non-ASCII too.
    val m = tokenPattern.matcher(text.toLowerCase.toString)
    val out = new java.util.ArrayList[String]()
    while (m.find()) out.add(m.group())
    out
  }

  /** First 15 md5 hex digits as unsigned long (60 bits). */
  private def md5Hash60(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  private def md5Hex(s: String): String = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = Hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = Hex(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** 16-long minhash signature; null when the text has < 3 tokens
    * (such docs have no shingles and are absent from the explode form).
    */
  def minhashSig(text: UTF8String): ArrayData = {
    val toks = tokenize(text)
    val n = toks.size
    if (n < 3) return null
    val mins = Array.fill(MinhashK)(Long.MaxValue)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= n - 3) {
      sb.setLength(0)
      sb.append(toks.get(i)).append(' ')
        .append(toks.get(i + 1)).append(' ').append(toks.get(i + 2))
      val h = md5Hash60(sb.toString) % MhP
      var k = 0
      while (k < MinhashK) {
        val p = (mhA(k) * h + mhB(k)) % MhP
        if (p < mins(k)) mins(k) = p
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 60-bit simhash; null when the text has no tokens. */
  def simhash60(text: UTF8String): java.lang.Long = {
    val toks = tokenize(text)
    if (toks.isEmpty) return null
    val votes = new Array[Int](60)
    var i = 0
    while (i < toks.size) {
      val h = md5Hash60(toks.get(i))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  /** Distinct sorted 60-bit hashes of the 3-word shingles; null when
    * < 3 tokens. Sorted so array_min is element 0 and output is
    * deterministic (collect_set order was not, but nothing downstream
    * observed it).
    */
  def shingleHashes(text: UTF8String): ArrayData = {
    val toks = tokenize(text)
    val n = toks.size
    if (n < 3) return null
    val set = new java.util.TreeSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i <= n - 3) {
      sb.setLength(0)
      sb.append(toks.get(i)).append(' ')
        .append(toks.get(i + 1)).append(' ').append(toks.get(i + 2))
      set.add(java.lang.Long.valueOf(md5Hash60(sb.toString)))
      i += 1
    }
    val out = new Array[Long](set.size)
    val it = set.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** Distinct hashed char-n-gram feature ids of the LOWERCASED text in
    * first-seen order — the [[graft.operators.LangId]] featurizer as
    * one compiled pass. Bit-identical to the SQL form it replaces,
    * `array_distinct(transform(<code-point n-grams of lower(text)>,
    * t -> cast(conv(substring(md5(t), 1, 4), 16, 10) as bigint)
    * % dims))`: the first 4 md5 hex digits are the first 2 digest
    * bytes as an unsigned 16-bit int; grams are CODE-POINT windows
    * (SQL substring counts code points — the zh markers are
    * supplementary-plane-safe the same way [[minGramMd5]] is); the
    * empty array (never null) when the text has < n code points (the
    * SQL form's char_length guard). The SQL chain allocated a hex
    * string + a conv parse + an UTF8String per gram and ran the
    * lambda interpreted; this is one MessageDigest reused across the
    * row (measured as the q151 featurize hot spot).
    */
  def lidFeatures(text: UTF8String, dims: Int, n: Int): ArrayData = {
    val cps = text.toLowerCase.toString.codePoints().toArray
    if (cps.length < n)
      return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    val md = md5Local.get()
    var i = 0
    while (i + n <= cps.length) {
      md.reset()
      val d = md.digest(
        new String(cps, i, n).getBytes(StandardCharsets.UTF_8))
      val h = (((d(0) & 0xffL) << 8) | (d(1) & 0xffL)) % dims
      seen.add(java.lang.Long.valueOf(h))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(out)
  }

  /** The house tokenization as one byte-scan pass:
    * `regexp_extract_all(lower(text), '\\w+', 0)` bit for bit. Java's
    * `\w` (no UNICODE flag) is exactly [a-zA-Z0-9_] — pure ASCII — so
    * a maximal `\w+` match in the lowered STRING is a maximal
    * ASCII-word-byte run in its UTF-8 ENCODING (multi-byte sequences
    * contain no ASCII bytes), and each token is the corresponding
    * byte slice. Lowercasing is UTF8String.toLowerCase — the same
    * operation Spark's lower() evaluates. The regex form pays a
    * UTF-16 toString of every document plus matcher machinery per
    * row; this is one pass over the lowered bytes.
    */
  def wordToks(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    def isWord(b: Byte): Boolean =
      (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9') ||
        (b >= 'A' && b <= 'Z') || b == '_'
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      if (isWord(bytes(i))) {
        val start = i
        while (i < n && isWord(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(
          java.util.Arrays.copyOfRange(bytes, start, i)))
      } else i += 1
    }
    val arr = new Array[Any](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    new GenericArrayData(arr)
  }

  /** The Gopher quality statistics of a token array in one compiled
    * pass: struct(n_tokens, len_sum, n_alpha, n_distinct) —
    * bit-identical inputs to the SQL chain it replaces (each of which
    * traversed the array separately, two through interpreted HOF
    * lambdas and one through a per-token REGEX):
    *  - n_tokens   = size(toks)
    *  - len_sum    = aggregate(transform(toks, x -> length(x)), 0, +)
    *    (length counts code points; int accumulator — token arrays
    *    can't overflow it)
    *  - n_alpha    = size(filter(toks, x -> x rlike '^[a-z]+$')) — a
    *    non-empty token of only a–z BYTES (any non-ASCII byte fails
    *    the regex's [a-z] too)
    *  - n_distinct = size(array_distinct(toks))
    */
  def gopherStats(toks: ArrayData): org.apache.spark.sql.catalyst
      .expressions.GenericInternalRow = {
    val n = toks.numElements()
    var lenSum = 0L
    var nAlpha = 0L
    val seen = new java.util.HashSet[UTF8String]()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      lenSum += t.numChars()
      val b = t.getBytes
      var alpha = b.length > 0
      var j = 0
      while (alpha && j < b.length) {
        if (b(j) < 'a' || b(j) > 'z') alpha = false
        j += 1
      }
      if (alpha) nAlpha += 1
      seen.add(t)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n.toLong, lenSum, nAlpha, seen.size.toLong))
  }

  /** Per-document distinct-bigram occurrence counts of a token array,
    * in first-seen order: array<struct<w1, w2, n_occ>> — the q113
    * bigram-LM feature frame as ONE compiled pass per row. Replaces
    * explode(zip_with(slice, slice, named_struct)) + groupBy(doc_id,
    * w1, w2): the per-DOC grouping needs no data movement at all (a
    * document's bigrams are already co-located in its row), so the
    * corpus-token-sized exchange that hash aggregate paid disappears;
    * every downstream consumer (the c2 model counts, the scoring
    * join) is order-independent over this row set, so first-seen
    * order is as good as any. Null tokens (impossible from the house
    * tokenizer, handled anyway) key like SQL grouping: null = null.
    */
  def tokBigramCounts(toks: ArrayData): ArrayData = {
    val n = toks.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val m = new java.util.LinkedHashMap[(UTF8String, UTF8String), Array[Long]]()
    var i = 0
    var prev: UTF8String =
      if (toks.isNullAt(0)) null else toks.getUTF8String(0)
    while (i < n - 1) {
      val cur =
        if (toks.isNullAt(i + 1)) null else toks.getUTF8String(i + 1)
      val k = (prev, cur)
      val c = m.get(k)
      if (c == null) m.put(k, Array(1L)) else c(0) += 1L
      prev = cur
      i += 1
    }
    val out = new Array[Any](m.size())
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(
          Array[Any](e.getKey._1, e.getKey._2, e.getValue()(0)))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct hashed feature ids of a TOKEN ARRAY in first-seen order
    * — the [[graft.operators.QualityModel]] featurizer as one compiled
    * pass. Bit-identical to the SQL form it replaces,
    * `array_distinct(transform(toks, t -> cast(conv(substring(md5(t),
    * 1, 4), 16, 10) as bigint) % dims))`: the first 4 md5 hex digits
    * are the first 2 digest bytes as an unsigned 16-bit int (≥ 0, so
    * SQL % = Java %); a null ELEMENT maps to a null feature id kept at
    * its first occurrence, exactly as the lambda (md5(null) = null)
    * and array_distinct do. The SQL chain allocated a hex string + a
    * conv parse + an UTF8String per token and ran the lambda
    * interpreted (the q151 lesson, replayed on the word-token
    * featurizer).
    */
  def tokFids(toks: ArrayData, dims: Int): ArrayData = {
    val n = toks.numElements()
    val seen = new java.util.LinkedHashSet[Any]()
    val md = md5Local.get()
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) seen.add(null)
      else {
        md.reset()
        val d = md.digest(toks.getUTF8String(i).getBytes)
        seen.add(java.lang.Long.valueOf(
          (((d(0) & 0xffL) << 8) | (d(1) & 0xffL)) % dims))
      }
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = it.next(); j += 1 }
    new GenericArrayData(out)
  }

  /** Lexicographic min of md5 hex over the character n-grams of the
    * input (the q36 winnowing fingerprint); null when length < n.
    * Grams are indexed by CODE POINT, not UTF-16 code unit — Spark's
    * `substring`/`length` and DuckDB's `substr`/`length` both count code
    * points, so a code-unit loop would diverge from the SQL forms (and
    * split surrogate pairs) on supplementary characters.
    */
  def minGramMd5(text: UTF8String, gramLen: Int): UTF8String = {
    // r21: per-gram work drops from (String alloc + UTF-8 encode +
    // hex-string alloc + hex compare) to (digest over a byte RANGE of
    // the one whole-text encoding + unsigned byte compare) — the hex
    // of the digest is ordered exactly like its unsigned bytes, and a
    // gram's UTF-8 encoding is the corresponding byte slice of the
    // whole text's encoding (UTF-8 is context-free per code point;
    // parquet strings are well-formed). Same min, hexed once at the
    // end — bit-identical output (FunctionsSpec fingerprint laws).
    val cps = text.toString.codePoints().toArray
    if (cps.length < gramLen) return null
    val bytes = text.getBytes
    // byte offset of each code-point start (+ end sentinel): a start
    // byte is anything but a 10xxxxxx continuation byte
    var nStarts = 0
    var bi = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xc0) != 0x80) nStarts += 1
      bi += 1
    }
    if (nStarts != cps.length) {
      // byte walk and code-point walk disagree (malformed UTF-8):
      // take the allocation-heavy but definition-exact path
      var bestHex: String = null
      var i = 0
      while (i + gramLen <= cps.length) {
        val hex = md5Hex(new String(cps, i, gramLen))
        if (bestHex == null || hex.compareTo(bestHex) < 0) bestHex = hex
        i += 1
      }
      return UTF8String.fromString(bestHex)
    }
    val starts = new Array[Int](cps.length + 1)
    var ci = 0
    bi = 0
    while (bi < bytes.length) {
      if ((bytes(bi) & 0xc0) != 0x80) { starts(ci) = bi; ci += 1 }
      bi += 1
    }
    starts(cps.length) = bytes.length
    val md = md5Local.get()
    var best: Array[Byte] = null
    var i = 0
    while (i + gramLen <= cps.length) {
      md.reset()
      md.update(bytes, starts(i), starts(i + gramLen) - starts(i))
      val d = md.digest()
      if (best == null || {
        var j = 0
        var cmp = 0
        while (j < 16 && cmp == 0) {
          cmp = (d(j) & 0xff) - (best(j) & 0xff); j += 1
        }
        cmp < 0
      }) best = d
      i += 1
    }
    val out = new Array[Char](32)
    var j = 0
    while (j < 16) {
      out(2 * j) = Hex((best(j) >> 4) & 0xf)
      out(2 * j + 1) = Hex(best(j) & 0xf)
      j += 1
    }
    UTF8String.fromString(new String(out))
  }
}

/** Base for the string → signature expressions: null-safe, non-codegen
  * fallback via nullSafeEval, codegen = one static call into
  * [[TextSignatures]] (the kernel is a single compiled method, so the
  * expression stays inside whole-stage codegen without inlining risk).
  */
sealed abstract class TextSignatureExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string column, got ${child.dataType.simpleString}")
  // All of these map some non-null inputs (too-short documents) to null.
  override def nullable: Boolean = true

  /** Java expression producing the (nullable, boxed) result from the
    * input variable; the generated guard assigns isNull/value.
    */
  protected def kernelCall(input: String): String
  protected def javaResultType: String

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sigResult")
      s"""
         |$javaResultType $r = ${kernelCall(c)};
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })
}

/** `minhash_sig(text)` → array<long> of 16 permuted minima. */
final case class MinhashSig(child: Expression)
    extends TextSignatureExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(input: Any): Any =
    TextSignatures.minhashSig(input.asInstanceOf[UTF8String])
  override protected def kernelCall(input: String): String =
    s"graft.functions.TextSignatures.minhashSig($input)"
  override protected def javaResultType: String =
    "org.apache.spark.sql.catalyst.util.ArrayData"
  override protected def withNewChildInternal(c: Expression): MinhashSig =
    copy(child = c)
}

/** `simhash60(text)` → 60-bit simhash as long. */
final case class Simhash60(child: Expression)
    extends TextSignatureExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"
  override def nullSafeEval(input: Any): Any =
    TextSignatures.simhash60(input.asInstanceOf[UTF8String])
  override protected def kernelCall(input: String): String =
    s"graft.functions.TextSignatures.simhash60($input)"
  override protected def javaResultType: String = "java.lang.Long"
  override protected def withNewChildInternal(c: Expression): Simhash60 =
    copy(child = c)
}

/** `shingle_hashes(text)` → distinct sorted array<long> of 60-bit
  * 3-word-shingle hashes.
  */
final case class ShingleHashes(child: Expression)
    extends TextSignatureExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(input: Any): Any =
    TextSignatures.shingleHashes(input.asInstanceOf[UTF8String])
  override protected def kernelCall(input: String): String =
    s"graft.functions.TextSignatures.shingleHashes($input)"
  override protected def javaResultType: String =
    "org.apache.spark.sql.catalyst.util.ArrayData"
  override protected def withNewChildInternal(c: Expression): ShingleHashes =
    copy(child = c)
}

/** `lid_features(text, dims, n)` → array<long> of distinct hashed
  * char-n-gram feature ids (first-seen order). `dims` and `n` must be
  * foldable positive integer literals (they shape the kernel, not the
  * data) — the [[MinGramMd5]] convention.
  */
final case class LidFeatures(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
  private lazy val dims: Int =
    second.eval(null).asInstanceOf[Number].intValue()
  private lazy val gramLen: Int =
    third.eval(null).asInstanceOf[Number].intValue()

  private def intLit(e: Expression): Boolean =
    e.foldable &&
      Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(e.dataType) &&
      e.eval(null) != null &&
      e.eval(null).asInstanceOf[Number].intValue() >= 1

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"lid_features expects a string column, got ${first.dataType.simpleString}")
    else if (!intLit(second) || !intLit(third))
      TypeCheckResult.TypeCheckFailure(
        "lid_features dims and gram length must be positive integer literals")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lid_features"
  override def nullSafeEval(input: Any, d: Any, n: Any): Any =
    TextSignatures.lidFeatures(input.asInstanceOf[UTF8String], dims,
      gramLen)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, _, _) => {
      s"""
         |${ev.value} = graft.functions.TextSignatures.lidFeatures(
         |  $c, $dims, $gramLen);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): LidFeatures =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `word_toks(text)` → array<string>: the house `\w+`-over-lowered
  * tokenization as a native byte-scan kernel (see
  * [[TextSignatures.wordToks]] for the bit-identical SQL form).
  */
final case class WordToks(child: Expression)
    extends TextSignatureExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_toks"
  // Unlike the signature kernels, every non-null input has an output
  // (possibly the empty array) — same as regexp_extract_all.
  override def nullable: Boolean = child.nullable
  override def nullSafeEval(input: Any): Any =
    TextSignatures.wordToks(input.asInstanceOf[UTF8String])
  override protected def kernelCall(input: String): String =
    s"graft.functions.TextSignatures.wordToks($input)"
  override protected def javaResultType: String =
    "org.apache.spark.sql.catalyst.util.ArrayData"
  override protected def withNewChildInternal(
      newChild: Expression): WordToks = copy(child = newChild)
}

/** `gopher_stats(toks)` → struct<n_tokens, len_sum, n_alpha,
  * n_distinct> — the Gopher quality statistics in one compiled pass
  * (see [[TextSignatures.gopherStats]]).
  */
final case class GopherStats(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"gopher_stats expects array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("len_sum", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false)))
  override def prettyName: String = "gopher_stats"
  override def nullSafeEval(input: Any): Any =
    TextSignatures.gopherStats(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TextSignatures.gopherStats($c);
       """.stripMargin
    })
  override protected def withNewChildInternal(
      newChild: Expression): GopherStats = copy(child = newChild)
}

/** `tok_bigram_counts(toks)` → array<struct<w1, w2, n_occ>> of the
  * token array's distinct-bigram occurrence counts (the q113 per-doc
  * feature frame; see [[TextSignatures.tokBigramCounts]]).
  */
final case class TokBigramCounts(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"tok_bigram_counts expects array<string>, got ${other.simpleString}")
    }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("w1", StringType,
      nullable = child.dataType.asInstanceOf[ArrayType].containsNull),
    StructField("w2", StringType,
      nullable = child.dataType.asInstanceOf[ArrayType].containsNull),
    StructField("n_occ", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "tok_bigram_counts"
  override def nullSafeEval(input: Any): Any =
    TextSignatures.tokBigramCounts(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.TextSignatures.tokBigramCounts($c);
       """.stripMargin
    })
  override protected def withNewChildInternal(
      newChild: Expression): TokBigramCounts = copy(child = newChild)
}

/** `tok_fids(toks, dims)` → array<long> of distinct hashed feature
  * ids of a token array in first-seen order (the QualityModel
  * featurizer; see [[TextSignatures.tokFids]] for the bit-identical
  * SQL form). `dims` must be a foldable positive integer literal.
  */
final case class TokFids(left: Expression, right: Expression)
    extends BinaryExpression {
  private lazy val dims: Int =
    right.eval(null).asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    left.dataType match {
      case ArrayType(StringType, _)
          if right.foldable &&
            Seq[DataType](ByteType, ShortType, IntegerType, LongType)
              .contains(right.dataType) &&
            right.eval(null) != null &&
            right.eval(null).asInstanceOf[Number].intValue() >= 1 =>
        TypeCheckResult.TypeCheckSuccess
      case ArrayType(StringType, _) =>
        TypeCheckResult.TypeCheckFailure(
          "tok_fids dims must be a positive integer literal")
      case other => TypeCheckResult.TypeCheckFailure(
        s"tok_fids expects an array<string> column, got ${other.simpleString}")
    }

  override def dataType: DataType =
    ArrayType(LongType, containsNull =
      left.dataType.asInstanceOf[ArrayType].containsNull)
  override def prettyName: String = "tok_fids"
  override def nullSafeEval(input: Any, d: Any): Any =
    TextSignatures.tokFids(input.asInstanceOf[ArrayData], dims)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, _) => {
      s"""
         |${ev.value} = graft.functions.TextSignatures.tokFids($c, $dims);
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): TokFids =
    copy(left = newLeft, right = newRight)
}

/** `min_gram_md5(text, n)` → lexicographic-min md5 hex over char
  * n-grams. `n` must be a foldable positive integer literal (it shapes
  * the kernel, not the data), so it participates in analysis as a
  * normal child but is folded to a constant in the generated code.
  */
final case class MinGramMd5(left: Expression, right: Expression)
    extends BinaryExpression {
  private lazy val gramLen: Int =
    right.eval(null).asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"min_gram_md5 expects a string column, got ${left.dataType.simpleString}")
    else if (!right.foldable ||
        !Seq[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(right.dataType) ||
        right.eval(null) == null ||
        right.eval(null).asInstanceOf[Number].intValue() < 1)
      TypeCheckResult.TypeCheckFailure(
        "min_gram_md5 gram length must be a positive integer literal")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "min_gram_md5"
  // Maps non-null too-short inputs to null.
  override def nullable: Boolean = true
  override def nullSafeEval(input: Any, len: Any): Any =
    TextSignatures.minGramMd5(input.asInstanceOf[UTF8String], gramLen)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (c, _) => {
      val r = ctx.freshName("sigResult")
      s"""
         |org.apache.spark.unsafe.types.UTF8String $r =
         |  graft.functions.TextSignatures.minGramMd5($c, $gramLen);
         |if ($r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $r;
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MinGramMd5 =
    copy(left = newLeft, right = newRight)
}
