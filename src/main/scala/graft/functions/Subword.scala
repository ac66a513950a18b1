package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Subword (BPE-style) token accounting — the metering unit of a training
  * pipeline. Tokenization is greedy longest-prefix segmentation against a
  * merged-subword vocabulary (the inference-time form of a trained BPE /
  * WordPiece merge table): at each position strip the LONGEST vocabulary
  * entry that prefixes the remaining word, else strip one character; every
  * strip is one token. Deterministic, order-independent, and replayable as
  * a recursive longest-prefix strip in ANSI SQL — which is exactly how the
  * DuckDB oracle gates it.
  *
  * The matcher is a plan-time constant shipped INSIDE the expression (via
  * the codegen reference array), so at 100 TB the count is a narrow
  * map-only projection inside whole-stage codegen — no broadcast join, no
  * UDF barrier, no shuffle. Real merge tables are a few 10k entries; the
  * first-char index keeps the per-position probe at the handful of entries
  * sharing the leading character.
  */
object Subword {

  /** Deterministic default merge table: high-frequency English subwords and
    * suffixes plus digram merges — enough structure that counts diverge
    * meaningfully from whitespace and character counts. Entries must be
    * non-empty and space-free (a space would let a match cross the word
    * boundary the segmentation is defined over). Single source for the
    * Spark expression AND the DuckDB oracle (SparkEntry interpolates it). */
  val DefaultVocab: Seq[String] = Seq(
    "the", "and", "ing", "ion", "tion", "ation", "ent", "ment", "ence",
    "ness", "able", "ible", "ous", "ive", "ize", "ed", "es", "er", "est",
    "ly", "al", "ar", "an", "at", "en", "in", "on", "or", "re", "st",
    "te", "ti", "to", "is", "it", "of", "se", "le", "ll", "nt", "nd",
    "th", "he", "ve", "co", "de", "di", "un", "us", "ra", "ri", "ro",
    "li", "la", "ne", "ch", "sh", "qu", "wh", "ou", "ow", "ee", "oo",
    "ea", "ai", "00", "19", "20")
}

/** Greedy longest-prefix segmenter over a fixed vocabulary. Serializable:
  * the instance rides to executors inside the expression (interpreted path)
  * and through the codegen reference array (compiled path); the first-char
  * index is rebuilt lazily on each JVM. */
final class SubwordMatcher(val tokens: Array[String]) extends Serializable {
  require(tokens.forall(t => t.nonEmpty && !t.contains(' ')),
    "subword vocabulary entries must be non-empty and space-free")

  /** Vocabulary grouped by first char, longest first — the greedy probe
    * scans only entries sharing the leading character and stops at the
    * first (= longest) region match. */
  @transient private lazy val byFirst: java.util.HashMap[Character, Array[String]] = {
    val m = new java.util.HashMap[Character, Array[String]]()
    tokens.groupBy(_.charAt(0)).foreach { case (c, ts) =>
      m.put(c, ts.sortBy(-_.length))
    }
    m
  }

  private val asciiVocab: Boolean = tokens.forall(_.forall(_ < 0x80))

  /** Byte-level vocabulary index for the ASCII fast path: 128 slots by
    * first byte, entries longest-first as UTF-8 byte arrays. */
  @transient private lazy val byFirstByte: Array[Array[Array[Byte]]] = {
    val idx = new Array[Array[Array[Byte]]](128)
    tokens.groupBy(_.charAt(0)).foreach { case (c, ts) =>
      if (c < 0x80) idx(c) = ts.sortBy(-_.length)
        .map(_.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    }
    idx
  }

  /** Token count of the whole (already sanitized) string: spaces separate
    * words and emit nothing; within a word, longest vocab prefix else one
    * char per token. Because no vocab entry contains a space, the one-pass
    * scan is identical to per-word segmentation.
    *
    * Hot path: scan the UTF8String's bytes directly — no String copy, no
    * UTF-16 decode — valid because for pure-ASCII input 1 byte = 1 char and
    * an ASCII vocabulary matches byte-for-byte. The first non-ASCII byte
    * (a UTF-8 lead byte is always visited: matches cover only ASCII vocab
    * bytes and the fallback advances one byte) bails to the exact UTF-16
    * String path for the whole value. */
  def count(text: UTF8String): Long = {
    if (!asciiVocab) return count(text.toString)
    val n = text.numBytes()
    var cnt = 0L
    var i = 0
    while (i < n) {
      val b = text.getByte(i)
      if (b < 0) return count(text.toString) // non-ASCII: exact slow path
      if (b == ' ') i += 1
      else {
        var step = 1
        val cand = byFirstByte(b)
        if (cand != null) {
          var j = 0
          while (j < cand.length && step == 1) {
            val t = cand(j)
            if (t.length > 1 && i + t.length <= n) {
              var k = 1
              while (k < t.length && text.getByte(i + k) == t(k)) k += 1
              if (k == t.length) step = t.length
            }
            j += 1
          }
        }
        cnt += 1
        i += step
      }
    }
    cnt
  }

  def count(s: String): Long = {
    var n = 0L
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      if (c == ' ') i += 1
      else {
        var step = 1
        val cand = byFirst.get(c)
        if (cand != null) {
          var j = 0
          while (j < cand.length && step == 1) {
            val t = cand(j)
            if (t.length > 1 && i + t.length <= len && s.regionMatches(i, t, 0, t.length)) {
              // entries are longest-first, so the first hit is the greedy one
              // (1-char entries are equivalent to the fallback)
              step = t.length
            }
            j += 1
          }
        }
        // No vocab hit on a supplementary-plane character: advance over the
        // whole surrogate PAIR so it counts as ONE unmatched token, matching
        // the documented per-code-point oracle semantics (a lone unit would
        // otherwise count twice — r6 ADVICE).
        if (step == 1 && Character.isHighSurrogate(c) && i + 1 < len
          && Character.isLowSurrogate(s.charAt(i + 1))) step = 2
        n += 1
        i += step
      }
    }
    n
  }
}

/** `bpe_count(text)` → BIGINT subword token count of the sanitized text
  * (see [[SubwordMatcher]]). The vocabulary is a plan-time constant. */
case class BpeCount(child: Expression, vocab: Seq[String]) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = InputCheck.string(child, "bpe_count")
  override def dataType: DataType = LongType

  @transient private lazy val matcher = new SubwordMatcher(vocab.toArray)

  override protected def nullSafeEval(v: Any): Any =
    matcher.count(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("subwordMatcher", matcher, classOf[SubwordMatcher].getName)
    defineCodeGen(ctx, ev, c => s"$m.count($c)")
  }

  override protected def withNewChildInternal(c: Expression): BpeCount = copy(child = c)
}
