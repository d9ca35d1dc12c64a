package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit rolling hash of every n-word
  * window of a string — the candidate-key generator for the exact
  * substring dedup (t17) and contamination (t15) operators.
  *
  * Why an expression and not `transform(sequence(...), i ->
  * xxhash64(array_join(slice(ws, i, n), " ")))`: that shape MATERIALIZES
  * one ~n*avg_word_len-byte string per window position just to hash it —
  * O(words * n * word_len) bytes allocated per document, billions of
  * throwaway strings at corpus scale, and higher-order functions are
  * CodegenFallback (they break the WholeStageCodegen span). This
  * expression hashes each word once and ROLLS the window polynomial in
  * O(1) per position — O(words) total — and stays inside codegen via
  * the [[SimHash64]] addReferenceObj pattern. The scan runs directly
  * over the UTF8String's UTF-8 BYTES (no per-row String decode): every
  * delimiter in the ASCII \s set is a single byte that can never occur
  * inside a multi-byte UTF-8 sequence, so byte-level splitting is exact.
  *
  * Tokenization: words are maximal runs of non-whitespace over the RE2
  * `\s` set — [ \t\n\f\r], deliberately WITHOUT vertical tab 0x0B
  * (see the companion's isWs note: Java regex `\s` additionally counts
  * VT, and t19's rebuild splitter must match THIS set exactly or its
  * removal indices misalign) — and there is deliberately NO empty-token
  * concept, so boundary whitespace is ignored. A DuckDB/Spark oracle
  * reformulation must therefore FULL-TRIM before splitting
  * (`regexp_replace(lower(text), '^\s+|\s+$', '', 'g')`): plain
  * `trim` strips only 0x20 spaces, and `split`/`regexp_split_to_array`
  * keep one empty token when the input starts or ends with a residual
  * tab/newline — a word list this expression would never produce. Window identity:
  * equal word sequences hash equal; distinct sequences collide with
  * ~2^-64 probability (same contract the xxhash64-of-string formulation
  * had — per-doc COUNTS are what the DuckDB oracle checks, and it
  * groups by the span text).
  */
case class WordWindowHashes(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"window size must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_window_hashes"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_window_hashes requires a STRING argument, got ${child.dataType.catalogString}")

  def compute(s: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(WordWindowHashes.hashes(s.getBytes, n))

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wwh", this, classOf[WordWindowHashes].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordWindowHashes =
    copy(child = newChild)
}

object WordWindowHashes {

  // polynomial base (FNV-64 prime) for word hashing and the window
  // roll; 2^64 wraparound IS the modulus
  private val P = 1099511628211L

  // RE2 \s — [\t\n\f\r ] — matching the DuckDB oracle dialect the
  // t15/t17 reformulations are written in. (Java regex \s additionally
  // matches vertical tab 0x0B; RE2's does not — a VT-containing text is
  // the one place Spark's split-based formulation and the oracle would
  // themselves disagree, so the expression sides with the oracle. All
  // are single bytes in UTF-8.)
  private def isWs(b: Byte): Boolean =
    b == ' '.toByte || b == '\t'.toByte || b == '\n'.toByte ||
      b == '\f'.toByte || b == '\r'.toByte

  private def wordHash(s: Array[Byte], start: Int, end: Int): Long = {
    // FNV-1a over the word's bytes, then a murmur-style finalizer —
    // equal words hash equal, and the finalizer decorrelates the
    // polynomial inputs
    var h = 0xcbf29ce484222325L
    var i = start
    while (i < end) { h ^= (s(i) & 0xffL); h *= P; i += 1 }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** Reference implementation — shared by eval, codegen, and tests.
    * Returns one 64-bit hash per n-word window (empty when the text has
    * fewer than n words), rolling in O(1) per position.
    */
  def hashes(bytes: Array[Byte], n: Int): Array[Long] = {
    val len = bytes.length
    // pass 1: count words (no allocations)
    var nWords = 0
    var i = 0
    var inWord = false
    while (i < len) {
      if (!isWs(bytes(i))) { if (!inWord) { nWords += 1; inWord = true } }
      else inWord = false
      i += 1
    }
    if (nWords < n) return Array.emptyLongArray
    // pass 2: per-word hashes
    val wh = new Array[Long](nWords)
    var w = 0
    i = 0
    while (i < len) {
      if (!isWs(bytes(i))) {
        val start = i
        while (i < len && !isWs(bytes(i))) i += 1
        wh(w) = wordHash(bytes, start, i)
        w += 1
      } else i += 1
    }
    // pass 3: rolling window polynomial h = sum wh(j) * P^(n-1-j)
    var pn = 1L // P^(n-1)
    var k = 1
    while (k < n) { pn *= P; k += 1 }
    val out = new Array[Long](nWords - n + 1)
    var h = 0L
    var j = 0
    while (j < n) { h = h * P + wh(j); j += 1 }
    out(0) = h
    j = n
    while (j < nWords) {
      h = (h - wh(j - n) * pn) * P + wh(j)
      out(j - n + 1) = h
      j += 1
    }
    out
  }

  /** String convenience overload (tests). */
  def hashes(text: String, n: Int): Array[Long] =
    hashes(text.getBytes(StandardCharsets.UTF_8), n)

  /** Column builder (Column <-> Expression via the Spark 4 classic API). */
  def wordWindowHashes(c: Column, n: Int): Column =
    GraftBridge.column(WordWindowHashes(GraftBridge.expression(c), n))
}
