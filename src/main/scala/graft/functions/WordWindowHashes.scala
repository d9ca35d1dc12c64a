package graft.functions

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
  * O(1) per position — O(words) total, zero intermediate strings — and
  * stays inside codegen via the [[SimHash64]] addReferenceObj pattern.
  *
  * Tokenization mirrors `split(<input>, "\\s+")` exactly (ASCII \s set,
  * empty tokens skipped); pass `lower(trim(col))` as the child to match
  * the t-family normalization. Window identity: equal word sequences
  * hash equal; distinct sequences collide with ~2^-64 probability (same
  * contract the xxhash64-of-string formulation had — per-doc COUNTS are
  * what the DuckDB oracle checks, and it groups by the span text).
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
    UnsafeArrayData.fromPrimitiveArray(WordWindowHashes.hashes(s.toString, n))

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

  // polynomial base (FNV-64 prime) and the removal multiplier P^(n-1)
  // are fixed per window size; 2^64 wraparound IS the modulus
  private val P = 1099511628211L

  // `split("\\s+")` whitespace, exactly (Java regex \s is the ASCII
  // set — NOT Character.isWhitespace, which adds Unicode spaces)
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == 11.toChar || c == '\f' || c == '\r'

  private def wordHash(s: String, start: Int, end: Int): Long = {
    // FNV-1a over chars, then a murmur-style finalizer — equal words
    // hash equal, and the finalizer decorrelates the polynomial inputs
    var h = 0xcbf29ce484222325L
    var i = start
    while (i < end) { h ^= s.charAt(i); h *= P; i += 1 }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^ (h >>> 33)
  }

  /** Reference implementation — shared by eval, codegen, and tests.
    * Returns one 64-bit hash per n-word window (empty when the text has
    * fewer than n words), rolling in O(1) per position.
    */
  def hashes(text: String, n: Int): Array[Long] = {
    val len = text.length
    // pass 1: word boundaries -> per-word hashes (no substring allocs)
    var nWords = 0
    var i = 0
    var inWord = false
    while (i < len) {
      if (!isWs(text.charAt(i))) { if (!inWord) { nWords += 1; inWord = true } }
      else inWord = false
      i += 1
    }
    if (nWords < n) return Array.emptyLongArray
    val wh = new Array[Long](nWords)
    var w = 0
    i = 0
    while (i < len) {
      if (!isWs(text.charAt(i))) {
        val start = i
        while (i < len && !isWs(text.charAt(i))) i += 1
        wh(w) = wordHash(text, start, i)
        w += 1
      } else i += 1
    }
    // pass 2: rolling window polynomial h = sum wh(j) * P^(n-1-j)
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

  /** Column builder (Column <-> Expression via the Spark 4 classic API). */
  def wordWindowHashes(c: Column, n: Int): Column =
    GraftBridge.column(WordWindowHashes(GraftBridge.expression(c), n))
}
