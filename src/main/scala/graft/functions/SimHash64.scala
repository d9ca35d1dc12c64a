package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of a string's
  * whitespace-separated lowercase words.
  *
  * Demonstrates the preferred extension path for scalar functions the
  * engine needs beyond built-ins (SURVEY.md §7.3): a codegen'd
  * `Expression` stays inside WholeStageCodegen — no typed-map
  * object-SerDe boundary and no UDF black box; the plan remains one
  * generated loop over UnsafeRows.
  *
  * [[SimHash64.hash]] is the single implementation — eval, codegen, and
  * the typed path ([[graft.queries.SimilarityQueries.simhash64]]) all
  * delegate to it: per-word 64-bit hash from two MurmurHash3 halves,
  * +1/-1 bit voting, sign bit per position; words split on Unicode
  * whitespace (Character.isWhitespace).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires a STRING argument, got ${child.dataType.catalogString}")

  def compute(s: UTF8String): Long = SimHash64.hash(s.toString)

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {

  /** Reference implementation — shared by eval, codegen, and tests. */
  def hash(text: String): Long = {
    val acc = new Array[Int](64)
    val lower = text.toLowerCase
    val len = lower.length
    var start = 0
    var i = 0
    while (i <= len) {
      if (i == len || Character.isWhitespace(lower.charAt(i))) {
        if (i > start) {
          val w = lower.substring(start, i)
          val h = (scala.util.hashing.MurmurHash3.stringHash(w, 0x1234abcd).toLong << 32) |
            (scala.util.hashing.MurmurHash3.stringHash(w, 0x9e3779b9).toLong & 0xffffffffL)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Column builder (Column <-> Expression via the Spark 4 classic API). */
  def simhash64(c: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(c)))

  /** SQL registration: makes `simhash64(col)` usable from spark.sql.
    * Same arity guard as the GraftExtensions path — a wrong-arity call
    * must fail analysis with a message, not IndexOutOfBounds at build.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => {
        if (exprs.length != 1) throw new IllegalArgumentException(
          s"simhash64 expects 1 argument, got ${exprs.length}")
        SimHash64(exprs.head)
      }, "scala_udf")
}
