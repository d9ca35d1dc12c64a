package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two
  * `array<double>` columns in ONE generated loop.
  *
  * The ANN/near-dup scoring paths (s03/s04/s06/s07/s09 rerank)
  * previously spelled this as
  * `aggregate(zip_with(a,b,*), 0.0, +) / (sqrt(...) * sqrt(...))` —
  * three higher-order-function passes per row, and Catalyst's HOFs are
  * CodegenFallback: every scored candidate left WholeStageCodegen for
  * interpreted eval. This expression keeps the hot loop inside
  * codegen and fuses dot + both norms into a single pass.
  *
  * Semantics are BIT-IDENTICAL to the HOF formula on well-formed input
  * (pins + DuckDB oracle unchanged): products and squares accumulate
  * left-to-right in element order exactly like aggregate's sequential
  * fold; length mismatch or a null element yields NULL (zip_with pads
  * with null → null product → null sum). ONE deliberate divergence: a
  * zero-norm vector yields NULL (undefined similarity — sorts last
  * under the rank windows) where the HOF formula's Divide THROWS
  * DIVIDE_BY_ZERO under ANSI mode, killing the whole job on a single
  * degenerate embedding (asserted in CosineSimilaritySpec).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(DoubleType, true) ||
        left.dataType == ArrayType(DoubleType, false)) {
      if (right.dataType == ArrayType(DoubleType, true) ||
          right.dataType == ArrayType(DoubleType, false))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"cosine_sim requires ARRAY<DOUBLE> arguments, got ${right.dataType.catalogString}")
    } else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires ARRAY<DOUBLE> arguments, got ${left.dataType.catalogString}")

  /** Shared by eval and codegen; returns null (boxed) on length
    * mismatch or a null element — the HOF formula's null semantics.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom == 0.0) null // zero-norm vector: similarity undefined
    else java.lang.Double.valueOf(dot / denom)
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("cosineSim", this, classOf[CosineSimilarity].getName)
    val tmp = ctx.freshName("cos")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double $tmp = $ref.compute($a, $b);
      if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
    """)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {

  /** Column builder (Column <-> Expression via the Spark 4 classic API). */
  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSimilarity(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** SQL registration: `cosine_sim(a, b)` from spark.sql. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_sim", exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"cosine_sim expects 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs.head, exprs(1))
      }, "scala_udf")
}
