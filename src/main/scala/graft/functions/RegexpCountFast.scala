package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: count of regex matches in a string,
  * without materializing the match array.
  *
  * Spark's own `regexp_count` is a RuntimeReplaceable that expands to
  * `size(regexp_extract_all(s, p, 0))` — every match is copied into a
  * UTF8String and boxed into an ArrayData only to be counted. This
  * expression runs the matcher and increments an int: same semantics
  * (group 0 = one count per `find()`; null-intolerant), no per-match
  * allocation. [[graft.plans.CollapseRegexCount]] rewrites the built-in
  * shape into this one.
  *
  * Pattern compilation is cached against the previous regex value (the
  * same per-row cache Spark's regexp expressions use), so a literal
  * pattern compiles once per task.
  */
case class RegexpCountFast(subject: Expression, regexp: Expression)
    extends BinaryExpression {

  override def left: Expression = subject
  override def right: Expression = regexp
  override def dataType: DataType = IntegerType
  override def prettyName: String = "regexp_count_fast"

  override def checkInputDataTypes(): TypeCheckResult =
    if (subject.dataType == StringType && regexp.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (STRING, STRING) arguments, got " +
        s"(${subject.dataType.catalogString}, ${regexp.dataType.catalogString})")

  @transient private var lastRegex: UTF8String = _
  @transient private var pattern: java.util.regex.Pattern = _

  def compute(s: UTF8String, p: UTF8String): Int = {
    if (pattern == null || !p.equals(lastRegex)) {
      lastRegex = p.clone()
      pattern = java.util.regex.Pattern.compile(lastRegex.toString)
    }
    val m = pattern.matcher(s.toString)
    var cnt = 0
    while (m.find()) cnt += 1
    cnt
  }

  override def nullSafeEval(s: Any, p: Any): Any =
    compute(s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternClass = classOf[java.util.regex.Pattern].getName
    val lastRegex = ctx.addMutableState("UTF8String", "graftLastRegex")
    val compiled = ctx.addMutableState(patternClass, "graftPattern")
    nullSafeCodeGen(ctx, ev, (s, p) => {
      val m = ctx.freshName("matcher")
      val cnt = ctx.freshName("cnt")
      s"""
         |if ($compiled == null || !$p.equals($lastRegex)) {
         |  $lastRegex = $p.clone();
         |  $compiled = $patternClass.compile($lastRegex.toString());
         |}
         |java.util.regex.Matcher $m = $compiled.matcher($s.toString());
         |int $cnt = 0;
         |while ($m.find()) $cnt++;
         |${ev.value} = $cnt;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RegexpCountFast =
    copy(subject = newLeft, regexp = newRight)
}

object RegexpCountFast {

  def regexpCountFast(s: Column, p: Column): Column =
    GraftBridge.column(RegexpCountFast(GraftBridge.expression(s), GraftBridge.expression(p)))

  /** Same arity guard as the GraftExtensions path — a wrong-arity call
    * must fail analysis with a message, not IndexOutOfBounds at build.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "regexp_count_fast", exprs => {
        if (exprs.length != 2) throw new IllegalArgumentException(
          s"regexp_count_fast expects 2 arguments, got ${exprs.length}")
        RegexpCountFast(exprs.head, exprs(1))
      }, "scala_udf")
}
