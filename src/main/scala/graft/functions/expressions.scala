package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** UTF8String-facing adapters so StaticInvoke can call the similarity
  * kernels directly from generated code (no UDF serialization, no
  * codegen fallback). Null handling is done by StaticInvoke's
  * propagateNull, except where the reference maps null → 0.0 explicitly. */
object SimilarityAdapters extends Serializable {
  def tokenSortRatio(s1: UTF8String, s2: UTF8String): Double =
    SimilarityKernel.tokenSortRatio(str(s1), str(s2))
  def ratio(s1: UTF8String, s2: UTF8String): Double =
    SimilarityKernel.ratio(str(s1), str(s2))
  def tokenSetRatio(s1: UTF8String, s2: UTF8String): Double =
    SimilarityKernel.tokenSetRatio(str(s1), str(s2))
  def partialRatio(s1: UTF8String, s2: UTF8String): Double =
    SimilarityKernel.partialRatio(str(s1), str(s2))
  def indelDistance(s1: UTF8String, s2: UTF8String): Int =
    SimilarityKernel.indelDistance(str(s1), str(s2))
  @inline private def str(s: UTF8String): String = if (s == null) null else s.toString
}

/**
 * ABN checksum validity as a native Catalyst expression with code
 * generation (reference semantics: src/common/utils.py:270-300). Returns
 * false — not null — for null input, matching the Python `validate_abn`.
 */
case class AbnValid(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def checkInputDataTypes() =
    if (child.dataType == StringType || child.dataType == NullType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"abn_valid expects STRING, got ${child.dataType.catalogString}")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    AbnKernel.isValid(child.eval(input).asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val kernel = AbnKernel.getClass.getName.stripSuffix("$")
    ev.copy(
      code = code"""
        ${childGen.code}
        boolean ${ev.value} = $kernel.isValid(
          ${childGen.isNull} ? null : ${childGen.value});
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): AbnValid =
    copy(child = newChild)
}

/** Column-facing entry points for the custom expressions, plus SQL
  * function registration so `spark.sql` can use them too. */
object GraftFunctions {
  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  private def invoke2(name: String, c1: Column, c2: Column, dt: DataType): Column =
    col(StaticInvoke(
      SimilarityAdapters.getClass,
      dt,
      name,
      Seq(expr(c1), expr(c2)),
      inputTypes = Seq(StringType, StringType),
      propagateNull = true,
      returnNullable = false))

  /** RapidFuzz-style token_sort_ratio in [0,1] — the reference's fuzzy
    * matcher score (entity_match.py:473-491). Codegen'd via StaticInvoke. */
  def token_sort_ratio(c1: Column, c2: Column): Column =
    invoke2("tokenSortRatio", c1, c2, DoubleType)

  /** Plain InDel ratio in [0,1] (RapidFuzz `ratio`). */
  def indel_ratio(c1: Column, c2: Column): Column =
    invoke2("ratio", c1, c2, DoubleType)

  /** RapidFuzz-style token_set_ratio in [0,1]. */
  def token_set_ratio(c1: Column, c2: Column): Column =
    invoke2("tokenSetRatio", c1, c2, DoubleType)

  /** RapidFuzz-style partial_ratio in [0,1]. */
  def partial_ratio(c1: Column, c2: Column): Column =
    invoke2("partialRatio", c1, c2, DoubleType)

  /** InDel edit distance (insert/delete only). */
  def indel_distance(c1: Column, c2: Column): Column =
    invoke2("indelDistance", c1, c2, IntegerType)

  /** ABN checksum validity; false for null (utils.py:270-300). */
  def abn_valid(c: Column): Column = col(AbnValid(expr(c)))

  /** Register the custom functions for Spark SQL usage. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("abn_valid",
      exprs => AbnValid(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("token_sort_ratio",
      exprs => expr(token_sort_ratio(col(exprs(0)), col(exprs(1)))), "built-in")
  }
}
