package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-row language identification: wraps
  * [[graft.text.LangIdModel]] (character-trigram naive Bayes, 14
  * languages) as a codegen'd expression — the generated code calls the
  * static scorer directly, so the projection stays inside whole-stage
  * codegen with no UDF serialization and no broadcast (the model is a
  * JVM static built once per executor).
  */
case class LangId(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_langid"

  override def nullSafeEval(input: Any): Any =
    graft.text.LangIdModel.predictUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.text.LangIdModel.predictUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}
