package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Crypto

/** Native Catalyst expressions for the ingest hot path (vs Scala UDFs):
  * no ScalaUDF wrapper, no encoder round-trip, and the call participates
  * in whole-stage codegen — the generated Java invokes the static kernel
  * directly on the UnsafeRow's byte[].
  *
  * Both kernels run once per *file* row, so this is a constant-factor
  * win; it matters because these sit inside the same codegen stage as the
  * JSONL explode (one fused pass per file: decrypt → gunzip → split).
  *
  * Exposed through the session FunctionRegistry ([[register]]) + public
  * `call_function` — also makes them usable from SQL text.
  */
object CryptoExpressions {

  /** Java-friendly kernel for codegen: UTF8String params avoid a
    * String conversion in the generated code's argument list. */
  def aesCtrKernel(content: Array[Byte], key: UTF8String, iv: UTF8String): Array[Byte] =
    Crypto.aesCtr(content, key.toString, iv.toString)

  def gunzipKernel(content: Array[Byte]): Array[Byte] = Crypto.gunzip(content)

  /** Idempotent per-session registration (analysis-time resolution for
    * call_function / SQL). */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction("aes_ctr_decrypt",
      exprs => AesCtrDecrypt(exprs(0), exprs(1), exprs(2)), "built-in")
    registry.createOrReplaceTempFunction("gunzip",
      exprs => Gunzip(exprs.head), "built-in")
  }

  def aes_ctr_decrypt(content: Column, keyB64: Column, ivB64: Column): Column =
    call_function("aes_ctr_decrypt", content, keyB64, ivB64)

  def gunzip(content: Column): Column = call_function("gunzip", content)
}

/** AES-CTR decrypt as a codegen'd ternary expression
  * (content BINARY, key STRING b64, iv STRING b64) → BINARY. */
case class AesCtrDecrypt(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = first.dataType == BinaryType &&
      second.dataType == StringType && third.dataType == StringType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"aes_ctr_decrypt expects (BINARY, STRING, STRING), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }

  override protected def nullSafeEval(content: Any, key: Any, iv: Any): Any =
    CryptoExpressions.aesCtrKernel(content.asInstanceOf[Array[Byte]],
      key.asInstanceOf[UTF8String], iv.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, k, i) =>
      s"graft.plans.CryptoExpressions.aesCtrKernel($c, $k, $i)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "aes_ctr_decrypt"
}

/** gunzip(BINARY) → BINARY as a codegen'd unary expression. */
case class Gunzip(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"gunzip expects BINARY, got ${child.dataType}")

  override protected def nullSafeEval(content: Any): Any =
    CryptoExpressions.gunzipKernel(content.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CryptoExpressions.gunzipKernel($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "gunzip"
}
