package graft.functions

import graft.core.{DateFmt, Json, Rowkey}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot scalar paths, with full
  * whole-stage-codegen support (`doGenCode` emits a direct static call —
  * no UDF serialization, no codegen fence). Both delegate to the pure
  * graft.core functions so the semantics stay locked to the unit corpus.
  */

/** `kafka_date_format(s)` — T9: lenient two-format parse normalized to
  * `yyyy-MM-dd'T'HH:mm:ss.SSS+0000` UTC (HBaseWriter.kt:523-541).
  * Throws on unparseable input, like the reference (callers F4-skip). */
case class KafkaDateFormat(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "kafka_date_format"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(DateFmt.kafkaFormat(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.core.DateFmt.kafkaFormat($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): KafkaDateFormat =
    copy(child = newChild)
}

/** `hdi_rowkey(idJson)` — K3: 4-byte big-endian CRC32 of the key-sorted
  * compact rendering of an id-object JSON string, prefixing those same
  * bytes (MessageUtils.kt:120-149). Returns BINARY. */
case class HdiRowkey(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = BinaryType
  override def prettyName: String = "hdi_rowkey"

  override protected def nullSafeEval(input: Any): Any =
    HdiRowkey.compute(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HdiRowkey.compute($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): HdiRowkey =
    copy(child = newChild)
}

object HdiRowkey {
  /** static entry point shared by interpreted eval and generated code */
  def compute(idJson: String): Array[Byte] =
    Rowkey.generateKey(Json.parseObject(idJson))
}

/** Registration — either through `spark.sql.extensions=graft.GraftExtensions`
  * or imperatively via [[GraftFunctions.register]]. */
object GraftFunctions {
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "kafka_date_format" -> (children => KafkaDateFormat(children.head)),
    "hdi_rowkey" -> (children => HdiRowkey(children.head)))

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, builder, "built-in")
    }
}
