package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** `ppm_luma_mean(bytes) -> double` — mean BT.601 luma of an uncompressed
  * netpbm (P5/P6) payload in one fused pass over the raster bytes (no
  * pixel array materialized; see graft.image.ImageCodec.lumaMean). The
  * image modality's scan-stage quality reduction, sibling of the audio
  * side's `pcm_quality`. */
case class PpmLumaMean(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ppm_luma_mean expects binary, got ${child.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "ppm_luma_mean"
  override def nullSafeEval(bytes: Any): Any =
    graft.image.ImageCodec.lumaMean(bytes.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = graft.image.ImageCodec.lumaMean($b);")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
