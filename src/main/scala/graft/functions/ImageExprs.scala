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

/** `y4m_motion_stats(bytes) -> array<double>` — [n_frames, mean_luma,
  * mean |Δ frame-mean luma|] of an uncompressed YUV4MPEG2 payload in one
  * fused pass over the luma planes (chroma never read; see
  * graft.image.Y4mCodec.motionStats). The video modality's scan-stage
  * temporal reduction behind static-vs-motion flagging. */
case class Y4mMotionStats(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"y4m_motion_stats expects binary, got ${child.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "y4m_motion_stats"
  override def nullSafeEval(bytes: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      graft.image.Y4mCodec.motionStats(bytes.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.image.Y4mCodec.motionStats($b));")
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}
