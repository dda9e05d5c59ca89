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

/** `image_meta(bytes) -> struct(format, width, height, channels,
  * bit_depth)` — LIBRARY-FREE header metadata for compressed and
  * uncompressed image payloads (JPEG SOF marker walk, PNG IHDR, GIF
  * screen descriptor, BMP info header, netpbm; see
  * graft.image.ImageMeta). Null for unparseable/unknown payloads —
  * row-level data quality, never a job failure. Runs in the scan stage at
  * header-walk cost (no pixel decoded), so dimension/format stats and
  * filters over a 100 TB image column cost a metadata pass, not a decode
  * pass. */
case class ImageMetaExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_meta expects binary, got ${child.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("format",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("width",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("height",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("channels",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("bit_depth",
      org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "image_meta"
  override def nullSafeEval(bytes: Any): Any =
    graft.image.ImageMeta.metaRow(bytes.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""${ev.value} = graft.image.ImageMeta.metaRow($b);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `image_luma_mean(bytes) -> double` — mean BT.601 luma of ANY supported
  * image payload: netpbm through the fused raster pass (no pixel array),
  * JPEG/PNG/GIF/BMP through the JDK decoder (graft.image.JdkImageCodec —
  * java.desktop, no external jars). Null when undecodable. The
  * compressed-modality sibling of `ppm_luma_mean`. */
case class ImageLumaMean(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_luma_mean expects binary, got ${child.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "image_luma_mean"
  override def nullSafeEval(bytes: Any): Any = {
    val v = graft.image.ImageMeta.lumaMeanAny(bytes.asInstanceOf[Array[Byte]])
    if (v.isNaN) null else v
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""${ev.value} = graft.image.ImageMeta.lumaMeanAny($b);
         |${ev.isNull} = Double.isNaN(${ev.value});""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `image_dhash(bytes) -> bigint` — 64-bit perceptual difference-hash of
  * ANY supported image payload (netpbm direct; JPEG/PNG/GIF/BMP via the
  * JDK decoder): decode -> luma -> 9x8 bilinear thumb -> neighbor
  * comparisons (graft.image.ImageHash). The scan-stage signature behind
  * cross-format image near-dup — only (id, hash) rides the candidate
  * shuffle. Null when undecodable. */
case class ImageDhash(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"image_dhash expects binary, got ${child.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "image_dhash"
  override def nullSafeEval(bytes: Any): Any =
    graft.image.ImageHash.dhashOrNull(bytes.asInstanceOf[Array[Byte]]) match {
      case null => null
      case v => v.longValue()
    }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""java.lang.Long ${ev.value}_boxed = graft.image.ImageHash.dhashOrNull($b);
         |${ev.isNull} = ${ev.value}_boxed == null;
         |${ev.value} = ${ev.isNull} ? 0L : ${ev.value}_boxed.longValue();""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `video_meta(bytes) -> struct(codec, profile_idc, level_idc, width,
  * height)` — LIBRARY-FREE video metadata: YUV4MPEG2 header parse (the
  * real-decode container) or H.264 Annex-B SPS walk (Exp-Golomb,
  * emulation-prevention removal, crop-exact dimensions — see
  * graft.image.H264Meta; the video analog of `image_meta`). Null when
  * neither claims the payload. Header-walk cost in the scan stage; no
  * frame decoded. */
case class VideoMetaExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"video_meta expects binary, got ${child.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("codec",
      org.apache.spark.sql.types.StringType, nullable = false),
    org.apache.spark.sql.types.StructField("profile_idc",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("level_idc",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("width",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("height",
      org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "video_meta"
  override def nullSafeEval(bytes: Any): Any =
    graft.image.H264Meta.metaRow(bytes.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""${ev.value} = graft.image.H264Meta.metaRow($b);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `y4m_temporal_dhash(bytes) -> bigint` — 64-bit temporal perceptual
  * signature of a YUV4MPEG2 payload: per-bit majority over every frame's
  * luma dHash (graft.image.Y4mCodec.temporalDhash, one fused pass). The
  * scan-stage signature behind video near-dup (v3) — robust to leading
  * trims and transcode-style luma remaps; only (id, hash) rides the
  * candidate shuffle. Null when not y4m. */
case class Y4mTemporalDhash(child: Expression, stride: Int = 1)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"y4m_temporal_dhash expects binary, got ${child.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullable: Boolean = true
  override def prettyName: String = "y4m_temporal_dhash"
  override def nullSafeEval(bytes: Any): Any =
    graft.image.Y4mCodec.temporalDhashOrNull(
      bytes.asInstanceOf[Array[Byte]], stride) match {
      case null => null
      case v => v.longValue()
    }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""java.lang.Long ${ev.value}_boxed =
         |  graft.image.Y4mCodec.temporalDhashOrNull($b, $stride);
         |${ev.isNull} = ${ev.value}_boxed == null;
         |${ev.value} = ${ev.isNull} ? 0L : ${ev.value}_boxed.longValue();""".stripMargin)
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
