package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, FloatType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.audio.AudioCodec

/** `decode_pcm(bytes, codec, sr_hz) -> array<float>` — the Catalyst-native
  * codec expression mandated by the north star: the analog of the
  * reference's heavy per-row render/transcode path
  * (`/root/reference/fetch/fetcher.go:284-373`,
  * `/root/reference/fetch/utf8encoding.go:13-32`) as a real Catalyst
  * `Expression` with codegen (`doGenCode` emits a static call — stays
  * inside whole-stage codegen, no UDF serialization, no Row boxing).
  *
  * `sr_hz` is part of the logical signature (a decode must know its clock)
  * but byte->float companding is rate-independent for these codecs.
  */
case class DecodePcm(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == BinaryType && second.dataType == StringType &&
      third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"decode_pcm expects (binary, string, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "decode_pcm"

  override def nullSafeEval(bytes: Any, codec: Any, sr: Any): Any =
    DecodePcm.decode(bytes.asInstanceOf[Array[Byte]], codec.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c, _) =>
      s"${ev.value} = graft.functions.DecodePcm.decode($b, $c);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

object DecodePcm {
  /** Static entry point shared by interpreted eval and generated code. */
  def decode(bytes: Array[Byte], codec: UTF8String): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(AudioCodec.decode(bytes, codec.toString))
}

/** `pcm_sample_count(bytes, codec) -> int` — sample count without decoding
  * (cheap length math; used for pushdown-friendly stats columns). */
case class PcmSampleCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_sample_count expects (binary, string), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "pcm_sample_count"
  override def nullSafeEval(bytes: Any, codec: Any): Any =
    AudioCodec.sampleCount(bytes.asInstanceOf[Array[Byte]].length,
      codec.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c) =>
      s"""${ev.value} = graft.audio.AudioCodec.sampleCount($b.length, $c.toString());""")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** `pcm_rms(bytes, codec) -> double` — fused decode + RMS in one pass, no
  * intermediate array (the codegen-friendly fast path; `decode_pcm` +
  * higher-order `aggregate` computes the same thing ~10x slower because
  * array HOFs run boxed lambdas outside whole-stage codegen). */
case class PcmRms(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_rms expects (binary, string), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "pcm_rms"
  override def nullSafeEval(bytes: Any, codec: Any): Any =
    AudioCodec.rms(bytes.asInstanceOf[Array[Byte]], codec.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c) =>
      s"${ev.value} = graft.audio.AudioCodec.rms($b, $c.toString());")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** `pcm_band_energies(bytes, codec, sr_hz) -> array<double>` — fused decode
  * + 8-band Goertzel filterbank (see AudioCodec.bandEnergies). */
case class PcmBandEnergies(first: Expression, second: Expression, third: Expression,
    nBands: Int = 8) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == BinaryType && second.dataType == StringType &&
      third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_band_energies expects (binary, string, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "pcm_band_energies"
  override def nullSafeEval(bytes: Any, codec: Any, sr: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      graft.audio.AudioCodec.bandEnergies(bytes.asInstanceOf[Array[Byte]],
        codec.asInstanceOf[UTF8String].toString, sr.asInstanceOf[Int], nBands))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c, s) =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.audio.AudioCodec.bandEnergies($b, $c.toString(), $s, $nBands));")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** `pcm_transcode(bytes, codec, target) -> binary` — fused decode +
  * re-encode (sample count preserved; see AudioCodec.transcode). The
  * ChromeFetcher-style heavy per-row transform as a codegen'd expression. */
case class PcmTranscode(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == BinaryType && second.dataType == StringType &&
      third.dataType == StringType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_transcode expects (binary, string, string), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pcm_transcode"
  override def nullSafeEval(bytes: Any, codec: Any, target: Any): Any =
    AudioCodec.transcode(bytes.asInstanceOf[Array[Byte]],
      codec.asInstanceOf[UTF8String].toString, target.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c, t) =>
      s"${ev.value} = graft.audio.AudioCodec.transcode($b, $c.toString(), $t.toString());")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** `pcm_resample(bytes, codec, src_hz, dst_hz) -> binary` — windowed-sinc
  * sample-rate conversion to pcm16@dst (see AudioCodec.resample): the
  * mixed-rate-corpus normalization step, fused decode+filter+encode in the
  * scan stage. Output length contract floor(n*dst/src) is integer-exact
  * (oracle-statable); signal fidelity is spec-gated at SNR >= 30 dB. */
case class PcmResample(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == BinaryType && second.dataType == StringType &&
      third.dataType == IntegerType && fourth.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_resample expects (binary, string, int, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType}, ${fourth.dataType})")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pcm_resample"
  override def nullSafeEval(bytes: Any, codec: Any, src: Any, dst: Any): Any =
    AudioCodec.resample(bytes.asInstanceOf[Array[Byte]],
      codec.asInstanceOf[UTF8String].toString,
      src.asInstanceOf[Int], dst.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c, s, d) =>
      s"${ev.value} = graft.audio.AudioCodec.resample($b, $c.toString(), $s, $d);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(f, s, t, q)
}

/** `pcm_tone_pair(bytes, codec, sr_hz) -> array<int>` — the two strongest
  * tones in integer Hz (see AudioCodec.tonePair): the parametric acoustic
  * fingerprint behind audio near-dup detection. */
case class PcmTonePair(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == BinaryType && second.dataType == StringType &&
      third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_tone_pair expects (binary, string, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pcm_tone_pair"
  override def nullSafeEval(bytes: Any, codec: Any, sr: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      AudioCodec.tonePair(bytes.asInstanceOf[Array[Byte]],
        codec.asInstanceOf[UTF8String].toString, sr.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c, s) =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.audio.AudioCodec.tonePair($b, $c.toString(), $s));")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** `pcm_aligned_corr(bytes_a, codec_a, bytes_b, codec_b) -> double` —
  * normalized cross-correlation with the shorter clip aligned at the
  * length difference (see AudioCodec.alignedCorr): the exact verify stage
  * of shift-robust audio near-dup, run on candidate pairs only. */
case class PcmAlignedCorr(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == BinaryType && second.dataType == StringType &&
      third.dataType == BinaryType && fourth.dataType == StringType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_aligned_corr expects (binary, string, binary, string), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType}, ${fourth.dataType})")
  }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def prettyName: String = "pcm_aligned_corr"
  override def nullSafeEval(ba: Any, ca: Any, bb: Any, cb: Any): Any =
    AudioCodec.alignedCorr(
      ba.asInstanceOf[Array[Byte]], ca.asInstanceOf[UTF8String].toString,
      bb.asInstanceOf[Array[Byte]], cb.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ba, ca, bb, cb) =>
      s"${ev.value} = graft.audio.AudioCodec.alignedCorr(" +
        s"$ba, $ca.toString(), $bb, $cb.toString());")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(f, s, t, q)
}

/** `pcm_gain(bytes, codec, gain) -> binary` — decode, scale, re-encode with
  * the same codec (hard-clips at full scale; see AudioCodec.gain). Planting
  * tool for quality-scoring ground truth: gain 0 = digital silence, large
  * gain = a clipped copy. */
case class PcmGain(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == BinaryType && second.dataType == StringType &&
      third.dataType == org.apache.spark.sql.types.DoubleType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_gain expects (binary, string, double), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pcm_gain"
  override def nullSafeEval(bytes: Any, codec: Any, g: Any): Any =
    AudioCodec.gain(bytes.asInstanceOf[Array[Byte]],
      codec.asInstanceOf[UTF8String].toString, g.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c, g) =>
      s"${ev.value} = graft.audio.AudioCodec.gain($b, $c.toString(), $g);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** `pcm_quality(bytes, codec) -> array<double>` — fused single-pass quality
  * metrics [silence_ratio, clipping_ratio, peak, rms] (see
  * AudioCodec.quality): the audio analog of the text quality ratios,
  * feeding silent/clipped-clip filters in a training-data pipeline. */
case class PcmQuality(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_quality expects (binary, string), got (${left.dataType}, ${right.dataType})")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "pcm_quality"
  override def nullSafeEval(bytes: Any, codec: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      AudioCodec.quality(bytes.asInstanceOf[Array[Byte]],
        codec.asInstanceOf[UTF8String].toString))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c) =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.audio.AudioCodec.quality($b, $c.toString()));")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(l, r)
}

/** `audio_meta(bytes)` -> struct(format, sr_hz, channels, bits,
  * n_samples) — library-free container metadata for WAV / FLAC /
  * MPEG-1-Layer-III / Ogg-Opus payloads (the audio analog of `image_meta`
  * and `video_meta`; see [[graft.audio.AudioMeta]]). Null on unsupported
  * or malformed payloads — row-level quality, never a job failure. */
case class AudioMetaExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"audio_meta expects binary, got ${child.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("format", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("sr_hz", IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("channels", IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("bits", IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("n_samples",
      org.apache.spark.sql.types.LongType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "audio_meta"
  override def nullSafeEval(bytes: Any): Any =
    graft.audio.AudioMeta.metaRow(bytes.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""${ev.value} = graft.audio.AudioMeta.metaRow($b);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** `wav_wrap(bytes, codec, sr_hz) -> binary` — wrap raw codec bytes
  * (mono) into a standard WAV file (PCM / G.711 A-law / mu-law format
  * tags): the write half of containered interchange; see
  * [[graft.audio.AudioMeta.wavWrap]]. */
case class WavWrap(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == BinaryType && second.dataType == StringType &&
      third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_wrap expects (binary, string, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "wav_wrap"
  override def nullSafeEval(bytes: Any, codec: Any, sr: Any): Any =
    graft.audio.AudioMeta.wavWrap(bytes.asInstanceOf[Array[Byte]],
      codec.asInstanceOf[UTF8String].toString, sr.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c, s) =>
      s"${ev.value} = graft.audio.AudioMeta.wavWrap($b, $c.toString(), $s);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** `wav_unwrap(bytes)` -> struct(codec, sr_hz, payload) — strip a mono
  * WAV container whose format tag maps to this engine's codec set (PCM /
  * G.711 A-law / mu-law), yielding raw bytes ready for decode_pcm and
  * every pcm_* kernel: real containered ingest, not metadata-only. Null
  * for non-WAV, multi-channel, or unsupported format tags. */
case class WavUnwrap(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"wav_unwrap expects binary, got ${child.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("codec", StringType, nullable = false),
    org.apache.spark.sql.types.StructField("sr_hz", IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("payload", BinaryType, nullable = false)))
  override def nullable: Boolean = true
  override def prettyName: String = "wav_unwrap"
  override def nullSafeEval(bytes: Any): Any =
    graft.audio.AudioMeta.unwrapRow(bytes.asInstanceOf[Array[Byte]])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b =>
      s"""${ev.value} = graft.audio.AudioMeta.unwrapRow($b);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
}

/** Row packer for `pcm_segments` — a plain object so the generated Java
  * can call it as a static (`graft.functions.PcmSegRows.toRows`). */
object PcmSegRows {
  /** [s0,e0,s1,e1,...] -> array<struct<seg_start_ms, seg_end_ms>>. */
  def toRows(flat: Array[Int]): ArrayData = {
    val rows = new Array[Any](flat.length / 2)
    var i = 0
    while (i < rows.length) {
      rows(i) = org.apache.spark.sql.catalyst.InternalRow(flat(2 * i), flat(2 * i + 1))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(rows)
  }
}

/** `pcm_segments(bytes, codec, sr_hz)` ->
  * `array<struct<seg_start_ms:int, seg_end_ms:int>>` — fused decode +
  * energy voice-activity segmentation on a `frameMs` frame grid (silence
  * stripping / speech-span extraction, the audio curation staple). See
  * [[graft.audio.AudioCodec.segmentsMs]] for the exact contract: frames
  * are voiced iff frame RMS >= rmsThreshold, maximal voiced runs become
  * segments, and the trailing partial frame is dropped so the output is
  * an integer-exact function of (n, sr, frameMs) and frame voicedness —
  * which is what makes the operator ORACLE-able from byte arithmetic. */
case class PcmSegments(first: Expression, second: Expression, third: Expression,
    frameMs: Int = 50, rmsThreshold: Double = 0.03) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == BinaryType && second.dataType == StringType &&
      third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_segments expects (binary, string, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }
  override def dataType: DataType = PcmSegments.Schema
  override def prettyName: String = "pcm_segments"
  override def nullSafeEval(bytes: Any, codec: Any, sr: Any): Any =
    PcmSegRows.toRows(AudioCodec.segmentsMs(bytes.asInstanceOf[Array[Byte]],
      codec.asInstanceOf[UTF8String].toString, sr.asInstanceOf[Int],
      frameMs, rmsThreshold))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c, s) =>
      s"${ev.value} = graft.functions.PcmSegRows.toRows(" +
        s"graft.audio.AudioCodec.segmentsMs($b, $c.toString(), $s, " +
        s"$frameMs, $rmsThreshold));")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

object PcmSegments {
  val Schema: DataType = ArrayType(org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("seg_start_ms", IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("seg_end_ms", IntegerType, nullable = false))),
    containsNull = false)
}

/** `pcm_strip_silence(bytes, codec, sr_hz) -> binary` — silence removal:
  * the bytes of the voiced frames (same grid/threshold as
  * `pcm_segments`), spliced without re-encoding. Codec and rate are
  * preserved; output length is frame-exact, so the transform carries a
  * byte-arithmetic length oracle (c19). */
case class PcmStripSilence(first: Expression, second: Expression, third: Expression,
    frameMs: Int = 50, rmsThreshold: Double = 0.03) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == BinaryType && second.dataType == StringType &&
      third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_strip_silence expects (binary, string, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pcm_strip_silence"
  override def nullSafeEval(bytes: Any, codec: Any, sr: Any): Any =
    AudioCodec.stripSilence(bytes.asInstanceOf[Array[Byte]],
      codec.asInstanceOf[UTF8String].toString, sr.asInstanceOf[Int],
      frameMs, rmsThreshold)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, c, s) =>
      s"${ev.value} = graft.audio.AudioCodec.stripSilence($b, $c.toString(), $s, " +
        s"$frameMs, $rmsThreshold);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** `pcm_tone(sr_hz, f_milli_hz, n) -> binary` — pure-sine pcm16 synthesis
  * (amp 0.5). The planted-contract generator for the c10 band-argmax
  * oracle: frequency is taken in milli-Hz so Goertzel band centers
  * ((2b+1)*sr/32, e.g. 2756.25 Hz at 44.1k) are exact integers in both
  * the Spark plan and the DuckDB oracle's arithmetic. */
case class PcmTone(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == IntegerType &&
      second.dataType == org.apache.spark.sql.types.LongType &&
      third.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pcm_tone expects (int, bigint, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType})")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pcm_tone"
  override def nullSafeEval(sr: Any, fMilliHz: Any, n: Any): Any =
    graft.audio.AudioSynth.tone(sr.asInstanceOf[Int],
      fMilliHz.asInstanceOf[Long], n.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, f, n) =>
      s"${ev.value} = graft.audio.AudioSynth.tone($s, $f, $n);")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression = copy(f, s, t)
}

/** `tone_band_energies(sr_tone, f_milli_hz, n, sr_band)` -> array<double>
  * — the FUSED form of `pcm_band_energies(pcm_tone(sr, f, n), 'pcm16',
  * sr)`, produced by the [[graft.plans.ToneBandFusion]] optimizer rule
  * (never written by hand in a query): bit-identical output (see
  * [[graft.audio.AudioCodec.toneBandEnergies]]) without materializing and
  * re-parsing the synthesized pcm16 byte array. */
case class ToneBandEnergies(first: Expression, second: Expression,
    third: Expression, fourth: Expression, nBands: Int = 8)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = first.dataType == IntegerType &&
      second.dataType == org.apache.spark.sql.types.LongType &&
      third.dataType == IntegerType && fourth.dataType == IntegerType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"tone_band_energies expects (int, bigint, int, int), got " +
        s"(${first.dataType}, ${second.dataType}, ${third.dataType}, ${fourth.dataType})")
  }
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.DoubleType, containsNull = false)
  override def prettyName: String = "tone_band_energies"
  override def nullSafeEval(sr: Any, fMilliHz: Any, n: Any, srB: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      AudioCodec.toneBandEnergies(sr.asInstanceOf[Int],
        fMilliHz.asInstanceOf[Long], n.asInstanceOf[Int],
        srB.asInstanceOf[Int], nBands))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, f, n, sb) =>
      s"${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.audio.AudioCodec.toneBandEnergies(" +
        s"$s, $f, $n, $sb, $nBands));")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression, q: Expression): Expression =
    copy(f, s, t, q)
}

object GraftFunctions {
  /** Expression -> Column bridge (Spark 4 classic API). */
  def toColumn(e: Expression): Column = Bridge.column(e)
  def toExpr(c: Column): Expression = Bridge.expression(c)

  def decode_pcm(bytes: Column, codec: Column, srHz: Column): Column =
    toColumn(DecodePcm(toExpr(bytes), toExpr(codec), toExpr(srHz)))

  def pcm_sample_count(bytes: Column, codec: Column): Column =
    toColumn(PcmSampleCount(toExpr(bytes), toExpr(codec)))

  def pcm_rms(bytes: Column, codec: Column): Column =
    toColumn(PcmRms(toExpr(bytes), toExpr(codec)))

  def pcm_band_energies(bytes: Column, codec: Column, srHz: Column,
                        nBands: Int = 8): Column =
    toColumn(PcmBandEnergies(toExpr(bytes), toExpr(codec), toExpr(srHz), nBands))

  def audio_meta(bytes: Column): Column = toColumn(AudioMetaExpr(toExpr(bytes)))

  def wav_unwrap(bytes: Column): Column = toColumn(WavUnwrap(toExpr(bytes)))

  def wav_wrap(bytes: Column, codec: Column, srHz: Column): Column =
    toColumn(WavWrap(toExpr(bytes), toExpr(codec), toExpr(srHz)))

  def pcm_segments(bytes: Column, codec: Column, srHz: Column,
                   frameMs: Int = 50, rmsThreshold: Double = 0.03): Column =
    toColumn(PcmSegments(toExpr(bytes), toExpr(codec), toExpr(srHz),
      frameMs, rmsThreshold))

  def pcm_strip_silence(bytes: Column, codec: Column, srHz: Column,
                        frameMs: Int = 50, rmsThreshold: Double = 0.03): Column =
    toColumn(PcmStripSilence(toExpr(bytes), toExpr(codec), toExpr(srHz),
      frameMs, rmsThreshold))

  def pcm_transcode(bytes: Column, codec: Column, target: Column): Column =
    toColumn(PcmTranscode(toExpr(bytes), toExpr(codec), toExpr(target)))

  def pcm_resample(bytes: Column, codec: Column, srcHz: Column, dstHz: Column): Column =
    toColumn(PcmResample(toExpr(bytes), toExpr(codec), toExpr(srcHz), toExpr(dstHz)))

  def pcm_tone_pair(bytes: Column, codec: Column, srHz: Column): Column =
    toColumn(PcmTonePair(toExpr(bytes), toExpr(codec), toExpr(srHz)))

  def pcm_aligned_corr(bytesA: Column, codecA: Column,
                       bytesB: Column, codecB: Column): Column =
    toColumn(PcmAlignedCorr(toExpr(bytesA), toExpr(codecA),
      toExpr(bytesB), toExpr(codecB)))

  def pcm_tone(srHz: Column, fMilliHz: Column, n: Column): Column =
    toColumn(PcmTone(toExpr(srHz), toExpr(fMilliHz), toExpr(n)))

  def pcm_gain(bytes: Column, codec: Column, gain: Column): Column =
    toColumn(PcmGain(toExpr(bytes), toExpr(codec), toExpr(gain)))

  def pcm_quality(bytes: Column, codec: Column): Column =
    toColumn(PcmQuality(toExpr(bytes), toExpr(codec)))

  def ppm_luma_mean(bytes: Column): Column = toColumn(PpmLumaMean(toExpr(bytes)))

  def y4m_motion_stats(bytes: Column): Column = toColumn(Y4mMotionStats(toExpr(bytes)))

  def y4m_temporal_dhash(bytes: Column, stride: Int = 1): Column =
    toColumn(Y4mTemporalDhash(toExpr(bytes), stride))

  def image_meta(bytes: Column): Column = toColumn(ImageMetaExpr(toExpr(bytes)))

  def image_luma_mean(bytes: Column): Column = toColumn(ImageLumaMean(toExpr(bytes)))

  def video_meta(bytes: Column): Column = toColumn(VideoMetaExpr(toExpr(bytes)))

  def image_dhash(bytes: Column): Column = toColumn(ImageDhash(toExpr(bytes)))

  /** HLL register-file aggregate (see [[HllRegistersAgg]]); use inside
    * groupBy(...).agg(...). */
  def hll_registers(c: Column, p: Int = 12): Column =
    toColumn(HllRegistersAgg(toExpr(c), p).toAggregateExpression())

  def lang_id(text: Column): Column = toColumn(LangId(toExpr(text)))
  def lang_id_ngram(text: Column): Column = toColumn(LangIdNgram(toExpr(text)))
  def rel_url(base: Column, rel: Column): Column =
    toColumn(RelUrl(toExpr(base), toExpr(rel)))
  def sim_hash(text: Column): Column = toColumn(SimHash(toExpr(text)))
  def jaccard_sim(a: Column, b: Column): Column =
    toColumn(JaccardSim(toExpr(a), toExpr(b)))
  def portable_bucket(s: Column, n: Column): Column =
    toColumn(PortableBucket(toExpr(s), toExpr(n)))
  def min_hash(text: Column, k: Column): Column =
    toColumn(MinHashSig(toExpr(text), toExpr(k)))
  def winnow_fp(text: Column): Column = toColumn(WinnowFingerprint(toExpr(text)))
  def cosine_sim(a: Column, b: Column): Column =
    toColumn(CosineSim(toExpr(a), toExpr(b)))
  def qcosine_sim(a: Column, b: Column): Column =
    toColumn(QCosineSim(toExpr(a), toExpr(b)))
  def vec_lsh_bucket(v: Column, nBits: Column): Column =
    toColumn(VecLshBucket(toExpr(v), toExpr(nBits)))
  def vec_lsh_buckets(v: Column, nBits: Column, nTables: Column): Column =
    toColumn(VecLshBuckets(toExpr(v), toExpr(nBits), toExpr(nTables)))

  /** Register graft functions for SQL use in this session. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("decode_pcm",
      es => DecodePcm(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("pcm_sample_count",
      es => PcmSampleCount(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("pcm_rms",
      es => PcmRms(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("pcm_band_energies",
      es => PcmBandEnergies(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("audio_meta",
      es => AudioMetaExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("wav_unwrap",
      es => WavUnwrap(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("wav_wrap",
      es => WavWrap(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("pcm_segments",
      es => PcmSegments(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("pcm_strip_silence",
      es => PcmStripSilence(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("pcm_transcode",
      es => PcmTranscode(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("pcm_resample",
      es => PcmResample(es(0), es(1), es(2), es(3)), "scala_udf")
    reg.createOrReplaceTempFunction("pcm_tone_pair",
      es => PcmTonePair(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("pcm_gain",
      es => PcmGain(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("pcm_quality",
      es => PcmQuality(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("ppm_luma_mean",
      es => PpmLumaMean(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("y4m_motion_stats",
      es => Y4mMotionStats(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("image_meta",
      es => ImageMetaExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("image_luma_mean",
      es => ImageLumaMean(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("video_meta",
      es => VideoMetaExpr(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("image_dhash",
      es => ImageDhash(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("pcm_aligned_corr",
      es => PcmAlignedCorr(es(0), es(1), es(2), es(3)), "scala_udf")
    reg.createOrReplaceTempFunction("lang_id", es => LangId(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("lang_id_ngram",
      es => LangIdNgram(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("rel_url", es => RelUrl(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("extract_attr",
      es => graft.operators.ExtractAttr(es(0), es(1), es(2)), "scala_udf")
    reg.createOrReplaceTempFunction("sim_hash", es => SimHash(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("jaccard_sim",
      es => JaccardSim(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("portable_bucket",
      es => PortableBucket(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("min_hash", es => MinHashSig(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("winnow_fp", es => WinnowFingerprint(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("qcosine_sim", es => QCosineSim(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_lsh_bucket", es => VecLshBucket(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("vec_lsh_buckets",
      es => VecLshBuckets(es(0), es(1), es(2)), "scala_udf")
  }
}
