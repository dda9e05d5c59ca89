package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.audio.AudioCodec
import graft.functions.GraftFunctions._

/** Declarative per-payload ACTION LISTS — the analog of the reference's
  * Chrome Actions (`/root/reference/fetch/actions.go:15-52`: a JSON list
  * of ClickAction/PaginateAction steps dispatched by name before
  * extraction), recast for the audio payload: a `;`-separated action
  * string (the same tiny DSL shape as the reference's filter chains,
  * F-family / [[graft.functions.DfkFilters]]) COMPILES to a chain of the
  * engine's existing fused byte transforms over (bytes, codec, sr_hz).
  *
  * Grammar: `action[:param](;action[:param])*` over
  *
  *   - `strip_silence`          — VAD silence removal (c19 kernel)
  *   - `resample:<hz>`          — windowed-sinc resample; codec becomes
  *                                pcm16 at `<hz>` (c17 kernel)
  *   - `transcode:<codec>`      — G.711/pcm16 re-encode (c14 kernel)
  *   - `gain:<g>`               — scale + clip through the encoder
  *
  * Validation is EAGER like the reference's unknown-action error (and F7's
  * unknown-filter): [[compile]] throws IllegalArgumentException on an
  * unknown action name, a malformed/missing param, or an out-of-range
  * value BEFORE any DataFrame is touched — plan-time, never mid-job. The
  * compiled chain is column-for-column identical to the hand-built
  * transform sequence (ActionsSpec pins plan equality), so Catalyst fuses
  * the whole list into one codegen'd scan stage: an N-step action list
  * costs ONE pass over the bytes, not N.
  */
object Actions {

  val Names: Set[String] = Set("strip_silence", "resample", "transcode", "gain")

  private val Codecs = Set(AudioCodec.Pcm16, AudioCodec.Ulaw, AudioCodec.Alaw)

  /** One parsed, validated step. */
  sealed trait Action
  object Action {
    case object StripSilence extends Action
    final case class Resample(targetHz: Int) extends Action
    final case class Transcode(target: String) extends Action
    final case class Gain(g: Double) extends Action
  }

  /** Parse + validate an action list; throws on the first invalid step. */
  def parse(spec: String): Seq[Action] =
    spec.split(";").toSeq.map(_.trim).filter(_.nonEmpty).map { step =>
      val (name, param) = step.indexOf(':') match {
        case -1 => (step, "")
        case i => (step.substring(0, i).trim, step.substring(i + 1).trim)
      }
      def intParam(lo: Int): Int = {
        val v = try param.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"action '$name' needs an integer param, got '$param'")
        }
        if (v < lo) throw new IllegalArgumentException(
          s"action '$name' param must be >= $lo, got $v")
        v
      }
      name match {
        case "strip_silence" =>
          if (param.nonEmpty) throw new IllegalArgumentException(
            s"action 'strip_silence' takes no param, got '$param'")
          Action.StripSilence
        case "resample" => Action.Resample(intParam(1))
        case "transcode" =>
          if (!Codecs(param)) throw new IllegalArgumentException(
            s"action 'transcode' needs a codec in $Codecs, got '$param'")
          Action.Transcode(param)
        case "gain" =>
          val g = try param.toDouble catch {
            case _: NumberFormatException => throw new IllegalArgumentException(
              s"action 'gain' needs a numeric param, got '$param'")
          }
          if (g < 0.0 || !java.lang.Double.isFinite(g))
            throw new IllegalArgumentException(s"action 'gain' must be finite >= 0, got $g")
          Action.Gain(g)
        case other =>
          throw new IllegalArgumentException(s"unknown action: $other")
      }
    }

  /** Compile an action list to a DataFrame transform over the standard
    * (bytes, codec, sr_hz) columns. Validation happens HERE (eagerly);
    * the returned function is pure plan construction. */
  def compile(spec: String): DataFrame => DataFrame = {
    val steps = parse(spec) // eager: invalid lists never reach a plan
    df => steps.foldLeft(df)(applyStep)
  }

  private def applyStep(df: DataFrame, a: Action): DataFrame = a match {
    case Action.StripSilence =>
      df.withColumn("bytes", pcm_strip_silence(col("bytes"), col("codec"), col("sr_hz")))
    case Action.Resample(hz) =>
      df.withColumn("bytes", pcm_resample(col("bytes"), col("codec"), col("sr_hz"), lit(hz)))
        .withColumn("codec", lit(AudioCodec.Pcm16))
        .withColumn("sr_hz", lit(hz))
    case Action.Transcode(target) =>
      df.withColumn("bytes", pcm_transcode(col("bytes"), col("codec"), lit(target)))
        .withColumn("codec", lit(target))
    case Action.Gain(g) =>
      df.withColumn("bytes", pcm_gain(col("bytes"), col("codec"), lit(g)))
  }
}
