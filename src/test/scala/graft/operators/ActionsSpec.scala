package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.fixtures.ClipGen

/** [[Actions]] — the declarative Chrome-Actions analog (r6): a `;`-DSL
  * action list compiles to the engine's existing fused transform chain.
  * Pins (1) PLAN IDENTITY with the hand-built chain (the compiled form
  * adds zero plan nodes — Catalyst sees the exact same tree, so the
  * whole list fuses into one codegen'd scan), (2) eager plan-time
  * validation (the reference's unknown-action error), (3) output
  * equality with independently applied kernels. */
class ActionsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import graft.functions.GraftFunctions._

  private lazy val clips = ClipGen.readClips(spark, "/root/testdata/sf0.001")
    .select("clip_id", "bytes", "codec", "sr_hz")

  test("compiled 3-step chain is PLAN-identical to the hand-built transforms") {
    val compiled = Actions.compile("strip_silence;resample:16000;transcode:ulaw")(clips)
    val hand = clips
      .withColumn("bytes", pcm_strip_silence(col("bytes"), col("codec"), col("sr_hz")))
      .withColumn("bytes", pcm_resample(col("bytes"), col("codec"), col("sr_hz"), lit(16000)))
      .withColumn("codec", lit("pcm16"))
      .withColumn("sr_hz", lit(16000))
      .withColumn("bytes", pcm_transcode(col("bytes"), col("codec"), lit("ulaw")))
      .withColumn("codec", lit("ulaw"))
    assert(compiled.queryExecution.optimizedPlan.canonicalized ==
      hand.queryExecution.optimizedPlan.canonicalized)
  }

  test("invalid action lists fail EAGERLY at compile, before any plan exists") {
    intercept[IllegalArgumentException](Actions.compile("click:selector"))
    intercept[IllegalArgumentException](Actions.compile("resample"))
    intercept[IllegalArgumentException](Actions.compile("resample:-8000"))
    intercept[IllegalArgumentException](Actions.compile("resample:abc"))
    intercept[IllegalArgumentException](Actions.compile("transcode:mp3"))
    intercept[IllegalArgumentException](Actions.compile("strip_silence:oops"))
    intercept[IllegalArgumentException](Actions.compile("gain:-1"))
    intercept[IllegalArgumentException](Actions.compile("strip_silence;bogus"))
    // empty / whitespace-only lists are the identity chain
    assert(Actions.parse(" ; ").isEmpty)
  }

  test("a compiled action list is a valid STREAM stage: stream == batch bit-for-bit") {
    // the chain is pure column transforms (no state, no shuffle), so the
    // same compiled list drops into a streaming DAG unchanged — the
    // reference dispatches its action list per fetched page; here per
    // micro-batched row
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val chain = Actions.compile("strip_silence;resample:16000;transcode:ulaw")
    val rows = clips.limit(12).collect().map { r =>
      (r.getString(0), r.getAs[Array[Byte]](1), r.getString(2), r.getInt(3))
    }.toSeq
    val in = MemoryStream[(String, Array[Byte], String, Int)]
    val q = chain(in.toDF().toDF("clip_id", "bytes", "codec", "sr_hz"))
      .writeStream.format("memory").queryName("actions_stream")
      .outputMode("append").start()
    try {
      in.addData(rows.take(5))
      q.processAllAvailable()
      in.addData(rows.drop(5))
      q.processAllAvailable()
      val stream = spark.table("actions_stream")
        .select("clip_id", "bytes", "codec")
        .collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1).toSeq,
          r.getString(2))).sortBy(_._1)
      val batch = chain(rows.toDF("clip_id", "bytes", "codec", "sr_hz"))
        .select("clip_id", "bytes", "codec")
        .collect().map(r => (r.getString(0), r.getAs[Array[Byte]](1).toSeq,
          r.getString(2))).sortBy(_._1)
      assert(stream.length == rows.length)
      assert(stream.toSeq == batch.toSeq)
    } finally q.stop()
  }

  test("chain output equals the independently applied kernels, bit for bit") {
    import spark.implicits._
    val sample = clips.limit(20).collect().map { r =>
      (r.getString(0), r.getAs[Array[Byte]](1), r.getString(2), r.getInt(3))
    }
    val out = Actions.compile("gain:0.5;transcode:alaw")(
      sample.toSeq.toDF("clip_id", "bytes", "codec", "sr_hz"))
      .select("clip_id", "bytes", "codec").collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1).toSeq, r.getString(2)))
      .sortBy(_._1)
    val expect = sample.map { case (id, b, c, _) =>
      val gained = graft.audio.AudioCodec.encode(
        graft.audio.AudioCodec.decode(b, c).map(v =>
          (v * 0.5).toFloat), c)
      (id, graft.audio.AudioCodec.transcode(gained, c, "alaw").toSeq, "alaw")
    }.sortBy(_._1)
    assert(out.length == expect.length)
    out.zip(expect).foreach { case (g, e) => assert(g == e, g._1) }
  }
}
