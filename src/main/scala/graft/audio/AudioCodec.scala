package graft.audio

/** Pure-JVM audio codecs for the clip table's `bytes` column.
  *
  * Re-expresses the reference's heavy per-row decode path (Chrome render,
  * `/root/reference/fetch/fetcher.go:284-373`, and charset transcode,
  * `/root/reference/fetch/utf8encoding.go:13-32`) as deterministic audio
  * codec work per BASELINE.json `input_hint`. Three codecs, all
  * deterministic pure math (ITU-T G.711 companding, public algorithm):
  *
  *   - `pcm16`: 16-bit signed little-endian linear PCM (2 bytes/sample)
  *   - `ulaw` : G.711 mu-law (1 byte/sample, 14-bit dynamic range)
  *   - `alaw` : G.711 A-law  (1 byte/sample, 13-bit dynamic range)
  *
  * Float convention: samples in [-1, 1); short = round(f * 32768) clamped,
  * decode f = s / 32768f. Round-trip SNR for in-range signals is ~35-40 dB
  * for the companded codecs (verified in AudioCodecSpec; the per-row
  * invariant requires >= 30 dB).
  */
object AudioCodec {

  final val Pcm16 = "pcm16"
  final val Ulaw  = "ulaw"
  final val Alaw  = "alaw"
  final val Codecs: Seq[String] = Seq(Pcm16, Ulaw, Alaw)

  @inline private def clampShort(v: Int): Short =
    if (v > 32767) 32767.toShort else if (v < -32768) (-32768).toShort else v.toShort

  @inline def floatToShort(f: Float): Short = clampShort(math.round(f * 32768f))
  @inline def shortToFloat(s: Short): Float = s / 32768f

  // ----- G.711 segment tables (ITU-T, public) -----
  private val SegAend = Array(0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF)
  private val SegUend = Array(0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF, 0x3FFF, 0x7FFF)
  private val UlawBias = 0x84
  private val UlawClip = 32635

  @inline private def segment(v: Int, table: Array[Int]): Int = {
    var i = 0
    while (i < 8 && v > table(i)) i += 1
    i
  }

  /** G.711 linear (16-bit) -> A-law byte. */
  def linearToAlaw(pcm16: Short): Byte = {
    var pcm = pcm16 >> 3 // 16 -> 13 bit
    var mask = 0xD5
    if (pcm < 0) { mask = 0x55; pcm = -pcm - 1 }
    val seg = segment(pcm, SegAend)
    if (seg >= 8) (0x7F ^ mask).toByte
    else {
      var aval = seg << 4
      if (seg < 2) aval |= (pcm >> 1) & 0xF
      else aval |= (pcm >> seg) & 0xF
      (aval ^ mask).toByte
    }
  }

  /** G.711 A-law byte -> linear (16-bit) — direct segment arithmetic
    * (kept as the table generator; hot paths read [[AlawLin]]). */
  private def alawToLinearCompute(alaw: Byte): Short = {
    val a = (alaw ^ 0x55) & 0xFF
    var t = (a & 0xF) << 4
    val seg = (a & 0x70) >> 4
    seg match {
      case 0 => t += 8
      case 1 => t += 0x108
      case _ => t += 0x108; t <<= (seg - 1)
    }
    (if ((a & 0x80) != 0) t else -t).toShort
  }

  /** 256-entry decode LUTs: a G.711 decode is a pure function of one byte,
    * so the per-sample segment/shift arithmetic in every companded hot
    * loop collapses to one array load (identical values by construction —
    * the tables are generated from the arithmetic they replace). */
  private val AlawLin: Array[Short] =
    Array.tabulate(256)(i => alawToLinearCompute(i.toByte))

  /** G.711 A-law byte -> linear (16-bit). */
  @inline def alawToLinear(alaw: Byte): Short = AlawLin(alaw & 0xFF)

  /** G.711 linear (16-bit) -> mu-law byte (Sun/CCITT g711.c convention,
    * BIAS in the 16-bit domain — matched pair with ulawToLinear). */
  def linearToUlaw(pcm16: Short): Byte = {
    var pcm = pcm16.toInt
    var mask = 0xFF
    if (pcm < 0) { pcm = -pcm; mask = 0x7F }
    if (pcm > UlawClip) pcm = UlawClip
    pcm += UlawBias
    val seg = segment(pcm, SegUend)
    if (seg >= 8) (0x7F ^ mask).toByte
    else (((seg << 4) | ((pcm >> (seg + 3)) & 0xF)) ^ mask).toByte
  }

  /** G.711 mu-law byte -> linear (16-bit) — table generator (see
    * [[AlawLin]]'s rationale). */
  private def ulawToLinearCompute(ulaw: Byte): Short = {
    val u = (~ulaw) & 0xFF
    var t = ((u & 0xF) << 3) + UlawBias
    t <<= (u & 0x70) >> 4
    clampShort(if ((u & 0x80) != 0) UlawBias - t else t - UlawBias)
  }

  private val UlawLin: Array[Short] =
    Array.tabulate(256)(i => ulawToLinearCompute(i.toByte))

  /** G.711 mu-law byte -> linear (16-bit). */
  @inline def ulawToLinear(ulaw: Byte): Short = UlawLin(ulaw & 0xFF)

  // Derived decode tables in the float/double domains the hot loops
  // consume (identical values by construction: float = shortToFloat(lin),
  // double = lin / 32768.0 — both exact power-of-two scalings), plus
  // full 16-bit ENCODE tables (64 KB each; linearToXlaw is a pure
  // function of the 16-bit sample). Hot loops hoist the table into a
  // local before the loop — the module-field access per call was
  // measurably slower than the arithmetic it replaced.
  private[audio] val UlawLinF: Array[Float] =
    Array.tabulate(256)(i => shortToFloat(UlawLin(i)))
  private[audio] val AlawLinF: Array[Float] =
    Array.tabulate(256)(i => shortToFloat(AlawLin(i)))
  private[audio] val UlawLinD: Array[Double] =
    Array.tabulate(256)(i => UlawLin(i) / 32768.0)
  private[audio] val AlawLinD: Array[Double] =
    Array.tabulate(256)(i => AlawLin(i) / 32768.0)
  private[audio] val UlawEnc: Array[Byte] =
    Array.tabulate(65536)(i => linearToUlaw(i.toShort))
  private[audio] val AlawEnc: Array[Byte] =
    Array.tabulate(65536)(i => linearToAlaw(i.toShort))

  // ----- byte[] <-> float[] -----

  def encode(samples: Array[Float], codec: String): Array[Byte] = codec match {
    case Pcm16 =>
      val out = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        val s = floatToShort(samples(i))
        out(2 * i) = (s & 0xFF).toByte
        out(2 * i + 1) = ((s >> 8) & 0xFF).toByte
        i += 1
      }
      out
    case Ulaw =>
      val t = UlawEnc
      val out = new Array[Byte](samples.length)
      var i = 0
      while (i < samples.length) { out(i) = t(floatToShort(samples(i)) & 0xFFFF); i += 1 }
      out
    case Alaw =>
      val t = AlawEnc
      val out = new Array[Byte](samples.length)
      var i = 0
      while (i < samples.length) { out(i) = t(floatToShort(samples(i)) & 0xFFFF); i += 1 }
      out
    case other => throw new IllegalArgumentException(s"unknown codec: $other")
  }

  def decode(bytes: Array[Byte], codec: String): Array[Float] = codec match {
    case Pcm16 =>
      val n = bytes.length / 2
      val out = new Array[Float](n)
      var i = 0
      while (i < n) {
        val s = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort
        out(i) = shortToFloat(s)
        i += 1
      }
      out
    case Ulaw =>
      val t = UlawLinF
      val out = new Array[Float](bytes.length)
      var i = 0
      while (i < bytes.length) { out(i) = t(bytes(i) & 0xFF); i += 1 }
      out
    case Alaw =>
      val t = AlawLinF
      val out = new Array[Float](bytes.length)
      var i = 0
      while (i < bytes.length) { out(i) = t(bytes(i) & 0xFF); i += 1 }
      out
    case other => throw new IllegalArgumentException(s"unknown codec: $other")
  }

  /** Number of samples encoded in `bytes` for `codec` (no decode needed). */
  /** Throws on unknown codecs like decode/encode do — the DecodeElision
    * optimizer rule rewrites size(decode_pcm(...)) to pcm_sample_count(...),
    * and an optimization must not change error semantics. */
  def sampleCount(nBytes: Int, codec: String): Int = codec match {
    case Pcm16 => nBytes / 2
    case Ulaw | Alaw => nBytes
    case other => throw new IllegalArgumentException(s"unknown codec: $other")
  }

  /** Fused decode + RMS — no intermediate float array (hot-path friendly:
    * one pass over the bytes, zero allocation). */
  def rms(bytes: Array[Byte], codec: String): Double = {
    var acc = 0.0
    var n = 0
    codec match {
      case Pcm16 =>
        n = bytes.length / 2
        var i = 0
        while (i < n) {
          val s = ((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort / 32768.0
          acc += s * s; i += 1
        }
      case Ulaw =>
        val t = UlawLinD
        n = bytes.length
        var i = 0
        while (i < n) { val s = t(bytes(i) & 0xFF); acc += s * s; i += 1 }
      case Alaw =>
        val t = AlawLinD
        n = bytes.length
        var i = 0
        while (i < n) { val s = t(bytes(i) & 0xFF); acc += s * s; i += 1 }
      case other => throw new IllegalArgumentException(s"unknown codec: $other")
    }
    if (n == 0) 0.0 else math.sqrt(acc / n)
  }

  /** Fused decode + energy-based voice-activity segmentation: the signal
    * is cut into `frameMs` frames, a frame is VOICED iff its RMS (float
    * scale, like [[rms]]) >= rmsThreshold, and maximal voiced runs become
    * segments. Returns segments flattened as [start_ms, end_ms, ...] on
    * the frame grid.
    *
    * The trailing partial frame (n % frameSamples != 0) is DROPPED, not
    * padded: a partial frame's RMS depends on whatever phase the signal
    * happened to end on (one or two samples can sit on a zero crossing),
    * which would make the clip tail's voicedness non-deterministic to
    * downstream length contracts. On the frame grid the output is an
    * exact function of (n, sr, frameMs) and per-frame voicedness.
    *
    * One pass over the bytes, zero allocation beyond the output — the
    * same fused-scan shape as [[rms]]/[[bandEnergies]]. */
  def segmentsMs(bytes: Array[Byte], codec: String, srHz: Int,
                 frameMs: Int, rmsThreshold: Double): Array[Int] = {
    require(frameMs > 0, s"frameMs must be > 0, got $frameMs")
    val fsL = srHz.toLong * frameMs / 1000
    require(fsL > 0, s"frame shorter than one sample: sr=$srHz frameMs=$frameMs")
    val frameSamples = fsL.toInt
    val n = sampleCount(bytes.length, codec)
    val nf = n / frameSamples
    if (nf == 0) return Array.emptyIntArray
    val segs = new scala.collection.mutable.ArrayBuffer[Int](8)
    var runStart = -1
    var f = 0
    while (f < nf) {
      var acc = 0.0
      val base = f * frameSamples
      codec match {
        case Pcm16 =>
          var i = 0
          while (i < frameSamples) {
            val j = 2 * (base + i)
            val s = ((bytes(j) & 0xFF) | (bytes(j + 1) << 8)).toShort / 32768.0
            acc += s * s; i += 1
          }
        case Ulaw =>
          val t = UlawLinD
          var i = 0
          while (i < frameSamples) {
            val s = t(bytes(base + i) & 0xFF); acc += s * s; i += 1
          }
        case Alaw =>
          val t = AlawLinD
          var i = 0
          while (i < frameSamples) {
            val s = t(bytes(base + i) & 0xFF); acc += s * s; i += 1
          }
        case other => throw new IllegalArgumentException(s"unknown codec: $other")
      }
      val voiced = math.sqrt(acc / frameSamples) >= rmsThreshold
      if (voiced && runStart < 0) runStart = f
      else if (!voiced && runStart >= 0) {
        segs += runStart * frameMs; segs += f * frameMs; runStart = -1
      }
      f += 1
    }
    if (runStart >= 0) { segs += runStart * frameMs; segs += nf * frameMs }
    segs.toArray
  }

  /** Silence REMOVAL: splice together the bytes of the voiced frames (as
    * segmented by [[segmentsMs]] — same frame grid, same threshold,
    * partial tail dropped) WITHOUT re-encoding: codec and rate are
    * preserved, so the output length is frame-exact
    * (voiced_frames * frame_bytes) and statable from byte arithmetic —
    * the oracle contract of c19. Idempotent: voiced frames stay voiced
    * under a second pass (their bytes are unchanged). */
  def stripSilence(bytes: Array[Byte], codec: String, srHz: Int,
                   frameMs: Int, rmsThreshold: Double): Array[Byte] = {
    val segs = segmentsMs(bytes, codec, srHz, frameMs, rmsThreshold)
    val fs = (srHz.toLong * frameMs / 1000).toInt
    val frameBytes = fs * (codec match {
      case Pcm16 => 2
      case Ulaw | Alaw => 1
      case other => throw new IllegalArgumentException(s"unknown codec: $other")
    })
    var outLen = 0
    var i = 0
    while (i < segs.length) {
      outLen += (segs(i + 1) - segs(i)) / frameMs * frameBytes; i += 2
    }
    val out = new Array[Byte](outLen)
    var pos = 0
    i = 0
    while (i < segs.length) {
      val nb = (segs(i + 1) - segs(i)) / frameMs * frameBytes
      System.arraycopy(bytes, segs(i) / frameMs * frameBytes, out, pos, nb)
      pos += nb; i += 2
    }
    out
  }

  /** Fused decode + Goertzel filterbank: per-band signal energy at
    * `nBands` evenly spaced center frequencies in (0, sr/2). One pass over
    * the bytes, `nBands` Goertzel recurrences running in parallel, zero
    * allocation beyond the output — the audio feature-extraction kernel of
    * the training-data pipeline (and the CPU-heavy stage of the bench).
    * Returns mean-square band energies (normalized by sample count). */
  def bandEnergies(bytes: Array[Byte], codec: String, srHz: Int,
                   nBands: Int = 8): Array[Double] = {
    val n = sampleCount(bytes.length, codec)
    val coeff = new Array[Double](nBands)
    var b = 0
    while (b < nBands) {
      val f = (b + 0.5) * srHz / (2.0 * nBands) // centers in (0, sr/2)
      coeff(b) = 2.0 * math.cos(2.0 * math.Pi * f / srHz)
      b += 1
    }
    val s1 = new Array[Double](nBands)
    val s2 = new Array[Double](nBands)
    // per-codec specialized loops: the codec is loop-invariant, and a
    // per-sample string match defeats the JIT (no reliable loop
    // unswitching on String equality) — hoisting it is worth ~2x on this
    // kernel, the CPU-heavy stage of the streaming bench. Arithmetic
    // order is IDENTICAL in every branch => bit-identical results.
    @inline def step(x: Double): Unit = {
      var b2 = 0
      while (b2 < nBands) {
        val s0 = x + coeff(b2) * s1(b2) - s2(b2)
        s2(b2) = s1(b2); s1(b2) = s0
        b2 += 1
      }
    }
    // two samples per band visit (pcm16, the 80% codec): halves the
    // s1/s2 load/store traffic; each step's arithmetic order is identical
    // to the single-step form => bit-identical results
    @inline def step2(x0: Double, x1: Double): Unit = {
      var b2 = 0
      while (b2 < nBands) {
        val c = coeff(b2); val a = s1(b2); val d = s2(b2)
        val e = x0 + c * a - d
        val f = x1 + c * e - a
        s2(b2) = e; s1(b2) = f
        b2 += 1
      }
    }
    // four samples per band visit (r7): quarters the state traffic; the
    // per-band op sequence is exactly two chained step2 applications =>
    // still bit-identical (KernelEquivalenceSpec gates the family)
    @inline def step4(x0: Double, x1: Double, x2: Double, x3: Double): Unit = {
      var b2 = 0
      while (b2 < nBands) {
        val c = coeff(b2); val a = s1(b2); val d = s2(b2)
        val e = x0 + c * a - d
        val f = x1 + c * e - a
        val g = x2 + c * f - e
        val h = x3 + c * g - f
        s2(b2) = g; s1(b2) = h
        b2 += 1
      }
    }
    codec match {
      case Pcm16 =>
        @inline def x(i: Int): Double =
          (((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort) / 32768.0
        var i = 0
        while (i + 3 < n) { step4(x(i), x(i + 1), x(i + 2), x(i + 3)); i += 4 }
        while (i + 1 < n) { step2(x(i), x(i + 1)); i += 2 }
        while (i < n) { step(x(i)); i += 1 }
      case Ulaw =>
        // step2 applies the two samples in exactly the single-step order
        // (see the pcm16 comment) and the table holds lin/32768.0 exactly
        // => bit-identical to the former per-sample arithmetic
        val t = UlawLinD
        var i = 0
        while (i + 1 < n) {
          step2(t(bytes(i) & 0xFF), t(bytes(i + 1) & 0xFF)); i += 2
        }
        while (i < n) { step(t(bytes(i) & 0xFF)); i += 1 }
      case Alaw =>
        val t = AlawLinD
        var i = 0
        while (i + 1 < n) {
          step2(t(bytes(i) & 0xFF), t(bytes(i + 1) & 0xFF)); i += 2
        }
        while (i < n) { step(t(bytes(i) & 0xFF)); i += 1 }
      case other => throw new IllegalArgumentException(s"unknown codec: $other")
    }
    val out = new Array[Double](nBands)
    b = 0
    while (b < nBands) {
      val e = s1(b) * s1(b) + s2(b) * s2(b) - coeff(b) * s1(b) * s2(b)
      out(b) = if (n == 0) 0.0 else e / (n.toDouble * n.toDouble)
      b += 1
    }
    out
  }

  /** Fused tone synthesis + Goertzel filterbank — the optimizer-rule
    * target for `pcm_band_energies(pcm_tone(srT, f, n), 'pcm16', srB)`
    * (c10's shape): synthesizes the quantized samples and feeds the SAME
    * step2/step recurrences as [[bandEnergies]]' pcm16 branch without
    * materializing the 2n-byte encoded array or re-parsing it. Each
    * sample's value is floatToShort(sample)/32768.0 — exactly what the
    * encode+decode round trip yields — and the recurrence structure
    * (pairwise step2, single-step tail) matches bandEnergies, so the
    * result is bit-identical to the unfused pipeline while skipping one
    * full encode pass, one decode pass and the per-row byte[] allocation
    * (~2.8 GB of transient garbage over a 50k-clip corpus — the GC churn
    * half of c10's cost instability). */
  def toneBandEnergies(srTone: Int, fMilliHz: Long, n: Int,
                       srBand: Int, nBands: Int = 8): Array[Double] = {
    // STREAMING synthesis: generate samples in a reusable 1024-sample
    // block (the phasor's exact-resync block size, so sample values are
    // IDENTICAL to AudioSynth.toneSamples) instead of materializing a
    // float[n] per row — the per-row up-to-700 KB allocation was the
    // remaining GC churn of c10 under memory pressure. Blocks are
    // 1024-aligned and even, so the pairwise step2 consumption below
    // never straddles a block boundary and the recurrence order matches
    // bandEnergies' pcm16 branch exactly.
    require(srTone > 0 && n >= 0, s"bad tone params sr=$srTone n=$n")
    val pcm = new Array[Float](math.min(n, 1024))
    val w = 2.0 * math.Pi * (fMilliHz / 1000.0) / srTone
    val cw = math.cos(w); val sw = math.sin(w)
    val coeff = new Array[Double](nBands)
    var b = 0
    while (b < nBands) {
      val f = (b + 0.5) * srBand / (2.0 * nBands)
      coeff(b) = 2.0 * math.cos(2.0 * math.Pi * f / srBand)
      b += 1
    }
    val s1 = new Array[Double](nBands)
    val s2 = new Array[Double](nBands)
    @inline def step(x: Double): Unit = {
      var b2 = 0
      while (b2 < nBands) {
        val s0 = x + coeff(b2) * s1(b2) - s2(b2)
        s2(b2) = s1(b2); s1(b2) = s0
        b2 += 1
      }
    }
    @inline def step2(x0: Double, x1: Double): Unit = {
      var b2 = 0
      while (b2 < nBands) {
        val c = coeff(b2); val a = s1(b2); val d = s2(b2)
        val e = x0 + c * a - d
        val f = x1 + c * e - a
        s2(b2) = e; s1(b2) = f
        b2 += 1
      }
    }
    // step4 == two chained step2 bodies (bandEnergies' r7 stride) =>
    // bit-identical; the fused-vs-unfused equality spec gates it
    @inline def step4(x0: Double, x1: Double, x2: Double, x3: Double): Unit = {
      var b2 = 0
      while (b2 < nBands) {
        val c = coeff(b2); val a = s1(b2); val d = s2(b2)
        val e = x0 + c * a - d
        val f = x1 + c * e - a
        val g = x2 + c * f - e
        val h = x3 + c * g - f
        s2(b2) = g; s1(b2) = h
        b2 += 1
      }
    }
    var blockStart = 0
    while (blockStart < n) {
      // exact anchor per 1024-sample block — identical to toneSamples
      var s = math.sin(w * blockStart); var c = math.cos(w * blockStart)
      val blockLen = math.min(1024, n - blockStart)
      var j = 0
      while (j < blockLen) {
        pcm(j) = (0.5 * s).toFloat
        val nc = c * cw - s * sw; s = s * cw + c * sw; c = nc
        j += 1
      }
      @inline def q(i: Int): Double = floatToShort(pcm(i)) / 32768.0
      var i = 0
      while (i + 3 < blockLen) { step4(q(i), q(i + 1), q(i + 2), q(i + 3)); i += 4 }
      while (i + 1 < blockLen) { step2(q(i), q(i + 1)); i += 2 }
      while (i < blockLen) { step(q(i)); i += 1 }
      blockStart += blockLen
    }
    val out = new Array[Double](nBands)
    b = 0
    while (b < nBands) {
      val e = s1(b) * s1(b) + s2(b) * s2(b) - coeff(b) * s1(b) * s2(b)
      out(b) = if (n == 0) 0.0 else e / (n.toDouble * n.toDouble)
      b += 1
    }
    out
  }

  /** Transcode: decode `codec` then re-encode as `target`. Sample count is
    * preserved; fidelity is bounded by the lossier of the two codecs (G.711
    * companding keeps SNR >= ~30 dB on speech-band signals).
    *
    * Byte-domain fast paths (r7): the float round trip is an exact
    * identity — `floatToShort(shortToFloat(s)) == s` for every short
    * (divide and multiply by the same power of two, round-to-nearest) —
    * so each codec pair collapses to table lookups with OUTPUT BYTES
    * IDENTICAL to the decode+encode composition (TranscodeTables are
    * generated from that composition's own functions): G.711 -> G.711 is
    * one 256-byte map per direction, pcm16 -> G.711 indexes the encode
    * table by the raw short, G.711 -> pcm16 writes the decode table's
    * short, pcm16 -> pcm16 is the identity. No float arrays, no
    * intermediate allocation — this is the twin-construction branch of
    * c14/c15/c20 and the final stage of every `transcode:` action chain
    * (c21). */
  private val UlawToAlaw: Array[Byte] =
    Array.tabulate(256)(i => AlawEnc(UlawLin(i) & 0xFFFF))
  private val AlawToUlaw: Array[Byte] =
    Array.tabulate(256)(i => UlawEnc(AlawLin(i) & 0xFFFF))
  // same-codec "transcode" still round-trips through the quantizer in the
  // composition — tabulate that round trip rather than assuming G.711
  // codes are re-encode fixed points
  private val UlawRound: Array[Byte] =
    Array.tabulate(256)(i => UlawEnc(UlawLin(i) & 0xFFFF))
  private val AlawRound: Array[Byte] =
    Array.tabulate(256)(i => AlawEnc(AlawLin(i) & 0xFFFF))

  def transcode(bytes: Array[Byte], codec: String, target: String): Array[Byte] = {
    @inline def mapBytes(t: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](bytes.length)
      var i = 0
      while (i < bytes.length) { out(i) = t(bytes(i) & 0xFF); i += 1 }
      out
    }
    (codec, target) match {
      // decode+encode of pcm16 truncates a trailing odd byte and is
      // otherwise the exact identity (floatToShort . shortToFloat = id)
      case (Pcm16, Pcm16) => java.util.Arrays.copyOf(bytes, bytes.length / 2 * 2)
      case (Ulaw, Ulaw) => mapBytes(UlawRound)
      case (Alaw, Alaw) => mapBytes(AlawRound)
      case (Ulaw, Alaw) => mapBytes(UlawToAlaw)
      case (Alaw, Ulaw) => mapBytes(AlawToUlaw)
      case (Pcm16, Ulaw) | (Pcm16, Alaw) =>
        val enc = if (target == Ulaw) UlawEnc else AlawEnc
        val n = bytes.length / 2
        val out = new Array[Byte](n)
        var i = 0
        while (i < n) {
          val s = (bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)
          out(i) = enc(s & 0xFFFF)
          i += 1
        }
        out
      case (Ulaw, Pcm16) | (Alaw, Pcm16) =>
        val lin = if (codec == Ulaw) UlawLin else AlawLin
        val out = new Array[Byte](bytes.length * 2)
        var i = 0
        while (i < bytes.length) {
          val s = lin(bytes(i) & 0xFF)
          out(2 * i) = (s & 0xFF).toByte
          out(2 * i + 1) = ((s >> 8) & 0xFF).toByte
          i += 1
        }
        out
      case _ => encode(decode(bytes, codec), target) // unknown-codec errors
    }
  }

  /** Exact output length of [[resample]] — pure integer math so the
    * contract is statable in oracle SQL: floor(n * dstHz / srcHz). */
  def resampledCount(n: Int, srcHz: Int, dstHz: Int): Int =
    ((n.toLong * dstHz) / srcHz).toInt

  /** Sample-rate conversion by windowed-sinc interpolation (the training-
    * pipeline normalization step: mixed-rate corpora -> one model rate).
    * Output is pcm16 at `dstHz` with exactly [[resampledCount]] samples.
    *
    * Per output sample m the input is evaluated at t = m*src/dst through
    * an 8-lobe Hann-windowed sinc; when downsampling the sinc cutoff is
    * scaled to the OUTPUT Nyquist (fc = dst/src), which is the anti-alias
    * lowpass — a plain linear interpolator would fold everything above
    * the target Nyquist back into band.
    *
    * POLYPHASE kernel caching: for a rational ratio the fractional phase
    * t-floor(t) takes only L = dst/gcd(src,dst) distinct values, so the
    * windowed-sinc coefficient bank is precomputed ONCE per (src, dst)
    * pair (a few KB, process-wide cache — deterministic contents, like a
    * folded constant) and the per-sample inner loop is a pure
    * multiply-accumulate with no trig. Measured ~20-50x over per-tap
    * Math.sin. Ratios with L > 4096 phases fall back to direct
    * evaluation. Cost O(n · taps/fc) per clip, computed in the scan stage
    * like every other codec kernel. */
  private final class PolyFilter(val L: Int, val M: Int, val jLo: Array[Int],
                                 val coeffs: Array[Array[Double]],
                                 val wsum: Array[Double],
                                 val identityPhase: Array[Boolean])
  private val filterCache =
    new java.util.concurrent.ConcurrentHashMap[Long, PolyFilter]()

  @annotation.tailrec
  private def gcd(a: Int, b: Int): Int = if (b == 0) a else gcd(b, a % b)

  @inline private def kernelCoeff(x: Double, fc: Double, half: Double): Double = {
    val sinc = if (x == 0.0) 1.0 else {
      val px = math.Pi * fc * x
      math.sin(px) / px
    }
    fc * sinc * 0.5 * (1.0 + math.cos(math.Pi * x / half)) // Hann-windowed
  }

  private def buildFilter(srcHz: Int, dstHz: Int, fc: Double, half: Double): PolyFilter = {
    val g = gcd(srcHz, dstHz)
    val l = dstHz / g; val mm = srcHz / g
    val jLo = new Array[Int](l)
    val coeffs = new Array[Array[Double]](l)
    val wsum = new Array[Double](l)
    val identity = new Array[Boolean](l)
    var r = 0
    while (r < l) {
      val frac = ((r.toLong * mm) % l).toDouble / l
      val lo = math.ceil(frac - half).toInt
      val hi = math.floor(frac + half).toInt
      jLo(r) = lo
      val cs = new Array[Double](hi - lo + 1)
      var j = lo
      var s = 0.0
      while (j <= hi) { val c = kernelCoeff(frac - j, fc, half); cs(j - lo) = c; s += c; j += 1 }
      coeffs(r) = cs
      wsum(r) = s
      // UPSAMPLING identity phase (r7): at fc == 1 and zero fractional
      // offset the kernel is a delta up to float residue (sin(pi*k)/pi*k
      // at ~1e-17 for integer k != 0) — such output samples are the input
      // sample to within ~1e-16 relative. Emitting in(base) directly
      // skips the whole tap loop for 1/L of outputs (HALF of them on the
      // dominant 8k->16k path). Sample values move by < 1e-9 of full
      // scale — invisible to the int16 encode and far inside the >= 30 dB
      // fidelity contract; output LENGTH (the oracle) is untouched.
      identity(r) = fc == 1.0 && frac == 0.0
      r += 1
    }
    new PolyFilter(l, mm, jLo, coeffs, wsum, identity)
  }

  def resample(bytes: Array[Byte], codec: String, srcHz: Int, dstHz: Int): Array[Byte] = {
    require(srcHz > 0 && dstHz > 0, s"sample rates must be positive: $srcHz -> $dstHz")
    val in = decode(bytes, codec)
    if (srcHz == dstHz) return encode(in, Pcm16)
    val nOut = resampledCount(in.length, srcHz, dstHz)
    val out = new Array[Float](nOut)
    val fc = math.min(1.0, dstHz.toDouble / srcHz) // cutoff vs input Nyquist
    val half = 8 / fc // taps reach further when downsampling
    val nPhases = dstHz / gcd(srcHz, dstHz)
    val pf = if (nPhases <= 4096)
      filterCache.computeIfAbsent((srcHz.toLong << 32) | dstHz,
        _ => buildFilter(srcHz, dstHz, fc, half))
    else null
    val n = in.length
    var m = 0
    while (m < nOut) {
      var acc = 0.0
      var wsum = 0.0
      if (pf != null) {
        val q = m / pf.L; val r = m % pf.L
        val base = q * pf.M + (r * pf.M) / pf.L // = floor(t)
        val cs = pf.coeffs(r)
        val kLo = base + pf.jLo(r)
        if (pf.identityPhase(r) && base < n) {
          // (acc/wsum).toFloat below reproduces in(base) exactly
          acc = in(base); wsum = 1.0
        } else if (kLo >= 0 && kLo + cs.length <= n) {
          // interior sample: full kernel, precomputed DC gain. FOUR
          // accumulators: a single `acc +=` chain is latency-bound (one
          // double add per 4-5 cycles); independent partial sums run at
          // FMA throughput — ~3x on this, the dominant loop of c17/c21.
          // The reassociated sum can move the rounded output by at most
          // 1 LSB; the resample contract pins output LENGTH exactly and
          // fidelity only at >= 30 dB SNR (both unaffected).
          var a0 = 0.0; var a1 = 0.0; var a2 = 0.0; var a3 = 0.0
          val m2 = cs.length
          var i = 0
          while (i + 3 < m2) {
            a0 += in(kLo + i) * cs(i)
            a1 += in(kLo + i + 1) * cs(i + 1)
            a2 += in(kLo + i + 2) * cs(i + 2)
            a3 += in(kLo + i + 3) * cs(i + 3)
            i += 4
          }
          while (i < m2) { a0 += in(kLo + i) * cs(i); i += 1 }
          acc = (a0 + a1) + (a2 + a3)
          wsum = pf.wsum(r)
        } else {
          // edge sample: clip the kernel to the signal, renormalize
          var i = math.max(0, -kLo)
          val end = math.min(cs.length, n - kLo)
          while (i < end) { val c = cs(i); acc += in(kLo + i) * c; wsum += c; i += 1 }
        }
      } else {
        // irrational-ish ratio (L too large to tabulate): direct kernel
        val t = m.toDouble * srcHz / dstHz
        var k = math.max(0, math.ceil(t - half).toInt)
        val kEnd = math.min(n - 1, math.floor(t + half).toInt)
        while (k <= kEnd) {
          val c = kernelCoeff(t - k, fc, half)
          acc += in(k) * c
          wsum += c
          k += 1
        }
      }
      // normalize by the kernel's DC gain so plateaus stay level at any
      // fractional phase (classic polyphase normalization)
      out(m) = if (wsum != 0.0) (acc / wsum).toFloat else 0f
      m += 1
    }
    encode(out, Pcm16)
  }

  /** Goertzel power of `pcm(from until from+len)` at frequency `f` Hz. */
  def goertzelPower(pcm: Array[Float], srHz: Int, f: Double,
                    from: Int, len: Int): Double = {
    val c = 2.0 * math.cos(2.0 * math.Pi * f / srHz)
    var s1 = 0.0; var s2 = 0.0
    var i = from
    val end = math.min(from + len, pcm.length)
    while (i < end) { val s0 = pcm(i) + c * s1 - s2; s2 = s1; s1 = s0; i += 1 }
    s1 * s1 + s2 * s2 - c * s1 * s2
  }

  /** Goertzel power at MANY integer frequencies in ONE pass over the
    * window. Each frequency's recurrence is independent and its arithmetic
    * (coefficient formula, update order, final power) is IDENTICAL to
    * [[goertzelPower]], so every output is bit-equal to the single-probe
    * call — only the loop nesting changes. The point is throughput: one
    * probe is a serial dependency chain (~2 FMA latencies per sample);
    * interleaving m probes gives m independent chains, so the scan stages
    * of [[scanTone]] run at FMA *throughput* instead of latency — measured
    * ~4-6x on the tonePair kernel, the dominant per-clip cost of every
    * audio near-dup query (c14/c15/c20 + organic variants). */
  def goertzelPowerMulti(pcm: Array[Float], srHz: Int, fs: Array[Int],
                         from: Int, len: Int): Array[Double] = {
    val m = fs.length
    val cs = new Array[Double](m)
    var j = 0
    while (j < m) {
      cs(j) = 2.0 * math.cos(2.0 * math.Pi * fs(j).toDouble / srHz); j += 1
    }
    val s1 = new Array[Double](m)
    val s2 = new Array[Double](m)
    var i = from
    val end = math.min(from + len, pcm.length)
    while (i < end) {
      val x = pcm(i)
      var j2 = 0
      while (j2 < m) {
        val s0 = x + cs(j2) * s1(j2) - s2(j2)
        s2(j2) = s1(j2); s1(j2) = s0
        j2 += 1
      }
      i += 1
    }
    val out = new Array[Double](m)
    j = 0
    while (j < m) {
      out(j) = s1(j) * s1(j) + s2(j) * s2(j) - cs(j) * s1(j) * s2(j); j += 1
    }
    out
  }

  /** Least-squares fit of a sinusoid at integer frequency `f` and its
    * subtraction from `pcm` (one matching-pursuit step). Over many cycles
    * the normal equations diagonalize to 2/n — residual of the fitted tone
    * is O(1/cycles) of its amplitude, far below any other component.
    *
    * cos(w·i)/sin(w·i) advance by a PHASOR RECURRENCE (one 2x2 rotation per
    * sample) instead of per-sample trig calls: Math.sin/cos pay large-angle
    * argument reduction (~100 ns/call) and were ~half the whole tonePair
    * kernel. Rotation drift is O(n·eps) ≈ 1.5e-11 over the 65536-sample
    * analysis window — 5 orders of magnitude below the G.711 noise floor
    * the integer-Hz argmax already survives. */
  private def subtractTone(pcm: Array[Float], srHz: Int, f: Int): Array[Float] = {
    val w = 2.0 * math.Pi * f / srHz
    val cw = math.cos(w); val sw = math.sin(w)
    var c = 1.0; var s = 0.0 // (cos(w*i), sin(w*i)) at i = 0
    var sc = 0.0; var ss = 0.0
    var i = 0
    while (i < pcm.length) {
      val x = pcm(i).toDouble
      sc += x * c; ss += x * s
      val nc = c * cw - s * sw; s = s * cw + c * sw; c = nc
      i += 1
    }
    val a = 2.0 * sc / pcm.length; val b = 2.0 * ss / pcm.length
    val out = new Array[Float](pcm.length)
    c = 1.0; s = 0.0
    i = 0
    while (i < pcm.length) {
      out(i) = (pcm(i) - a * c - b * s).toFloat
      val nc = c * cw - s * sw; s = s * cw + c * sw; c = nc
      i += 1
    }
    out
  }

  /** Tone analysis window: scans and the matching-pursuit subtraction read
    * at most this many samples. A stationary tone's integer-Hz argmax
    * needs ~sr/w < 1 Hz resolution (65536 @ 44.1 kHz -> 0.67 Hz) and a few
    * thousand cycles for the least-squares fit — more samples add cost,
    * not precision. Bounding the window also makes the kernel O(1) per
    * clip regardless of clip length (a 100 TB corpus property: cost set by
    * the fingerprint, not the payload). */
  final val AnalysisWindow = 65536

  /** Strongest tone in [80, min(2600, sr/2)] to integer Hz.
    *
    * Three stages, all O(probes · window) Goertzel sums:
    *  1. coarse scan of the whole band on a SHORT window (512) at
    *     ~half-bin steps — cheap localization to ~a coarse bin;
    *  2. a ZOOM PYRAMID: double the window, re-scan only ± the previous
    *     level's uncertainty at ~half-bin steps. Each level's error is one
    *     of ITS bins, so the radius halves as the window doubles — total
    *     cost is a few probes per level instead of (coarse radius) probes
    *     on the final window. (The flat coarse→refine version did up to
    *     89 probes × 65536 samples at 44.1 kHz — the pyramid is ~6× less.)
    *  3. a final ±2 Hz integer polish at the full analysis window.
    *
    * Merged-then-split peaks are safe: two tones closer than a level's bin
    * width appear as one peak there, and both lie inside the next level's
    * search radius (radius ≥ previous bin ≥ their separation). */
  private def scanTone(pcm: Array[Float], srHz: Int): Int = {
    val lo = 80; val hi = math.min(2600, srHz / 2 - 1)
    val wMax = math.min(pcm.length, AnalysisWindow)
    val w1 = math.min(wMax, 512)
    val res1 = math.max(1.0, srHz.toDouble / w1)
    val step1 = math.max(1, math.ceil(res1 / 2).toInt)
    var bestF = lo
    // Every scan stage runs its probe set through goertzelPowerMulti (ONE
    // pass, all probes interleaved) and takes the strictly-greater argmax
    // in ascending-frequency order — probe set, per-probe arithmetic and
    // tie-breaking are identical to the former probe-at-a-time loops, so
    // the selected frequency is bit-for-bit the same; only wall clock
    // changes (independent recurrence chains instead of one serial chain
    // per probe — see goertzelPowerMulti).
    def scanBest(fs: Array[Int], w: Int): Unit = {
      if (fs.isEmpty) return
      val ps = goertzelPowerMulti(pcm, srHz, fs, 0, w)
      var bp = -1.0; var bf = bestF
      var j = 0
      while (j < fs.length) {
        if (ps(j) > bp) { bp = ps(j); bf = fs(j) }
        j += 1
      }
      bestF = bf
    }
    def rangeProbes(from: Int, to: Int, st: Int): Array[Int] = {
      if (from > to) return Array.emptyIntArray
      val out = new Array[Int]((to - from) / st + 1)
      var g = from; var j = 0
      while (g <= to) { out(j) = g; j += 1; g += st }
      out
    }
    scanBest(rangeProbes(lo, hi, step1), w1)
    def scanAround(w: Int, radius: Int, st: Int): Unit =
      scanBest(rangeProbes(math.max(lo, bestF - radius),
        math.min(hi, bestF + radius), st), w)
    var w = w1
    var errHz = 2.0 * res1 // coarse argmax lands within ~2 coarse bins
    var lastSt = step1
    while (w < wMax) {
      w = math.min(2L * w, wMax.toLong).toInt
      val bin = srHz.toDouble / w
      val st = math.max(1, (bin / 2).toInt)
      scanAround(w, math.max(2, math.ceil(errHz).toInt), st)
      errHz = math.max(st.toDouble, bin)
      lastSt = st
    }
    // Integer polish at the full window — only when the last pyramid level
    // was still striding (short clips): a st=1 level already did this scan.
    if (lastSt > 1) scanAround(wMax, math.max(2, math.ceil(errHz).toInt), 1)
    bestF
  }

  /** Parametric acoustic fingerprint: the two strongest quasi-stationary
    * tones to INTEGER Hz, strongest first, by one matching-pursuit round:
    * estimate f1, SUBTRACT its fitted sinusoid, estimate f2 on the
    * residual. Subtraction (rather than an exclusion margin around f1) is
    * what makes f2 stable when the tones are close: the merged peak's
    * lumpy skirt made a margin-based second scan flip by several Hz across
    * re-encodes, in both margin regimes (margin 30 dropped a 25 Hz-away
    * tone into the chirp band; margin 3 flipped on beat lumps).
    *
    * Robustness/discrimination contract (AudioDedupSpec + the c14 oracle):
    * f1 — the dominant tone's integer argmax — survives a G.711 re-encode
    * (~30 dB SNR) EXACTLY; f2 survives to within a few Hz (when no true
    * second tone is separable the residual scan lands in the chirp's swept
    * band, whose noise-shaped peak can jitter); different synthesized
    * signals differ by >= 1 Hz. Near-dup key: exact (sr, n, f1) + |Δf2|
    * tolerance — one hash shuffle (Dedup.exact discipline). Fixture tones
    * live in [150, 2450] Hz (AudioSynth); real speech would swap this
    * estimator for richer landmarks behind the same expression slot. */
  def tonePair(bytes: Array[Byte], codec: String, srHz: Int): Array[Int] = {
    // Decode only the analysis prefix: every downstream stage (coarse scan,
    // refine, fit/subtract) reads at most AnalysisWindow samples, so bytes
    // past it are never touched — decode cost is O(window), not O(clip).
    val maxBytes = codec match {
      case Pcm16 => AnalysisWindow * 2
      case _     => AnalysisWindow
    }
    val b = if (bytes.length <= maxBytes) bytes
            else java.util.Arrays.copyOf(bytes, maxBytes)
    val pcm = decode(b, codec)
    if (pcm.length == 0) return Array(0, 0)
    val f1 = scanTone(pcm, srHz)
    val f2 = scanTone(subtractTone(pcm, srHz, f1), srHz)
    Array(f1, f2)
  }

  /** Normalized cross-correlation of two clips ALIGNED BY THEIR LENGTH
    * DIFFERENCE: the shorter clip is assumed to be the longer one with
    * `delta = nLong - nShort` leading samples trimmed, so
    * long[delta + i] is correlated against short[i] over the first
    * min(nShort, AnalysisWindow) samples. Returns a value in [-1, 1]
    * (0 when either side is silent).
    *
    * This is the EXACT verify stage of shift-robust audio near-dup: run
    * only on fingerprint-candidate pairs (never all pairs), it separates
    * true trimmed/transcoded twins (corr ≈ 1, bounded below by G.711
    * round-trip SNR) from organic fingerprint collisions (corr ≈ 0 for
    * unrelated signals) — so detector PRECISION never depends on the
    * fingerprint key being collision-free at corpus scale. */
  def alignedCorr(bytesA: Array[Byte], codecA: String,
                  bytesB: Array[Byte], codecB: String): Double = {
    val nA = sampleCount(bytesA.length, codecA)
    val nB = sampleCount(bytesB.length, codecB)
    val (lb, lc, sb, sc) =
      if (nA >= nB) (bytesA, codecA, bytesB, codecB) else (bytesB, codecB, bytesA, codecA)
    val delta = math.abs(nA - nB)
    val w = math.min(math.min(nA, nB), AnalysisWindow)
    if (w <= 0) return 0.0
    // decode only what the window touches
    def prefix(bytes: Array[Byte], codec: String, samples: Int): Array[Float] = {
      val maxBytes = codec match {
        case Pcm16 => samples * 2
        case _     => samples
      }
      decode(if (bytes.length <= maxBytes) bytes
             else java.util.Arrays.copyOf(bytes, maxBytes), codec)
    }
    val a = prefix(lb, lc, delta + w)
    val b = prefix(sb, sc, w)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < w) {
      val x = a(delta + i).toDouble
      val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  /** Gain applied in the decoded domain, re-encoded with the SAME codec:
    * decode -> scale by `g` -> encode (floatToShort saturates, so gains
    * driving samples past full scale hard-clip exactly like an analog
    * chain into a fixed-point encoder). g = 0 produces digital silence;
    * large g produces a clipped copy. Sample count is preserved. */
  def gain(bytes: Array[Byte], codec: String, g: Double): Array[Byte] = {
    val pcm = decode(bytes, codec)
    var i = 0
    while (i < pcm.length) { pcm(i) = (pcm(i) * g).toFloat; i += 1 }
    encode(pcm, codec)
  }

  /** Silent-sample threshold in the 16-bit linear domain. A-law has no
    * true zero (its zero code decodes to ±8), so "silent" must admit at
    * least |s| <= 8; 16 adds margin for any companded near-zero code while
    * staying ~3 orders of magnitude under the fixture's signal amplitude. */
  final val SilenceLin = 16
  /** Clipped-sample threshold: |s| >= 0.97 full scale. The companded
    * codecs rail at 32124 (mu-law) / 32256 (A-law) ≈ 0.980-0.984 — above
    * the threshold — while the synth fixture's in-range peak is <= 0.88,
    * comfortably below it. */
  final val ClipLin = (0.97 * 32768).toInt

  /** Audio quality metrics in ONE fused pass over the encoded bytes (rms
    * discipline: no intermediate float array). Returns
    * [silence_ratio, clipping_ratio, peak, rms] with peak/rms normalized
    * to [-1, 1] full scale. Empty input is fully silent by convention.
    *
    * The training-data filter this feeds: silence_ratio flags dead/blank
    * clips, clipping_ratio flags distorted ones — the audio analog of the
    * text quality ratios (t1/t4). */
  def quality(bytes: Array[Byte], codec: String): Array[Double] = {
    val n = sampleCount(bytes.length, codec)
    if (n == 0) return Array(1.0, 0.0, 0.0, 0.0)
    var silent = 0; var clipped = 0; var peak = 0; var sumSq = 0.0
    @inline def acc(s: Int): Unit = {
      val a = if (s < 0) -s else s
      if (a <= SilenceLin) silent += 1
      if (a >= ClipLin) clipped += 1
      if (a > peak) peak = a
      sumSq += s.toDouble * s.toDouble
    }
    codec match {
      case Pcm16 =>
        var i = 0
        while (i < n) {
          acc(((bytes(2 * i) & 0xFF) | (bytes(2 * i + 1) << 8)).toShort.toInt)
          i += 1
        }
      case Ulaw =>
        val t = UlawLin
        var i = 0
        while (i < n) { acc(t(bytes(i) & 0xFF).toInt); i += 1 }
      case Alaw =>
        val t = AlawLin
        var i = 0
        while (i < n) { acc(t(bytes(i) & 0xFF).toInt); i += 1 }
      case other => throw new IllegalArgumentException(s"unknown codec: $other")
    }
    Array(silent.toDouble / n, clipped.toDouble / n,
      peak / 32768.0, math.sqrt(sumSq / n) / 32768.0)
  }

  /** Signal-to-noise ratio in dB of `decoded` against reference `signal`. */
  def snrDb(signal: Array[Float], decoded: Array[Float]): Double = {
    require(signal.length == decoded.length,
      s"length mismatch: ${signal.length} vs ${decoded.length}")
    var sig = 0.0; var err = 0.0; var i = 0
    while (i < signal.length) {
      val s = signal(i).toDouble
      val e = s - decoded(i)
      sig += s * s; err += e * e; i += 1
    }
    if (err == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(sig / err)
  }
}

/** Deterministic PCM synthesis, seeded per clip — the fixture side.
  * Two-tone sine + linear chirp, amplitude bounded well inside [-1, 1].
  */
object AudioSynth {

  /** splitmix64 — stable 64-bit mixer (public algorithm, Steele et al.). */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit string hash — stable across JVMs (unlike String.hashCode
    * it is ours to keep fixed). */
  def hash64(s: String): Long = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i).toLong; h *= 0x100000001B3L; i += 1 }
    h
  }

  /** Pure sine tone samples: `n` floats of 0.5*sin(2*pi*f*i/sr) with
    * `f = fMilliHz / 1000` (milli-Hz so band-center frequencies like
    * 2756.25 Hz stay exact integers end-to-end — the c10 oracle states
    * them in integer SQL arithmetic).
    *
    * sin advances by a PHASOR RECURRENCE (one 2x2 rotation per sample)
    * with an exact Math.sin/cos resync every 1024 samples: per-call trig
    * pays large-angle argument reduction (~25-80 ns/sample) and was the
    * dominant cost of the c10 synthesis+filterbank query; the rotation is
    * ~4 mul+2 add. Drift between resyncs is <= 1024 rotations of ~1-ulp
    * error (~1e-13 absolute in double) — five orders of magnitude below
    * the float cast's own 6e-8 quantum, so the emitted float samples are
    * equal to the direct-trig samples except for a ~1e-6 fraction that
    * can move by one float ulp (far inside every downstream margin:
    * int16 quantization is 3e-5, the c10 band-argmax margin ~1e5). */
  def toneSamples(srHz: Int, fMilliHz: Long, n: Int): Array[Float] = {
    require(srHz > 0 && n >= 0, s"bad tone params sr=$srHz n=$n")
    val w = 2.0 * math.Pi * (fMilliHz / 1000.0) / srHz
    val cw = math.cos(w); val sw = math.sin(w)
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      // exact anchor for this 1024-sample block
      var s = math.sin(w * i); var c = math.cos(w * i)
      val end = math.min(n, i + 1024)
      while (i < end) {
        out(i) = (0.5 * s).toFloat
        val nc = c * cw - s * sw; s = s * cw + c * sw; c = nc
        i += 1
      }
    }
    out
  }

  /** Pure sine tone, pcm16-encoded (see [[toneSamples]]). Shares NO code
    * with the Goertzel filterbank it is used to verify. */
  def tone(srHz: Int, fMilliHz: Long, n: Int): Array[Byte] =
    AudioCodec.encode(toneSamples(srHz, fMilliHz, n), AudioCodec.Pcm16)

  /** Synthesize `n` samples at `srHz`, deterministically from `seed`. */
  def synth(seed: Long, srHz: Int, n: Int): Array[Float] = {
    val h1 = mix64(seed)
    val h2 = mix64(h1)
    val f1 = 150.0 + java.lang.Long.remainderUnsigned(h1, 1200L)         // 150-1349 Hz
    val f2 = 250.0 + java.lang.Long.remainderUnsigned(h2, 2200L)         // 250-2449 Hz
    val chirpRate = 20.0 + java.lang.Long.remainderUnsigned(mix64(h2), 300L)
    val w1 = 2.0 * math.Pi * f1 / srHz
    val w2 = 2.0 * math.Pi * f2 / srHz
    val out = new Array[Float](n)
    var i = 0
    while (i < n) {
      val t = i.toDouble / srHz
      val chirp = math.sin(2.0 * math.Pi * (100.0 + 0.5 * chirpRate * t) * t)
      out(i) = (0.40 * math.sin(w1 * i) + 0.30 * math.sin(w2 * i) + 0.18 * chirp).toFloat
      i += 1
    }
    out
  }
}
