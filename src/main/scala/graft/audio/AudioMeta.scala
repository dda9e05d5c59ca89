package graft.audio

/** LIBRARY-FREE metadata extraction for CONTAINERED audio payloads — the
  * audio analog of [[graft.image.ImageMeta]] (i2) and the H.264 SPS walk
  * (v2): a real 100 TB audio column arrives as WAV/FLAC/MP3/Ogg-Opus
  * files, not raw codec bytes, and sample rate / channels / bit depth /
  * length must come out of the BYTES without decoding a sample (and for
  * the compressed formats no decoder exists in this environment at all —
  * the same constraint v2 documents for H.264 pixels).
  *
  * Format coverage, all from the public specifications:
  *  - WAV (RIFF, Microsoft/IBM spec): chunk walk to `fmt ` (format tag,
  *    channels, sample rate, bits) and `data` (payload size). Format tags
  *    1 (PCM), 6 (G.711 A-law), 7 (G.711 mu-law) — exactly this engine's
  *    codec set, so [[wavUnwrap]] can route a WAV payload INTO the
  *    existing decode pipeline (real containered ingest, not metadata
  *    only). Odd chunk sizes carry the RIFF pad byte.
  *  - FLAC (xiph.org spec): `fLaC` signature, then the mandatory-first
  *    STREAMINFO metadata block — sample rate (20 bits), channels-1
  *    (3 bits), bits-per-sample-1 (5 bits), total samples (36 bits).
  *  - MP3 (ISO 11172-3, MPEG-1 Layer III): frame-sync walk — bitrate and
  *    sample-rate indices from the 4-byte frame header, frame length
  *    144*bitrate/sr (+ padding), frames counted to the end of the
  *    payload; n_samples = 1152 * frames. `bits` is reported 0
  *    (compressed audio has no integer sample depth).
  *  - Ogg Opus (RFCs 3533 + 7845): Ogg page walk (27-byte header +
  *    segment table); channels and pre-skip from the OpusHead packet on
  *    the first page, stream length from the LAST page's granule
  *    position minus pre-skip (granules are 48 kHz sample counts).
  *
  * Parsers are null-never-throw on malformed/truncated payloads (a
  * 100 TB corpus WILL contain both) — row-level quality, never a job
  * failure.
  */
object AudioMeta {

  /** Parsed container metadata. `bits` is 0 for compressed formats
    * (mp3/opus); `nSamples` is the per-channel sample count (for opus:
    * in the 48 kHz granule domain per RFC 7845). */
  final case class Meta(format: String, srHz: Int, channels: Int,
                        bits: Int, nSamples: Long)

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xFFL) | ((b(i + 1) & 0xFFL) << 8) |
      ((b(i + 2) & 0xFFL) << 16) | ((b(i + 3) & 0xFFL) << 24)
  private def u64le(b: Array[Byte], i: Int): Long = {
    var v = 0L; var k = 7
    while (k >= 0) { v = (v << 8) | (b(i + k) & 0xFFL); k -= 1 }
    v
  }

  /** Magic-byte sniff; "unknown" when no supported signature matches. */
  def detect(b: Array[Byte]): String = {
    if (b == null || b.length < 12) "unknown"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
             b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else if (b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') "flac"
    else if (b(0) == 'O' && b(1) == 'g' && b(2) == 'g' && b(3) == 'S') "ogg"
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xE0) == 0xE0) "mp3"
    else "unknown"
  }

  def parse(bytes: Array[Byte]): Option[Meta] =
    try {
      detect(bytes) match {
        case "wav" => parseWav(bytes).map { case (m, _, _) => m }
        case "flac" => parseFlac(bytes)
        case "mp3" => parseMp3(bytes)
        case "ogg" => parseOgg(bytes)
        case _ => None
      }
    } catch { case _: RuntimeException => None } // truncated/garbage

  // ------------------------------------------------------------------ WAV

  /** WAV format tag <-> this engine's codec names. */
  private val WavTagToCodec = Map(1 -> AudioCodec.Pcm16,
    6 -> AudioCodec.Alaw, 7 -> AudioCodec.Ulaw)
  private val CodecToWavTag = WavTagToCodec.map(_.swap)

  /** (meta, codec, payload offset+len) — shared by parse and unwrap. */
  private def parseWav(b: Array[Byte]): Option[(Meta, String, (Int, Int))] = {
    var i = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // tag, ch, sr, bits
    var data: Option[(Int, Int)] = None
    while (i + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b, i, 4, "US-ASCII")
      val size = u32le(b, i + 4).toInt
      if (size < 0 || i + 8 + size > b.length) return None
      if (id == "fmt " && size >= 16)
        fmt = Some((u16le(b, i + 8), u16le(b, i + 10),
          u32le(b, i + 12).toInt, u16le(b, i + 22)))
      else if (id == "data") data = Some((i + 8, size))
      i += 8 + size + (size & 1) // RIFF pads odd chunks
    }
    for {
      (tag, ch, sr, bits) <- fmt
      codec <- WavTagToCodec.get(tag)
      (off, len) <- data
      if ch >= 1 && sr > 0 && bits > 0
    } yield (Meta("wav", sr, ch, bits, len.toLong / (ch * (bits / 8))),
      codec, (off, len))
  }

  /** Wrap this engine's raw codec bytes (mono) into a standard WAV file —
    * the write half of containered interchange. */
  def wavWrap(payload: Array[Byte], codec: String, srHz: Int): Array[Byte] = {
    val tag = CodecToWavTag.getOrElse(codec,
      throw new IllegalArgumentException(s"unknown codec: $codec"))
    val bits = if (codec == AudioCodec.Pcm16) 16 else 8
    val blockAlign = bits / 8 // mono
    val out = java.nio.ByteBuffer.allocate(44 + payload.length + (payload.length & 1))
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII"))
    out.putInt(36 + payload.length + (payload.length & 1))
    out.put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
    out.putShort(tag.toShort).putShort(1.toShort).putInt(srHz)
    out.putInt(srHz * blockAlign).putShort(blockAlign.toShort)
    out.putShort(bits.toShort)
    out.put("data".getBytes("US-ASCII")).putInt(payload.length)
    out.put(payload)
    if ((payload.length & 1) == 1) out.put(0.toByte) // RIFF pad
    out.array()
  }

  /** Unwrap a MONO WAV whose format tag maps to this engine's codecs:
    * (codec, sr_hz, raw payload bytes) — ready for decode_pcm/pcm_*.
    * None for non-WAV, multi-channel, or unsupported format tags. */
  def wavUnwrap(bytes: Array[Byte]): Option[(String, Int, Array[Byte])] =
    try {
      parseWav(bytes).collect { case (m, codec, (off, len)) if m.channels == 1 =>
        (codec, m.srHz, java.util.Arrays.copyOfRange(bytes, off, off + len))
      }
    } catch { case _: RuntimeException => None }

  // ----------------------------------------------------------------- FLAC

  private def parseFlac(b: Array[Byte]): Option[Meta] = {
    // first metadata block must be STREAMINFO (type 0, length 34)
    if (b.length < 4 + 4 + 34) return None
    val btype = b(4) & 0x7F
    val len = ((b(5) & 0xFF) << 16) | ((b(6) & 0xFF) << 8) | (b(7) & 0xFF)
    if (btype != 0 || len < 34) return None
    val s = 8 // streaminfo start
    def u(i: Int) = b(s + i) & 0xFF
    val sr = (u(10) << 12) | (u(11) << 4) | (u(12) >> 4)
    val ch = ((u(12) >> 1) & 0x7) + 1
    val bits = (((u(12) & 1) << 4) | (u(13) >> 4)) + 1
    val total = ((u(13) & 0xFL) << 32) | (u(14).toLong << 24) |
      (u(15).toLong << 16) | (u(16).toLong << 8) | u(17).toLong
    if (sr == 0) None else Some(Meta("flac", sr, ch, bits, total))
  }

  // ------------------------------------------------------------------ MP3

  private val Mp3Bitrates = // MPEG-1 Layer III, kbit/s, index 1..14
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000)

  private def parseMp3(b: Array[Byte]): Option[Meta] = {
    var i = 0
    var frames = 0L
    var sr = 0
    var channels = 0
    while (i + 4 <= b.length) {
      val ok = (b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFE) == 0xFA // MPEG-1 L3
      if (!ok) return if (frames > 0) Some(Meta("mp3", sr, channels, 0, 1152L * frames)) else None
      val brIdx = (b(i + 2) & 0xF0) >>> 4
      val srIdx = (b(i + 2) & 0x0C) >>> 2
      val padding = (b(i + 2) & 0x02) >>> 1
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
      sr = Mp3Rates(srIdx)
      channels = if (((b(i + 3) & 0xC0) >>> 6) == 3) 1 else 2
      val frameLen = 144 * Mp3Bitrates(brIdx) * 1000 / sr + padding
      if (i + frameLen > b.length) // truncated trailing frame: stop here
        return if (frames > 0) Some(Meta("mp3", sr, channels, 0, 1152L * frames)) else None
      frames += 1
      i += frameLen
    }
    if (frames > 0) Some(Meta("mp3", sr, channels, 0, 1152L * frames)) else None
  }

  // ------------------------------------------------------------- Ogg Opus

  private def parseOgg(b: Array[Byte]): Option[Meta] = {
    var i = 0
    var first = true
    var channels = 0
    var preskip = 0
    var inputSr = 0
    var lastGranule = -1L
    while (i + 27 <= b.length) {
      if (!(b(i) == 'O' && b(i + 1) == 'g' && b(i + 2) == 'g' && b(i + 3) == 'S'))
        return done(channels, preskip, inputSr, lastGranule)
      val granule = u64le(b, i + 6)
      val nsegs = b(i + 26) & 0xFF
      if (i + 27 + nsegs > b.length) return done(channels, preskip, inputSr, lastGranule)
      var payloadLen = 0
      var k = 0
      while (k < nsegs) { payloadLen += b(i + 27 + k) & 0xFF; k += 1 }
      val payloadOff = i + 27 + nsegs
      if (payloadOff + payloadLen > b.length)
        return done(channels, preskip, inputSr, lastGranule)
      if (first) {
        // OpusHead: magic(8) ver(1) ch(1) preskip(2le) inputSr(4le) ...
        if (payloadLen < 19 ||
            new String(b, payloadOff, 8, "US-ASCII") != "OpusHead") return None
        channels = b(payloadOff + 9) & 0xFF
        preskip = u16le(b, payloadOff + 10)
        inputSr = u32le(b, payloadOff + 12).toInt
        first = false
      }
      if (granule != -1L) lastGranule = granule
      i = payloadOff + payloadLen
    }
    done(channels, preskip, inputSr, lastGranule)
  }

  private def done(ch: Int, preskip: Int, inputSr: Int, lastGranule: Long): Option[Meta] =
    if (ch == 0 || lastGranule < 0) None
    else Some(Meta("ogg", inputSr, ch, 0, math.max(0L, lastGranule - preskip)))

  // ------------------------------------------------------------ row bridge

  def metaRow(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow =
    parse(bytes) match {
      case Some(m) => org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(m.format),
        m.srHz, m.channels, m.bits, m.nSamples)
      case None => null
    }

  def unwrapRow(bytes: Array[Byte]): org.apache.spark.sql.catalyst.InternalRow =
    wavUnwrap(bytes) match {
      case Some((codec, sr, payload)) => org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString(codec), sr, payload)
      case None => null
    }
}
