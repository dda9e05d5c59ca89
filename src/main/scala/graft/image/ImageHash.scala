package graft.image

/** Perceptual difference-hash (dHash) for CROSS-FORMAT image near-dup —
  * the image analog of the audio tone-pair fingerprint: the same picture
  * re-encoded through another codec (PNG -> JPEG, netpbm -> BMP, quality
  * loss included) maps to the same-or-nearly-same 64-bit signature, while
  * unrelated images land ~32 bits apart (uncorrelated comparisons).
  *
  * Classic public construction: decode -> BT.601 luma -> bilinear resize
  * to 9x8 -> one bit per horizontal neighbor comparison (px < px_right),
  * row-major, 8x8 = 64 bits. Codec loss perturbs resized cells by well
  * under typical neighbor gaps, so only near-tie cells (local gradient
  * ~0) can flip — a handful of bits on structured content (margins
  * measured in ImageHashSpec; the near-dup query's planted fixture keeps
  * an order-of-magnitude gap between twin and organic distances).
  *
  * Decodes via the shared paths: netpbm through [[ImageCodec]],
  * JPEG/PNG/GIF/BMP through [[JdkImageCodec]]. Runs in the scan stage —
  * only (id, 64-bit signature) ever rides the candidate shuffle, never
  * pixels or payload bytes (the c14 discipline). */
object ImageHash {

  /** 64-bit dHash; throws on undecodable payloads (the expression layer
    * maps that to SQL null). */
  def dhash(bytes: Array[Byte]): Long = {
    val img = ImageMeta.detect(bytes) match {
      case "pgm" | "ppm" => ImageCodec.decode(bytes)
      case "unknown" => throw new IllegalArgumentException("unknown image format")
      case _ => JdkImageCodec.decode(bytes).getOrElse(
        throw new IllegalArgumentException("undecodable image payload"))
    }
    dhashOf(img)
  }

  /** dHash of an already-decoded image — shared with the video path
    * (per-frame hashing over y4m luma planes, Y4mCodec.temporalDhash). */
  def dhashOf(img: ImageCodec.Image): Long = {
    val thumb = ImageCodec.resizeBilinear(ImageCodec.toLuma(img), 9, 8)
    var sig = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val left = thumb.pixels(y * 9 + x)
        val right = thumb.pixels(y * 9 + x + 1)
        if (left < right) sig |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    sig
  }

  /** Boxed variant for the Catalyst expression (null = undecodable). */
  def dhashOrNull(bytes: Array[Byte]): java.lang.Long =
    try java.lang.Long.valueOf(dhash(bytes))
    catch { case scala.util.control.NonFatal(_) => null }
}
