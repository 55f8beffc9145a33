package graft.operators

/** JDK-PROVIDED image decode (`javax.imageio` — part of the public
  * Java SE API, present in every JRE including this headless one):
  * the last link in the [[Multimodal.decodePixels]] chain, covering
  * the formats whose decompression genuinely exceeds hand-written
  * byte arithmetic — baseline/progressive JPEG, TIFF, WBMP — plus
  * anything else the running JRE registers. Output is normalized to
  * the same RGB raster ([[PngCodec.Image]], 3 channels) the
  * hand-written codecs produce, so resampling and stats compose
  * identically.
  *
  * Ordering contract: [[PngCodec]] and [[GifCodec]] run FIRST —
  * they are bit-exact, spec-pinned, and JDK-version-independent;
  * ImageIO is the fallback for formats they do not cover. Lossy
  * formats (JPEG) decode deterministically within one JRE but the
  * exact pixels may differ across JDK builds (different libjpeg
  * vintages), so oracle-checked queries pin only the exact-codec
  * paths; ImageIO-decoded media flows through spec-level assertions
  * (dims, bounded pixel error) instead. Cross-validation the other
  * way — our codecs' output read back by ImageIO — is pinned in
  * the codec specs, an independent-implementation check of spec
  * compliance. */
object ImageIoCodec {

  // Executors have no display; force headless before AWT statics load.
  private lazy val headlessSet: Boolean = {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    true
  }

  /** Decode any ImageIO-readable buffer to an RGB raster; None when
    * no registered reader claims the bytes or decoding fails. */
  def decode(bytes: Array[Byte]): Option[PngCodec.Image] = {
    val _ = headlessSet
    try {
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (bi == null) return None
      val w = bi.getWidth; val h = bi.getHeight
      if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26)) return None
      val out = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = bi.getRGB(x, y)
          val k = (y * w + x) * 3
          out(k) = ((rgb >> 16) & 0xff).toByte
          out(k + 1) = ((rgb >> 8) & 0xff).toByte
          out(k + 2) = (rgb & 0xff).toByte
          x += 1
        }
        y += 1
      }
      Some(PngCodec.Image(w, h, 3, out))
    } catch { case _: Exception => None }
  }
}
