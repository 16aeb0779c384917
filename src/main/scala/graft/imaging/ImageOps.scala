package graft.imaging

import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

/** JPEG decode + per-band statistics replicating PIL semantics
  * (02_Data Ingest.py:137-185 metadata, 02:223-249 statistics):
  * all stats derive from the 256-bin-per-band histogram exactly as PIL's
  * ImageStat does — mean = sum/count, median = first bin where
  * cumsum > count//2, stddev = sqrt((sum2 - sum^2/count)/count)
  * (population), extrema = (lowest, highest) occupied bin, entropy =
  * -sum p*log2(p) over the normalized joint histogram of all bands.
  */
object ImageOps {

  // the payloads are already in memory — the default disk-backed
  // FileCacheImageInputStream would create/write/delete a temp file per
  // decode in the UDF hot path
  ImageIO.setUseCache(false)

  final case class Meta(
      height: Int, width: Int, dpi: Option[(Int, Int)], layers: Int,
      mode: String, format: String)

  final case class Stats(
      mean: Array[Double], median: Array[Int], stddev: Array[Double],
      extrema: Array[Array[Int]], entropy: Double, histogram: Array[Int])

  def decode(bytes: Array[Byte]): Option[BufferedImage] =
    try Option(ImageIO.read(new ByteArrayInputStream(bytes)))
    catch { case _: Exception => None }

  /** PIL-style mode string from band count. */
  def modeOfBands(bands: Int): String = bands match {
    case 1 => "L"
    case 3 => "RGB"
    case 4 => "CMYK"
    case n => s"BANDS$n"
  }

  def modeOf(img: BufferedImage): String = modeOfBands(img.getRaster.getNumBands)

  /** Header-only metadata: dimensions and band count come from the
    * ImageReader without decoding pixels (PIL's open() reads only the
    * header the same way — and U2 pays the full pixel decode anyway in
    * the same enrich projection, so decoding here would double it).
    */
  def metadata(bytes: Array[Byte]): Option[Meta] = {
    try {
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val w = r.getWidth(0); val h = r.getHeight(0)
            val it = r.getImageTypes(0)
            val bands = if (it.hasNext) it.next().getNumComponents else 3
            Some(Meta(h, w, jfifDpi(bytes), bands, modeOfBands(bands), "JPEG"))
          } finally r.dispose()
        }
      } finally iis.close()
    } catch { case _: Exception => None }
  }

  /** One JFIF marker-segment walker shared by the APP0 (DPI) and APP1
    * (Exif) lookups: `f` sees (marker, payloadOffset, payloadLen) for
    * every non-standalone segment, and the walk stops at the first
    * Some, at start-of-scan (0xDA), or at buffer end.
    */
  private[imaging] def findSegment[T](b: Array[Byte])(
      f: (Int, Int, Int) => Option[T]): Option[T] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    var i = 2
    while (i + 4 <= b.length && (b(i) & 0xFF) == 0xFF) {
      val marker = b(i + 1) & 0xFF
      if (marker >= 0xD0 && marker <= 0xD9) { i += 2 }
      else {
        val len = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        val res = f(marker, i + 4, len - 2)
        if (res.isDefined) return res
        if (marker == 0xDA) return None
        i += 2 + len
      }
    }
    None
  }

  /** DPI from the JFIF APP0 density fields when the unit is dots-per-inch
    * (unit byte == 1) — PIL surfaces `info["dpi"]` under the same
    * condition only.
    */
  def jfifDpi(b: Array[Byte]): Option[(Int, Int)] =
    findSegment[Option[(Int, Int)]](b) { (marker, off, _) =>
      if (marker == 0xE0 && off + 12 <= b.length &&
          b(off) == 'J' && b(off + 1) == 'F' && b(off + 2) == 'I' &&
          b(off + 3) == 'F' && b(off + 4) == 0) {
        val units = b(off + 7) & 0xFF
        val xd = ((b(off + 8) & 0xFF) << 8) | (b(off + 9) & 0xFF)
        val yd = ((b(off + 10) & 0xFF) << 8) | (b(off + 11) & 0xFF)
        Some(if (units == 1) Some((xd, yd)) else None)
      } else None
    }.flatten

  /** Single-pass histogram accumulation; all other stats derived from it
    * (the PIL ImageStat formulas above).
    */
  def statistics(bytes: Array[Byte]): Option[Stats] =
    decode(bytes).map { img =>
      val raster = img.getRaster
      val bands  = raster.getNumBands
      val w      = img.getWidth
      val h      = img.getHeight
      val hist   = new Array[Int](256 * bands)
      // row-batched getSamples: one JNI-free bulk read per band per row
      val rowBuf = new Array[Int](w)
      var b = 0
      while (b < bands) {
        var y = 0
        while (y < h) {
          raster.getSamples(0, y, w, 1, b, rowBuf)
          var x = 0
          while (x < w) {
            hist(b * 256 + rowBuf(x)) += 1
            x += 1
          }
          y += 1
        }
        b += 1
      }

      val count = w.toLong * h
      val mean    = new Array[Double](bands)
      val median  = new Array[Int](bands)
      val stddev  = new Array[Double](bands)
      val extrema = new Array[Array[Int]](bands)
      b = 0
      while (b < bands) {
        var sum = 0L; var sum2 = 0L
        var lo = -1; var hi = -1
        var j = 0
        while (j < 256) {
          val c = hist(b * 256 + j)
          if (c > 0) {
            sum += j.toLong * c
            sum2 += j.toLong * j * c
            if (lo < 0) lo = j
            hi = j
          }
          j += 1
        }
        mean(b) = sum.toDouble / count
        // PIL _getmedian: first bin where running sum exceeds count//2
        val half = count / 2
        var s = 0L; var m = 0
        var k = 0
        var done = false
        while (k < 256 && !done) {
          s += hist(b * 256 + k)
          if (s > half) { m = k; done = true }
          k += 1
        }
        median(b) = m
        val variance = (sum2.toDouble - sum.toDouble * sum / count) / count
        stddev(b) = math.sqrt(math.max(variance, 0.0))
        extrema(b) = Array(math.max(lo, 0), math.max(hi, 0))
        b += 1
      }

      // PIL Image.entropy(): joint normalized histogram over all bands
      val total = count.toDouble * bands
      var entropy = 0.0
      var i = 0
      while (i < hist.length) {
        if (hist(i) > 0) {
          val p = hist(i) / total
          entropy -= p * (math.log(p) / math.log(2.0))
        }
        i += 1
      }

      Stats(mean, median, stddev, extrema, entropy, hist)
    }
}
