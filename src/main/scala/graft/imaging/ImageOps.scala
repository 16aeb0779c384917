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
  def modeOf(img: BufferedImage): String = img.getRaster.getNumBands match {
    case 1 => "L"
    case 3 => "RGB"
    case 4 => "CMYK"
    case n => s"BANDS$n"
  }

  def metadata(bytes: Array[Byte]): Option[Meta] =
    decode(bytes).map { img =>
      Meta(
        height = img.getHeight,
        width = img.getWidth,
        dpi = jfifDpi(bytes),
        layers = img.getRaster.getNumBands,
        mode = modeOf(img),
        format = "JPEG")
    }

  /** DPI from the JFIF APP0 density fields when the unit is dots-per-inch
    * (unit byte == 1) — PIL surfaces `info["dpi"]` under the same
    * condition only.
    */
  def jfifDpi(b: Array[Byte]): Option[(Int, Int)] = {
    if (b.length < 4 || (b(0) & 0xFF) != 0xFF || (b(1) & 0xFF) != 0xD8) return None
    var i = 2
    while (i + 4 <= b.length && (b(i) & 0xFF) == 0xFF) {
      val marker = b(i + 1) & 0xFF
      if (marker >= 0xD0 && marker <= 0xD9) { i += 2 }
      else {
        val len = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
        if (marker == 0xE0 && i + 4 + 14 <= b.length &&
            b(i + 4) == 'J' && b(i + 5) == 'F' && b(i + 6) == 'I' &&
            b(i + 7) == 'F' && b(i + 8) == 0) {
          val units = b(i + 11) & 0xFF
          val xd = ((b(i + 12) & 0xFF) << 8) | (b(i + 13) & 0xFF)
          val yd = ((b(i + 14) & 0xFF) << 8) | (b(i + 15) & 0xFF)
          return if (units == 1) Some((xd, yd)) else None
        }
        if (marker == 0xDA) return None
        i += 2 + len
      }
    }
    None
  }

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
