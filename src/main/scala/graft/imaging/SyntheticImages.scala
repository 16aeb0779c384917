package graft.imaging

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import javax.imageio.ImageIO

/** Deterministic synthetic JPEG fixtures (FIXTURES.md A.5): solid-color,
  * two-tone and gradient images with closed-form statistics, plus a
  * hand-built EXIF APP1 segment splicer for ExifReader tests. The real
  * reference corpus (S3 JPEGs) is unavailable offline; these exercise the
  * identical code paths.
  */
object SyntheticImages {

  def solid(w: Int, h: Int, r: Int, g: Int, b: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val gfx = img.createGraphics()
    gfx.setColor(new java.awt.Color(r, g, b))
    gfx.fillRect(0, 0, w, h)
    gfx.dispose()
    encode(img)
  }

  /** Left half one color, right half another. */
  def twoTone(w: Int, h: Int, c1: (Int, Int, Int), c2: (Int, Int, Int)): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val gfx = img.createGraphics()
    gfx.setColor(new java.awt.Color(c1._1, c1._2, c1._3))
    gfx.fillRect(0, 0, w / 2, h)
    gfx.setColor(new java.awt.Color(c2._1, c2._2, c2._3))
    gfx.fillRect(w / 2, 0, w - w / 2, h)
    gfx.dispose()
    encode(img)
  }

  /** Horizontal gray gradient 0..255. */
  def gradient(w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      val v = (x * 255) / math.max(w - 1, 1)
      val rgb = (v << 16) | (v << 8) | v
      var y = 0
      while (y < h) { img.setRGB(x, y, rgb); y += 1 }
      x += 1
    }
    encode(img)
  }

  def encode(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "jpg", bos)
    bos.toByteArray
  }

  /** Splice a hand-built EXIF APP1 segment right after SOI. */
  def withExif(jpeg: Array[Byte], tags: Seq[(Int, String)],
      gps: Seq[(Int, String)] = Nil): Array[Byte] = {
    val app1 = buildApp1(tags, gps)
    val out = new Array[Byte](jpeg.length + app1.length)
    out(0) = jpeg(0); out(1) = jpeg(1) // SOI
    System.arraycopy(app1, 0, out, 2, app1.length)
    System.arraycopy(jpeg, 2, out, 2 + app1.length, jpeg.length - 2)
    out
  }

  /** Minimal little-endian TIFF with IFD0 ASCII tags and an optional GPS
    * sub-IFD of ASCII tags, wrapped in an APP1 marker. Every ASCII value
    * is NUL-terminated and padded to more than 4 bytes so it is always
    * stored in the data area (no inline-value encoding needed).
    */
  private def buildApp1(tags: Seq[(Int, String)], gps: Seq[(Int, String)]): Array[Byte] = {
    val hasGps = gps.nonEmpty
    val n0 = tags.length + (if (hasGps) 1 else 0)
    // layout: header(8) | ifd0 | [gps ifd] | string data
    val ifd0Off  = 8
    val ifd0Size = 2 + n0 * 12 + 4
    val gpsOff   = ifd0Off + ifd0Size
    val gpsSize  = if (hasGps) 2 + gps.length * 12 + 4 else 0

    def pad(s: String): Array[Byte] = {
      val raw = s.getBytes("US-ASCII") :+ 0.toByte
      if (raw.length > 4) raw else java.util.Arrays.copyOf(raw, 5)
    }

    var dataOff = gpsOff + gpsSize
    val data = new ByteArrayOutputStream()
    def store(s: String): (Int, Int) = { // (count, offset)
      val bytes = pad(s)
      val off = dataOff
      data.write(bytes)
      dataOff += bytes.length
      (bytes.length, off)
    }

    val entries0   = tags.map { case (tag, v) => (tag, store(v)) }
    val gpsEntries = gps.map { case (tag, v) => (tag, store(v)) }

    val tiff = ByteBuffer.allocate(dataOff).order(ByteOrder.LITTLE_ENDIAN)
    tiff.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifd0Off)
    tiff.putShort(n0.toShort)
    val sorted0 = (entries0 ++
      (if (hasGps) Seq((ExifTags.GpsInfoPointer, (-1, gpsOff))) else Nil))
      .sortBy(_._1)
    sorted0.foreach { case (tag, (cnt, off)) =>
      if (cnt == -1) // GPS pointer: type LONG, count 1, value = sub-IFD offset
        tiff.putShort(tag.toShort).putShort(4).putInt(1).putInt(off)
      else           // ASCII at offset
        tiff.putShort(tag.toShort).putShort(2).putInt(cnt).putInt(off)
    }
    tiff.putInt(0) // next-IFD terminator
    if (hasGps) {
      tiff.putShort(gps.length.toShort)
      gpsEntries.sortBy(_._1).foreach { case (tag, (cnt, off)) =>
        tiff.putShort(tag.toShort).putShort(2).putInt(cnt).putInt(off)
      }
      tiff.putInt(0)
    }
    tiff.put(data.toByteArray)

    val payload = Array[Byte]('E', 'x', 'i', 'f', 0, 0) ++
      java.util.Arrays.copyOf(tiff.array(), tiff.position())
    val len = payload.length + 2
    ByteBuffer.allocate(4 + payload.length)
      .put(0xFF.toByte).put(0xE1.toByte)
      .put(((len >> 8) & 0xFF).toByte).put((len & 0xFF).toByte)
      .put(payload)
      .array()
  }
}
