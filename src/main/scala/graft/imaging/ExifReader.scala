package graft.imaging

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal JPEG APP1 / TIFF-IFD Exif parser (SURVEY.md §7.4 hard part 1):
  * walks IFD0, merges the Exif sub-IFD into the flat map (like PIL's
  * `_getexif`), and parses the GPS sub-IFD separately. All values are
  * stringified (the reference stringifies every exif value,
  * 02_Data Ingest.py:148): integers as decimal, rationals as "num/den",
  * multi-valued tags as "(v1, v2, ...)", ASCII trimmed of NULs.
  *
  * Derived from the public EXIF 2.3 / TIFF 6.0 specifications only.
  */
object ExifReader {

  final case class Exif(tags: Map[String, String], gps: Map[String, String])
  val empty: Exif = Exif(Map.empty, Map.empty)

  /** Extract Exif from whole-JPEG bytes; empty result if no/invalid APP1. */
  def read(jpeg: Array[Byte]): Exif = {
    try {
      findApp1(jpeg) match {
        case Some(tiff) => parseTiff(tiff)
        case None       => empty
      }
    } catch { case _: Exception => empty }
  }

  /** Locate the APP1 "Exif\0\0" segment via the shared JFIF segment
    * walker (ImageOps.findSegment); returns the TIFF payload.
    */
  private def findApp1(b: Array[Byte]): Option[Array[Byte]] =
    ImageOps.findSegment[Array[Byte]](b) { (marker, off, payloadLen) =>
      if (marker == 0xE1 && off + 6 <= b.length &&
          b(off) == 'E' && b(off + 1) == 'x' && b(off + 2) == 'i' &&
          b(off + 3) == 'f' && b(off + 4) == 0 && b(off + 5) == 0) {
        val start = off + 6
        val end = math.max(start, math.min(off + payloadLen, b.length))
        Some(java.util.Arrays.copyOfRange(b, start, end))
      } else None
    }

  private def parseTiff(t: Array[Byte]): Exif = {
    if (t.length < 8) return empty
    val order =
      if (t(0) == 'I' && t(1) == 'I') ByteOrder.LITTLE_ENDIAN
      else if (t(0) == 'M' && t(1) == 'M') ByteOrder.BIG_ENDIAN
      else return empty
    val bb = ByteBuffer.wrap(t).order(order)
    if (bb.getShort(2) != 42) return empty
    val ifd0 = bb.getInt(4)

    val raw = scala.collection.mutable.Map[Int, String]()
    var gps = Map.empty[String, String]

    // tag ids are collected raw here; friendly naming happens once after
    // the walk via the ExifTags maps
    def walk(offset: Int,
        into: scala.collection.mutable.Map[Int, String], depth: Int): Unit = {
      if (depth > 3 || offset < 0 || offset + 2 > t.length) return
      val n = bb.getShort(offset) & 0xFFFF
      var e = 0
      while (e < n) {
        val base = offset + 2 + 12 * e
        if (base + 12 <= t.length) {
          val tag = bb.getShort(base) & 0xFFFF
          val typ = bb.getShort(base + 2) & 0xFFFF
          val cnt = bb.getInt(base + 4)
          if (tag == ExifTags.ExifIfdPointer) {
            walk(bb.getInt(base + 8), into, depth + 1)
          } else if (tag == ExifTags.GpsInfoPointer) {
            val g = scala.collection.mutable.Map[Int, String]()
            walk(bb.getInt(base + 8), g, depth + 1)
            gps = g.flatMap { case (id, v) => ExifTags.gpsName.get(id).map(_ -> v) }.toMap
          } else {
            decodeValue(bb, t, base, typ, cnt).foreach(v => into(tag) = v)
          }
        }
        e += 1
      }
    }

    walk(ifd0, raw, 0)
    val named = raw.flatMap { case (id, v) => ExifTags.tagName.get(id).map(_ -> v) }.toMap
    Exif(named, gps)
  }

  private val typeSize = Map(1 -> 1, 2 -> 1, 3 -> 2, 4 -> 4, 5 -> 8, 7 -> 1, 9 -> 4, 10 -> 8)

  private def decodeValue(bb: ByteBuffer, t: Array[Byte], entryBase: Int,
      typ: Int, cnt: Int): Option[String] = {
    val sz = typeSize.getOrElse(typ, return None)
    val total = sz.toLong * cnt
    if (cnt <= 0 || total > 65536) return None
    val valueOff = if (total <= 4) entryBase + 8 else bb.getInt(entryBase + 8)
    if (valueOff < 0 || valueOff + total > t.length) return None

    typ match {
      case 2 => // ASCII, NUL-terminated
        val raw = new String(t, valueOff, cnt, java.nio.charset.StandardCharsets.US_ASCII)
        Some(raw.takeWhile(_ != '\u0000'))
      case 7 => // UNDEFINED: raw bytes as latin-1 string (PIL keeps bytes)
        Some(new String(t, valueOff, cnt, java.nio.charset.StandardCharsets.ISO_8859_1))
      case _ =>
        val vals = (0 until cnt).map { i =>
          val o = valueOff + i * sz
          typ match {
            case 1  => (t(o) & 0xFF).toString
            case 3  => (bb.getShort(o) & 0xFFFF).toString
            case 4  => (bb.getInt(o).toLong & 0xFFFFFFFFL).toString
            case 9  => bb.getInt(o).toString
            case 5  =>
              val num = bb.getInt(o).toLong & 0xFFFFFFFFL
              val den = bb.getInt(o + 4).toLong & 0xFFFFFFFFL
              s"$num/$den"
            case 10 => s"${bb.getInt(o)}/${bb.getInt(o + 4)}"
            case _  => return None
          }
        }
        Some(if (cnt == 1) vals.head else vals.mkString("(", ", ", ")"))
    }
  }
}
