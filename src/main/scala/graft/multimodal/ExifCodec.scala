package graft.multimodal

/** Pure-byte EXIF reader: walks the JPEG marker stream to the APP1
  * `Exif\0\0` segment and parses its embedded TIFF IFD0 — both byte
  * orders (`II`/`MM`), inline and offset ASCII values — with no imaging
  * library. Same posture as [[VideoCodec]]'s MP4 box walk: a projection
  * over bytes, partition-parallel, nothing global. Reference intent:
  * typed field extraction from opaque payloads (orientdb-etl
  * OCSVTransformer.java:96-140's typed-cell contract applied to media
  * bytes).
  *
  * Extracted IFD0 tags: 0x010F Make, 0x0110 Model (ASCII, NUL
  * stripped), 0x0112 Orientation (SHORT). Absent tags → null columns.
  */
object ExifCodec {

  final case class ExifMeta(media_id: Long, orientation: Option[Int],
                            exif_make: Option[String],
                            exif_model: Option[String])

  /** Parse the EXIF APP1 of a JPEG payload; None when the payload is
    * not a JPEG or carries no EXIF segment. Malformed TIFF internals
    * fail LOUD naming the row — silent nulls would look like "no EXIF"
    * on data that HAS metadata. */
  def parse(id: Long, payload: Array[Byte]): Option[ExifMeta] = {
    if (payload == null || payload.length < 4 ||
        (payload(0) & 0xFF) != 0xFF || (payload(1) & 0xFF) != 0xD8)
      return None // not a JPEG
    var pos = 2
    while (pos + 4 <= payload.length) {
      if ((payload(pos) & 0xFF) != 0xFF) return None // marker stream lost
      val marker = payload(pos + 1) & 0xFF
      if (marker == 0xD8 || (marker >= 0xD0 && marker <= 0xD9)) { pos += 2 }
      else if (marker == 0xDA) return None // SOS: entropy data, no EXIF seen
      else {
        val len = ((payload(pos + 2) & 0xFF) << 8) | (payload(pos + 3) & 0xFF)
        if (len < 2 || pos + 2 + len > payload.length)
          sys.error(s"mm_exif: media_id=$id: segment length $len overruns payload")
        if (marker == 0xE1 && len >= 8 &&
            payload(pos + 4) == 'E' && payload(pos + 5) == 'x' &&
            payload(pos + 6) == 'i' && payload(pos + 7) == 'f' &&
            payload(pos + 8) == 0 && payload(pos + 9) == 0)
          return Some(parseTiff(id, payload, pos + 10, len - 8))
        pos += 2 + len
      }
    }
    None
  }

  private def parseTiff(id: Long, b: Array[Byte], tiffStart: Int,
                        tiffLen: Int): ExifMeta = {
    def fail(msg: String): Nothing =
      sys.error(s"mm_exif: media_id=$id: $msg")
    if (tiffLen < 8) fail(s"TIFF block too short ($tiffLen bytes)")
    val little = (b(tiffStart), b(tiffStart + 1)) match {
      case ('I', 'I') => true
      case ('M', 'M') => false
      case _ => fail("bad TIFF byte-order mark")
    }
    def u16(off: Int): Int = {
      val p = tiffStart + off
      if (p + 2 > b.length) fail(s"u16 read past payload at tiff+$off")
      if (little) (b(p) & 0xFF) | ((b(p + 1) & 0xFF) << 8)
      else ((b(p) & 0xFF) << 8) | (b(p + 1) & 0xFF)
    }
    def u32(off: Int): Long = {
      if (little) u16(off).toLong | (u16(off + 2).toLong << 16)
      else (u16(off).toLong << 16) | u16(off + 2).toLong
    }
    if (u16(2) != 42) fail("bad TIFF magic")
    val ifd0 = u32(4).toInt
    val n = u16(ifd0)
    var orientation: Option[Int] = None
    var make: Option[String] = None
    var model: Option[String] = None
    def ascii(count: Long, valueFieldRel: Int): String = {
      // count includes the terminating NUL; values > 4 bytes live at a
      // tiff-relative offset, <= 4 inline in the value field itself
      val rel = if (count <= 4) valueFieldRel else u32(valueFieldRel).toInt
      val at = tiffStart + rel
      if (at + count > b.length) fail("ASCII value overruns payload")
      new String(b, at, count.toInt, "US-ASCII").takeWhile(_ != '\u0000')
    }
    for (i <- 0 until n) {
      val e = ifd0 + 2 + i * 12
      val tag = u16(e)
      val typ = u16(e + 2)
      val count = u32(e + 4)
      tag match {
        case 0x010F if typ == 2 =>
          make = Some(ascii(count, e + 8))
        case 0x0110 if typ == 2 =>
          model = Some(ascii(count, e + 8))
        case 0x0112 if typ == 3 && count == 1 =>
          orientation = Some(u16(e + 8))
        case _ => () // unknown tags skipped, per TIFF reader contract
      }
    }
    ExifMeta(id, orientation, make, model)
  }
}
