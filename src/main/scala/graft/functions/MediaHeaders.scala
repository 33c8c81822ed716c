package graft.functions

/** Media container header probing: magic-byte format detection plus
  * the dimension/channel/sample-rate fields a curation pipeline wants
  * before any (expensive, library-bound) full decode:
  *
  *  - PNG:  signature + IHDR width/height/bit-depth/color-type
  *          (PNG spec §5.2, §11.2.2)
  *  - JPEG: SOI, then a marker scan skipping APPn/COM/quant segments
  *          to the first SOFn frame header (ITU T.81 §B.2.2)
  *  - WAV:  RIFF/WAVE `fmt ` chunk channels + sample rate
  *
  * The result packs into one long —
  * `[format:4][width:20][height:20][channels:4][sample_rate:16]` —
  * so the probe is a single codegen'd expression
  * ([[MediaHeaderInfo]]) and the field unpacks stay plain bit ops
  * inside the same whole-stage-codegen span. Truncated or foreign
  * payloads yield format 0 (never a throw): at corpus scale a probe
  * that can die on one corrupt blob is unusable.
  */
object MediaHeaders {
  val FmtUnknown = 0
  val FmtPng = 1
  val FmtJpeg = 2
  val FmtWav = 3

  /** Out-of-range fields SATURATE to the field maximum rather than
    * wrap: a 96 kHz WAV reports 65535 (recognizably "at the cap"),
    * never a confidently-wrong 30464. */
  def pack(fmt: Long, w: Long, h: Long, ch: Long, rate: Long): Long =
    (fmt << 60) | (sat(w, 0xFFFFFL) << 40) | (sat(h, 0xFFFFFL) << 20) |
      (sat(ch, 0xFL) << 16) | sat(rate, 0xFFFFL)

  private def sat(v: Long, max: Long): Long = if (v < 0 || v > max) max else v

  private def u(b: Byte): Int = b & 0xff
  private def be16(bs: Array[Byte], i: Int): Int = (u(bs(i)) << 8) | u(bs(i + 1))
  private def be32(bs: Array[Byte], i: Int): Long =
    (u(bs(i)).toLong << 24) | (u(bs(i + 1)) << 16) | (u(bs(i + 2)) << 8) | u(bs(i + 3))
  private def le16(bs: Array[Byte], i: Int): Int = u(bs(i)) | (u(bs(i + 1)) << 8)
  private def le32(bs: Array[Byte], i: Int): Long =
    u(bs(i)).toLong | (u(bs(i + 1)).toLong << 8) | (u(bs(i + 2)).toLong << 16) |
      (u(bs(i + 3)).toLong << 24)

  /** Single entry point used by the codegen'd expression. */
  def packedInfo(bs: Array[Byte]): Long =
    if (isPng(bs)) png(bs)
    else if (isJpeg(bs)) jpeg(bs)
    else if (isWav(bs)) wav(bs)
    else 0L

  private def isPng(bs: Array[Byte]): Boolean =
    bs.length >= 26 && u(bs(0)) == 0x89 && bs(1) == 'P' && bs(2) == 'N' && bs(3) == 'G' &&
      u(bs(4)) == 0x0d && u(bs(5)) == 0x0a && u(bs(6)) == 0x1a && u(bs(7)) == 0x0a &&
      bs(12) == 'I' && bs(13) == 'H' && bs(14) == 'D' && bs(15) == 'R'

  private def png(bs: Array[Byte]): Long = {
    val w = be32(bs, 16)
    val h = be32(bs, 20)
    // channels from the IHDR color type: 0 gray, 2 rgb, 3 palette,
    // 4 gray+alpha, 6 rgba
    val ch = u(bs(25)) match {
      case 0 | 3 => 1
      case 2 => 3
      case 4 => 2
      case 6 => 4
      case _ => 0
    }
    pack(FmtPng, w, h, ch, 0)
  }

  private def isJpeg(bs: Array[Byte]): Boolean =
    bs.length >= 2 && u(bs(0)) == 0xff && u(bs(1)) == 0xd8

  private def jpeg(bs: Array[Byte]): Long = {
    // scan segment markers to the first SOFn (C0-CF minus C4/C8/CC,
    // which are huffman/arithmetic tables, not frame headers)
    var i = 2
    while (i + 3 < bs.length && u(bs(i)) == 0xff) {
      // ITU T.81 B.1.1.2: any number of 0xFF fill bytes may pad the
      // space before a marker — skip them or a fill byte would be
      // read as a length-prefixed segment and jump past the SOF
      while (i + 3 < bs.length && u(bs(i + 1)) == 0xff) i += 1
      val marker = u(bs(i + 1))
      if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        if (i + 9 >= bs.length) return pack(FmtJpeg, 0, 0, 0, 0)
        val h = be16(bs, i + 5)
        val w = be16(bs, i + 7)
        val ch = u(bs(i + 9))
        return pack(FmtJpeg, w, h, ch, 0)
      } else if (marker == 0xd9 || marker == 0xda) {
        // EOI ends the stream; SOS begins entropy-coded data, where a
        // chance FF Cx byte pair is content, not a marker — either way
        // no SOF frame header precedes it, so stop rather than risk
        // reporting garbage dimensions from payload bytes
        return pack(FmtJpeg, 0, 0, 0, 0)
      } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
        i += 2 // standalone marker, no length field
      } else {
        if (i + 3 >= bs.length) return pack(FmtJpeg, 0, 0, 0, 0)
        i += 2 + be16(bs, i + 2)
      }
    }
    pack(FmtJpeg, 0, 0, 0, 0)
  }

  private def isWav(bs: Array[Byte]): Boolean =
    bs.length >= 28 && bs(0) == 'R' && bs(1) == 'I' && bs(2) == 'F' && bs(3) == 'F' &&
      bs(8) == 'W' && bs(9) == 'A' && bs(10) == 'V' && bs(11) == 'E' &&
      bs(12) == 'f' && bs(13) == 'm' && bs(14) == 't' && bs(15) == ' '

  private def wav(bs: Array[Byte]): Long =
    pack(FmtWav, 0, 0, le16(bs, 22), le32(bs, 24))
}
