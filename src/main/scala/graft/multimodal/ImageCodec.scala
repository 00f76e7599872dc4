package graft.multimodal

/** Header-level image codec: magic-byte format detection and dimension /
  * channel parsing for PNG, JPEG, GIF, and BMP — the genuinely parseable
  * part of a multimodal pipeline's decode stage (full pixel decode needs
  * image libraries this container doesn't ship; a header parse is what a
  * corpus-curation pass needs anyway: validity, format, dims, channels
  * for filtering and bucketing).
  *
  * All parsing is bounds-checked over the raw bytes; anything that
  * doesn't match a known magic or whose header is truncated/corrupt
  * yields None rather than throwing, so a 100-TB scan of crawled media
  * survives garbage payloads.
  *
  * The paired `pngBytes`/`jpegBytes`/`gifBytes` encoders emit minimal
  * spec-conformant headers; they exist so tests and driver-checked
  * queries can construct real binaries whose parse the oracle predicts.
  */
object ImageCodec {

  final case class ImageMeta(format: String, width: Int, height: Int, channels: Int)

  def parse(bytes: Array[Byte]): Option[ImageMeta] = {
    if (bytes == null) None
    else if (isPng(bytes)) parsePng(bytes)
    else if (isJpeg(bytes)) parseJpeg(bytes)
    else if (isGif(bytes)) parseGif(bytes)
    else if (isBmp(bytes)) parseBmp(bytes)
    else None
  }

  // ---- magic bytes ----

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      (b(4) & 0xff) == 0x0d && (b(5) & 0xff) == 0x0a && (b(6) & 0xff) == 0x1a && (b(7) & 0xff) == 0x0a

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 3 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
      (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def isBmp(b: Array[Byte]): Boolean =
    b.length >= 2 && b(0) == 'B' && b(1) == 'M'

  // ---- byte readers ----

  private def be16(b: Array[Byte], i: Int): Int = ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int = ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) | ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le32(b: Array[Byte], i: Int): Int =
    ((b(i + 3) & 0xff) << 24) | ((b(i + 2) & 0xff) << 16) | ((b(i + 1) & 0xff) << 8) | (b(i) & 0xff)

  // ---- per-format header parsing ----

  /** PNG: 8-byte signature, then the IHDR chunk (must be first per spec):
    * 4-byte length, "IHDR", width/height as big-endian int32, bit depth,
    * color type (0 gray, 2 RGB, 3 palette, 4 gray+alpha, 6 RGBA).
    */
  private def parsePng(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 26) return None
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')) return None
    val w = be32(b, 16); val h = be32(b, 20)
    val channels = (b(25) & 0xff) match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => return None
    }
    if (w <= 0 || h <= 0) None else Some(ImageMeta("png", w, h, channels))
  }

  /** JPEG: walk the marker stream from SOI until a start-of-frame marker
    * (C0–CF minus C4 DHT / C8 JPG / CC DAC); its payload is precision,
    * height BE16, width BE16, component count. Markers in between are
    * skipped via their big-endian length field; fill bytes (FF FF …)
    * before a marker are legal and consumed.
    */
  private def parseJpeg(b: Array[Byte]): Option[ImageMeta] = {
    var i = 2
    while (i + 3 < b.length) {
      if ((b(i) & 0xff) != 0xff) return None // marker stream out of sync
      var j = i
      while (j < b.length && (b(j) & 0xff) == 0xff) j += 1 // fill bytes
      if (j >= b.length) return None
      val marker = b(j) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7) || marker == 0x01) {
        i = j + 1 // standalone marker, no length field
      } else if (marker == 0xd9 || marker == 0xda) {
        return None // EOI / start-of-scan before any SOF: no frame header
      } else {
        if (j + 2 >= b.length) return None
        val len = be16(b, j + 1)
        if (len < 2) return None
        val isSof = marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc
        if (isSof) {
          if (j + 8 >= b.length) return None
          val h = be16(b, j + 4); val w = be16(b, j + 6)
          val ncomp = b(j + 8) & 0xff
          return if (w <= 0 || h <= 0 || ncomp == 0) None
                 else Some(ImageMeta("jpeg", w, h, ncomp))
        }
        i = j + 1 + len
      }
    }
    None
  }

  /** GIF: 6-byte signature then the logical screen descriptor — width and
    * height as LITTLE-endian uint16. Pixel data is palette-indexed RGB,
    * reported as 3 channels.
    */
  private def parseGif(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 10) return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0) None else Some(ImageMeta("gif", w, h, 3))
  }

  /** BMP: "BM" file header (14 bytes) then BITMAPINFOHEADER: size,
    * width/height as little-endian int32 (height may be negative for
    * top-down rows), planes, bits-per-pixel.
    */
  private def parseBmp(b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 30) return None
    val w = le32(b, 18); val h = math.abs(le32(b, 22))
    val bpp = le16(b, 28)
    val channels = bpp match {
      case 1 | 4 | 8 => 1
      case 16 | 24 => 3
      case 32 => 4
      case _ => return None
    }
    if (w <= 0 || h <= 0) None else Some(ImageMeta("bmp", w, h, channels))
  }

  // ---- minimal spec-conformant encoders (tests + oracle-checked queries) ----

  /** PNG signature + IHDR chunk. colorType: 0 gray, 2 RGB, 4 gray+alpha, 6 RGBA. */
  def pngBytes(width: Int, height: Int, colorType: Int = 2): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    out.write(Array(0, 0, 0, 13).map(_.toByte)) // IHDR length
    out.write("IHDR".getBytes)
    writeBe32(out, width); writeBe32(out, height)
    out.write(8) // bit depth
    out.write(colorType)
    out.write(0); out.write(0); out.write(0) // compression, filter, interlace
    out.write(Array(0, 0, 0, 0).map(_.toByte)) // CRC (not validated at header level)
    out.toByteArray
  }

  /** SOI, an APP0 the parser must skip, SOF0, EOI. */
  def jpegBytes(width: Int, height: Int, components: Int = 3): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(0xff); out.write(0xd8) // SOI
    out.write(0xff); out.write(0xe0) // APP0
    out.write(0); out.write(7); out.write("JFIF".getBytes); out.write(0)
    out.write(0xff); out.write(0xc0) // SOF0 (baseline)
    writeBe16(out, 8 + 3 * components)
    out.write(8) // precision
    writeBe16(out, height); writeBe16(out, width)
    out.write(components)
    (0 until components).foreach { c => out.write(c + 1); out.write(0x11); out.write(0) }
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** GIF89a signature + logical screen descriptor. */
  def gifBytes(width: Int, height: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes)
    writeLe16(out, width); writeLe16(out, height)
    out.write(0); out.write(0); out.write(0) // packed, bg color, aspect
    out.toByteArray
  }

  /** COMPLETE 24-bit uncompressed BMP with real pixel data — decodable
    * by any BMP reader (including `javax.imageio`), so the pixel-level
    * stages (perceptual hash) exercise a genuine decode, not a stub.
    * `gray(x, y)` in [0,255] is written to all three channels;
    * bottom-up row order and 4-byte row padding per the format.
    */
  def bmpBytes(width: Int, height: Int, gray: (Int, Int) => Int): Array[Byte] = {
    val rowBytes = width * 3
    val pad = (4 - rowBytes % 4) % 4
    val imageSize = (rowBytes + pad) * height
    val fileSize = 14 + 40 + imageSize
    val out = new java.io.ByteArrayOutputStream(fileSize)
    out.write('B'); out.write('M')
    writeLe32(out, fileSize)
    writeLe32(out, 0)        // reserved
    writeLe32(out, 54)       // pixel-data offset
    writeLe32(out, 40)       // BITMAPINFOHEADER size
    writeLe32(out, width)
    writeLe32(out, height)   // positive: bottom-up rows
    writeLe16b(out, 1)       // planes
    writeLe16b(out, 24)      // bits per pixel
    writeLe32(out, 0)        // BI_RGB, uncompressed
    writeLe32(out, imageSize)
    writeLe32(out, 2835); writeLe32(out, 2835) // 72 dpi
    writeLe32(out, 0); writeLe32(out, 0)       // palette
    var y = height - 1
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val g = gray(x, y) & 0xff
        out.write(g); out.write(g); out.write(g) // B G R
        x += 1
      }
      var p = 0
      while (p < pad) { out.write(0); p += 1 }
      y -= 1
    }
    out.toByteArray
  }

  private def writeLe32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
    o.write((v >> 16) & 0xff); o.write((v >> 24) & 0xff)
  }
  private def writeLe16b(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }

  private def writeBe16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }
  private def writeLe16(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write(v & 0xff); o.write((v >> 8) & 0xff)
  }
  private def writeBe32(o: java.io.ByteArrayOutputStream, v: Int): Unit = {
    o.write((v >> 24) & 0xff); o.write((v >> 16) & 0xff); o.write((v >> 8) & 0xff); o.write(v & 0xff)
  }
}
