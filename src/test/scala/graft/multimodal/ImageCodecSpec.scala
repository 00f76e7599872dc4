package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class ImageCodecSpec extends AnyFunSuite {

  import ImageCodec._

  test("PNG round-trip: dims big-endian, channels from color type") {
    assert(parse(pngBytes(640, 480, colorType = 2)).contains(ImageMeta("png", 640, 480, 3)))
    assert(parse(pngBytes(1, 1, colorType = 0)).contains(ImageMeta("png", 1, 1, 1)))
    assert(parse(pngBytes(65537, 3, colorType = 6)).contains(ImageMeta("png", 65537, 3, 4)))
    assert(parse(pngBytes(12, 34, colorType = 4)).contains(ImageMeta("png", 12, 34, 2)))
  }

  test("JPEG round-trip: marker walk skips APP0, reads SOF dims") {
    assert(parse(jpegBytes(1024, 768, components = 3)).contains(ImageMeta("jpeg", 1024, 768, 3)))
    assert(parse(jpegBytes(7, 9, components = 1)).contains(ImageMeta("jpeg", 7, 9, 1)))
    // SOF2 (progressive) parses the same way
    val prog = jpegBytes(33, 44)
    var idx = -1
    for (i <- prog.indices.dropRight(1))
      if ((prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0) idx = i + 1
    prog(idx) = 0xc2.toByte
    assert(parse(prog).contains(ImageMeta("jpeg", 33, 44, 3)))
  }

  test("GIF round-trip: little-endian screen descriptor") {
    assert(parse(gifBytes(320, 200)).contains(ImageMeta("gif", 320, 200, 3)))
    assert(parse(gifBytes(258, 1)).contains(ImageMeta("gif", 258, 1, 3))) // 258 = 0x0102: LE order matters
  }

  test("BMP: BITMAPINFOHEADER dims, abs(height) for top-down, channels from bpp") {
    val bmp = new Array[Byte](54)
    bmp(0) = 'B'; bmp(1) = 'M'
    def le32(i: Int, v: Int): Unit = {
      bmp(i) = (v & 0xff).toByte; bmp(i + 1) = ((v >> 8) & 0xff).toByte
      bmp(i + 2) = ((v >> 16) & 0xff).toByte; bmp(i + 3) = ((v >> 24) & 0xff).toByte
    }
    le32(18, 800); le32(22, -600) // top-down bitmap: negative height
    bmp(28) = 24
    assert(parse(bmp).contains(ImageMeta("bmp", 800, 600, 3)))
    bmp(28) = 8
    assert(parse(bmp).contains(ImageMeta("bmp", 800, 600, 1)))
  }

  test("garbage, truncation, and near-misses parse to None, never throw") {
    assert(parse(null).isEmpty)
    assert(parse(Array.emptyByteArray).isEmpty)
    assert(parse("plain text, definitely not an image".getBytes).isEmpty)
    assert(parse(pngBytes(10, 10).take(12)).isEmpty) // signature but truncated IHDR
    assert(parse(jpegBytes(10, 10).take(4)).isEmpty) // SOI + half a marker
    assert(parse(gifBytes(10, 10).take(7)).isEmpty) // signature, half a width
    val badColor = pngBytes(10, 10); badColor(25) = 9 // undefined color type
    assert(parse(badColor).isEmpty)
    val zeroDim = gifBytes(0, 10)
    assert(parse(zeroDim).isEmpty)
    // JPEG whose marker stream hits start-of-scan with no SOF
    val noSof = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x02).map(_.toByte)
    assert(parse(noSof).isEmpty)
  }

  test("decodeMeta maps a mixed-format frame with nulls for garbage") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    val df = Seq(
      (1L, pngBytes(10, 20, 2)),
      (2L, jpegBytes(30, 40)),
      (3L, gifBytes(50, 60)),
      (4L, "garbage".getBytes)).toDF("doc_id", "content")
    val out = Multimodal.decodeMeta(df, "doc_id", "content")
      .orderBy("id").collect()
    assert(out(0).getString(1) == "png" && out(0).getInt(2) == 10 && out(0).getInt(3) == 20)
    assert(out(1).getString(1) == "jpeg" && out(1).getInt(2) == 30 && out(1).getInt(3) == 40)
    assert(out(2).getString(1) == "gif" && out(2).getInt(2) == 50 && out(2).getInt(3) == 60)
    assert(out(3).isNullAt(1) && out(3).isNullAt(2) && out(3).isNullAt(3) && out(3).isNullAt(4))
  }
}
