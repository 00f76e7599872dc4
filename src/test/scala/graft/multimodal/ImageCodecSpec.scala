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

  test("bmpBytes round-trips pixel-exact through javax.imageio") {
    val bytes = ImageCodec.bmpBytes(9, 8, (x, y) => (x * 7 + y * 13) % 256)
    // header parse agrees with the pixel decoder
    assert(ImageCodec.parse(bytes).contains(ImageCodec.ImageMeta("bmp", 9, 8, 3)))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == 9 && img.getHeight == 8)
    for (y <- 0 until 8; x <- 0 until 9) {
      val rgb = img.getRGB(x, y)
      val g = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3
      assert(g == (x * 7 + y * 13) % 256, s"pixel ($x,$y)")
    }
    // odd width exercises the 4-byte row padding
    val odd = ImageCodec.bmpBytes(5, 3, (x, y) => x + y)
    val oi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(odd))
    assert(oi != null && oi.getWidth == 5 && oi.getHeight == 3)
    assert((oi.getRGB(4, 2) & 0xff) == 6)
  }

  test("imageDHash: identity, sensitivity, resize tolerance, garbage -> None") {
    def pat(x: Int, y: Int) = ((x * 2654435761L + y * 1013904223L) % 256).toInt
    val a = ImageCodec.bmpBytes(9, 8, pat)
    val b = ImageCodec.bmpBytes(9, 8, pat) // identical pixels
    val c = ImageCodec.bmpBytes(9, 8, (x, y) => pat(8 - x, y)) // mirrored
    val ha = Multimodal.imageDHash(a).get
    assert(Multimodal.imageDHash(b).get == ha, "same pixels, same hash")
    assert(java.lang.Long.bitCount(ha ^ Multimodal.imageDHash(c).get) > 8,
      "a structurally different image must be far in Hamming space")
    // the SAME pattern rendered 10x larger hashes close to the small
    // one: the area-average grid is scale-normalizing by construction
    val big = ImageCodec.bmpBytes(90, 80, (x, y) => pat(x / 10, y / 10))
    assert(java.lang.Long.bitCount(ha ^ Multimodal.imageDHash(big).get) <= 3,
      "10x upscale of the same pattern must stay within a few bits")
    assert(Multimodal.imageDHash("not an image".getBytes).isEmpty)
    assert(Multimodal.imageDHash(null).isEmpty)
  }

  test("imageNearDupPairs finds pixel-identical pairs and drops garbage") {
    val spark = graft.TestSpark.spark
    import spark.implicits._
    def img(base: Long) = ImageCodec.bmpBytes(9, 8,
      (x, y) => ((base * 2654435761L + (y * 9 + x) * 1013904223L) % 256).toInt)
    val df = Seq(
      (0L, img(0)), (1L, img(0)),          // identical pair
      (2L, img(2)), (3L, img(3)),          // unrelated
      (4L, "garbage".getBytes),            // undecodable
      (5L, img(5)), (6L, img(5))           // second identical pair
    ).toDF("doc_id", "content")
    val pairs = Multimodal.imageNearDupPairs(df, "doc_id", "content", maxHamming = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)) && pairs.contains((5L, 6L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), "garbage must drop out")
    assert(!pairs.contains((2L, 3L)), "unrelated images must not pair")
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
