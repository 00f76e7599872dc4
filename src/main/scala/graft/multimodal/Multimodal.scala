package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column plus typed metadata; decode / feature-extract
  * run as partition-batched functions over the binary payloads (in a
  * PySpark deployment these are Pandas UDFs via mapInPandas; here the
  * same batch shape is a Scala mapPartitions).
  *
  * `decodeMeta` is a REAL header decode: magic-byte format detection and
  * dimension/channel parsing for PNG/JPEG/GIF/BMP via [[ImageCodec]];
  * unrecognized or corrupt payloads yield null metadata rather than
  * failing the scan. `extractFeatures` remains a deterministic stand-in
  * for model inference (a vision/audio model is not shippable here);
  * its contract — binary in, fixed-dim float vector out, batched — is
  * the real one.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true)))

  /** Deterministic stand-in for a model feature extractor (real
    * implementation would run a vision/audio model over decoded frames).
    * Produces a fixed-dim float vector from per-byte hashes. The
    * accumulation is integer and position-based (order-independent), so
    * the SQL correctness oracle can replay it exactly; the final floats
    * are exact (sums stay far below 2^24).
    */
  private def fakeFeatures(bytes: Array[Byte], dim: Int): Array[Float] = {
    val acc = new Array[Long](dim)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      acc(i % dim) += (b.toLong * 2654435761L + i.toLong * 1013904223L) % 1000L
      i += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) { out(j) = acc(j).toFloat / 1000.0f; j += 1 }
    out
  }

  /** Decode header metadata for a binary `content` column: mapPartitions
    * keeps the per-batch amortization a real decoder needs (load codec
    * once per partition, stream rows through it). Unparseable payloads
    * produce null metadata, not a task failure.
    */
  def decodeMeta(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val outSchema = StructType(
      StructField("id", LongType, nullable = false) +: metaSchema.fields)
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      // per-partition setup happens here (real codec: open once)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        ImageCodec.parse(bytes) match {
          case Some(m) => Row(r.getLong(idIdx), m.format, m.width, m.height, m.channels)
          case None => Row(r.getLong(idIdx), null, null, null, null)
        }
      }
    }(enc)
  }

  /** 64-bit difference hash (dHash) of an image payload — the standard
    * perceptual fingerprint for image near-dup in a crawl-curation
    * pipeline: decode pixels (a REAL decode via `javax.imageio` — PNG /
    * JPEG / GIF / BMP, whatever the JDK readers handle), deterministic
    * area-average downsample to a 9×8 luminance grid, then one bit per
    * adjacent-column comparison (bit y·8+x = gray(x+1,y) > gray(x,y)).
    * Near-identical images (recompress, small edits, resize) land within
    * a few bits; unrelated images differ in ~32. Undecodable payloads
    * hash to null. Luminance is the integer mean (r+g+b)/3 and the
    * downsample is exact integer math over pixel-block sums, so two
    * engines decoding the same pixels agree bit-for-bit.
    */
  def imageDHash(bytes: Array[Byte]): Option[Long] = {
    if (bytes == null) return None
    val img =
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case scala.util.control.NonFatal(_) => None }
    img.filter(i => i.getWidth > 0 && i.getHeight > 0).map { i =>
      val w = i.getWidth; val h = i.getHeight
      val gw = 9; val gh = 8
      val grid = Array.ofDim[Long](gw, gh)
      var ty = 0
      while (ty < gh) {
        val y0 = ty * h / gh; val y1 = math.max((ty + 1) * h / gh, y0 + 1)
        var tx = 0
        while (tx < gw) {
          val x0 = tx * w / gw; val x1 = math.max((tx + 1) * w / gw, x0 + 1)
          var sum = 0L; var n = 0L
          var y = y0
          while (y < math.min(y1, h)) {
            var x = x0
            while (x < math.min(x1, w)) {
              val rgb = i.getRGB(x, y)
              sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
              n += 1
              x += 1
            }
            y += 1
          }
          grid(tx)(ty) = if (n == 0) 0L else sum / (3L * n)
          tx += 1
        }
        ty += 1
      }
      var hash = 0L
      var y = 0
      while (y < gh) {
        var x = 0
        while (x < 8) {
          if (grid(x + 1)(y) > grid(x)(y)) hash |= 1L << (y * 8 + x)
          x += 1
        }
        y += 1
      }
      hash
    }
  }

  /** (id, dhash) for a binary image column — partition-batched like
    * [[decodeMeta]] (a real decoder amortizes per partition); null hash
    * for undecodable payloads.
    */
  def imageDHashes(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("fp", LongType, nullable = true)))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val h = imageDHash(r.getAs[Array[Byte]](contentIdx))
        Row(r.getLong(idIdx), h.map(java.lang.Long.valueOf).orNull)
      }
    }(enc)
  }

  /** Image near-dup pairs: dHash fingerprints into the SAME segment-
    * banding candidate engine the text SimHash dedup uses
    * ([[graft.dedup.Dedup.fingerprintPairs]]) — pigeonhole candidates
    * from (maxHamming+1)-segment equality joins, exact Hamming verify.
    * With the default maxHamming=3 the 4-segment banding is LOSSLESS:
    * every pair within distance 3 shares an untouched 16-bit segment.
    */
  def imageNearDupPairs(df: DataFrame, idCol: String, contentCol: String,
      maxHamming: Int = 3, maxBucket: Int = 10000): DataFrame =
    graft.dedup.Dedup.fingerprintPairs(
      imageDHashes(df, idCol, contentCol), maxHamming, maxBucket)

  /** Audio/video metadata for a binary media column — the WAV/MP4
    * counterpart of [[decodeMeta]]: real RIFF chunk-walk / ISO-BMFF
    * box-walk via [[AudioCodec]], partition-batched, null metadata for
    * unparseable payloads. `rate` is the sample rate (WAV) or movie
    * timescale (MP4); `channels` is null where the container's top
    * header doesn't carry it (MP4).
    */
  def decodeMediaMeta(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("format", StringType, nullable = true),
      StructField("rate", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        AudioCodec.parse(r.getAs[Array[Byte]](contentIdx)) match {
          case Some(m) => Row(r.getLong(idIdx), m.format, m.rate,
            if (m.channels < 0) null else m.channels, m.durationMs)
          case None => Row(r.getLong(idIdx), null, null, null, null)
        }
      }
    }(enc)
  }

  /** Exact PCM DSP statistics (energy / zero crossings) for a binary
    * 16-bit WAV column — a REAL sample-level decode
    * ([[AudioCodec.pcm16Stats]]), the audio analog of [[imageDHash]]'s
    * pixel decode: silence screens (low energy) and noise screens (high
    * zero-crossing rate) are the standard audio curation filters. All
    * integer arithmetic, so the correctness oracle replays it exactly.
    * Null stats for undecodable or non-PCM16 payloads.
    */
  def audioStats(df: DataFrame, idCol: String, contentCol: String): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("n_samples", LongType, nullable = true),
      StructField("sum_squares", LongType, nullable = true),
      StructField("zero_crossings", LongType, nullable = true)))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        AudioCodec.pcm16Stats(r.getAs[Array[Byte]](contentIdx)) match {
          case Some(s) => Row(r.getLong(idIdx), s.nSamples, s.sumSquares, s.zeroCrossings)
          case None => Row(r.getLong(idIdx), null, null, null)
        }
      }
    }(enc)
  }

  /** Fixed-dim feature vectors from binary payloads (batched). */
  def extractFeatures(df: DataFrame, idCol: String, contentCol: String, dim: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc: ExpressionEncoder[Row] = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val idIdx = df.schema.fieldIndex(idCol)
    val contentIdx = df.schema.fieldIndex(contentCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](contentIdx)
        Row(r.getLong(idIdx), fakeFeatures(bytes, dim))
      }
    }(enc)
  }
}
