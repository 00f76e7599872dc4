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
