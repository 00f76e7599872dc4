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
  * STUB NOTE: this container has no image/audio codecs, so `decodeMeta`
  * and `extractFeatures` are deterministic fakes over the raw bytes —
  * clearly marked below. The Spark-side contract (binary column in,
  * typed struct/vector out, partition-batched execution, schema
  * preserved) is real and tested; swapping in a real codec changes only
  * the marked function bodies.
  */
object Multimodal {

  val metaSchema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false)))

  /** ==== STUB ==== deterministic fake of an image/video header decode:
    * real implementation would parse the codec header. Keeps a fixed
    * arithmetic mapping from byte length so results are verifiable.
    */
  private def fakeDecode(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    val len = bytes.length
    (1 + len % 64, 1 + (len * 7) % 64, 3, 1 + len % 8)
  }

  /** ==== STUB ==== deterministic fake feature extractor: real
    * implementation would run a vision/audio model over decoded frames.
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

  /** Decode metadata for a binary `content` column: mapPartitions keeps
    * the per-batch amortization a real decoder needs (load codec once
    * per partition, stream rows through it).
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
        val (w, h, c, f) = fakeDecode(bytes)
        Row(r.getLong(idIdx), w, h, c, f)
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
