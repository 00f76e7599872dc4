package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain_long(hash, filter)`: membership probe of a long
  * hash against an `org.apache.spark.util.sketch.BloomFilter`. The
  * serialized filter travels as a TORRENT BROADCAST — the expression
  * (and thus every plan branch, task binary, and canonicalized copy)
  * carries only the broadcast handle, so a gigabyte-class filter ships
  * over the cluster once and lives once per executor, no matter how
  * many plan branches probe it (bloomDedup probes from two). Earlier
  * revisions embedded the raw bytes in the expression, which (a) made
  * equality reference-based — structurally identical probes never
  * canonicalized equal, defeating subexpression elimination — and
  * (b) re-shipped the bytes per plan branch. A `Broadcast` handle has
  * stable identity, and the builder reuses one handle per filter, so
  * both problems disappear.
  *
  * Per task the filter deserializes lazily once (transient), then each
  * row is one compiled `mightContainLong` call inside whole-stage
  * codegen — the probe prices like a scalar function, and no join or
  * shuffle touches the probed side.
  *
  * False positives only (rate set at build time), never false
  * negatives — so `!might_contain` is an exact "definitely new" gate,
  * and only the tiny maybe-set needs an exact confirmation join
  * (see graft.dedup.Dedup.bloomDedup).
  */
case class BloomMightContainLong(child: Expression, filterBc: Broadcast[Array[Byte]])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain_long"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBc.value))

  /** Entry point for generated code (see doGenCode). */
  def probe(hash: Long): Boolean = bloom.mightContainLong(hash)

  protected override def nullSafeEval(input: Any): Any = probe(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Reference THIS expression: it serializes as (child, broadcast
    // handle) — bytes never ride the task binary — and the transient
    // filter rebuilds lazily per executor from the broadcast block.
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

/** `bloom_agg(hash, expected, fpp)`: a mergeable per-group Bloom filter
  * over long hashes — the build side of PARTITIONED bloom dedup, where
  * one reference filter would outgrow a broadcast: each key-bucket
  * aggregates its own filter (partials OR-merge map-side) and probes
  * co-shuffle to the bucket holding their filter.
  */
case class BloomAgg(
    child: Expression,
    expected: Long,
    fpp: Double,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[BloomFilter]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(expected > 0 && fpp > 0 && fpp < 1, s"bloom_agg(expected=$expected, fpp=$fpp)")

  override def createAggregationBuffer(): BloomFilter = BloomFilter.create(expected, fpp)

  override def update(buf: BloomFilter, input: org.apache.spark.sql.catalyst.InternalRow)
      : BloomFilter = {
    val v = child.eval(input)
    if (v != null) buf.putLong(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: BloomFilter, other: BloomFilter): BloomFilter = {
    buf.mergeInPlace(other); buf
  }

  override def eval(buf: BloomFilter): Any = serialize(buf)

  override def serialize(buf: BloomFilter): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    buf.writeTo(out)
    out.toByteArray
  }
  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_agg"

  override def withNewMutableAggBufferOffset(offset: Int): BloomAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

object BloomExpressions {

  def bloom_agg(hash: Column, expected: Long, fpp: Double): Column =
    org.apache.spark.sql.graft.bridge.column(
      BloomAgg(org.apache.spark.sql.graft.bridge.expression(hash), expected, fpp)
        .toAggregateExpression())
  /** Broadcast `filter` once and return a probe column bound to the
    * broadcast handle. Call once per filter and reuse the returned
    * handle/column — `probeColumn(bc, hash)` derives further probes of
    * the same filter without re-broadcasting.
    */
  def broadcastFilter(spark: SparkSession, filter: BloomFilter): Broadcast[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    spark.sparkContext.broadcast(out.toByteArray)
  }

  def probeColumn(filterBc: Broadcast[Array[Byte]], hash: Column): Column =
    bridge.column(BloomMightContainLong(bridge.expression(hash), filterBc))

  def bloom_might_contain_long(hash: Column, filter: BloomFilter): Column =
    probeColumn(broadcastFilter(SparkSession.active, filter), hash)
}
