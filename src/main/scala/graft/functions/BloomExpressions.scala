package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.bridge
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** `bloom_might_contain_long(hash, filterBytes)`: membership probe of a
  * long hash against a serialized `org.apache.spark.util.sketch
  * .BloomFilter`. The filter ships to executors as plan bytes and is
  * deserialized once per task (transient lazy), then each row is one
  * compiled `mightContainLong` call inside whole-stage codegen — the
  * probe prices like a scalar function, and no join or shuffle touches
  * the probed side.
  *
  * False positives only (rate set at build time), never false
  * negatives — so `!might_contain` is an exact "definitely new" gate,
  * and only the tiny maybe-set needs an exact confirmation join
  * (see graft.dedup.Dedup.bloomDedup).
  */
case class BloomMightContainLong(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain_long"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  /** Entry point for generated code (see doGenCode). */
  def probe(hash: Long): Boolean = bloom.mightContainLong(hash)

  protected override def nullSafeEval(input: Any): Any = probe(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Reference THIS expression, not the materialized BloomFilter: the
    // filter bytes then ship exactly once (inside the expression; the
    // transient filter rebuilds lazily per executor) instead of the
    // task binary carrying a serialized BloomFilter object ALONGSIDE
    // the plan's copy of the bytes — which doubles driver memory and
    // shipping cost for large filters.
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContainLong].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomExpressions {
  def bloom_might_contain_long(hash: Column, filter: BloomFilter): Column = {
    val out = new java.io.ByteArrayOutputStream()
    filter.writeTo(out)
    bridge.column(BloomMightContainLong(bridge.expression(hash), out.toByteArray))
  }
}
