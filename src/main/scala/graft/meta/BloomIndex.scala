package graft.meta

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String
import graft.core.GraftSchema

/** Per-file Bloom-filter value index — opt-in file-grain data skipping
  * for EQUALITY predicates on value columns whose min/max stats cannot
  * discriminate (high-cardinality or interleaved categoricals). The
  * reference prunes by key range only (its leaf/partition tree); this is
  * the standard sidecar extension a 100-TB deployment needs for
  * "find the rows with this label/user/id" queries on NON-key columns:
  * min/max keeps every file whose range straddles the probe value, a
  * Bloom filter keeps only files that (probably) CONTAIN it — false
  * positives cost one extra file read, never a wrong row (Spark
  * re-applies all filters post-scan).
  *
  * Config string (persisted table metadata, like aggregation/filter):
  * `bloom(field)` or `bloom(field,expectedItemsPerFile)` entries,
  * comma-separated: `bloom(event_type),bloom(user_id,500000)`.
  * Only string and long value columns are indexable — the hash family
  * is fixed per type and must match between build and probe (the int
  * vs long hash mismatch is exactly the bug class the round-11 advice
  * flagged in the CMS, so unsupported types fail at CREATE, not probe).
  */
object BloomIndex {

  /** One indexed column: `expectedItems` sizes each per-file filter
    * (Spark's BloomFilter allocates bits upfront; ~9.6 bits/item at the
    * fixed 1% fpp). Writers may override with better per-file knowledge
    * (compaction knows its job's input row count).
    */
  final case class BloomSpec(field: String, expectedItems: Long)

  val DefaultExpectedItems = 1000000L
  val Fpp = 0.01

  /** Ceiling on a writer-derived expected-items value: keeps one
    * filter's bits ≤ ~10 MB however large a compaction job gets (fpp
    * degrades gracefully past it; skipping stays sound).
    */
  val MaxExpectedItems = 8L * 1000 * 1000

  private val Entry = """\s*bloom\(\s*([A-Za-z0-9_]+)\s*(?:,\s*(\d+)\s*)?\)\s*""".r

  def parse(indexConfig: String): Seq[BloomSpec] = {
    val s = indexConfig.trim
    if (s.isEmpty) Nil
    else s.split(",(?![^()]*\\))").toSeq.filter(_.trim.nonEmpty).map {
      case Entry(f, exp) =>
        BloomSpec(f, Option(exp).map(_.toLong).getOrElse(DefaultExpectedItems))
      case other => throw new IllegalArgumentException(
        s"unparseable index config entry '$other' (want bloom(field[,expected]))")
    }
  }

  /** Fail at table-create time for columns the hash family cannot
    * serve: only STRING and LONG value columns are indexable.
    */
  def validate(schema: GraftSchema, indexConfig: String): Unit =
    parse(indexConfig).foreach { spec =>
      val f = schema.allFields.find(_.name == spec.field).getOrElse(
        throw new IllegalArgumentException(
          s"bloom index field '${spec.field}' not in the table schema"))
      f.dataType match {
        case org.apache.spark.sql.types.StringType |
             org.apache.spark.sql.types.LongType => ()
        case dt => throw new IllegalArgumentException(
          s"bloom index on '${spec.field}': unsupported type $dt " +
            "(string and long columns only)")
      }
    }

  /** Fields of `indexConfig` that are bloom-indexed, in config order. */
  def bloomFields(indexConfig: String): Seq[String] = parse(indexConfig).map(_.field)

  // -- the shared hash family: EXACTLY Spark's xxhash64(col) (seed 42),
  //    so the build side can use the codegen'd SQL function and the
  //    probe side hashes literals identically (spec-pinned).

  val Seed = 42L

  def hashLong(v: Long): Long = XXH64.hashLong(v, Seed)

  def hashString(s: UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)

  /** Driver-side hash of a pushed-filter literal; None for values the
    * index cannot serve (probe declines, file is kept).
    */
  def hashValue(v: Any): Option[Long] = v match {
    case s: String => Some(hashString(UTF8String.fromString(s)))
    case s: UTF8String => Some(hashString(s))
    case l: Long => Some(hashLong(l))
    case _ => None
  }
}
