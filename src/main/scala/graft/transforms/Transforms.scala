package graft.transforms

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.core.GraftSchema

/** The engine's user extension point (X1) — the reference's
  * `ConfigStringIterator` re-expressed at plan level
  * (reference: java/core/.../iterator/ConfigStringIterator.java:32,
  * SortedRowIterator.java:35-55, factory IteratorFactory.java:62-99).
  *
  * Contract (as documented in the reference's data-processing guide):
  *  - the transform must preserve sort order on (row keys, sort keys);
  *  - a table-level transform runs at BOTH compaction and query time, so
  *    it must be commutative/associative over partial compactions;
  *  - `requiredValueFields` declares the value columns the transform
  *    reads, so the engine can prune the read schema to
  *    (keys ∪ requested ∪ required) even when the transform body is
  *    opaque (reference: SortedRowIterator.getRequiredValueFields:46-54,
  *    LeafPartitionQueryExecutor.createSchemaForDataRead:105-131).
  *
  * Expressing the hook as DataFrame => DataFrame (instead of a row
  * iterator) lets Catalyst see through well-behaved transforms — filters
  * still push to parquet, columns still prune — while `mapPartitions`
  * inside a transform remains the escape hatch for row-level logic.
  */
trait SortedRowTransform extends Serializable {
  /** Called once with the config-string payload and the table schema. */
  def init(config: String, schema: GraftSchema): Unit = {}
  def apply(df: DataFrame): DataFrame
  /** Value fields this transform reads; keys are always available. */
  def requiredValueFields: Seq[String] = Nil
}

/** Builds transforms from config strings of the form
  * `fully.qualified.ClassName` or `fully.qualified.ClassName{config}` —
  * the reference's class-name + config-string convention
  * (`sleeper.table.iterator.class.name` / `queryTimeIteratorClassName`,
  * IteratorFactory.java:62-99). A `;`-separated spec composes a CHAIN of
  * transforms applied left-to-right, the reference's iterator-list
  * composition (SortedRowIterators.java:30-52); the chain's
  * requiredValueFields is the union of its members'.
  *
  * Classes resolve from the engine classpath PLUS a directory of
  * user-supplied jars — the reference's user-jars extension path
  * (IteratorFactory loads iterators through an ObjectFactory over the
  * instance's jars bucket, IteratorFactory.java:62-99; system test
  * UserJarsST) — so an extension author ships a jar next to the engine
  * instead of rebuilding it. The directory comes from the `userJarsDir`
  * argument (threaded from `TableConfig.userJarsDir`) or, when absent,
  * the `graft.user.jars.dir` system property (the deployment-level
  * setting — how the SQL catalog's DDL-time validation finds user
  * classes without per-table plumbing). Loaders are cached per
  * directory; parent-first delegation, so user jars add classes but
  * never shadow the engine's. NOTE for cluster mode: this covers
  * driver-side resolution; executors deserialize transform closures, so
  * the same jars must also ride `spark.jars`/`--jars` (exactly the
  * reference's requirement that user jars be on every component's
  * classpath).
  */
object TransformFactory {

  private val spec = """([\w.$]+)(?:\{(.*)\})?""".r

  private val loaders =
    new java.util.concurrent.ConcurrentHashMap[String, ClassLoader]()

  /** The classloader for a user-jars directory (cached; every `*.jar`
    * in lexicographic order). An empty/missing dir degrades to the
    * engine classloader.
    */
  def classLoaderFor(jarsDir: String): ClassLoader =
    loaders.computeIfAbsent(jarsDir, dir => {
      val d = new java.io.File(dir)
      val jars = Option(d.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".jar"))
        .sortBy(_.getName)
      if (jars.isEmpty) getClass.getClassLoader
      else new java.net.URLClassLoader(jars.map(_.toURI.toURL),
        getClass.getClassLoader)
    })

  private def resolveLoader(userJarsDir: String): ClassLoader = {
    val dir = if (userJarsDir != null && userJarsDir.trim.nonEmpty) userJarsDir.trim
      else sys.props.getOrElse("graft.user.jars.dir", "").trim
    if (dir.isEmpty) getClass.getClassLoader else classLoaderFor(dir)
  }

  def create(specStr: String, schema: GraftSchema,
      userJarsDir: String = ""): SortedRowTransform = specStr.trim match {
    case spec(className, config) =>
      val t = Class.forName(className, true, resolveLoader(userJarsDir))
        .getDeclaredConstructor()
        .newInstance().asInstanceOf[SortedRowTransform]
      t.init(Option(config).getOrElse(""), schema)
      t
    case other => throw new IllegalArgumentException(s"bad transform spec: '$other'")
  }

  def parse(specStr: String, schema: GraftSchema,
      userJarsDir: String = ""): Option[SortedRowTransform] = {
    if (specStr == null || specStr.trim.isEmpty) return None
    splitChain(specStr).map(create(_, schema, userJarsDir)) match {
      case Seq() => None
      case Seq(one) => Some(one)
      case many => Some(new ChainedTransform(many))
    }
  }

  /** Chain members of a spec: `"A{x};B"` → `Seq("A{x}", "B")` — the same
    * depth-aware split `parse` uses, for callers (serde) that need the
    * chain structure without instantiating anything.
    */
  def chainMembers(s: String): Seq[String] = splitChain(s)

  /** One member's (className, config): `"A{x}"` → `("A", "x")`. */
  def memberParts(member: String): (String, String) = member.trim match {
    case spec(cls, cfg) => (cls, Option(cfg).getOrElse(""))
    case other => throw new IllegalArgumentException(s"bad transform spec: '$other'")
  }

  /** Split on `;` outside `{...}` (a config payload may itself use `;`). */
  private def splitChain(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0
    val sb = new StringBuilder
    s.foreach {
      case '{' => depth += 1; sb += '{'
      case '}' => depth -= 1; sb += '}'
      case ';' if depth == 0 => out += sb.toString; sb.clear()
      case c => sb += c
    }
    out += sb.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }
}

/** Left-to-right composition of transforms (each member individually
  * preserves key order, so the chain does too).
  */
private final class ChainedTransform(members: Seq[SortedRowTransform])
    extends SortedRowTransform {
  override def apply(df: DataFrame): DataFrame = members.foldLeft(df)((d, t) => t(d))
  override def requiredValueFields: Seq[String] =
    members.flatMap(_.requiredValueFields).distinct
}

/** Example transform mirroring the reference's example iterator: keep a
  * row iff its visibility field is empty/null or within the caller's
  * authorizations (reference: SecurityFilteringIterator.java:36-75).
  * Config: `field,auth1|auth2|...`.
  */
final class SecurityFilter extends SortedRowTransform {
  private var field: String = _
  private var auths: Seq[String] = Nil

  override def init(config: String, schema: GraftSchema): Unit = {
    val parts = config.split(",", 2)
    require(parts.length == 2, s"SecurityFilter config must be 'field,auth|auth': $config")
    field = parts(0).trim
    schema.field(field) // validates existence
    auths = parts(1).split("\\|").map(_.trim).filter(_.nonEmpty).toSeq
  }

  override def apply(df: DataFrame): DataFrame =
    df.filter(col(field).isNull || col(field) === "" || col(field).isin(auths: _*))

  override def requiredValueFields: Seq[String] = Seq(field)
}

/** Example value-capping transform (config: `field,maxValue`) — the kind
  * of per-row rewrite users plug in; preserves sort order by touching
  * only a value column.
  */
final class CapValue extends SortedRowTransform {
  private var field: String = _
  private var max: Long = _

  override def init(config: String, schema: GraftSchema): Unit = {
    val parts = config.split(",", 2)
    require(parts.length == 2, s"CapValue config must be 'field,max': $config")
    field = parts(0).trim
    max = parts(1).trim.toLong
  }

  override def apply(df: DataFrame): DataFrame =
    df.withColumn(field, least(col(field), lit(max)))

  override def requiredValueFields: Seq[String] = Seq(field)
}
