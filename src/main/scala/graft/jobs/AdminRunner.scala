package graft.jobs

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit}
import org.json4s._
import org.json4s.jackson.JsonMethods
import graft.table.GraftTable

/** Out-of-process table administration — the spark-submit surface for
  * the mutable-row/lifecycle operations a non-JVM client can't reach
  * through the query/ingest/merge runners:
  *
  *   spark-submit --class graft.jobs.AdminRunner graft.jar \
  *     delete  <tableDir> <jobJson | @jobJsonFile> [statusDir]
  *   spark-submit --class graft.jobs.AdminRunner graft.jar \
  *     version <tableDir> [statusDir]
  *   spark-submit --class graft.jobs.AdminRunner graft.jar \
  *     clone   <tableDir> <destDir> <version> [statusDir]
  *
  * `delete` job JSON: `{"id": "...", "keys": [[k1,...], ...] |
  * "files": [...], "format": "parquet"|"jsonl", "purge": false}` —
  * row-key tuples inline (typed against the table's row keys; a bare
  * scalar works for single-key tables) or key files carrying the
  * row-key columns. Deletes land as generation-aware tombstones (m13)
  * through ONE atomic merge commit whose txn watermark is the job id —
  * resubmitting a committed id is a recorded no-op (`DUPLICATE`), so
  * the seq-advancing double-tombstone a blind resubmission would cause
  * cannot happen. `purge: true` compacts the affected leaves before
  * returning (physical removal — the compliance shape).
  *
  * `version` reports the table's current state-store version — the
  * handle a client captures for `clone` and for `--as-of` time-travel
  * queries ([[graft.query.QueryRunner]]).
  *
  * `clone` deep-clones the table AS OF a version to an independent
  * directory ([[GraftTable.cloneAt]]): branch-for-experiments from
  * Python with no JVM linkage.
  *
  * Status JSON (`<statusDir>/<id or op>.status.json` when statusDir is
  * given, always the last stdout line): `{"op", "id", "state":
  * "COMMITTED"|"DUPLICATE"|"OK"|"FAILED", ..., "error"}`; exit 0 iff
  * not FAILED.
  */
object AdminRunner {

  private val TxnApp = "delete-job"

  def main(args: Array[String]): Unit = sys.exit(run(args))

  def run(args: Array[String]): Int = {
    if (args.length < 2) {
      System.err.println(
        "usage: AdminRunner delete <tableDir> <jobJson|@file> [statusDir] | " +
          "version <tableDir> [statusDir] | " +
          "clone <tableDir> <destDir> <version> [statusDir]")
      return 2
    }
    args(0) match {
      case "delete" if args.length >= 3 => runDelete(args)
      case "version" if args.length >= 2 => runVersion(args)
      case "clone" if args.length >= 4 => runClone(args)
      case "set-properties" if args.length >= 3 => runSetProperties(args)
      case "restore" if args.length >= 3 => runRestore(args)
      case other =>
        System.err.println(s"unknown/short admin command: $other")
        2
    }
  }

  /** `set-properties <tableDir> <json|@file> [statusDir]` — the
    * reference's admin-console property editor as one versioned
    * transaction. JSON: `{"updates": {"filter": "ageOff(ts,86400000)",
    * "index": "bloom(domain)", ...}}`; keys aggregation / filter /
    * transform / index, validated against the schema (aggregation only
    * while the table is empty — see StateTransaction.SetProperties).
    */
  private def runSetProperties(args: Array[String]): Int = {
    val tableDir = args(1)
    val json =
      if (args(2).startsWith("@")) graft.meta.GraftFS.readString(args(2).drop(1))
      else args(2)
    val statusDir = if (args.length > 3) Some(args(3)) else None
    val spark = SparkSession.builder().appName("graft-admin-runner").getOrCreate()
    var state = "FAILED"
    var applied = 0
    var error: Option[String] = None
    try {
      val m = JsonMethods.parse(json).asInstanceOf[JObject].obj.toMap
      val updates = m.get("updates").collect { case JObject(fields) =>
        fields.collect { case (k, JString(v)) => k -> v }.toMap
      }.getOrElse(sys.error("set-properties JSON needs an \"updates\" object"))
      GraftTable.load(spark, tableDir).setProperties(updates)
      applied = updates.size
      state = "OK"
    } catch {
      case scala.util.control.NonFatal(e) => error = Some(String.valueOf(e.getMessage))
    }
    finish(statusDir, "set-properties",
      s"""{"op":"set-properties","id":"set-properties","state":"$state",""" +
        s""""applied":$applied,"error":${error.map(graft.Verify.jsonEscape)
          .getOrElse("null")}}""", state)
  }

  private def runDelete(args: Array[String]): Int = {
    val tableDir = args(1)
    val json =
      if (args(2).startsWith("@")) graft.meta.GraftFS.readString(args(2).drop(1))
      else args(2)
    val statusDir = if (args.length > 3) Some(args(3)) else None
    val m = JsonMethods.parse(json).asInstanceOf[JObject].obj.toMap
    val id = m.get("id").collect { case JString(s) => s }
      .filter(_.matches("[A-Za-z0-9._-]+"))
      .getOrElse(java.util.UUID.randomUUID().toString)
    val purge = m.get("purge").collect { case JBool(b) => b }.getOrElse(false)

    val spark = SparkSession.builder().appName("graft-admin-runner").getOrCreate()
    var state = "FAILED"
    var deleted = 0L
    var error: Option[String] = None
    try {
      val table = GraftTable.load(spark, tableDir)
      if (table.store.lastTxnVersion(s"$TxnApp-$id").exists(_ >= 1L)) state = "DUPLICATE"
      else {
        val keySt = org.apache.spark.sql.types.StructType(table.schema.rowKeys.map(f =>
          org.apache.spark.sql.types.StructField(f.name, f.dataType, nullable = false)))
        val keysDf = m.get("keys") match {
          case Some(JArray(tuples)) =>
            require(tuples.nonEmpty, "delete job carries an empty keys list")
            val rows = new java.util.ArrayList[org.apache.spark.sql.Row](tuples.size)
            tuples.foreach { t =>
              val vals = t match {
                case JArray(vs) => vs
                case scalar => List(scalar) // single-key sugar
              }
              require(vals.size == table.schema.rowKeys.size,
                s"key tuple $t must give one value per row key")
              rows.add(org.apache.spark.sql.Row.fromSeq(
                vals.zip(table.schema.rowKeys).map { case (v, f) => jsonKey(v, f.dataType) }))
            }
            spark.createDataFrame(rows, keySt)
          case _ =>
            val files = m.get("files").collect { case JArray(xs) =>
              xs.collect { case JString(s) => s }
            }.getOrElse(Nil)
            require(files.nonEmpty, "delete job needs \"keys\" or \"files\"")
            val raw = m.get("format").collect { case JString(s) => s }.getOrElse("parquet") match {
              case "jsonl" => spark.read.schema(keySt).json(files: _*)
              case "parquet" => spark.read.parquet(files: _*)
              case other => sys.error(s"unknown delete format: $other")
            }
            raw.select(table.schema.rowKeys.map(f =>
              col(f.name).cast(f.dataType).as(f.name)): _*)
        }
        // one atomic merge commit of pure markers: identical tombstone
        // semantics to deleteKeys, plus the job-id txn watermark. The
        // merge contract resolves the full table schema on its source,
        // so pad null value columns (never written: every row is a
        // delete).
        val padded = keysDf.select(
          (table.schema.rowKeys.map(f => col(f.name)) ++
            (table.schema.sortKeys ++ table.schema.values)
              .map(f => lit(null).cast(f.dataType).as(f.name)) :+
            lit("delete").as("__op")): _*)
        val (_, tombs) = table.merge(padded, col("__op") === "delete",
          txn = Some((s"$TxnApp-$id", 1L)))
        deleted = tombs.map(_.rowCount).sum
        if (purge && tombs.nonEmpty) table.compactAll()
        state = "COMMITTED"
      }
    } catch {
      case scala.util.control.NonFatal(e) => error = Some(String.valueOf(e.getMessage))
    }
    finish(statusDir, id,
      s"""{"op":"delete","id":${graft.Verify.jsonEscape(id)},"state":"$state",""" +
        s""""deleteKeys":$deleted,"error":${error.map(graft.Verify.jsonEscape)
          .getOrElse("null")}}""", state)
  }

  /** `restore <tableDir> <version> [statusDir]` — roll the table's data
    * back to a historical version's contents (one metadata commit, no
    * data IO; refused when the target's files were already GC'd).
    */
  private def runRestore(args: Array[String]): Int = {
    val tableDir = args(1)
    val statusDir = if (args.length > 3) Some(args(3)) else None
    val spark = SparkSession.builder().appName("graft-admin-runner").getOrCreate()
    var state = "FAILED"
    var error: Option[String] = None
    try {
      GraftTable.load(spark, tableDir).restoreTo(args(2).toLong)
      state = "OK"
    } catch {
      case scala.util.control.NonFatal(e) => error = Some(String.valueOf(e.getMessage))
    }
    finish(statusDir, "restore",
      s"""{"op":"restore","id":"restore","state":"$state","version":${args(2)},""" +
        s""""error":${error.map(graft.Verify.jsonEscape).getOrElse("null")}}""", state)
  }

  private def runVersion(args: Array[String]): Int = {
    val tableDir = args(1)
    val statusDir = if (args.length > 2) Some(args(2)) else None
    var state = "FAILED"
    var version = -1L
    var error: Option[String] = None
    try {
      version = graft.meta.JsonStateStore.load(s"$tableDir/meta").currentVersion
      state = "OK"
    } catch {
      case scala.util.control.NonFatal(e) => error = Some(String.valueOf(e.getMessage))
    }
    finish(statusDir, "version",
      s"""{"op":"version","id":"version","state":"$state","version":$version,""" +
        s""""error":${error.map(graft.Verify.jsonEscape).getOrElse("null")}}""", state)
  }

  /** `clone <tableDir> <destDir> <version> [statusDir] [--shallow]` —
    * deep copy by default; `--shallow` branches zero-copy (the dest
    * references the source's files by absolute path; O(metadata)).
    */
  private def runClone(args: Array[String]): Int = {
    val (tableDir, destDir, versionS) = (args(1), args(2), args(3))
    val shallow = args.contains("--shallow")
    val statusDir = args.drop(4).filterNot(_.startsWith("--")).headOption
    val spark = SparkSession.builder().appName("graft-admin-runner").getOrCreate()
    var state = "FAILED"
    var error: Option[String] = None
    try {
      val t = GraftTable.load(spark, tableDir)
      if (shallow) t.shallowCloneAt(destDir, versionS.toLong)
      else t.cloneAt(destDir, versionS.toLong)
      state = "OK"
    } catch {
      case scala.util.control.NonFatal(e) => error = Some(String.valueOf(e.getMessage))
    }
    finish(statusDir, "clone",
      s"""{"op":"clone","id":"clone","state":"$state","dest":${graft.Verify.jsonEscape(destDir)},""" +
        s""""version":$versionS,"shallow":$shallow,""" +
        s""""error":${error.map(graft.Verify.jsonEscape).getOrElse("null")}}""",
      state)
  }

  private def jsonKey(v: JValue, dt: org.apache.spark.sql.types.DataType): Any = (v, dt) match {
    case (JInt(i), org.apache.spark.sql.types.LongType) => i.toLong
    case (JInt(i), org.apache.spark.sql.types.IntegerType) => i.toInt
    case (JLong(l), org.apache.spark.sql.types.LongType) => l
    case (JLong(l), org.apache.spark.sql.types.IntegerType) => l.toInt
    case (JString(s), org.apache.spark.sql.types.StringType) => s
    case (JString(s), org.apache.spark.sql.types.LongType) => s.toLong
    case (JString(s), org.apache.spark.sql.types.IntegerType) => s.toInt
    case _ => sys.error(s"cannot convert key value $v to $dt")
  }

  private def finish(statusDir: Option[String], id: String, status: String,
      state: String): Int = {
    statusDir.foreach { d =>
      try graft.meta.GraftFS.writeString(s"$d/$id.status.json", status)
      catch { case scala.util.control.NonFatal(_) => () }
    }
    println(status)
    if (state == "FAILED") 1 else 0
  }
}
