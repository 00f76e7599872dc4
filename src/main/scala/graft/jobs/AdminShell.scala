package graft.jobs

import java.io.{BufferedReader, InputStreamReader}
import org.apache.spark.sql.SparkSession
import graft.table.GraftTable

/** Interactive administration console — the last piece of the
  * reference's clients surface (reference:
  * java/clients/src/main/java/sleeper/clients/admin/AdminClient.java,
  * a menu console for table status, property editing, and maintenance).
  *
  * Spark-first shape: the shell is a thin REPL over the SQL surface the
  * engine already exposes — metadata tables (`$history`/`$files`/
  * `$partitions`), `SHOW TBLPROPERTIES` / `ALTER TABLE SET
  * TBLPROPERTIES`, and the `CALL system.*` maintenance procedures — so
  * every command is one SQL statement a user could also run themselves
  * (`sql <stmt>` escapes to arbitrary SQL). No bespoke admin code paths:
  * if the console can do it, SQL can, and vice versa.
  *
  *   spark-submit --class graft.jobs.AdminShell graft.jar /base/dir
  *
  * Reads commands from stdin (works both interactively and piped),
  * prints to stdout; `exit`/EOF ends the session with code 0. A failed
  * command prints `error: ...` and keeps the session alive.
  */
object AdminShell {

  private val Help =
    """commands:
      |  tables                      list tables under the root
      |  use <table>                 select the current table
      |  describe                    columns of the current table
      |  properties                  SHOW TBLPROPERTIES
      |  set <key>=<value>           ALTER TABLE ... SET TBLPROPERTIES (versioned)
      |  status                      row/file/partition metrics (state store only)
      |  files                       SELECT * FROM `t$files`
      |  partitions                  SELECT * FROM `t$partitions`
      |  history [n]                 last n commits from `t$history` (default 10)
      |  compact [all|basic|size_ratio]   CALL system.compact
      |  split                       CALL system.split_partitions
      |  gc                          CALL system.gc
      |  restore <version>           CALL system.restore
      |  snapshot <sinkTable>        CALL system.snapshot_metrics
      |  sql <statement>             run any SQL (catalog 'shell' is bound)
      |  help | exit""".stripMargin

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: AdminShell <catalogRootDir>")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-admin-shell")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val code = loop(spark, args(0),
      new BufferedReader(new InputStreamReader(System.in)), interactive = true)
    spark.stop()
    sys.exit(code)
  }

  /** The REPL body, separated from main for in-JVM testing. Returns 0
    * on clean exit; commands that fail print `error:` and continue.
    */
  def loop(spark: SparkSession, root: String, in: BufferedReader,
      interactive: Boolean = false): Int = {
    val cat = "shell"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.root", root)
    var table: Option[String] = None
    def t: String = table.getOrElse(sys.error("no table selected - `use <table>` first"))
    def show(sql: String, n: Int = 100): Unit = spark.sql(sql).show(n, false)

    var line: String = null
    var done = false
    while (!done && { if (interactive) print("graft> "); line = in.readLine(); line != null }) {
      val trimmed = line.trim
      val (cmd, arg) = trimmed.split("\\s+", 2) match {
        case Array(c, a) => (c.toLowerCase, a.trim)
        case Array(c) => (c.toLowerCase, "")
      }
      try cmd match {
        case "" => ()
        case "help" => println(Help)
        case "exit" | "quit" => done = true
        case "tables" => show(s"SHOW TABLES IN $cat")
        case "use" =>
          require(arg.nonEmpty, "use <table>")
          require(graft.meta.GraftFS.exists(s"$root/${arg.replace('.', '/')}/meta"),
            s"no such table: $arg")
          table = Some(arg); println(s"using $arg")
        case "describe" => show(s"DESCRIBE TABLE $cat.$t")
        case "properties" => show(s"SHOW TBLPROPERTIES $cat.$t")
        case "set" =>
          val Array(k, v) = arg.split("=", 2).map(_.trim)
          require(k.nonEmpty, "set <key>=<value>")
          spark.sql(s"ALTER TABLE $cat.$t SET TBLPROPERTIES('$k'='$v')")
          println(s"set $k=$v (new version committed)")
        case "status" =>
          val m = GraftTable.load(spark, s"$root/${t.replace('.', '/')}").metrics
          println(s"table=$t rows=${m.rowCount} files=${m.fileCount} " +
            s"partitions=${m.partitionCount} leaves=${m.leafPartitionCount} " +
            s"avgFilesPerLeaf=${m.averageFileReferencesPerPartition}")
        case "files" => show(s"SELECT * FROM $cat.`$t$$files`")
        case "partitions" => show(s"SELECT * FROM $cat.`$t$$partitions`")
        case "history" =>
          val n = if (arg.isEmpty) 10 else arg.toInt
          show(s"SELECT * FROM $cat.`$t$$history` ORDER BY version DESC LIMIT $n")
        case "compact" =>
          val strat = if (arg.isEmpty) "all" else arg
          show(s"CALL $cat.system.compact('$t', strategy => '$strat')")
        case "split" => show(s"CALL $cat.system.split_partitions('$t')")
        case "gc" => show(s"CALL $cat.system.gc('$t')")
        case "restore" =>
          require(arg.nonEmpty, "restore <version>")
          show(s"CALL $cat.system.restore('$t', ${arg.toLong})")
        case "snapshot" =>
          require(arg.nonEmpty, "snapshot <sinkTable>")
          show(s"CALL $cat.system.snapshot_metrics('$t', '$arg')")
        case "sql" =>
          require(arg.nonEmpty, "sql <statement>")
          show(arg)
        case other => println(s"unknown command: $other (try `help`)")
      } catch {
        case scala.util.control.NonFatal(e) =>
          val msg = Option(e.getMessage).getOrElse(e.toString)
            .stripPrefix("requirement failed: ").linesIterator.next()
          println(s"error: $msg")
      }
    }
    0
  }
}
