package graft.jobs

import java.io.{BufferedReader, ByteArrayOutputStream, PrintStream, StringReader}
import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite

/** The interactive admin console, driven end-to-end with a piped
  * command script: table discovery, status, maintenance (CALL-backed),
  * property editing, history, and error recovery.
  */
class AdminShellSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  private def runScript(root: String, script: String): String = {
    val out = new ByteArrayOutputStream()
    val code = Console.withOut(new PrintStream(out, true, "UTF-8")) {
      AdminShell.loop(spark, root, new BufferedReader(new StringReader(script)))
    }
    assert(code == 0)
    out.toString("UTF-8")
  }

  test("full admin session over a real table") {
    val root = Files.createTempDirectory("graft-shell").toString
    spark.conf.set("spark.sql.catalog.shellfix", classOf[graft.sources.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.shellfix.root", root)
    spark.sql(
      """CREATE TABLE shellfix.ev (key STRING, n BIGINT NOT NULL)
        |USING graft
        |TBLPROPERTIES('rowKeys'='key', 'splitPoints'='m')""".stripMargin)
    spark.sql("INSERT INTO shellfix.ev VALUES ('a', 1), ('p', 2)")
    spark.sql("INSERT INTO shellfix.ev VALUES ('b', 3), ('q', 4)")

    val outText = runScript(root,
      """tables
        |use ev
        |status
        |compact
        |history 5
        |properties
        |set filter=
        |files
        |sql SELECT count(*) AS c FROM shell.ev
        |exit""".stripMargin)

    assert(outText.contains("ev"), outText)
    assert(outText.contains("rows=4") && outText.contains("leaves=2"), outText)
    // compact merged 2 files/leaf -> 1 (CALL result table shows the counts)
    assert(outText.contains("files_before"), outText)
    assert(outText.contains("version"), outText)             // history listing
    assert(outText.contains("rowKeys"), outText)            // properties
    assert(outText.contains("set filter="), outText)        // property txn committed
    assert(outText.contains("partition_id"), outText)       // $files listing
    assert(outText.contains("4"), outText)                  // sql count
  }

  test("errors keep the session alive; unknown commands are reported") {
    val root = Files.createTempDirectory("graft-shell2").toString
    val outText = runScript(root,
      """status
        |use nope
        |frobnicate
        |help
        |exit""".stripMargin)
    assert(outText.contains("error: no table selected"), outText)
    assert(outText.contains("error: no such table: nope"), outText)
    assert(outText.contains("unknown command: frobnicate"), outText)
    assert(outText.contains("commands:"), outText)
  }
}
