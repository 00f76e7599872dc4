package graft.query

import org.scalatest.funsuite.AnyFunSuite

/** Runs the Python client's pytest round-trips as part of the Scala
  * suite, so every round's green gate re-proves the spark-submit
  * interchange (query JSON in, parquet + status out) against the
  * CURRENT jar — a contract drift in QueryRunner/QuerySerDe fails CI
  * here instead of surfacing when a Python user hits it. Skips cleanly
  * where pytest or a Spark distribution is missing.
  */
class PythonClientSpec extends AnyFunSuite {

  private def which(cmd: String): Option[String] = {
    val r = new ProcessBuilder("sh", "-c", s"command -v $cmd").start()
    val out = new String(r.getInputStream.readAllBytes()).trim
    if (r.waitFor() == 0 && out.nonEmpty) Some(out) else None
  }

  test("python client round-trips through spark-submit (pytest)") {
    val repo = new java.io.File(".").getCanonicalFile
    val pyDir = new java.io.File(repo, "python")
    assume(pyDir.isDirectory, "python/ not present")
    val pytest = which("pytest")
    assume(pytest.nonEmpty, "pytest not on PATH")
    val sparkHome = sys.env.getOrElse("SPARK_HOME", "/opt/spark")
    assume(new java.io.File(sparkHome, "bin/spark-submit").exists(),
      "no spark distribution")
    val jar = Option(new java.io.File(repo, "target/scala-2.13").listFiles())
      .getOrElse(Array.empty).filter(_.getName.matches("sleeperspark_.*\\.jar"))
    assume(jar.nonEmpty, "packaged jar missing — run sbt package")

    val proc = new ProcessBuilder(pytest.get, "-q", "test")
      .directory(pyDir)
      .redirectErrorStream(true)
      .start()
    val out = new String(proc.getInputStream.readAllBytes())
    val finished = proc.waitFor(600, java.util.concurrent.TimeUnit.SECONDS)
    assert(finished, s"pytest timed out:\n$out")
    assert(proc.exitValue() == 0, s"pytest failed:\n$out")
    assert(out.contains("passed"), s"no tests ran:\n$out")
    assert(!out.contains("skipped"),
      s"the round-trip must actually run (jar + spark present):\n$out")
  }
}
