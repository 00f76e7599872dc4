package graft.transforms

import java.io.File
import java.nio.file.Files
import java.util.jar.{JarEntry, JarOutputStream}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.table.{GraftTable, TableConfig}

/** User-jar transform loading — the reference's extension path
  * (IteratorFactory.java:62-99 over the instance jars bucket; system
  * test UserJarsST): a transform class that exists ONLY inside a jar in
  * the configured user-jars directory is compiled here at test time
  * (javax.tools), loaded by config string, and applied at query AND
  * compaction.
  */
class UserJarsSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark
  import spark.implicits._

  private val schema = GraftSchema(
    rowKeys = Seq(GraftField("key", StringType)),
    sortKeys = Seq(GraftField("ts", LongType)),
    values = Seq(GraftField("vis", StringType), GraftField("count", LongType)))

  private def tmp() = Files.createTempDirectory("graft-userjar").toString

  private def batch(rows: (String, Long, String, Long)*) =
    rows.toDF("key", "ts", "vis", "count")

  /** The user's transform, as a plain-Java source: implements the Scala
    * trait (2.13 traits are interfaces with default methods), keeps only
    * rows whose configured column is at most the configured max —
    * key-order-preserving, so valid at compaction.
    */
  private val javaSource =
    """package graftuser;
      |import org.apache.spark.sql.Dataset;
      |import org.apache.spark.sql.Row;
      |import graft.core.GraftSchema;
      |import graft.transforms.SortedRowTransform;
      |
      |public class KeepAtMost implements SortedRowTransform {
      |  private String field;
      |  private long max;
      |
      |  @Override
      |  public void init(String config, GraftSchema schema) {
      |    String[] parts = config.split(",", 2);
      |    field = parts[0].trim();
      |    max = Long.parseLong(parts[1].trim());
      |  }
      |
      |  @Override
      |  public Dataset<Row> apply(Dataset<Row> df) {
      |    return df.filter(df.col(field).leq(max));
      |  }
      |}
      |""".stripMargin

  /** Compile [[javaSource]] and pack it into `<dir>/user-transforms.jar`.
    * The compile classpath is assembled from the code sources of the
    * classes the source references (works under sbt's layered test
    * classloaders, where java.class.path is just the launcher).
    */
  private def buildUserJar(dir: String): File = {
    val compiler = javax.tools.ToolProvider.getSystemJavaCompiler
    assert(compiler != null, "JDK compiler required")
    val src = new File(dir, "graftuser/KeepAtMost.java")
    src.getParentFile.mkdirs()
    Files.writeString(src.toPath, javaSource)

    // compile classpath: graft classes + scala-library (via code
    // sources) + the Spark distribution jars (the build's unmanaged
    // classpath — javac chases transitive signatures like Logging and
    // the java function interfaces, so it needs the full set)
    def codeSourceOf(c: Class[_]): String =
      new File(c.getProtectionDomain.getCodeSource.getLocation.toURI).getAbsolutePath
    val sparkDist = new File("/opt/spark/jars")
    val sparkJarDir =
      if (sparkDist.isDirectory) sparkDist
      else new File(codeSourceOf(classOf[org.apache.spark.sql.Dataset[_]])).getParentFile
    val sparkJars = Option(sparkJarDir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".jar")).map(_.getAbsolutePath).sorted
    val cp = (Seq(
      codeSourceOf(classOf[SortedRowTransform]),
      codeSourceOf(classOf[scala.collection.immutable.Seq[_]])
    ) ++ sparkJars).distinct.mkString(File.pathSeparator)

    val out = new File(dir, "classes")
    out.mkdirs()
    val rc = compiler.run(null, null, null,
      "-cp", cp, "-d", out.getAbsolutePath, src.getAbsolutePath)
    assert(rc == 0, "javac failed")

    val jar = new File(dir, "user-transforms.jar")
    val jos = new JarOutputStream(new java.io.FileOutputStream(jar))
    try {
      Files.walk(out.toPath).iterator().asScala
        .filter(p => p.toString.endsWith(".class"))
        .foreach { p =>
          jos.putNextEntry(new JarEntry(out.toPath.relativize(p).toString))
          jos.write(Files.readAllBytes(p))
          jos.closeEntry()
        }
    } finally jos.close()
    jar
  }

  test("a transform in a user jar loads by config string and applies at query + compaction") {
    val work = tmp()
    buildUserJar(work)

    // the class must NOT be reachable from the engine classpath — the
    // jar is genuinely the only source
    intercept[ClassNotFoundException](Class.forName("graftuser.KeepAtMost"))
    intercept[Exception](
      TransformFactory.create("graftuser.KeepAtMost{count,10}", schema))

    // direct factory load + apply
    val t = TransformFactory.create("graftuser.KeepAtMost{count,10}", schema, work)
    val filtered = t(batch(("a", 1L, "x", 5L), ("b", 1L, "x", 50L)))
    assert(filtered.select("key").as[String].collect().toSeq == Seq("a"))

    // end-to-end: table-level transform from the user jar runs at query
    // time and rewrites data at compaction, like any built-in
    val table = GraftTable.create(spark, tmp(), schema,
      config = TableConfig(
        transformConfig = "graftuser.KeepAtMost{count,10}",
        userJarsDir = work))
    table.ingest(batch(("a", 1L, "x", 5L), ("b", 1L, "x", 50L), ("c", 1L, "x", 7L)))
    assert(table.toDF.select("key").as[String].collect().sorted.toSeq ==
      Seq("a", "c"))
    table.compactAll()
    assert(table.store.fileReferences.map(_.rowCount).sum == 2,
      "compaction must apply the user-jar transform persistently")
  }

  test("system-property fallback resolves user jars without per-table config") {
    val work = tmp()
    buildUserJar(work)
    val prev = sys.props.get("graft.user.jars.dir")
    sys.props("graft.user.jars.dir") = work
    try {
      val t = TransformFactory.create("graftuser.KeepAtMost{count,3}", schema)
      val out = t(batch(("a", 1L, "x", 2L), ("b", 1L, "x", 9L)))
      assert(out.select("key").as[String].collect().toSeq == Seq("a"))
    } finally {
      prev match {
        case Some(v) => sys.props("graft.user.jars.dir") = v
        case None => sys.props.remove("graft.user.jars.dir")
      }
    }
  }
}
