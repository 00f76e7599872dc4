package graft.meta

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** The crash battery of [[LifecycleStress]] over the filesystem-
  * coordinated external CAS — see that object's scaladoc for the
  * invariants; HttpCasSpec runs the identical battery over the HTTP
  * claim service.
  */
class ObjectStoreLifecycleSpec extends AnyFunSuite {

  private lazy val spark = graft.TestSpark.spark

  test("ingest || compact || GC from 3 writers on an emulated object store with crash injection (stress)") {
    val coord = Files.createTempDirectory("graft-objstore-coord").toString
    LifecycleStress.run(spark, () => new CoordinatedCAS(coord))
  }
}
