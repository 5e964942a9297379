package graft.core

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.queries.RunStore

/** The cross-process claims of the [[graft.queries.RunStore]] build
  * lock — winner builds, loser revalidates-and-reuses, one artifact —
  * exercised in TWO REAL JVMs (round-10 verdict #5: RunStoreSpec
  * simulates fresh processes by dropping the in-memory catalog; this
  * spec pays for the real thing once). The child process is
  * [[StoreRaceChild]], launched with this test JVM's own classpath; a
  * stdin GO handshake releases both `ensure` calls as close together
  * as two JVMs allow, and the assertions hold for EVERY interleaving:
  * full overlap serializes on the lock file (loser revalidates the
  * winner's build), no overlap degenerates to build-then-revalidate —
  * either way exactly one "built", one "reused", identical rows.
  */
class TwoJvmStoreRaceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("two real JVMs ensuring the same store concurrently: exactly one " +
    "build, one fingerprint reuse, and byte-identical contents") {
    val src = TestSpark.Sf0001
    val store = StoreRaceFixture.store
    val t = store.tableName(src)
    RunStore.dropWithLocation(spark, t)
    store.reset()
    val child = new ProcessBuilder(
      (Seq(System.getProperty("java.home") + "/bin/java") ++
        StoreRaceFixture.jdk17AddOpens ++
        Seq("-Xmx2g", "-Dspark.ui.enabled=false",
          "-cp", System.getProperty("java.class.path"),
          "graft.core.StoreRaceChild",
          spark.conf.get("spark.sql.warehouse.dir"), src)): _*)
      .redirectError(ProcessBuilder.Redirect.to(
        java.io.File.createTempFile("store_race_child", ".err")))
      .start()
    try {
      val out = new java.io.BufferedReader(
        new java.io.InputStreamReader(child.getInputStream, "UTF-8"))
      def readUntil(prefix: String): String = {
        var line = out.readLine()
        while (line != null && !line.startsWith(prefix)) line = out.readLine()
        assert(line != null, s"child exited before printing $prefix")
        line.stripPrefix(prefix)
      }
      readUntil("CHILD_READY")
      // release both sides as simultaneously as two processes get
      child.getOutputStream.write("GO\n".getBytes("UTF-8"))
      child.getOutputStream.flush()
      val parentMode = store.ensure(spark, src)
      val childMode = readUntil("CHILD_MODE:")
      val childHash = readUntil("CHILD_HASH:")
      assert(child.waitFor(120, java.util.concurrent.TimeUnit.SECONDS),
        "child JVM did not finish")
      assert(child.exitValue() == 0, "child JVM failed — see its stderr file")

      val modes = Seq(parentMode, childMode).sorted
      assert(modes == Seq("built", "reused"),
        s"expected exactly one build and one reuse across the two " +
          s"processes, got parent=$parentMode child=$childMode")
      assert(StoreRaceFixture.contentHash(spark, src) == childHash,
        "both processes must serve the same artifact")
    } finally {
      child.destroyForcibly()
      RunStore.dropWithLocation(spark, t)
      store.reset()
    }
  }
}
