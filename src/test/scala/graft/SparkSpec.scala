package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs. sf0.001 testdata for fixtures.
  *
  * Master parametrization (reference parity: the reference's
  * tests/conftest.py:145-150 fixture runs its whole test body under
  * both the threaded scheduler and a real distributed cluster): the
  * default master is local[4]; setting
  * `SPARK_GRAFT_TEST_MASTER=local-cluster[2,1,1024]` runs the SAME
  * suite across a real executor boundary — separate executor JVMs, so
  * broadcast closures, the native codegen expressions, opaque
  * broadcast models, and streaming state classes must genuinely
  * serialize (the cluster profile also forces Kryo data serialization
  * to widen coverage). The default stays local[4] to keep CI time
  * sane; the round recipe runs the full suite once under the cluster
  * master (see ClusterSweepSpec for the per-query execution sweep).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  val sfDir = "/root/testdata/sf0.001"
  implicit class DoubleOps(x: Double) {
    def ~==(y: Double, tol: Double = 1e-9): Boolean = math.abs(x - y) <= tol
  }
}

object SparkSpec {
  val master: String = sys.env.getOrElse("SPARK_GRAFT_TEST_MASTER", "local[4]")
  val isCluster: Boolean = master.startsWith("local-cluster")

  lazy val session: SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
    val b2 =
      if (!isCluster) b
      else {
        // Executor JVMs are spawned fresh by the in-process Worker:
        // they need the forked test JVM's full classpath (graft classes
        // + Spark jars; Test/fork := true makes java.class.path
        // complete) and the same JDK-17 --add-opens the driver gets
        // from build.sbt. Kryo is forced so shuffle/broadcast data of
        // the native expressions' outputs round-trips through it.
        val addOpens = Seq(
          "java.base/java.lang", "java.base/java.lang.invoke",
          "java.base/java.lang.reflect", "java.base/java.io",
          "java.base/java.net", "java.base/java.nio",
          "java.base/java.util", "java.base/java.util.concurrent",
          "java.base/java.util.concurrent.atomic",
          "java.base/sun.nio.ch", "java.base/sun.nio.cs",
          "java.base/sun.security.action", "java.base/sun.util.calendar",
        ).map(p => s"--add-opens=$p=ALL-UNNAMED").mkString(" ")
        b.config("spark.executor.memory", "1024m")
          .config("spark.executor.extraClassPath", sys.props("java.class.path"))
          .config("spark.executor.extraJavaOptions", addOpens)
          .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      }
    val s = b2.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
