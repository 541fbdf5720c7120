package graft

/** Executes EVERY SparkEntry query end-to-end at sf0.001 (not just
  * planning — PlanRegressionSpec covers plans): the gate sweep the
  * local-cluster run uses to prove that the native codegen
  * expressions, broadcast opaque models, memoized fits, and their
  * closures all survive a REAL executor boundary — the bug class
  * local[*] cannot catch, because there everything shares one JVM and
  * nothing is ever serialized.
  *
  * Each query materializes through the noop sink (a bare count() would
  * let Catalyst prune the computed columns and skip evaluating the
  * very expressions under test). Heavy — every fit runs — so the
  * sweep registers only when the suite is pointed at a cluster master
  * (SPARK_GRAFT_TEST_MASTER=local-cluster[2,1,1024]) or when
  * SPARK_GRAFT_SWEEP=1 opts in under local[4].
  */
class ClusterSweepSpec extends SparkSpec {
  private val enabled =
    SparkSpec.isCluster || sys.env.get("SPARK_GRAFT_SWEEP").contains("1")

  if (!enabled) {
    test("cluster sweep not requested (set SPARK_GRAFT_TEST_MASTER=local-cluster[2,1,1024] or SPARK_GRAFT_SWEEP=1)") {
      succeed
    }
  } else {
    SparkEntry.queries.keys.toSeq.sorted.foreach { name =>
      test(s"executes across the executor boundary: $name") {
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
    }
    test("flagship entry returns rows across the executor boundary") {
      assert(SparkEntry.entry(spark).count() > 0)
    }
  }
}
