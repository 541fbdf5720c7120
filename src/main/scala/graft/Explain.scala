package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan for the named queries
  * (all queries if none given) — the `.explain("formatted")` audit loop
  * the build process uses to keep scans pruned, filters pushed, and
  * WholeStageCodegen spans wide.
  *
  * Usage: sbt "runMain graft.Explain <sfDir> q_a q_b ..."
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      try SparkEntry.queries(n)(spark, sfDir).explain("formatted")
      catch { case e: Throwable => println(s"failed: ${e.getMessage}") }
    }
    spark.stop()
  }
}
