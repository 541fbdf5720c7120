package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: `runMain graft.Explain <query>[,<query>…] [sfDir]`
  * prints each query's formatted physical plan — the same surface the
  * per-round plan audits and PlanRegressionSpec read. With no args it
  * audits every registered query; a failure in one query is reported and
  * the audit continues.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.isEmpty) SparkEntry.queries.keys.toSeq.sorted
      else args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      println(s"\n========== $name ==========")
      try SparkEntry.queries(name)(spark, dir).explain("formatted")
      catch {
        case e: Exception =>
          println(s"[explain failed] $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
