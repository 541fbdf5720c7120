package graft.relational

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Source/sink round-trips for the formats a pipeline ingests besides
  * parquet: CSV with explicit schema + header, JSON lines, and
  * partitioned parquet with partition-pruned reads (the layout the
  * engine writes training shards in).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def withTmp[A](f: String => A): A = {
    val dir = Files.createTempDirectory("graft-sources").toFile
    try f(dir.getAbsolutePath)
    finally org.apache.commons.io.FileUtils.deleteQuietly(dir)
  }

  private val rows = Seq(
    (1L, "alpha", 1.5, "en"), (2L, "beta", -2.25, "de"),
    (3L, "gamma, with comma", 0.0, "en"), (4L, "delta \"quoted\"", 9.75, "fr"))

  test("CSV round-trip: schema, header, quoting") {
    withTmp { dir =>
      val df = rows.toDF("id", "name", "score", "lang")
      df.write.mode("overwrite").option("header", "true").csv(s"$dir/csv")
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("name", StringType),
        StructField("score", DoubleType), StructField("lang", StringType)))
      val back = spark.read.schema(schema).option("header", "true")
        .csv(s"$dir/csv")
        .as[(Long, String, Double, String)].collect().sortBy(_._1).toSeq
      assert(back == rows)
    }
  }

  test("JSON-lines round-trip preserves values and types") {
    withTmp { dir =>
      rows.toDF("id", "name", "score", "lang")
        .write.mode("overwrite").json(s"$dir/json")
      val back = spark.read.json(s"$dir/json")
        .select(col("id").cast("long"), col("name"),
          col("score").cast("double"), col("lang"))
        .as[(Long, String, Double, String)].collect().sortBy(_._1).toSeq
      assert(back == rows)
    }
  }

  test("partitioned parquet: lang= dirs exist and pruning hits one partition") {
    withTmp { dir =>
      rows.toDF("id", "name", "score", "lang")
        .write.mode("overwrite").partitionBy("lang").parquet(s"$dir/pq")
      val dirs = new java.io.File(s"$dir/pq").listFiles()
        .filter(_.isDirectory).map(_.getName).sorted.toSeq
      assert(dirs == Seq("lang=de", "lang=en", "lang=fr"))
      val en = spark.read.parquet(s"$dir/pq").filter(col("lang") === "en")
      // partition pruning: the filter must reach PartitionFilters, and
      // only the en rows come back
      val plan = en.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters"), plan)
      assert(en.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    }
  }

  test("ORC round-trip preserves values; predicate pushes to the ORC scan") {
    withTmp { dir =>
      val df = rows.toDF("id", "name", "score", "lang")
      df.write.orc(s"$dir/orc")
      val back = spark.read.orc(s"$dir/orc")
      assert(back.orderBy("id").as[(Long, String, Double, String)]
        .collect().toSeq == rows)
      val filtered = back.filter(col("id") > 2L)
      val plan = filtered.queryExecution.executedPlan.toString
      assert(plan.contains("PushedFilters") && plan.contains("GreaterThan"), plan)
      assert(filtered.count() == 2)
    }
  }
}
