package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.llmdata.Dedup

/** Dev profiling main: stage-by-stage timing of the hottest queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    // warmup
    Tables.lineitem(spark, sfDir).count()

    println("== minhash breakdown ==")
    val docs = t("read docs")(Tables.documents(spark, sfDir).cache())
    t("docs count")(docs.count())
    val sh = Dedup.shingles(docs, "text", "doc_id").cache()
    t("shingles")(println(s"    n=${sh.count()}"))
    val sigs = t("signatures")(Dedup.minhashSignatures(docs, "text", "doc_id", 8))
    t("sigs materialize")(sigs.write.format("noop").mode("overwrite").save())
    val bands = Dedup.bandHashes(sigs, "doc_id", 8, 2)
    val cands = Dedup.candidatePairs(bands, "doc_id")
    t("candidates")(println(s"    n=${cands.count()}"))
    val jac = Dedup.jaccard(cands, sh, "doc_id")
    t("jaccard")(println(s"    n=${jac.count()}"))
    t("full pipeline")(
      Dedup.minhashNearDupPairs(docs, "text", "doc_id", 0.8)
        .write.format("noop").mode("overwrite").save())

    println("== quantile transform breakdown ==")
    val li = Tables.lineitem(spark, sfDir)
    val qt = t("fit")(new graft.preprocessing.QuantileTransformer(
      Seq("l_extendedprice"), nQuantiles = 200).fit(li))
    t("transform")(qt.transform(li).write.format("noop").mode("overwrite").save())

    println("== kmeans breakdown ==")
    val km = t("fit")(new graft.cluster.KMeans(
      Seq("l_quantity", "l_extendedprice", "l_discount"), 4, seed = 42).fit(li))
    println(s"    iters=${km.nIter}")
    t("predict")(km.transform(li).write.format("noop").mode("overwrite").save())

    spark.stop()
  }
}
