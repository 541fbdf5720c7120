package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec

class KmvSpec extends SparkSpec {

  import Sketches.{kmvEstimate, kmvMerge, kmvSetOps, kmvSketch}

  private def frameRows(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "pos", "h").collect()
      .map(r => (r.get(0).toString, r.getInt(1).toLong, r.getLong(2)))
      .sortBy(identity).toSeq

  /** Independent h60 replay (MessageDigest, no Spark). */
  private def h60(salt: String, key: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest((salt + key).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  test("sketch is the exact distinct bottom-k, duplicates never evict") {
    import spark.implicits._
    // a hot key repeated 1000× plus 50 singles: the sketch must hold
    // the 8 smallest DISTINCT hashes, not 8 copies of the hot key
    val rows = Seq.fill(1000)("hot") ++ (1 to 50).map(i => s"key$i")
    val df = rows.toDF("k").withColumn("g", lit("x"))
    val sk = kmvSketch(df, col("g"), col("k"), "spec", k = 8)
    val got = frameRows(sk)
    val expected = rows.distinct
      .map(k => h60("spec", k))
      .sorted.take(8).zipWithIndex
      .map { case (h, i) => ("x", (i + 1).toLong, h) }.sorted
    assert(got == expected)
  }

  test("merge of any shard split is frame-identical to the whole sketch") {
    import spark.implicits._
    val df = (1 to 5000).map(i => s"v$i").toDF("k")
      .withColumn("g", pmod(col("k").substr(2, 10).cast("long"), lit(3)))
    val whole = kmvSketch(df, col("g"), col("k"), "m", k = 64)
    val s1 = kmvSketch(df.filter(col("k").substr(2, 10).cast("long") % 2 === 0),
      col("g"), col("k"), "m", k = 64)
    val s2 = kmvSketch(df.filter(col("k").substr(2, 10).cast("long") % 2 === 1),
      col("g"), col("k"), "m", k = 64)
    assert(frameRows(kmvMerge(s1, s2, k = 64)) == frameRows(whole))
    // idempotent too
    assert(frameRows(kmvMerge(whole, whole, k = 64)) == frameRows(whole))
  }

  test("estimate is exact below k and within the KMV band above") {
    import spark.implicits._
    val small = (1 to 40).map(i => ("small", s"s$i"))
    val big = (1 to 20000).map(i => ("big", s"b$i"))
    val df = (small ++ big).toDF("g", "k")
    val est = kmvEstimate(
        kmvSketch(df, col("g"), col("k"), "e", k = 256), k = 256)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    assert(est("small") == ((40L, 40.0)), "below k the sketch IS the set")
    val (nSeen, e) = est("big")
    assert(nSeen == 256L)
    // σ ≈ D/√(k−2): 20000/16 = 1250; allow 4σ
    assert(math.abs(e - 20000.0) < 5000.0, s"estimate $e too far from 20000")
  }

  test("set operations: exact when both sides are below k, sane above") {
    import spark.implicits._
    // A = 1..60, B = 41..120 → |A∩B| = 20, |A∪B| = 120
    val df = ((1 to 60).map(i => ("a", s"k$i"))
      ++ (41 to 120).map(i => ("b", s"k$i"))).toDF("g", "k")
    val sk = kmvSketch(df, col("g"), col("k"), "s", k = 256)
    val row = kmvSetOps(sk, "a", "b", k = 256).head()
    assert(row.getAs[Long]("n_both") == 20L)
    assert(row.getAs[Double]("union_est") == 120.0)
    assert(row.getAs[Double]("intersection_est") == 20.0)
    assert(row.getAs[Double]("difference_a_est") == 40.0)
    assert(row.getAs[Double]("jaccard_est") ~== (20.0 / 120.0, 1e-6))

    // above k: 5000 shared + 5000 only-A + 5000 only-B, k = 256
    val big = ((1 to 10000).map(i => ("a", s"x$i"))
      ++ (5001 to 15000).map(i => ("b", s"x$i"))).toDF("g", "k")
    val bsk = kmvSketch(big, col("g"), col("k"), "s2", k = 256)
    val b = kmvSetOps(bsk, "a", "b", k = 256).head()
    val inter = b.getAs[Double]("intersection_est")
    val union = b.getAs[Double]("union_est")
    assert(math.abs(union - 15000.0) < 4000.0, s"union_est $union")
    assert(math.abs(inter - 5000.0) < 2500.0, s"intersection_est $inter")
    assert(b.getAs[Double]("jaccard_est") > 0.15
      && b.getAs[Double]("jaccard_est") < 0.55)
  }

  test("the estimator is scale-stable across k (threshold consistency)") {
    import spark.implicits._
    val df = (1 to 8000).map(i => ("g", s"z$i")).toDF("g", "k")
    for (k <- Seq(64, 128, 512)) {
      val e = kmvEstimate(kmvSketch(df, col("g"), col("k"), "t", k), k)
        .head().getDouble(2)
      assert(math.abs(e - 8000.0) < 8000.0 * 6.0 / math.sqrt(k.toDouble),
        s"k=$k estimate $e outside 6σ")
    }
  }
}
