package graft.modelselection

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EpochShuffleSpec extends SparkSpec {

  private val n = 5000L
  private lazy val ids = spark.range(n).toDF("id")
  private lazy val shuffled =
    Splits.epochShuffle(ids, "id", epochs = 2, nShards = 8).cache()

  test("epochShuffle: pos is a bijection — no two docs collide, per epoch") {
    val d = shuffled.groupBy("epoch")
      .agg(countDistinct("pos").as("np"),
        countDistinct("shard", "pos").as("nsp"), count(lit(1)).as("c"))
      .collect()
    assert(d.length == 2)
    d.foreach { r =>
      assert(r.getAs[Long]("np") == n, "pos must be distinct per epoch")
      assert(r.getAs[Long]("nsp") == n)
      assert(r.getAs[Long]("c") == n)
    }
  }

  test("epochShuffle: deterministic — same (salt, epoch) reproduces the order") {
    val again = Splits.epochShuffle(ids, "id", epochs = 2, nShards = 8)
    assert(shuffled.except(again).isEmpty && again.except(shuffled).isEmpty)
  }

  test("epochShuffle: epochs decorrelate — near-zero rank correlation") {
    // Pearson correlation of the two epochs' pos values per doc: a
    // shared or shifted order would show |corr| near 1; independent
    // permutations sit near 0.
    val wide = shuffled.groupBy("id").pivot("epoch", Seq(0, 1)).sum("pos")
    val c = wide.agg(corr(col("0").cast("double"), col("1").cast("double")))
      .head().getDouble(0)
    assert(math.abs(c) < 0.05, s"epoch orders should decorrelate, corr=$c")
  }

  test("epochShuffle: shards balance within multinomial noise") {
    val sizes = shuffled.filter(col("epoch") === 0)
      .groupBy("shard").count().collect().map(_.getAs[Long]("count"))
    assert(sizes.length == 8)
    val expected = n.toDouble / 8
    // 4 sigma of Binomial(n, 1/8): sqrt(5000 * 1/8 * 7/8) ~ 23.4
    sizes.foreach(s =>
      assert(math.abs(s - expected) < 4 * math.sqrt(expected * 7.0 / 8),
        s"shard sizes ${sizes.mkString(",")} drifted from $expected"))
  }

  test("epochShuffle: pure projection — no shuffle in the plan") {
    val plan = Splits.epochShuffle(ids, "id", epochs = 3, nShards = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"must be scan-fused:\n$plan")
  }

  test("epochShuffle: injective on SPARSE ids too (bijection on the full domain)") {
    // the bijectivity claim is on [0, 2^60), not just contiguous
    // ranges — large scattered ids must map to distinct (shard, pos)
    val sparse = spark.range(2000).select(
      (col("id") * lit(1099511627776L + 7919L)).as("id")) // 2^40-ish stride, no overflow
    val out = Splits.epochShuffle(sparse, "id", epochs = 1, nShards = 16)
    assert(out.select("pos").distinct().count() == 2000)
    assert(out.select("shard", "pos").distinct().count() == 2000)
  }

  test("epochShuffle: every epoch appears, ids in [0, 2^60) preserved") {
    val epochs = Splits.epochShuffle(ids.limit(10), "id", epochs = 3,
      nShards = 4).select("epoch").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(epochs.sameElements(Array(0, 1, 2)))
  }

  override def afterAll(): Unit = {
    shuffled.unpersist()
    super.afterAll()
  }
}
