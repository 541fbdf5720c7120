package graft.llmdata

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Incremental ANN ingest: index entries are a pure per-row function
  * of the trained (frozen) centroids/codebooks, so assigning shards
  * incrementally must equal re-indexing the whole corpus — and a
  * search over the incrementally-assembled index must equal one over
  * the full re-index.
  */
class AnnIngestSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16
  private val rnd = new Random(9)
  private val corpus: Seq[(Long, Seq[Double])] = (0L until 120L).map { i =>
    (i, Seq.fill(dim)(rnd.nextGaussian()))
  }
  private def df(rows: Seq[(Long, Seq[Double])]) = rows.toDF("id", "vec")

  // a frozen index trained on the FIRST shard only — later shards are
  // assigned without retraining
  private lazy val cents = Ann.ivfIndex(df(corpus.take(60)), "vec",
    nList = 4, dim = dim, sampleSize = 60, iters = 3, seed = 7)
  private lazy val cbs = Ann.pqTrain(df(corpus.take(60)), "vec",
    m = 4, ksub = 8, dim = dim, sampleSize = 60, iters = 3, seed = 7)

  private def entries(rows: Seq[(Long, Seq[Double])]) =
    Ann.ivfPqIndexEntries(df(rows), "id", "vec", cents, cbs)
      .select(col("id"), col("cell"), col("code").cast("string"),
        col("norm"))
      .as[(Long, Int, String, Double)].collect().sorted.toSeq

  test("incremental shard assignment equals the full re-index") {
    val (s1, rest) = corpus.splitAt(60)
    val (s2, s3) = rest.splitAt(40)
    val incremental = entries(s1) ++ entries(s2) ++ entries(s3)
    assert(incremental.sorted == entries(corpus))
  }

  test("entries are partition-independent") {
    val a = Ann.ivfPqIndexEntries(df(corpus).repartition(7), "id", "vec",
        cents, cbs)
      .select(col("id"), col("cell"), col("code").cast("string"))
      .as[(Long, Int, String)].collect().sorted.toSeq
    val b = Ann.ivfPqIndexEntries(df(corpus).repartition(1), "id", "vec",
        cents, cbs)
      .select(col("id"), col("cell"), col("code").cast("string"))
      .as[(Long, Int, String)].collect().sorted.toSeq
    assert(a == b)
  }

  test("search over an incrementally-ingested corpus equals the re-indexed one") {
    // ivf search assigns cells with the same frozen centroids the
    // ingest uses, so searching old+new equals searching a corpus that
    // was 'fully re-indexed' — pinned by running both unions
    val q = df(corpus.take(5))
    val full = Ann.ivfCosineTopK(df(corpus), q, "id", "vec", k = 3,
        cents, nProbe = 2)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().sorted.toSeq
    val unioned = Ann.ivfCosineTopK(
        df(corpus.take(60)).unionByName(df(corpus.drop(60))),
        q, "id", "vec", k = 3, cents, nProbe = 2)
      .select("query_id", "rank", "neighbor_id")
      .as[(Long, Int, Long)].collect().sorted.toSeq
    assert(full == unioned)
  }

  test("cell and code stay inside the trained vocabularies") {
    val e = Ann.ivfPqIndexEntries(df(corpus), "id", "vec", cents, cbs)
    val cells = e.select("cell").as[Int].collect()
    assert(cells.forall(c => c >= 0 && c < cents.length))
    val codes = e.select(explode(col("code"))).as[Int].collect()
    assert(codes.forall(c => c >= 0 && c < cbs(0).length))
    assert(e.count() == corpus.size)
  }
}
