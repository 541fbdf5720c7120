package graft.relational

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Sinks

/** Flagship v8's composed last mile — Layout.zBucketed →
  * Sinks.writeShards — driven end to end on real files: the readback
  * manifest must equal the input-side manifest cell for cell, and the
  * MEASURED parquet rows-read under a multi-dimensional predicate must
  * beat a single-column-sorted write of the same data.
  */
class ZOrderWriteSpec extends SparkSpec {

  import spark.implicits._

  private lazy val grid =
    (for (x <- 0 until 96; y <- 0 until 96) yield (x.toLong, x, y))
      .toDF("id", "x", "y")

  test("z-bucketed shard write: readback manifest equals the input-side manifest") {
    val out = java.nio.file.Files.createTempDirectory("graft_zw").toString
    val bucketed = Layout.zBucketed(grid, Seq("x", "y"), bits = 7,
      bucketBits = 4)
    val readback = Sinks.writeShards(bucketed, out, shardCol = "zbucket",
      idCol = "id", sizeCol = "y", maxRecordsPerFile = 300)
    val input = Sinks.writtenManifest(bucketed, "zbucket", "id", "y")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).sortBy(_._1).toSeq
    assert(rows(readback) == rows(input))
    assert(readback.count() == 16) // 2^bucketBits cells, all populated
  }

  test("measured pruning: the z-bucketed write skips rows a 1-col sort must read") {
    val zDir = java.nio.file.Files.createTempDirectory("graft_zw_z").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft_zw_x").toString
    // the v8 path: cell-partitioned directories, one writer per cell
    Sinks.writeShards(
      Layout.zBucketed(grid, Seq("x", "y"), bits = 7, bucketBits = 6),
      zDir, shardCol = "zbucket", idCol = "id", sizeCol = "y",
      maxRecordsPerFile = 300)
    // the strawman: same data sorted on x only
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").option("parquet.block.size", 4096)
      .parquet(xDir)
    def scanRows(dir: String): (Long, Long) = {
      // the multi-dimensional trainer predicate: an id/x range AND a
      // token-count band — the case a 1-col sort cannot bound
      val q = spark.read.parquet(dir).filter(col("x") < 24 && col("y") < 24)
      val n = q.collect().length.toLong
      val scanned = q.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
      (n, scanned)
    }
    val (nZ, readZ) = scanRows(zDir)
    val (nX, readX) = scanRows(xDir)
    assert(nZ == 24 * 24 && nX == 24 * 24) // same answer either way
    info(s"rows read: z-bucketed $readZ, x-sorted $readX")
    assert(readZ <= readX / 2,
      s"z-bucketed write must skip row groups: read $readZ vs $readX")
  }

  test("a reader that maps its box to cells gets DIRECTORY pruning on top") {
    val out = java.nio.file.Files.createTempDirectory("graft_zw_d").toString
    val bucketed = Layout.zBucketed(grid, Seq("x", "y"), bits = 7,
      bucketBits = 4)
    Sinks.writeShards(bucketed, out, shardCol = "zbucket", idCol = "id",
      sizeCol = "y", maxRecordsPerFile = 300)
    // cells whose bounding box intersects the query box, from the same
    // deterministic bucket stats a catalog would keep
    val cells = Layout.zOrderBucketStats(grid, Seq("x", "y"), bits = 7,
        bucketBits = 4)
      .filter(col("min_x") < 24 && col("min_y") < 24)
      .select("bucket").as[Long].collect().toSeq
    assert(cells.size < 16, "the box must not touch every cell")
    val q = spark.read.parquet(out)
      .filter(col("zbucket").isin(cells: _*) &&
        col("x") < 24 && col("y") < 24)
    assert(q.collect().length == 24 * 24)
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("zbucket"),
      s"zbucket predicate must reach PartitionFilters:\n$scan")
  }
}
