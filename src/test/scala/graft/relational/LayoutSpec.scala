package graft.relational

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Morton-key layout: bit-level parity with a reference interleave,
  * the multi-dimensional skipping win itself, and the writer path's
  * partition discipline.
  */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def refInterleave(vals: Seq[Long], bits: Int): Long = {
    var z = 0L
    for (j <- vals.indices; i <- 0 until bits)
      z |= (((vals(j) & ((1L << bits) - 1)) >> i) & 1L) << (i * vals.size + j)
    z
  }

  test("zOrderKey matches the reference interleave bit for bit") {
    val rnd = new Random(11)
    val rows = Seq.fill(200)((rnd.nextInt(1 << 16).toLong,
      rnd.nextInt(1 << 16).toLong, rnd.nextInt(1 << 16).toLong))
    val got = rows.toDF("x", "y", "w")
      .select(col("x"), col("y"), col("w"),
        Layout.zOrderKey(Seq(col("x"), col("y"), col("w")), 16).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(3) ==
        refInterleave(Seq(r.getLong(0), r.getLong(1), r.getLong(2)), 16))
    }
  }

  test("zOrderKeySql is the same arithmetic (Spark SQL executes the oracle text)") {
    val rnd = new Random(13)
    val rows = Seq.fill(100)((rnd.nextInt(1 << 12).toLong, rnd.nextInt(1 << 12).toLong))
    val sql = Layout.zOrderKeySql(Seq("x", "y"), 12)
    val both = rows.toDF("x", "y")
      .select(Layout.zOrderKey(Seq(col("x"), col("y")), 12).as("a"),
        expr(sql).as("b"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("skipping win: z buckets bound BOTH dims; x-sort buckets span all of y") {
    // 64×64 uniform grid, 64 buckets. Under z-order each bucket is an
    // 8×8 quad-tree cell; under x-sort each bucket spans the full y
    // range. A predicate on y alone prunes 7/8 of z buckets and zero
    // x-sort buckets.
    val grid = (for (x <- 0 until 64; y <- 0 until 64) yield (x, y))
    val df = grid.toDF("x", "y")
    val z = Layout.zOrderBucketStats(df, Seq("x", "y"), bits = 6,
      bucketBits = 6).collect()
    assert(z.length == 64)
    z.foreach { r =>
      val (sx, sy) = (r.getAs[Int]("max_x") - r.getAs[Int]("min_x"),
        r.getAs[Int]("max_y") - r.getAs[Int]("min_y"))
      assert(sx == 7 && sy == 7, s"cell not 8x8: $r")
    }
    // the single-column layout every bucket spans y fully
    val xsort = df.withColumn("bucket", floor(col("x") / lit(1)))
      .groupBy((col("x") / 8).cast("int").as("bucket"))
      .agg(min("y").as("min_y"), max("y").as("max_y")).collect()
    xsort.foreach(r => assert(
      r.getAs[Int]("max_y") - r.getAs[Int]("min_y") == 63))
  }

  test("scaling fills the bit range even for narrow/offset domains") {
    // values 1000..1063 in x, 5..8 in y — raw masking would leave the
    // top bits constant and collapse the buckets
    val df = (for (x <- 1000 until 1064; y <- 5 until 9) yield (x, y))
      .toDF("x", "y")
    val stats = Layout.zOrderBucketStats(df, Seq("x", "y"), bits = 8,
      bucketBits = 4)
    assert(stats.count() == 16)
  }

  test("constant column scales to 0 without dividing by zero") {
    val df = (0 until 32).map(i => (i, 7)).toDF("x", "y")
    val stats = Layout.zOrderBucketStats(df, Seq("x", "y"), bits = 4,
      bucketBits = 2).collect()
    assert(stats.map(_.getAs[Long]("n")).sum == 32)
    stats.foreach(r => assert(r.getAs[Int]("min_y") == 7))
  }

  test("REAL parquet skipping: z-layout prunes row groups on the non-sort dim, x-sort cannot") {
    // write the same 2-D table under both layouts, query the dimension
    // a single-column sort does NOT cover, and read the scan's actual
    // output-row metric: parquet row-group stats prune under the
    // z-order layout, while every x-sorted file spans the full y range
    // and must be read end to end
    val grid = (for (x <- 0 until 128; y <- 0 until 128) yield (x, y))
    val df = grid.toDF("x", "y")
    val zDir = java.nio.file.Files.createTempDirectory("graft_z").toString
    val xDir = java.nio.file.Files.createTempDirectory("graft_x").toString
    Layout.zOrdered(df, Seq("x", "y"), bits = 7, numFiles = 16)
      .write.mode("overwrite").option("parquet.block.size", 4096).parquet(zDir)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").option("parquet.block.size", 4096).parquet(xDir)
    def scanRows(dir: String): (Long, Long) = {
      val q = spark.read.parquet(dir).filter(col("y") < 8)
      // collect() so the metrics land on THIS QueryExecution (count()
      // would plan and execute a separate one with its own metrics)
      val n = q.collect().length.toLong
      val scanned = q.queryExecution.executedPlan.collectLeaves()
        .flatMap(_.metrics.get("numOutputRows").map(_.value)).sum
      (n, scanned)
    }
    val (nZ, readZ) = scanRows(zDir)
    val (nX, readX) = scanRows(xDir)
    assert(nZ == 128 * 8 && nX == 128 * 8) // same answer either way
    info(s"rows read from parquet: z-layout $readZ, x-sort $readX")
    // x-sort reads (essentially) everything — a stray boundary row
    // group may prune by luck; z-order skips the row groups whose
    // y-range can't match
    assert(readX >= (128L * 128L * 95) / 100,
      s"x-sort should read ~all rows, read $readX")
    assert(readZ <= readX / 2, s"z-layout must skip: read $readZ of $readX")
  }

  test("zOrdered: requested file count, disjoint sorted key ranges per partition") {
    val rnd = new Random(17)
    val df = Seq.fill(4096)((rnd.nextInt(1000), rnd.nextInt(1000)))
      .toDF("x", "y")
    val laid = Layout.zOrdered(df, Seq("x", "y"), bits = 10, numFiles = 8)
    assert(laid.rdd.getNumPartitions == 8)
    // recompute the scaled key per row; partitions must hold sorted,
    // non-overlapping ranges (the property parquet footers rely on)
    val rows = laid.select("x", "y").collect().map(r => (r.getInt(0), r.getInt(1)))
    val (xs, ys) = (rows.map(_._1.toLong), rows.map(_._2.toLong))
    val (xmn, xmx, ymn, ymx) = (xs.min, xs.max, ys.min, ys.max)
    def key(x: Long, y: Long): Long = {
      val m = (1L << 10) - 1
      def sc(v: Long, mn: Long, mx: Long) =
        if (mx > mn) math.floor(((v - mn) * m).toDouble / (mx - mn)).toLong else 0L
      refInterleave(Seq(sc(x, xmn, xmx), sc(y, ymn, ymx)), 10)
    }
    // collect() preserves partition-major, within-partition row order;
    // group consecutively by partition id on the driver (no closure
    // ships, so the spec class never needs to serialize)
    val tagged = laid.select(spark_partition_id().as("pid"), col("x"), col("y"))
      .collect().map(r => (r.getInt(0), key(r.getInt(1), r.getInt(2))))
    val byPart = tagged.groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (pid, ks) => (pid, ks.map(_._2)) }
    byPart.foreach { case (pid, ks) =>
      assert(ks.sameElements(ks.sorted), s"partition $pid not curve-ordered") }
    byPart.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a.max <= b.min)
      case _ =>
    }
  }
}
