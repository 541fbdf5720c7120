package graft.sources

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SinksSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 500L)
    .map(i => (i, s"shard${i % 4}", 10L + i % 37))
    .toDF("doc_id", "shard", "n_chars")

  private def parquetFiles(dir: Path): Seq[Path] =
    Files.walk(dir).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet")).toSeq

  test("roundtrip: readback content equals input, shard column restored") {
    val out = Files.createTempDirectory("graft_sink_spec").toString
    Sinks.writeShards(docs, out, "shard", "doc_id", "n_chars",
      maxRecordsPerFile = 50)
    val back = spark.read.parquet(out)
      .select("doc_id", "shard", "n_chars")
      .as[(Long, String, Long)].collect().sortBy(_._1)
    val in = docs.as[(Long, String, Long)].collect().sortBy(_._1)
    assert(back.sameElements(in))
  }

  test("shardDelta: identical manifests are all unchanged; each edit kind gets its status") {
    val cur = Sinks.writtenManifest(docs, "shard", "doc_id", "n_chars")
    val same = Sinks.shardDelta(cur, cur, "shard").collect()
    assert(same.length == 4 && same.forall(_.getString(1) == "unchanged"))
    // previous snapshot: shard1 missing a doc (changed), shard2 absent
    // entirely (added), plus a retired shard (removed)
    val prev = Sinks.writtenManifest(
        docs.filter(col("doc_id") =!= 1L && col("shard") =!= "shard2"),
        "shard", "doc_id", "n_chars")
      .unionByName(Seq(("shard9", 3L, 30L, 42L))
        .toDF("shard", "n_docs", "total_size", "checksum"))
    val d = Sinks.shardDelta(prev, cur, "shard").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(d == Map("shard0" -> "unchanged", "shard1" -> "changed",
      "shard2" -> "added", "shard3" -> "unchanged", "shard9" -> "removed"))
  }

  test("spliceByDelta: unchanged kept from prev, added/changed from fresh, removed dropped") {
    val prevResult = Seq(("shard0", "old0"), ("shard1", "old1"),
      ("shard9", "old9")).toDF("shard", "payload")
    val freshResult = Seq(("shard0", "new0"), ("shard1", "new1"),
      ("shard2", "new2")).toDF("shard", "payload")
    val delta = Seq(("shard0", "unchanged"), ("shard1", "changed"),
      ("shard2", "added"), ("shard9", "removed"))
      .toDF("shard", "status")
      .withColumn("n_prev", lit(0L)).withColumn("n_cur", lit(0L))
    val out = Sinks.spliceByDelta(prevResult, freshResult, delta, "shard")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("shard0", "old0"), ("shard1", "new1"),
      ("shard2", "new2")))
  }

  test("zero-padded NUMERIC-LOOKING string shards round-trip the manifest exactly") {
    // partition inference would read shard '07' back as int 7 (and a
    // cast can't restore the padding); the explicit-schema readback
    // must keep the raw string keys
    val padded = (1L to 40L).map(i => (i, f"${i % 4}%02d", 5L))
      .toDF("doc_id", "shard", "n_chars")
    val out = Files.createTempDirectory("graft_sink_pad").toString
    val readback = Sinks.writeShards(padded, out, "shard", "doc_id",
      "n_chars", maxRecordsPerFile = 50)
    val input = Sinks.writtenManifest(padded, "shard", "doc_id", "n_chars")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(rows(readback) == rows(input))
    assert(rows(readback).map(_._1) == Seq("00", "01", "02", "03"))
  }

  test("maxRecordsPerFile bounds every file; one writer per shard still splits") {
    val out = Files.createTempDirectory("graft_sink_spec").toString
    Sinks.writeShards(docs, out, "shard", "doc_id", "n_chars",
      maxRecordsPerFile = 50)
    val files = parquetFiles(java.nio.file.Paths.get(out))
    assert(files.nonEmpty)
    files.foreach { f =>
      val n = spark.read.parquet(f.toString).count()
      assert(n <= 50, s"$f has $n rows > 50")
    }
    // 125 rows per shard at cap 50 → at least 3 files per shard dir
    val perShard = files.groupBy(_.getParent.getFileName.toString)
    assert(perShard.size == 4)
    perShard.foreach { case (s, fs) => assert(fs.size >= 3, s"$s: ${fs.size}") }
  }

  test("returned manifest equals the input-side manifest (nothing lost in flight)") {
    val out = Files.createTempDirectory("graft_sink_spec").toString
    val written = Sinks.writeShards(docs, out, "shard", "doc_id", "n_chars")
      .orderBy("shard").collect()
    val input = Sinks.writtenManifest(docs, "shard", "doc_id", "n_chars")
      .orderBy("shard").collect()
    assert(written.sameElements(input))
  }

  test("tamper evidence: deleting one file flips exactly that shard's manifest row") {
    val out = Files.createTempDirectory("graft_sink_spec")
    val before = Sinks.writeShards(docs, out.toString, "shard", "doc_id",
        "n_chars", maxRecordsPerFile = 50)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    val victim = parquetFiles(out).head
    val victimShard = victim.getParent.getFileName.toString.split("=")(1)
    Files.delete(victim)
    val after = Sinks.writtenManifest(
        spark.read.parquet(out.toString), "shard", "doc_id", "n_chars")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(3))).toMap
    assert(after(victimShard) != before(victimShard))
    (before.keySet - victimShard).foreach(s => assert(after(s) == before(s)))
  }
}
