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
