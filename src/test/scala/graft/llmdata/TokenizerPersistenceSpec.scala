package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.ModelIO

/** ModelIO round-trips for the four learned tokenizer families' tables
  * (BPE merges, byte-level BPE merges over the surrogate alphabet,
  * unigram-LM piece/score arrays, WordPiece vocabulary): a 100 TB run
  * trains the tokenizer ONCE and ships the table to every later job,
  * so save → load → encode must be indistinguishable from encoding
  * with the in-memory model. Encode equality is asserted over the
  * whole sf0.001 documents table through the REAL codegen encode
  * expressions (not just table equality — the loaded model must also
  * rebuild its transient lookup structures correctly).
  */
class TokenizerPersistenceSpec extends SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-tok").toString + s"/$name"

  private def assertEncodeEqual(mkCols: org.apache.spark.sql.Column => Seq[org.apache.spark.sql.Column]): Unit = {
    val docs = graft.core.Tables.documents(spark, sfDir).select(col("text"))
    val Seq(a, b) = mkCols(col("text"))
    val bad = docs.select(a.as("__a"), b.as("__b"))
      .where(not(col("__a") <=> col("__b")))
      .limit(1).collect()
    assert(bad.isEmpty, s"encode mismatch after round-trip: ${bad.mkString}")
  }

  test("BPE merge table round-trips; encode identical") {
    val merges = Bpe.trained(spark, sfDir)
    val path = tmp("bpe")
    ModelIO.save(spark, merges, path)
    val loaded = ModelIO.load[Seq[(String, String)]](spark, path)
    assert(loaded == merges)
    assertEncodeEqual(t => Seq(Bpe.encodeExpr(t, merges),
      Bpe.encodeExpr(t, loaded)))
  }

  test("byte-level BPE merge table round-trips (surrogate alphabet intact)") {
    val merges = ByteBpe.trained(spark, sfDir)
    val path = tmp("bytebpe")
    ModelIO.save(spark, merges, path)
    val loaded = ModelIO.load[Seq[(String, String)]](spark, path)
    assert(loaded == merges)
    // the byte alphabet rides ON the merge strings: every char must
    // survive serialization code-point-exact or decode breaks
    assert(loaded.flatMap(m => m._1 + m._2) == merges.flatMap(m => m._1 + m._2))
    assertEncodeEqual(t => Seq(ByteBpe.encodeExpr(t, merges),
      ByteBpe.encodeExpr(t, loaded)))
  }

  test("unigram piece/score arrays round-trip; lookup rebuilt; encode identical") {
    val model = Unigram.trained(spark, sfDir)
    val path = tmp("unigram")
    ModelIO.save(spark, model, path)
    val loaded = ModelIO.load[graft.functions.UnigramModel](spark, path)
    assert(loaded.pieces.toSeq == model.pieces.toSeq)
    assert(loaded.scores.toSeq == model.scores.toSeq)
    assert(loaded.unkScore == model.unkScore)
    // transient lookup/maxLen rebuild from the deserialized arrays
    assert(loaded.maxLen == model.maxLen)
    assertEncodeEqual(t => Seq(Unigram.encodeExpr(t, model),
      Unigram.encodeExpr(t, loaded)))
  }

  test("WordPiece vocabulary round-trips; encode identical") {
    val model = WordPiece.trained(spark, sfDir)
    val path = tmp("wordpiece")
    ModelIO.save(spark, model, path)
    val loaded = ModelIO.load[graft.functions.WordPieceModel](spark, path)
    assert(loaded.pieces.toSeq == model.pieces.toSeq)
    assertEncodeEqual(t => Seq(WordPiece.encodeExpr(t, model),
      WordPiece.encodeExpr(t, loaded)))
  }
}
