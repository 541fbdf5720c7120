package graft.quality

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ConstraintsSpec extends SparkSpec {
  import spark.implicits._
  import Constraints._

  private val dirty = Seq(
    (Some(1L), Some("a"), Some(5.0), "ok"),
    (Some(2L), Some("b"), Some(50.0), "ok"),
    (Some(2L), Some("c"), Some(500.0), "bad!"), // dup key, out of range
    (None, None, None, "ok"),                   // nulls everywhere
    (Some(4L), Some("zz"), Some(7.0), "ok"))    // zz not in set
    .map { case (k, s, v, t) => (k, s, v, t) }
    .toDF("k", "s", "v", "t")

  private def report(fks: Seq[(String, String,
      org.apache.spark.sql.DataFrame, String)] = Nil) =
    suite(dirty, Seq(notNull("k"), unique("k"), inRange("v", 0, 100),
        inSet("s", Seq("a", "b", "c")), matches("t", "^[a-z]+$")), fks)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getBoolean(4))).toMap

  test("each rule counts exactly its planted violations; nulls only fail completeness") {
    val r = report()
    assert(r("not_null(k)") == ((5L, 1L, false)))
    assert(r("unique(k)") == ((5L, 1L, false)))     // one extra duplicate
    assert(r("in_range(v)") == ((5L, 1L, false)))   // 500.0 only; null exempt
    assert(r("in_set(s)") == ((5L, 1L, false)))     // zz only; null exempt
    assert(r("matches(t)") == ((5L, 1L, false)))    // "bad!" only; null exempt
  }

  test("clean table passes every rule") {
    val clean = Seq((1L, "a", 5.0, "ok"), (2L, "b", 50.0, "fine"))
      .toDF("k", "s", "v", "t")
    val r = suite(clean, Seq(notNull("k"), unique("k"), inRange("v", 0, 100),
        inSet("s", Seq("a", "b")), matches("t", "^[a-z]+$")))
      .collect()
    assert(r.length == 5 && r.forall(_.getBoolean(4)))
    assert(r.forall(_.getDouble(3) == 0.0))
  }

  test("referential rule: missing keys counted, null FKs exempt") {
    val dim = Seq(1L, 2L).toDF("dk")
    val r = report(fks = Seq(("fk(k->dim)", "k", dim, "dk")))
    // keys present: 1,2,2,4 (null exempt) → violation is the 4
    assert(r("fk(k->dim)") == ((5L, 1L, false)))
  }

  test("FK-only suite works (no row rules to explode)") {
    val dim = Seq(1L, 2L).toDF("dk")
    val r = suite(dirty, Nil, fks = Seq(("fk(k->dim)", "k", dim, "dk")))
      .collect()
    assert(r.length == 1)
    assert(r(0).getLong(1) == 5L && r(0).getLong(2) == 1L)
  }

  test("duplicate rule names are rejected up front; renaming makes them coexist") {
    val ex = intercept[IllegalArgumentException] {
      suite(dirty, Seq(matches("t", "^a"), matches("t", "b$")))
    }
    assert(ex.getMessage.contains("matches(t)"))
    // the documented escape hatch: same kind, same column, one renamed
    val r = suite(dirty, Seq(matches("t", "^[a-z]"),
        matches("t", "[a-z]$").copy(name = "matches(t, suffix)")))
      .collect().map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(r.size == 2)
    assert(r("matches(t)") == 0L)          // every t starts lowercase
    assert(r("matches(t, suffix)") == 1L)  // "bad!" fails the suffix rule
  }

  test("a RENAMED unique rule still counts duplicates (kind is a field, not name-parsing)") {
    val r = suite(dirty, Seq(unique("k").copy(name = "pk_unique")))
      .collect().map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(r("pk_unique") == 1L) // k=2 duplicated once
  }

  test("FK rule works when fact and dim share the key column name") {
    val dim = Seq(1L, 2L).toDF("k") // same name as the fact column
    val r = suite(dirty, Nil, fks = Seq(("fk(k->dim.k)", "k", dim, "k")))
      .collect()
    assert(r.length == 1 && r(0).getLong(2) == 1L) // k=4 unmatched
  }

  test("all row-level rules share ONE scan of the table") {
    val plan = suite(dirty, Seq(notNull("k"), unique("k"),
        inRange("v", 0, 100), matches("t", "^[a-z]+$")))
      .queryExecution.executedPlan.toString
    val scans = "(LocalTableScan|FileScan|BatchScan)".r.findAllIn(plan).length
    assert(scans == 1, s"expected one scan:\n$plan")
  }
}
