package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint suite — the Deequ /
  * great-expectations shape (Schelter et al., "Automating Large-Scale
  * Data Quality Verification", VLDB'18): a batch of named constraints
  * verified against a table, reported as one row per rule.
  *
  * Scale shape: every row-level rule compiles to a conditional count
  * inside ONE aggregate — the whole suite costs a single scan of the
  * table regardless of how many rules it holds (uniqueness rides the
  * same aggregate as a count vs count-distinct delta). Referential
  * rules are the only ones that inherently need a second relation:
  * each is a left-anti equi-join count (dimension side deduplicated
  * to its keys; Catalyst broadcasts it when small, shuffles
  * otherwise).
  *
  * Null discipline: completeness is its own rule (`notNull`); value
  * rules (`inRange`/`inSet`/`matches`) do NOT double-count nulls as
  * violations — a null fails completeness, not the range check.
  */
object Constraints {

  /** A named row-level rule: `violation` is true on rows that break it.
    * `uniqueOn` marks uniqueness rules by the checked column (not by
    * name-parsing), so a rule renamed via `Check.copy(name = ...)`
    * keeps its semantics.
    */
  final case class Check(name: String, violation: Column,
      uniqueOn: Option[String] = None)

  def notNull(c: String): Check = Check(s"not_null($c)", col(c).isNull)

  def unique(c: String): Check = // counted via the distinct delta
    Check(s"unique($c)", lit(false), uniqueOn = Some(c))

  def inRange(c: String, lo: Double, hi: Double): Check =
    Check(s"in_range($c)",
      col(c).isNotNull && !(col(c) >= lit(lo) && col(c) <= lit(hi)))

  def inSet(c: String, values: Seq[String]): Check =
    Check(s"in_set($c)",
      col(c).isNotNull && !col(c).isin(values.map(_.asInstanceOf[Any]): _*))

  def matches(c: String, regex: String): Check =
    Check(s"matches($c)", col(c).isNotNull && !col(c).rlike(regex))

  /** Run the suite: one scan for all row-level rules, one anti-join per
    * referential rule (`fks` = (ruleName, factKeyCol, dimFrame,
    * dimKeyCol)). Output per rule: (rule, n_rows, n_violations,
    * violation_frac, passed).
    */
  /** The rules as aggregate columns — `__n` plus one `__v_<rule>`
    * count per check. Exposed so a STREAMING monitor can run the same
    * row-level rules as a complete-mode aggregation (conditional sums
    * are mergeable across micro-batches; `unique` is the exception —
    * exact distinct doesn't stream, so keep it batch-side).
    */
  def violationAggs(checks: Seq[Check]): Seq[Column] =
    count(lit(1)).as("__n") +:
      (checks.filter(_.uniqueOn.isEmpty).map(c =>
        sum(when(c.violation, 1L).otherwise(0L)).as(s"__v_${c.name}")) ++
        checks.collect { case Check(n, _, Some(c)) =>
          (count(col(c)) - countDistinct(col(c))).as(s"__v_$n") })

  def suite(df: DataFrame, checks: Seq[Check],
      fks: Seq[(String, String, DataFrame, String)] = Nil): DataFrame = {
    require(checks.nonEmpty || fks.nonEmpty, "empty constraint suite")
    val names = checks.map(_.name) ++ fks.map(_._1)
    require(names.distinct.size == names.size,
      "duplicate rule names — two rules of the same kind on one column " +
        "collide on the default name; rename one via Check.copy(name = " +
        s"...): ${names.diff(names.distinct).distinct.mkString(", ")}")
    val rowAggs = violationAggs(checks)
    val one = df.agg(rowAggs.head, rowAggs.tail: _*)

    // explode(array()) of zero structs is NullType — an FK-only suite
    // must skip the row-report branch entirely
    val rowReport =
      if (checks.isEmpty) None
      else Some(one.select(col("__n"), explode(array(checks.map(c =>
          struct(lit(c.name).as("rule"),
            col(s"__v_${c.name}").as("n_violations"))): _*)).as("__r"))
        .select(col("__r.rule").as("rule"), col("__n").as("n_rows"),
          col("__r.n_violations").as("n_violations")))

    val fkReports = fks.map { case (name, factKey, dim, dimKey) =>
      // alias the dim key: when fact and dim share the key's column
      // name the raw reference is ambiguous at analysis time
      val viol = df.select(col(factKey)).filter(col(factKey).isNotNull)
        .join(dim.select(col(dimKey).as("__dim_key")).distinct(),
          col(factKey) === col("__dim_key"), "left_anti")
        .agg(count(lit(1)).as("n_violations"))
      viol.crossJoin(broadcast(one.select(col("__n").as("n_rows"))))
        .select(lit(name).as("rule"), col("n_rows"), col("n_violations"))
    }

    (rowReport.toSeq ++ fkReports).reduce(_ unionByName _)
      .select(col("rule"), col("n_rows"), col("n_violations"),
        round(col("n_violations").cast("double") /
          col("n_rows").cast("double"), 6).as("violation_frac"),
        (col("n_violations") === 0).as("passed"))
  }
}
