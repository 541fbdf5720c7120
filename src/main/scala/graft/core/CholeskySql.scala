package graft.core

/** DuckDB mirror of [[graft.functions.CholeskySolve]]: wraps an inner
  * normal-equation subquery (columns a_i_j for i ≤ j and b_i, plus any
  * key columns) in ONE nested `SELECT *, <expr> AS <col>` layer per
  * factorization value, dependency-ordered, so the top level exposes
  * the solution columns x_0..x_{d−1} beside the carried key columns.
  *
  * Why nested layers and not lateral column aliases: DuckDB implements
  * a lateral alias by INLINING the referenced expression, so a chained
  * dependency like Cholesky's explodes exponentially in d (measured:
  * d = 5 already takes ~6 s to bind); one subquery layer per column
  * keeps binding linear (d = 8 binds in ~50 ms).
  *
  * Exactness contract: each layer's expression is EXACTLY the kernel's
  * IEEE-754 op sequence (left-associated subtraction chains in
  * ascending k, one sqrt / one division per value — see
  * [[graft.functions.CholeskySolve.compute]]); verified bit-identical
  * against the kernel order over random round-6 systems at d = 4 and
  * d = 8. The solution is UNROUNDED — callers apply the house round-6
  * handoff, exactly where the engine rounds.
  */
object CholeskySql {

  /** (column name, defining expression) pairs in dependency order. The
    * `a`/`b` callbacks print the A(i,j) (i ≤ j) and b(i) operands —
    * plain aggregate column names by default, or composite forms like
    * `(g_i_j + s_i_j)` for the Gram-trick solve.
    */
  private def valueColumns(d: Int, lambda: Double,
      a: (Int, Int) => String,
      b: Int => String): Seq[(String, String)] = {
    val cols = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (j <- 0 until d) {
      val diagChain = (0 until j).map(k => s" - l_${j}_$k * l_${j}_$k")
        .mkString
      cols += (s"l_${j}_$j" -> s"sqrt(${a(j, j)} + $lambda$diagChain)")
      for (i <- j + 1 until d) {
        val chain = (0 until j).map(k => s" - l_${i}_$k * l_${j}_$k")
          .mkString
        cols += (s"l_${i}_$j" -> s"(${a(j, i)}$chain) / l_${j}_$j")
      }
    }
    for (i <- 0 until d) {
      val chain = (0 until i).map(k => s" - l_${i}_$k * z_$k").mkString
      cols += (s"z_$i" -> s"(${b(i)}$chain) / l_${i}_$i")
    }
    for (i <- d - 1 to 0 by -1) {
      val chain = (i + 1 until d).map(k => s" - l_${k}_$i * x_$k").mkString
      cols += (s"x_$i" -> s"(z_$i$chain) / l_${i}_$i")
    }
    cols.toSeq
  }

  /** The full nested-subquery expression: `inner` must be a
    * parenthesized subquery (or table name) exposing the a_i_j / b_i
    * operand columns. Returns a parenthesized subquery exposing
    * everything `inner` exposes plus l_*, z_*, x_*.
    */
  def nestedSolve(d: Int, lambda: Double, inner: String,
      a: (Int, Int) => String = (i, j) => s"a_${i}_$j",
      b: Int => String = i => s"b_$i"): String =
    valueColumns(d, lambda, a, b).foldLeft(inner) {
      case (q, (name, expr)) => s"(SELECT *, $expr AS $name FROM $q)"
    }
}
