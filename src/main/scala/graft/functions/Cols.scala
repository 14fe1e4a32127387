package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression helpers. */
object Cols {

  /** Let-binding for Column expressions: evaluate `e` ONCE per row and
    * bind the result as a lambda variable inside `f`.
    *
    * Catalyst re-evaluates an expression TREE every time it appears in
    * a higher-order-function lambda body — a non-trivial `e` referenced
    * inside a per-element lambda (or referenced k times in one
    * projection expression) multiplies its cost by the element count /
    * k. Wrapping it as the element of a one-element array forces a
    * single evaluation: the lambda variable is a bound attribute, not a
    * tree. (Measured: SimHash sketch dropped ~30× when the per-token
    * md5 stopped being recomputed per bit.)
    */
  def let(e: Column)(f: Column => Column): Column =
    element_at(transform(array(e), x => f(x)), 1)

  /** Two-value let. */
  def let2(e1: Column, e2: Column)(f: (Column, Column) => Column): Column =
    let(struct(e1.as("_1"), e2.as("_2")))(s =>
      f(s.getField("_1"), s.getField("_2")))
}
