package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.MinhashSlices

/** Engine extension point (SURVEY §7.3): registers the custom Catalyst
  * expressions with the session so plain SQL can call them too. Activate
  * with `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — the Scala DSL surface in
  * `graft.ops` works either way (it binds the expressions directly).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("minhash_slices"),
      new ExpressionInfo(classOf[MinhashSlices].getName, "minhash_slices"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "minhash_slices(array<string>, k)")
        val k = children(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(
            s"minhash_slices k must be an integer literal, got $other")
        }
        MinhashSlices(children.head, k)
      }))
  }
}
