package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{BpeCountText, BpeTokensText, DotProduct, LangIdText,
  MinhashSlices, MinhashText, SimhashLong, SimhashText}

/** Engine extension point (SURVEY §7.3): registers the custom Catalyst
  * expressions with the session so plain SQL can call them too. Activate
  * with `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — the Scala DSL surface in
  * `graft.ops` works either way (it binds the expressions directly).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("minhash_slices"),
      new ExpressionInfo(classOf[MinhashSlices].getName, "minhash_slices"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "minhash_slices(array<string>, k)")
        MinhashSlices(children.head, intLit(children(1), "minhash_slices k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("minhash_text"),
      new ExpressionInfo(classOf[MinhashText].getName, "minhash_text"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "minhash_text(text, n, k)")
        MinhashText(children.head,
          intLit(children(1), "minhash_text n"), intLit(children(2), "minhash_text k"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "dot_product(array<double>, array<double>)")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("intersect_count"),
      new ExpressionInfo(classOf[graft.functions.IntersectCount].getName,
        "intersect_count"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "intersect_count(array<string>, array<string>)")
        graft.functions.IntersectCount(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("langid_text"),
      new ExpressionInfo(classOf[LangIdText].getName, "langid_text"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "langid_text(text)")
        LangIdText(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_text"),
      new ExpressionInfo(classOf[SimhashText].getName, "simhash_text"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "simhash_text(text, bits)")
        SimhashText(children.head, intLit(children(1), "simhash_text bits"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("simhash_long"),
      new ExpressionInfo(classOf[SimhashLong].getName, "simhash_long"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "simhash_long(text, bits)")
        SimhashLong(children.head, intLit(children(1), "simhash_long bits"))
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpe_count_text"),
      new ExpressionInfo(classOf[BpeCountText].getName, "bpe_count_text"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "bpe_count_text(text)")
        BpeCountText(children.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("bpe_tokens_text"),
      new ExpressionInfo(classOf[BpeTokensText].getName, "bpe_tokens_text"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "bpe_tokens_text(text)")
        BpeTokensText(children.head)
      }))
  }
}
