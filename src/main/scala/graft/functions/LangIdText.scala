package graft.functions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused language-ID expression: whitespace-tokenize once, probe one
  * shared token→languages hash map per token, argmax with lexicographic
  * tie-break. The composed Catalyst form ([[graft.ops.TextOps.langId]]'s
  * differential twin) runs one interpreted higher-order `filter` pass
  * over the token array PER language profile; this is a single
  * codegen'd pass with O(1) per-token work regardless of profile count.
  * Null text → null. Zero hits everywhere → the lexicographically first
  * language (same as the composed form and the SQL oracle).
  */
case class LangIdText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "langid_text"

  protected override def nullSafeEval(input: Any): Any =
    LangIdText.compute(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LangIdText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LangIdText =
    copy(child = newChild)
}

object LangIdText {

  /** Languages in sorted order (the tie-break order) and one combined
    * stopword→language-indices map, built once per JVM from the same
    * profiles the composed form uses.
    */
  private val langs: Array[UTF8String] = {
    import graft.ops.TextOps.StopwordProfiles
    StopwordProfiles.keys.toArray.sorted.map(UTF8String.fromString)
  }
  private val tokenLangs: java.util.HashMap[String, Array[Int]] = {
    import graft.ops.TextOps.StopwordProfiles
    val sortedLangs = StopwordProfiles.keys.toArray.sorted
    val m = new java.util.HashMap[String, Array[Int]]()
    sortedLangs.zipWithIndex.foreach { case (lang, i) =>
      StopwordProfiles(lang).foreach { w =>
        m.merge(w, Array(i), (a, b) => a ++ b)
      }
    }
    m
  }

  def compute(text: UTF8String): UTF8String = {
    val toks = Md5Hex.sqlTrim(text.toString).split("\\s+", -1)
    val scores = new Array[Int](langs.length)
    var i = 0
    while (i < toks.length) {
      val hit = tokenLangs.get(toks(i))
      if (hit != null) {
        var j = 0
        while (j < hit.length) { scores(hit(j)) += 1; j += 1 }
      }
      i += 1
    }
    var best = 0
    var b = 1
    while (b < scores.length) {
      if (scores(b) > scores(best)) best = b
      b += 1
    }
    langs(best)
  }
}
