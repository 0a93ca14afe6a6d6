package graft.functions

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HTML → plain-text extraction — the front door of a crawled-corpus
  * pipeline (the text ops x1–x29 and [[graft.ops.CorpusOps.curate]]
  * assume extracted text; crawls arrive as markup). One fused
  * expression, zero shuffle, null in → null out.
  *
  * The extraction law is a FIXED, SQL-replayable chain (each step is a
  * global regex replace; the DuckDB oracle replays the identical chain):
  *
  *  1. strip comments        `(?is)<!--.*?-->`            → " "
  *  2. strip script blocks   `(?is)<script\b[^>]*>.*?</script>` → " "
  *  3. strip style blocks    `(?is)<style\b[^>]*>.*?</style>`   → " "
  *  4. strip remaining tags  `(?s)<[^>]*>`                → " "
  *  5. decode named entities lt gt quot apos #39 (nbsp → space)
  *  6. decode `&amp;` LAST — so `&amp;lt;` yields the literal text
  *     "&lt;", never a second-round "<"
  *  7. collapse `\s+` to one space, trim
  *
  * Tags are stripped BEFORE entities decode, so decoded angle brackets
  * are literal text, not markup — the standard order. Deliberately NOT
  * a full HTML5 parser: no numeric character references, no CDATA, and
  * an unclosed script/style block degrades to tag-stripping its open
  * tag (deterministic on both engines). Patterns are precompiled per
  * JVM; the composed `regexp_replace` twin
  * ([[graft.ops.TextOps.htmlToTextComposed]]) re-plans seven passes
  * with per-row pattern state — this is one call.
  */
case class HtmlText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "html_text"

  protected override def nullSafeEval(input: Any): Any =
    HtmlText.compute(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlText.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): HtmlText =
    copy(child = newChild)
}

object HtmlText {

  /** (pattern, replacement) chain — order is the contract (see class
    * doc); `&amp;` must come after every other entity.
    */
  val Steps: Seq[(String, String)] = Seq(
    "(?is)<!--.*?-->" -> " ",
    "(?is)<script\\b[^>]*>.*?</script>" -> " ",
    "(?is)<style\\b[^>]*>.*?</style>" -> " ",
    "(?s)<[^>]*>" -> " ",
    "&lt;" -> "<",
    "&gt;" -> ">",
    "&quot;" -> "\"",
    "&apos;" -> "'",
    "&#39;" -> "'",
    "&nbsp;" -> " ",
    "&amp;" -> "&",
    "\\s+" -> " ")

  private val compiled: Array[(Pattern, String)] =
    Steps.map { case (p, r) =>
      (Pattern.compile(p), java.util.regex.Matcher.quoteReplacement(r))
    }.toArray

  def compute(html: UTF8String): UTF8String = {
    var s = html.toString
    var i = 0
    while (i < compiled.length) {
      s = compiled(i)._1.matcher(s).replaceAll(compiled(i)._2)
      i += 1
    }
    UTF8String.fromString(s.trim)
  }
}
