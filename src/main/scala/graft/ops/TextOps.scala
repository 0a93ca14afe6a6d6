package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, shingling, language-ID, quality scoring, fingerprinting.
  *
  * Everything here is pure Catalyst array/string expressions — no UDFs,
  * no explode unless noted — so each op is a narrow, codegen'd map over
  * the documents table: at 100 TB these scan-local ops scale linearly
  * with input splits and shuffle nothing.
  */
object TextOps {

  /** Whitespace tokenization (token = maximal non-space run). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** HTML → plain text ([[graft.functions.HtmlText]]): strip
    * comments/script/style/tags, decode the named entities (`&amp;`
    * last), collapse whitespace. The extraction front door that makes
    * the x1–x29 text ops and [[CorpusOps.curate]] runnable on raw
    * crawl. Narrow, codegen'd, precompiled patterns.
    */
  def htmlToText(html: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.HtmlText(
      GraftColumnBridge.expression(html)))
  }

  /** Composed Catalyst twin of [[htmlToText]] — the identical
    * replace chain as built-in `regexp_replace` steps, kept for the
    * differential spec that pins the native kernel to public-operator
    * semantics.
    */
  private[graft] def htmlToTextComposed(html: Column): Column =
    trim(graft.functions.HtmlText.Steps.foldLeft(html) {
      case (c, (pat, rep)) => regexp_replace(c, pat, rep)
    })

  /** BPE-ish subword count: word-piece regex splits on letter/digit/other
    * boundaries — a cheap stand-in for tokenizer-aware counting.
    */
  def subwordCount(text: Column): Column =
    size(split(trim(text), "\\s+|(?<=[a-z])(?=[0-9])|(?<=[0-9])(?=[a-z])"))

  /** REAL merge-driven BPE token count ([[graft.functions.BpeCountText]],
    * fixture vocabulary [[graft.functions.BpeVocab.DefaultMerges]]) —
    * the token-budget unit an LLM pipeline actually bills by, vs the
    * whitespace approximation of [[tokens]]/[[subwordCount]]. Narrow,
    * codegen'd, per-word memoized.
    */
  def bpeCount(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.BpeCountText(
      GraftColumnBridge.expression(text)))
  }

  /** Full BPE token stream (array<string>), word-boundary preserving. */
  def bpeTokens(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.BpeTokensText(
      GraftColumnBridge.expression(text)))
  }

  /** BYTE-level BPE token count (GPT-2-style regex pre-tokenization,
    * bytes as the merge alphabet — [[graft.functions.ByteBpeCountText]],
    * fixture vocabulary [[graft.functions.ByteBpeVocab]]): what
    * production token counts look like — punctuation never glues to
    * words and any UTF-8 survives. Narrow, codegen'd, memoized.
    */
  def byteBpeCount(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.ByteBpeCountText(
      GraftColumnBridge.expression(text)))
  }

  /** Full byte-BPE token stream (array<string>, latin-1 byte strings),
    * pre-token-boundary preserving.
    */
  def byteBpeTokens(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.ByteBpeTokensText(
      GraftColumnBridge.expression(text)))
  }

  /** Tokenizer compression ratio in exact half-up millionths:
    * chars-per-BPE-token × 10⁶ — the standard gibberish/garbage gate
    * (normal text compresses well under a learned vocabulary; random
    * characters, base64 blobs, and wrong-script text do not, so a LOW
    * ratio flags junk). All-integer half-up division, so any engine
    * reproduces it byte-exactly. Null text → null; empty/whitespace
    * text → 0 (zero tokens would divide by zero — callers gate on it).
    */
  def bpeCompressionMillionths(text: Column): Column = {
    val chars = length(text).cast("long")
    val toks = bpeCount(text)
    when(toks > 0, exactDiv(chars * 2000000L + toks, toks * 2L))
      .otherwise(lit(0L))
  }

  /** Adjacent token pairs as array<struct<w1, w2>> built NARROWLY
    * inside the token array (`zip_with` over two shifted slices) — the
    * shared bigram idiom of the LM-scoring / PMI / bigram-count family
    * (one definition, so the Spark sides of those oracles can never
    * drift apart). Empty array for docs with < 2 tokens.
    */
  def adjacentPairs(text: Column): Column = {
    val a = tokens(text)
    val n1 = greatest(size(a) - 1, lit(0))
    zip_with(slice(a, lit(1), n1), slice(a, lit(2), n1),
      (x, y) => struct(x.as("w1"), y.as("w2")))
  }

  /** Word n-gram shingles; empty array when the doc has fewer than n
    * tokens. Native fused expression ([[graft.functions.ShinglesText]]):
    * tokenize once, one pass — the composed form below re-slices the
    * token array per output position, interpreted.
    */
  def shingles(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.ShinglesText(
      GraftColumnBridge.expression(text), n))
  }

  /** Composed-builtin twin of [[shingles]] (differential test anchor). */
  private[graft] def shinglesComposed(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(array().cast("array<string>"))
  }

  /** In-document repetition: fraction of n-gram occurrences that repeat
    * an earlier n-gram (1 − distinct/total) — the standard "duplicated
    * n-grams" quality signal for filtering boilerplate/template text.
    * Narrow (one shingle pass + a distinct over a per-row array), zero
    * shuffle; 0.0 for docs shorter than n tokens.
    */
  def repetitionRatio(text: Column, n: Int = 3): Column = {
    val sh = shingles(text, n)
    when(size(sh) > 0,
      lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh).cast("double"))
      .otherwise(lit(0.0))
  }

  /** [[repetitionRatio]] in exact half-up millionths (same engine-proof
    * integer arithmetic as [[qualityScoreMillionths]] — the double form
    * rounds at a knife edge that eventually lands on a cross-engine
    * .5 boundary).
    */
  def repetitionMillionths(text: Column, n: Int = 3): Column = {
    val sh = shingles(text, n)
    val total = size(sh).cast("long")
    val dup = total - size(array_distinct(sh)).cast("long")
    when(total > 0, exactDiv(dup * 2000000L + total, total * 2L))
      .otherwise(lit(0L))
  }

  /** Stopword profiles for the n-gram/stopword language-ID heuristic. */
  val StopwordProfiles: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "y", "en", "es", "que", "los"),
    "fr" -> Seq("le", "la", "de", "et", "en", "est", "que", "les"),
    "zh" -> Seq("de", "le", "shi", "bu", "wo", "you", "zhe", "ren"))

  /** Occurrences of profile stopwords among the tokens. */
  def stopwordHits(toks: Column, profile: Seq[String]): Column =
    size(filter(toks, t => t.isin(profile.map(x => x: Any): _*)))

  /** Predicted language = argmax of profile hit counts, lexicographic
    * tie-break (deterministic). Native fused expression
    * ([[graft.functions.LangIdText]]): one codegen'd pass, one hash
    * probe per token — the composed form below runs one interpreted
    * higher-order filter per language profile.
    */
  def langId(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.LangIdText(
      GraftColumnBridge.expression(text)))
  }

  /** The composed-builtin language-ID — kept as the differential-test
    * twin of the native expression.
    */
  private[graft] def langIdComposed(text: Column): Column = {
    val toks = tokens(text)
    val scores = StopwordProfiles.toSeq.sortBy(_._1)
      .map { case (lang, prof) => lang -> stopwordHits(toks, prof) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldLeft(lit(null).cast("string")) { case (acc, (lang, score)) =>
      coalesce(acc, when(score === best, lit(lang)))
    }
  }

  /** The quality score in exact MILLIONTHS (a long): the same formula
    * as [[qualityScore]] evaluated as one rational N/D over a common
    * integer denominator, rounded half-up with integer division — so
    * the value is bit-identical across engines and partitionings.
    * Motivation: the double form rounds at a 1e-6 knife edge, and at
    * sf0.1 two of 5000 documents landed exactly on a .5 boundary where
    * Spark's BigDecimal HALF_UP and DuckDB's double-multiply rounding
    * disagree. Exactness: the division goes through decimal(38,0)
    * (see [[exactDiv]]) so it is exact for the full long range; the
    * numerator itself only overflows Long beyond
    * nTokens·nChars ≈ 5·10^11 (multi-megabyte documents — far past any
    * per-document text this engine targets).
    */
  def qualityScoreMillionths(text: Column): Column = {
    val toks = tokens(text)
    val nt = size(toks).cast("long")
    val stop = stopwordHits(toks, StopwordProfiles("en")).cast("long")
    val nch = length(text).cast("long")
    val dig = length(regexp_replace(text, "[^0-9]", "")).cast("long")
    // 0.4·min(4·stop/nt, 1) + 0.3·(1 − dig/nch) + 0.3·min((nch−nt+1)/(8·nt), 1)
    val t1 = least(stop * 4, nt)           // numerator over nt
    val t3 = least(nch - nt + 1, nt * 8)   // numerator over 8·nt
    val n = lit(400000L) * t1 * 8L * nch +
      lit(300000L) * (nch - dig) * 8L * nt +
      lit(300000L) * t3 * nch
    val d = lit(8L) * nt * nch
    // half-up: floor(N/D + 1/2) = (2N + D) div (2D)
    exactDiv(n * 2L + d, d * 2L)
  }

  /** Exact long division x div y (x, y ≥ 0, y > 0, x exactly divisible
    * after remainder subtraction). No integral-div Column op exists;
    * a double division is only exact below 2^53, so route the
    * remainder-subtracted numerator through decimal(38,0) division —
    * exact for the full long range (the quotient is an exact integer,
    * so the result scale rounding never fires).
    */
  private[graft] def exactDiv(x: Column, y: Column): Column =
    ((x - pmod(x, y)).cast("decimal(38,0)") / y.cast("decimal(38,0)"))
      .cast("long")

  /** Quality-score inputs + composite score in [0,1]: rewards stopword
    * density and moderate token length, penalizes digit load. All
    * ratios are exact-int / exact-int in double — deterministic.
    */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nTokens = size(toks).cast("double")
    val stop = stopwordHits(toks, StopwordProfiles("en")).cast("double")
    val nChars = length(text).cast("double")
    val nDigits = length(regexp_replace(text, "[^0-9]", "")).cast("double")
    val avgTokLen = (nChars - (nTokens - 1)) / nTokens
    val stopRatio = stop / nTokens
    val digitRatio = nDigits / nChars
    round(lit(0.4) * least(stopRatio * 4, lit(1.0)) +
      lit(0.3) * (lit(1.0) - digitRatio) +
      lit(0.3) * least(avgTokLen / 8.0, lit(1.0)), 6)
  }

  /** Content fingerprint of whitespace/case-normalized text (md5 — the
    * exact-dedup key). A 64-bit rolling variant is [[rollingFingerprint]].
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Polynomial rolling hash over tokens (Rabin–Karp style), mod the
    * Mersenne prime 2³¹−1 so the fold never overflows a long under ANSI
    * mode. Order-sensitive; stays in Catalyst (no UDF); Spark-side only
    * (not oracle-expressible).
    */
  def rollingFingerprint(text: Column): Column = {
    val p = 2147483647L // 2^31 - 1
    aggregate(
      transform(tokens(text),
        t => pmod(conv(substring(md5(t), 1, 15), 16, 10).cast("long"), lit(p))),
      lit(0L),
      (acc, h) => pmod(acc * 1000003L + h, lit(p)))
  }
}
