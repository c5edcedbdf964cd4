package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The one-pass kernel behind [[NgramShingles]]. A plain object so the
  * Scala compiler emits a STATIC forwarder (`NgramKernel.compute`) that
  * generated Java code can call directly. */
object NgramKernel {

  /** `\s` of java.util.regex (the class the composable chain's
    * `split(_, "\\s+")` matches): space, tab, LF, VT, FF, CR. All
    * ASCII, so byte-scanning is exact even on multi-byte UTF-8 text
    * (UTF-8 continuation bytes are ≥ 0x80 and can never alias them). */
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' ||
      b == '\r'

  /** Distinct space-joined word `n`-grams of the lowercased,
    * whitespace-tokenized text — byte-for-byte the composable chain
    * `array_distinct(transform(sequence(1, size(toks)-(n-1)),
    * i -> concat_ws(" ", toks[i..i+n-1])))` over
    * `toks = filter(split(lower(text), "\\s+"), _ != "")`, preserving
    * first-occurrence order (LinkedHashSet = array_distinct's rule).
    * Total: fewer than n tokens → empty array. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    // token spans: (start, end) byte offsets
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val s = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > s) { starts.add(s); ends.add(i); () }
    }
    val m = starts.size()
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    while (j + n <= m) {
      var size = n - 1 // single-space joiners
      var k = 0
      while (k < n) {
        size += ends.get(j + k) - starts.get(j + k); k += 1
      }
      val out = new Array[Byte](size)
      var pos = 0
      k = 0
      while (k < n) {
        val s = starts.get(j + k); val e = ends.get(j + k)
        System.arraycopy(bytes, s, out, pos, e - s)
        pos += e - s
        if (k < n - 1) { out(pos) = ' '; pos += 1 }
        k += 1
      }
      seen.add(UTF8String.fromBytes(out))
      j += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  /** Max multiplicity of any word `n`-gram of the lowercased,
    * whitespace-tokenized text (1-grams = words); 0 when the text has
    * fewer than `n` tokens. One fused scan + open hash count — the
    * kernel behind the repetition quality screens, where the
    * composable alternative is an explode + two-level groupBy shuffle
    * per metric. Same tokenization/gram-join rules as [[compute]]. */
  def topCount(text: UTF8String, n: Int): Long = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val s = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > s) { starts.add(s); ends.add(i); () }
    }
    val m = starts.size()
    if (m < n) return 0L
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var best = 0
    var j = 0
    while (j + n <= m) {
      var size = n - 1
      var k = 0
      while (k < n) {
        size += ends.get(j + k) - starts.get(j + k); k += 1
      }
      val out = new Array[Byte](size)
      var pos = 0
      k = 0
      while (k < n) {
        val s = starts.get(j + k); val e = ends.get(j + k)
        System.arraycopy(bytes, s, out, pos, e - s)
        pos += e - s
        if (k < n - 1) { out(pos) = ' '; pos += 1 }
        k += 1
      }
      val g = UTF8String.fromBytes(out)
      var c = counts.get(g)
      if (c == null) { c = new Array[Int](1); counts.put(g, c); () }
      c(0) += 1
      if (c(0) > best) best = c(0)
      j += 1
    }
    best.toLong
  }

  /** Tokens WITH multiplicity (no distinct): the input scan of the
    * token-statistics family — byte-for-byte
    * `filter(split(lower(text), "\\s+"), _ != "")`. */
  def tokens(text: UTF8String): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val len = bytes.length
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val s = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > s) {
        val t = new Array[Byte](i - s)
        System.arraycopy(bytes, s, t, 0, i - s)
        out.add(UTF8String.fromBytes(t)); ()
      }
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native distinct word n-gram shingling of a text column.
  *
  * The composable formulation — `array_distinct(transform(sequence(...),
  * i -> concat_ws(" ", element_at(toks, i), ...)))` over a
  * `filter(split(lower(text), "\\s+"), ...)` token array — walks four
  * higher-order expressions per row, allocating the token array, a
  * lambda evaluation per gram, and an O(grams) distinct pass. Shingling
  * feeds FIVE operators (MinHash-LSH and inverted-index dedup, the
  * curation composition, contamination, and the streaming
  * decontamination twin) and touches every document of the corpus, so
  * it is the second place the engine drops to a custom Catalyst
  * `Expression` (SURVEY §2.12 ladder; [[DotProduct]] is the first):
  * one fused pass over the UTF-8 bytes, whole-stage-codegen'd via a
  * static kernel call.
  *
  * Semantics are byte-identical to the chain it replaces (same java
  * `\s` tokenization, same lowercase, same first-occurrence distinct
  * order — NgramShinglesSpec proves it differentially), so the DuckDB
  * twins are untouched. Total on short docs by construction: fewer
  * than n tokens → empty array (the chain needed a when() guard to
  * survive filter/projection reordering under ANSI mode). */
case class NgramShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"graft_ngrams: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.simpleString)

  override def nullSafeEval(t: Any): Any =
    NgramKernel.compute(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramKernel.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression)
      : NgramShingles = copy(child = newChild)
}

/** Native whitespace tokenization with multiplicity — the input scan
  * shared by the token-statistics family (text stats, entropy, vocab,
  * packing, SimHash). Byte-identical to
  * `filter(split(lower(text), "\\s+"), _ != "")` (same kernel scan as
  * [[NgramShingles]], no distinct), replacing a three-expression chain
  * whose regex split and filter lambda run interpreted wherever
  * InferFiltersFromGenerate duplicates them around a Generate. */
case class TokenSplit(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokens"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.simpleString)

  override def nullSafeEval(t: Any): Any =
    NgramKernel.tokens(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NgramKernel.tokens($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : TokenSplit = copy(child = newChild)
}

/** Native max n-gram multiplicity — `graft_top_ngram_count(text, n)`
  * returns the occurrence count of the most frequent word n-gram
  * (0 when fewer than n tokens). Powers the per-document repetition
  * screens ([[graft.operators.LlmText.repetition]]): computed locally
  * per row in one fused scan, where the composable plan would explode
  * every gram and shuffle a (doc, gram) aggregate per metric. */
case class TopNgramCount(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"graft_top_ngram_count: n must be >= 1, got $n")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_top_ngram_count"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.simpleString)

  override def nullSafeEval(t: Any): Any =
    NgramKernel.topCount(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramKernel.topCount($c, $n)")

  override protected def withNewChildInternal(newChild: Expression)
      : TopNgramCount = copy(child = newChild)
}
