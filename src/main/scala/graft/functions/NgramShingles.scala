package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The one-pass kernels behind [[NgramShingles]] / [[TokenSplit]] /
  * [[TopNgramCount]] / [[RepMetrics]]. A plain object so the Scala
  * compiler emits STATIC forwarders that generated Java code can call
  * directly. All four entry points share ONE tokenization
  * ([[spanScan]]) and ONE gram assembly ([[gramBytes]]), so the
  * byte-parity invariant between them — which the repetition screens
  * and every DuckDB oracle depend on — cannot drift copy by copy. */
object NgramKernel {

  /** `\s` of java.util.regex (the class the composable chain's
    * `split(_, "\\s+")` matches): space, tab, LF, VT, FF, CR. All
    * ASCII, so byte-scanning is exact even on multi-byte UTF-8 text
    * (UTF-8 continuation bytes are ≥ 0x80 and can never alias them). */
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' ||
      b == '\r'

  /** Token spans of the (already lowercased) bytes: interleaved
    * (start, end) byte offsets, one pair per token — byte-for-byte the
    * tokens of `filter(split(lower(text), "\\s+"), _ != "")`. */
  private def spanScan(bytes: Array[Byte]): Array[Int] = {
    val len = bytes.length
    var buf = new Array[Int](16)
    var m = 0
    var i = 0
    while (i < len) {
      while (i < len && isWs(bytes(i))) i += 1
      val s = i
      while (i < len && !isWs(bytes(i))) i += 1
      if (i > s) {
        if (2 * m == buf.length)
          buf = java.util.Arrays.copyOf(buf, buf.length * 2)
        buf(2 * m) = s; buf(2 * m + 1) = i; m += 1
      }
    }
    java.util.Arrays.copyOf(buf, 2 * m)
  }

  /** Space-joined bytes of the n-gram starting at token `j`. */
  private def gramBytes(bytes: Array[Byte], spans: Array[Int], j: Int,
      n: Int): Array[Byte] = {
    var size = n - 1 // single-space joiners
    var k = 0
    while (k < n) {
      size += spans(2 * (j + k) + 1) - spans(2 * (j + k)); k += 1
    }
    val out = new Array[Byte](size)
    var pos = 0
    k = 0
    while (k < n) {
      val s = spans(2 * (j + k)); val e = spans(2 * (j + k) + 1)
      System.arraycopy(bytes, s, out, pos, e - s)
      pos += e - s
      if (k < n - 1) { out(pos) = ' '; pos += 1 }
      k += 1
    }
    out
  }

  /** Distinct space-joined word `n`-grams of the lowercased,
    * whitespace-tokenized text — byte-for-byte the composable chain
    * `array_distinct(transform(sequence(1, size(toks)-(n-1)),
    * i -> concat_ws(" ", toks[i..i+n-1])))` over
    * `toks = filter(split(lower(text), "\\s+"), _ != "")`, preserving
    * first-occurrence order (LinkedHashSet = array_distinct's rule).
    * Total: fewer than n tokens → empty array. */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val bytes = text.toLowerCase.getBytes
    val spans = spanScan(bytes)
    val m = spans.length / 2
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[UTF8String]()
    var j = 0
    while (j + n <= m) {
      seen.add(UTF8String.fromBytes(gramBytes(bytes, spans, j, n)))
      j += 1
    }
    new GenericArrayData(seen.toArray(Array.empty[AnyRef]))
  }

  /** Max multiplicity of any word `n`-gram (1-grams = words); 0 when
    * the text has fewer than `n` tokens. One scan + open hash count —
    * the standalone kernel behind `graft_top_ngram_count`. */
  def topCount(text: UTF8String, n: Int): Long = {
    val bytes = text.toLowerCase.getBytes
    val spans = spanScan(bytes)
    val m = spans.length / 2
    if (m < n) return 0L
    val counts = new java.util.HashMap[UTF8String, Array[Int]]()
    var best = 0
    var j = 0
    while (j + n <= m) {
      val g = UTF8String.fromBytes(gramBytes(bytes, spans, j, n))
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
    val spans = spanScan(bytes)
    val m = spans.length / 2
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      val t = new Array[Byte](spans(2 * j + 1) - spans(2 * j))
      System.arraycopy(bytes, spans(2 * j), t, 0, t.length)
      out(j) = UTF8String.fromBytes(t)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** All four repetition-screen inputs in ONE scan: token count, max
    * word multiplicity, max 2-gram multiplicity, distinct-3-gram count
    * (each 0 when the text is too short for it). The separate
    * `graft_tokens`/`graft_top_ngram_count`/`graft_ngrams` chain would
    * lowercase and span-scan the same bytes four times per row. */
  def repMetrics(text: UTF8String): InternalRow = {
    val bytes = text.toLowerCase.getBytes
    val spans = spanScan(bytes)
    val m = spans.length / 2
    var topw = 0L
    var top2 = 0L
    var d3 = 0L
    if (m >= 1) {
      val counts = new java.util.HashMap[UTF8String, Array[Int]]()
      var best = 0
      var j = 0
      while (j < m) {
        val g = UTF8String.fromBytes(gramBytes(bytes, spans, j, 1))
        var c = counts.get(g)
        if (c == null) { c = new Array[Int](1); counts.put(g, c); () }
        c(0) += 1
        if (c(0) > best) best = c(0)
        j += 1
      }
      topw = best.toLong
    }
    if (m >= 2) {
      val counts = new java.util.HashMap[UTF8String, Array[Int]]()
      var best = 0
      var j = 0
      while (j + 2 <= m) {
        val g = UTF8String.fromBytes(gramBytes(bytes, spans, j, 2))
        var c = counts.get(g)
        if (c == null) { c = new Array[Int](1); counts.put(g, c); () }
        c(0) += 1
        if (c(0) > best) best = c(0)
        j += 1
      }
      top2 = best.toLong
    }
    if (m >= 3) {
      val seen = new java.util.HashSet[UTF8String]()
      var j = 0
      while (j + 3 <= m) {
        seen.add(UTF8String.fromBytes(gramBytes(bytes, spans, j, 3)))
        j += 1
      }
      d3 = seen.size().toLong
    }
    new GenericInternalRow(Array[Any](m.toLong, topw, top2, d3))
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
  * (0 when fewer than n tokens), computed locally per row in one
  * fused scan, where the composable plan would explode every gram and
  * shuffle a (doc, gram) aggregate. */
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

/** Native fused repetition-screen metrics —
  * `graft_rep_metrics(text)` returns
  * `struct<n_tokens, top_word_n, top2_n, distinct3>` from ONE
  * lowercase + span scan of the text
  * ([[graft.operators.LlmText.repetition]] consumes it; reading four
  * fields of the one struct replaces four independent kernel scans of
  * the same bytes). */
case class RepMetrics(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepMetrics.schema
  override def prettyName: String = "graft_rep_metrics"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got " +
        child.dataType.simpleString)

  override def nullSafeEval(t: Any): Any =
    NgramKernel.repMetrics(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.NgramKernel.repMetrics($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : RepMetrics = copy(child = newChild)
}

object RepMetrics {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false),
    StructField("top2_n", LongType, nullable = false),
    StructField("distinct3", LongType, nullable = false)))
}
