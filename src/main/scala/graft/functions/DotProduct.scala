package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native dot product over two `array<double>` columns.
  *
  * The composable formulation — `aggregate(zip_with(a, b, (x,y)->x*y),
  * 0.0, (acc,v)->acc+v)` — materializes an intermediate array per row
  * and evaluates two lambda closures per element. For a similarity scan
  * that touches every vector of a 100 TB corpus that's the hot path, so
  * this is the one place the engine drops to a custom Catalyst
  * `Expression` (SURVEY §2.12 ladder: built-ins → native Expression):
  * a fused, allocation-free loop with whole-stage codegen.
  *
  * Accumulation is left-to-right starting at 0.0 — bit-identical to the
  * fold it replaces, so DuckDB oracle parity is preserved (verified by
  * DotProductSpec and the llm_knn gate). The degenerate cases follow
  * the fold too: mismatched lengths (zip_with pads with null → null
  * product → null sum) and any null element both yield NULL, rather
  * than silently truncating or reading undefined slots.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"
  // the result can be null even for non-null inputs (length mismatch /
  // null element), so nullability must not be inferred from the children
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<double> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
      int $n = $a.numElements();
      ${ev.value} = 0.0;
      if ($n != $b.numElements()) {
        ${ev.isNull} = true;
      } else {
        for (int $i = 0; $i < $n; $i++) {
          if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
          ${ev.value} += $a.getDouble($i) * $b.getDouble($i);
        }
      }
      """
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): DotProduct = copy(newLeft, newRight)
}

/** Registration of the engine's native functions via the public
  * `SparkSessionExtensions` hook: session builders add
  * `.withExtensions(GraftFunctions.install)`, after which
  * `graft_dot(a, b)` resolves in SQL text and
  * `functions.call_function("graft_dot", ...)` in the DataFrame API. */
object GraftFunctions {
  val dotProduct: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getCanonicalName,
        "graft_dot"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1)))

  /** `graft_ngrams(text, n)` — n must be a foldable integer literal
    * (it parameterizes the generated code). */
  val ngramShingles: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_ngrams"),
      new ExpressionInfo(classOf[NgramShingles].getCanonicalName,
        "graft_ngrams"),
      (exprs: Seq[Expression]) =>
        NgramShingles(exprs.head,
          literalInt("graft_ngrams(text, n)", exprs, 1)))

  /** `graft_minhash(shingles, numHashes)` — numHashes must be a
    * foldable integer literal. */
  val minHashSig: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSig].getCanonicalName,
        "graft_minhash"),
      (exprs: Seq[Expression]) =>
        MinHashSig(exprs.head,
          literalInt("graft_minhash(shingles, n)", exprs, 1)))

  /** Extract argument `idx` as a non-null foldable integer, with the
    * signature in every failure message — a raw NPE/ClassCastException
    * from eval would otherwise surface during analysis with no hint. */
  private def literalInt(sig: String, exprs: Seq[Expression], idx: Int)
      : Int = {
    require(exprs.size == idx + 1 && exprs(idx).foldable,
      s"$sig: n must be a literal integer")
    exprs(idx).eval(null) match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$sig: n must be a non-null literal integer, got " +
          s"${Option(other).getOrElse("NULL")}")
    }
  }

  /** Extract the single argument of a unary function, with the
    * signature in the failure message (a bare `exprs.head` would throw
    * an unhelpful NoSuchElementException on zero args and silently
    * IGNORE extra ones). */
  private def unaryArg(sig: String, exprs: Seq[Expression]): Expression = {
    require(exprs.size == 1,
      s"$sig takes exactly one argument, got ${exprs.size}")
    exprs.head
  }

  val tokenSplit: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_tokens"),
      new ExpressionInfo(classOf[TokenSplit].getCanonicalName,
        "graft_tokens"),
      (exprs: Seq[Expression]) =>
        TokenSplit(unaryArg("graft_tokens(text)", exprs)))

  /** `graft_top_ngram_count(text, n)` — n must be a foldable integer
    * literal. */
  val topNgramCount: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_top_ngram_count"),
      new ExpressionInfo(classOf[TopNgramCount].getCanonicalName,
        "graft_top_ngram_count"),
      (exprs: Seq[Expression]) =>
        TopNgramCount(exprs.head,
          literalInt("graft_top_ngram_count(text, n)", exprs, 1)))

  val repMetrics: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_rep_metrics"),
      new ExpressionInfo(classOf[RepMetrics].getCanonicalName,
        "graft_rep_metrics"),
      (exprs: Seq[Expression]) =>
        RepMetrics(unaryArg("graft_rep_metrics(text)", exprs)))

  /** Spark's OWN bloom-filter expressions (the machinery behind its
    * runtime row-level filtering), which Spark keeps out of the public
    * FunctionRegistry — re-exposed through the same public extension
    * hook as the graft kernels so the blocklist scrub
    * ([[graft.operators.LlmPrep.blocklistFilter]]) can build and probe
    * a bloom with catalyst-native codegen'd expressions instead of a
    * UDF. `graft_bloom_agg(xxhash64(key)[, numItems[, numBits]])` →
    * binary; `graft_might_contain(bloom, xxhash64(key))` → boolean. */
  val bloomAgg: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate
          .BloomFilterAggregate].getCanonicalName,
        "graft_bloom_agg"),
      (exprs: Seq[Expression]) => exprs match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c)
        case Seq(c, n) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c, n)
        case Seq(c, n, b) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c, n, b)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(hashedKey[, numItems[, numBits]]) takes 1-3 " +
            s"arguments, got ${exprs.size}")
      })

  /** `graft_mg_agg(key, capacity)` — distributed Misra-Gries
    * heavy-hitter sketch over a BIGINT key ([[MisraGriesAgg]]);
    * capacity must be a foldable integer literal (it sizes the
    * aggregation buffer, so it cannot be row-dependent). */
  val misraGries: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_mg_agg"),
      new ExpressionInfo(classOf[MisraGriesAgg].getCanonicalName,
        "graft_mg_agg"),
      (exprs: Seq[Expression]) =>
        MisraGriesAgg(exprs.head,
          literalInt("graft_mg_agg(key, capacity)", exprs, 1)))

  /** `graft_pq_assign(s, sv, cvs, bbs)` / `graft_pq_lut(s, sv, cvs,
    * bbs)` — fused PQ codebook scans ([[PqAssign]]/[[PqLut]]); the
    * codebook arguments must be (typed) literals. */
  private def quaternary(sig: String,
      mk: (Expression, Expression, Expression, Expression) => Expression)
      : Seq[Expression] => Expression =
    (exprs: Seq[Expression]) => {
      require(exprs.size == 4,
        s"$sig takes exactly four arguments, got ${exprs.size}")
      mk(exprs(0), exprs(1), exprs(2), exprs(3))
    }

  val pqAssign: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_pq_assign"),
      new ExpressionInfo(classOf[PqAssign].getCanonicalName,
        "graft_pq_assign"),
      quaternary("graft_pq_assign(s, sv, cvs, bbs)", PqAssign.apply))

  val pqLut: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_pq_lut"),
      new ExpressionInfo(classOf[PqLut].getCanonicalName,
        "graft_pq_lut"),
      quaternary("graft_pq_lut(s, sv, cvs, bbs)", PqLut.apply))

  /** `graft_sdc(pa, pb, cvs, bbs)` — symmetric compressed distance of
    * two packed PQ code words ([[PqSdc]]). */
  val pqSdc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_sdc"),
      new ExpressionInfo(classOf[PqSdc].getCanonicalName, "graft_sdc"),
      quaternary("graft_sdc(pa, pb, cvs, bbs)", PqSdc.apply))

  /** `graft_pq_pack(vn, cvs, bbs)` / `graft_pq_lut_all(vn, cvs, bbs)`
    * — whole-vector fusions of the per-subspace PQ scans
    * ([[PqPack]]/[[PqLutAll]]); codebook arguments must be
    * literals. */
  private def ternary(sig: String,
      mk: (Expression, Expression, Expression) => Expression)
      : Seq[Expression] => Expression =
    (exprs: Seq[Expression]) => {
      require(exprs.size == 3,
        s"$sig takes exactly three arguments, got ${exprs.size}")
      mk(exprs(0), exprs(1), exprs(2))
    }

  val pqPack: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_pq_pack"),
      new ExpressionInfo(classOf[PqPack].getCanonicalName,
        "graft_pq_pack"),
      ternary("graft_pq_pack(vn, cvs, bbs)", PqPack.apply))

  val pqLutAll: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_pq_lut_all"),
      new ExpressionInfo(classOf[PqLutAll].getCanonicalName,
        "graft_pq_lut_all"),
      ternary("graft_pq_lut_all(vn, cvs, bbs)", PqLutAll.apply))

  /** `graft_adc(packed, lut)` — asymmetric compressed distance of a
    * packed PQ code word against a per-query integer-scaled LUT
    * ([[PqAdc]]); the LUT is a column, not a literal. */
  val pqAdc: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_adc"),
      new ExpressionInfo(classOf[PqAdc].getCanonicalName, "graft_adc"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2,
          s"graft_adc(packed, lut) takes exactly two arguments, got " +
            s"${exprs.size}")
        PqAdc(exprs.head, exprs(1))
      })

  /** `graft_ivf_topn(v, norm, ids, cvs, norms, n)` — fused trained-
    * quantizer top-n scan ([[IvfTopN]]); codebook arguments must be
    * literals, `n` a foldable integer literal. */
  val ivfTopN: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_ivf_topn"),
      new ExpressionInfo(classOf[IvfTopN].getCanonicalName,
        "graft_ivf_topn"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 6,
          "graft_ivf_topn(v, norm, ids, cvs, norms, n) takes exactly " +
            s"six arguments, got ${exprs.size}")
        IvfTopN(exprs(0), exprs(1), exprs(2), exprs(3), exprs(4),
          literalInt("graft_ivf_topn(..., n)", exprs, 5))
      })

  /** `graft_ed1(a, b)` — exact `levenshtein(a, b, 1)` equivalent
    * (0 / 1 / -1) without the banded DP ([[Ed1]]). */
  val ed1: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_ed1"),
      new ExpressionInfo(classOf[Ed1].getCanonicalName, "graft_ed1"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2,
          s"graft_ed1(a, b) takes exactly two arguments, got ${exprs.size}")
        Ed1(exprs.head, exprs(1))
      })

  /** `graft_nfc(text)` — Unicode NFC normalization
    * ([[NfcNormalize]]). */
  val nfcNormalize: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getCanonicalName,
        "graft_nfc"),
      (exprs: Seq[Expression]) =>
        NfcNormalize(unaryArg("graft_nfc(text)", exprs)))

  val mightContain: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) =
    (FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain].getCanonicalName,
        "graft_might_contain"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 2,
          "graft_might_contain(bloom, hashedKey) takes exactly two " +
            s"arguments, got ${exprs.size}")
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(exprs.head, exprs(1))
      })

  def install(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(dotProduct)
    ext.injectFunction(ngramShingles)
    ext.injectFunction(minHashSig)
    ext.injectFunction(tokenSplit)
    ext.injectFunction(topNgramCount)
    ext.injectFunction(repMetrics)
    ext.injectFunction(bloomAgg)
    ext.injectFunction(mightContain)
    ext.injectFunction(misraGries)
    ext.injectFunction(nfcNormalize)
    ext.injectFunction(ed1)
    ext.injectFunction(pqAssign)
    ext.injectFunction(pqLut)
    ext.injectFunction(pqSdc)
    ext.injectFunction(pqAdc)
    ext.injectFunction(pqPack)
    ext.injectFunction(pqLutAll)
    ext.injectFunction(ivfTopN)
  }
}
