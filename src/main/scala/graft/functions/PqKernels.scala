package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Primitive PQ scan kernels shared by eval and generated code.
  *
  * Arithmetic contract (bit-parity with the composable formulation and
  * the DuckDB oracle): dots accumulate left-to-right from 0.0
  * ([[DotProduct]]'s fold), the distance is the left-assoc
  * (aa − 2·ab) + bb, and rounding replicates Catalyst's `Round` for
  * DoubleType exactly — `BigDecimal(x).setScale(scale, HALF_UP)` —
  * so `graft_pq_assign`/`graft_pq_lut` are drop-in replacements for
  * the round()-based column chain they fuse. */
object PqKernel {

  def round6(x: Double): Double =
    scala.math.BigDecimal(x)
      .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** round(x·10⁹) as long — Catalyst `round(col * 1e9).cast("long")`:
    * scale-0 HALF_UP, then the double→long cast of an integral. */
  def scale9(x: Double): Long =
    scala.math.BigDecimal(x * 1e9)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP)
      .toDouble.toLong

  /** Nearest centroid of `sv` among `cvs` (code-indexed), distances
    * rounded to 6 before comparison; first (lowest) code wins ties.
    * Returns struct(code: long, l2sq: double).
    *
    * The BigDecimal rounding (exact Catalyst semantics, but a
    * Double.toString parse per call) is NOT run for all codes: round6
    * is monotone and |round6(x) − x| ≤ 5·10⁻⁷, so any candidate with
    * raw distance ≥ rawMin + 2·10⁻⁶ rounds STRICTLY above
    * round6(rawMin) and cannot win or tie — only the (typically one)
    * candidates inside that window are rounded exactly and compared
    * by (r6, code). Measured: 4M BigDecimal calls → ~16k on the
    * sf0.1 assignment, the difference between the kernel being the
    * bench entry's hotspot and being free. */
  def assign(sv: ArrayData, cvs: Array[Array[Double]],
      bbs: Array[Double]): InternalRow = {
    checkDim(sv, cvs, "graft_pq_assign")
    val n = sv.numElements()
    var aa = 0.0
    var i = 0
    while (i < n) { val x = sv.getDouble(i); aa += x * x; i += 1 }
    val raw = new Array[Double](cvs.length)
    var rawMin = Double.MaxValue
    var c = 0
    while (c < cvs.length) {
      val d = dist(aa, sv, cvs(c), bbs(c))
      raw(c) = d
      if (d < rawMin) rawMin = d
      c += 1
    }
    val bound = rawMin + 2e-6
    var bestCode = -1L
    var bestDist = Double.MaxValue
    c = 0
    while (c < cvs.length) {
      // NaN distances (a NaN coordinate in sv or a NaN centroid)
      // never satisfy raw < bound, so they can't win — and +Inf never
      // beats the MaxValue init, keeping round6's BigDecimal parse
      // off non-finite input
      if (raw(c) < bound && java.lang.Double.isFinite(raw(c))) {
        val r6 = round6(raw(c))
        if (r6 < bestDist) { bestDist = r6; bestCode = c.toLong }
      }
      c += 1
    }
    // A NaN subvector leaves every distance NaN and no winner. Writing
    // the sentinel code -1 into an index would silently corrupt it
    // (ADC lookups on -1 drop the row at best) — fail the encode
    // loudly instead, mirroring the unsorted-ids rejection in IvfTopN.
    if (bestCode < 0)
      throw new IllegalArgumentException(
        "graft_pq_assign: no centroid has a finite distance — the " +
          "input subvector contains NaN/Inf coordinates")
    new GenericInternalRow(Array[Any](bestCode, bestDist))
  }

  /** The full integer-scaled LUT row: round(dist·10⁹) per code. */
  def lut(sv: ArrayData, cvs: Array[Array[Double]],
      bbs: Array[Double]): ArrayData = {
    checkDim(sv, cvs, "graft_pq_lut")
    val n = sv.numElements()
    var aa = 0.0
    var i = 0
    while (i < n) { val x = sv.getDouble(i); aa += x * x; i += 1 }
    val out = new Array[Long](cvs.length)
    var c = 0
    while (c < cvs.length) {
      val d = dist(aa, sv, cvs(c), bbs(c))
      if (!java.lang.Double.isFinite(d))
        throw new IllegalArgumentException(
          "graft_pq_lut: non-finite distance at code " + c +
            " — the query subvector contains NaN/Inf coordinates")
      out(c) = scale9(d)
      c += 1
    }
    ArrayData.toArrayData(out)
  }

  /** All-subspace packing of one NORMALIZED vector in a single call:
    * byte s of the returned word is subspace s's [[assign]] code, and
    * the second field is the Σ_s l2sq reconstruction total. The
    * per-subspace arithmetic REPLICATES [[assign]] exactly (same aa
    * fold over the slice, same (aa − 2·ab) + bb spelling, same
    * bounded-round6 winner scan, same lowest-code ties) — pinned by
    * the PqSpec differential against M separate assign calls. One
    * expression instance per plan instead of M means the multi-MB
    * codebook literal serializes ONCE, which measured as the
    * difference between the packed search plan paying ~6 s of plan/
    * codegen tax and paying none. */
  def packAll(vn: ArrayData, cvs: Array[Array[Array[Double]]],
      bbs: Array[Array[Double]]): InternalRow = {
    val m = cvs.length
    if (m > 8)
      throw new IllegalArgumentException(
        s"graft_pq_pack: the packed word holds at most 8 byte codes, " +
          s"codebook has $m subspaces")
    checkVecDim(vn, cvs, "graft_pq_pack")
    val subDim = if (m == 0) 0 else cvs(0)(0).length
    var packed = 0L
    var l2sqSum = 0.0
    var s = 0
    while (s < m) {
      val off = s * subDim
      val cs = cvs(s)
      val bs = bbs(s)
      var aa = 0.0
      var i = 0
      while (i < subDim) {
        val x = vn.getDouble(off + i); aa += x * x; i += 1
      }
      val raw = new Array[Double](cs.length)
      var rawMin = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        val cv = cs(c)
        var ab = 0.0
        var j = 0
        while (j < subDim) {
          ab += vn.getDouble(off + j) * cv(j); j += 1
        }
        val d = aa - 2.0 * ab + bs(c)
        raw(c) = d
        if (d < rawMin) rawMin = d
        c += 1
      }
      val bound = rawMin + 2e-6
      var bestCode = -1L
      var bestDist = Double.MaxValue
      c = 0
      while (c < cs.length) {
        if (raw(c) < bound && java.lang.Double.isFinite(raw(c))) {
          val r6 = round6(raw(c))
          if (r6 < bestDist) { bestDist = r6; bestCode = c.toLong }
        }
        c += 1
      }
      if (bestCode < 0)
        throw new IllegalArgumentException(
          "graft_pq_pack: no centroid has a finite distance at " +
            s"subspace $s — the vector contains NaN/Inf coordinates")
      packed |= bestCode << (8 * s)
      l2sqSum += bestDist
      s += 1
    }
    new GenericInternalRow(Array[Any](packed, l2sqSum))
  }

  /** All-subspace integer-scaled LUT of one normalized QUERY vector:
    * row s is subspace s's [[lut]] row. Same single-literal-instance
    * rationale as [[packAll]]; spec-pinned against M lut calls. */
  def lutAll(vn: ArrayData, cvs: Array[Array[Array[Double]]],
      bbs: Array[Array[Double]]): ArrayData = {
    val m = cvs.length
    checkVecDim(vn, cvs, "graft_pq_lut_all")
    val subDim = if (m == 0) 0 else cvs(0)(0).length
    val rows = new Array[ArrayData](m)
    var s = 0
    while (s < m) {
      val off = s * subDim
      val cs = cvs(s)
      val bs = bbs(s)
      var aa = 0.0
      var i = 0
      while (i < subDim) {
        val x = vn.getDouble(off + i); aa += x * x; i += 1
      }
      val out = new Array[Long](cs.length)
      var c = 0
      while (c < cs.length) {
        val cv = cs(c)
        var ab = 0.0
        var j = 0
        while (j < subDim) {
          ab += vn.getDouble(off + j) * cv(j); j += 1
        }
        val d = aa - 2.0 * ab + bs(c)
        if (!java.lang.Double.isFinite(d))
          throw new IllegalArgumentException(
            "graft_pq_lut_all: non-finite distance at subspace " + s +
              " code " + c + " — the query contains NaN/Inf coordinates")
        out(c) = scale9(d)
        c += 1
      }
      rows(s) = ArrayData.toArrayData(out)
      s += 1
    }
    ArrayData.toArrayData(rows)
  }

  /** The whole-vector dims guard of the fused kernels: vn must hold
    * exactly M·subDim coordinates for this codebook. */
  private def checkVecDim(vn: ArrayData,
      cvs: Array[Array[Array[Double]]], name: String): Unit = {
    val m = cvs.length
    val subDim = if (m == 0 || cvs(0).isEmpty) 0 else cvs(0)(0).length
    if (vn.numElements() != m * subDim)
      throw new IllegalArgumentException(
        s"$name: vector dimension ${vn.numElements()} does not match " +
          s"codebook layout $m x $subDim — the vectors and the " +
          "codebook were built with different dims")
  }

  /** Asymmetric distance of one PACKED code word against a per-QUERY
    * integer-scaled LUT (`lut[s][code]` = round(‖q_s − c_{s,code}‖²·
    * 10⁹), [[lut]]'s rows stacked): Σ_s lut[s][byte_s(packed)] — the
    * ADC inner loop as ONE kernel call per candidate, M array reads
    * into an L1-resident table instead of an M-way (s, code) join.
    * The sum is an exact integer fold of the same scaled longs the
    * join formulation aggregated, so it is bit-identical to
    * `sum(pd)` in ANY order — the associativity trick [[Pq.search]]
    * documents, inherited wholesale. */
  def adc(packed: Long, lut: ArrayData): Long = {
    val m = lut.numElements()
    var s = 0
    var sum = 0L
    while (s < m) {
      val row = lut.getArray(s)
      val c = ((packed >>> (8 * s)) & 0xFFL).toInt
      if (c >= row.numElements())
        throw new IllegalArgumentException(
          s"graft_adc: code $c at subspace $s is outside the " +
            s"${row.numElements()}-entry LUT row — the packed word " +
            "and the codebook disagree")
      sum += row.getLong(c)
      s += 1
    }
    sum
  }

  /** Symmetric (code↔code) PQ distance: ‖q_a − q_b‖² of two packed
    * code words via the per-subspace cross-distance tables (SDC —
    * Jégou et al. 2011 §III.A). One L1-resident lookup per subspace;
    * byte s of each word is its subspace-s code. */
  def sdc(pa: Long, pb: Long,
      tables: Array[Array[Array[Double]]]): Double = {
    var s = 0
    var d = 0.0
    while (s < tables.length) {
      val t = tables(s)
      val ca = ((pa >>> (8 * s)) & 0xFFL).toInt
      val cb = ((pb >>> (8 * s)) & 0xFFL).toInt
      if (ca >= t.length || cb >= t.length)
        throw new IllegalArgumentException(
          s"graft_sdc: code ${math.max(ca, cb)} at subspace $s is " +
            s"outside the ${t.length}-entry codebook — the packed " +
            "words and the codebook disagree")
      d += t(ca)(cb)
      s += 1
    }
    d
  }

  /** The SDC cross-distance tables of a codebook:
    * D[s][a][b] = ‖cv_{s,a} − cv_{s,b}‖² (= bb_a − 2·cv_a·cv_b +
    * bb_b, the same left-assoc spelling as [[dist]]). M·256² doubles
    * (≤ 4 MB) — built once per plan from the literal codebook. */
  def sdcTables(cvs: Array[Array[Array[Double]]],
      bbs: Array[Array[Double]]): Array[Array[Array[Double]]] =
    Array.tabulate(cvs.length) { s =>
      val c = cvs(s)
      val b = bbs(s)
      Array.tabulate(c.length) { a =>
        Array.tabulate(c.length) { j =>
          var ab = 0.0
          var i = 0
          while (i < c(a).length) { ab += c(a)(i) * c(j)(i); i += 1 }
          b(a) - 2.0 * ab + b(j)
        }
      }
    }

  /** Equal-dims guard: a query/corpus vector sliced with a different
    * SubDim than the codebook was trained at must fail loudly, not
    * silently score over the truncated prefix. */
  private def checkDim(sv: ArrayData, cvs: Array[Array[Double]],
      name: String): Unit =
    if (cvs.length > 0 && sv.numElements() != cvs(0).length)
      throw new IllegalArgumentException(
        s"$name: subvector dimension ${sv.numElements()} does not " +
          s"match codebook dimension ${cvs(0).length} — the vectors " +
          "and the codebook were built with different SubDim/dim")

  private def dist(aa: Double, sv: ArrayData, cv: Array[Double],
      bb: Double): Double = {
    var ab = 0.0
    var i = 0
    val n = cv.length
    while (i < n) { ab += sv.getDouble(i) * cv(i); i += 1 }
    aa - 2.0 * ab + bb
  }
}

/** Shared shape of the two PQ scan expressions: children are
  * (s: bigint, sv: array<double>, cvs, bbs) where `cvs` (per-subspace
  * code-indexed centroids, array³) and `bbs` (their ‖cv‖², array²)
  * must be FOLDABLE literals — they parameterize a per-row scan over
  * the whole codebook, so they are evaluated ONCE at plan time into
  * primitive arrays. Codegen emits a single static kernel call per
  * row (all tight loops live in [[PqKernel]], JIT-compiled), keeping
  * the consumer inside its WholeStageCodegen span — the higher-order-
  * function formulation this replaces ran 256 interpreted lambda
  * closures per row and DOUBLED the sf0.1 bench entry. */
abstract class PqScanBase extends Expression {

  def s: Expression
  def sv: Expression
  def cvs: Expression
  def bbs: Expression

  override def children: Seq[Expression] = Seq(s, sv, cvs, bbs)
  override def nullable: Boolean = true
  override lazy val foldable: Boolean = s.foldable && sv.foldable

  override def checkInputDataTypes(): TypeCheckResult = {
    val okS = s.dataType == LongType
    val okSv = sv.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    }
    val okCvs = cvs.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    }
    val okBbs = bbs.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true; case _ => false
    }
    if (!(okS && okSv && okCvs && okBbs))
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires " +
        "(bigint, array<double>, array<array<array<double>>>, " +
        "array<array<double>>), got " +
        children.map(_.dataType.simpleString).mkString(", "))
    else if (!cvs.foldable || !bbs.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: the codebook arguments must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** Codebook literals parsed once: [s][code][dim] and [s][code]. */
  @transient protected lazy val cvsLocal: Array[Array[Array[Double]]] = {
    val a = cvs.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements()) { i =>
      val sub = a.getArray(i)
      Array.tabulate(sub.numElements())(j =>
        sub.getArray(j).toDoubleArray())
    }
  }
  @transient protected lazy val bbsLocal: Array[Array[Double]] = {
    val a = bbs.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i => a.getArray(i).toDoubleArray())
  }

  protected def subspace(sVal: Long): Int = {
    val i = sVal.toInt
    if (i < 0 || i >= cvsLocal.length)
      throw new IllegalArgumentException(
        s"$prettyName: subspace $sVal outside codebook range " +
          s"0..${cvsLocal.length - 1}")
    i
  }

  override def eval(input: InternalRow): Any = {
    val sVal = s.eval(input)
    val svVal = sv.eval(input)
    if (sVal == null || svVal == null) null
    else {
      val i = subspace(sVal.asInstanceOf[Long])
      kernel(svVal.asInstanceOf[ArrayData], cvsLocal(i), bbsLocal(i))
    }
  }

  protected def kernel(sv: ArrayData, cvs: Array[Array[Double]],
      bbs: Array[Double]): Any

  /** `PqKernel.<name>(sv, cvs[s], bbs[s])` — the generated call. */
  protected def genKernelCall(ctx: CodegenContext, ev: ExprCode,
      kernelName: String): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val cvsRef = ctx.addReferenceObj("pqCvs", cvsLocal, "double[][][]")
    val bbsRef = ctx.addReferenceObj("pqBbs", bbsLocal, "double[][]")
    val sGen = s.genCode(ctx)
    val svGen = sv.genCode(ctx)
    val si = ctx.freshName("si")
    val javaType = CodeGenerator.javaType(dataType)
    val resultCode =
      code"""
        ${sGen.code}
        ${svGen.code}
        boolean ${ev.isNull} = ${sGen.isNull} || ${svGen.isNull};
        $javaType ${ev.value} = null;
        if (!${ev.isNull}) {
          int $si = (int) ${sGen.value};
          if ($si < 0 || $si >= $cvsRef.length) {
            throw new IllegalArgumentException(
              "$prettyName: subspace " + $si + " outside codebook range");
          }
          ${ev.value} = graft.functions.PqKernel.$kernelName(
            ${svGen.value}, $cvsRef[$si], $bbsRef[$si]);
        }
        """
    ev.copy(code = resultCode)
  }
}

/** `graft_pq_assign(s, sv, cvs, bbs)` → struct(code bigint, l2sq
  * double): nearest centroid with round(·,6) distances, lowest code
  * on ties — identical ordering to a row_number window over
  * (l2sq ASC, code ASC), fused into one per-row kernel call. */
case class PqAssign(s: Expression, sv: Expression, cvs: Expression,
    bbs: Expression) extends PqScanBase {

  override def prettyName: String = "graft_pq_assign"
  override def dataType: DataType = StructType(Seq(
    StructField("code", LongType, nullable = false),
    StructField("l2sq", DoubleType, nullable = false)))

  override protected def kernel(sv: ArrayData,
      cvs: Array[Array[Double]], bbs: Array[Double]): Any =
    PqKernel.assign(sv, cvs, bbs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    genKernelCall(ctx, ev, "assign")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqAssign =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
}

/** `graft_pq_lut(s, sv, cvs, bbs)` → array<bigint>: the code-indexed
  * integer-scaled ADC lookup row round(dist·10⁹). */
case class PqLut(s: Expression, sv: Expression, cvs: Expression,
    bbs: Expression) extends PqScanBase {

  override def prettyName: String = "graft_pq_lut"
  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)

  override protected def kernel(sv: ArrayData,
      cvs: Array[Array[Double]], bbs: Array[Double]): Any =
    PqKernel.lut(sv, cvs, bbs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    genKernelCall(ctx, ev, "lut")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqLut =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
}

/** `graft_sdc(pa, pb, cvs, bbs)` → double: the symmetric compressed
  * distance ‖q_a − q_b‖² of two PACKED code words (byte s = the
  * subspace-s code, [[graft.operators.Pq.packCodes]]'s layout) via
  * the per-subspace cross-distance tables derived once from the
  * literal codebook. This is the pair-join payload trick: a candidate
  * join ships 8 bytes per side instead of the float vectors, and the
  * distance estimate costs [[Pq.M]] table lookups instead of a 64-dim
  * dot — the prefilter [[graft.operators.LlmSim.dedupEmbedPq]] ranks
  * candidates with before fetching floats for survivors. */
case class PqSdc(pa: Expression, pb: Expression, cvs: Expression,
    bbs: Expression) extends Expression {

  override def prettyName: String = "graft_sdc"
  override def children: Seq[Expression] = Seq(pa, pb, cvs, bbs)
  override def nullable: Boolean = true
  override lazy val foldable: Boolean = pa.foldable && pb.foldable
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    val okCvs = cvs.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    }
    val okBbs = bbs.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true; case _ => false
    }
    if (!(pa.dataType == LongType && pb.dataType == LongType &&
        okCvs && okBbs))
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires " +
        "(bigint, bigint, array<array<array<double>>>, " +
        "array<array<double>>), got " +
        children.map(_.dataType.simpleString).mkString(", "))
    else if (!cvs.foldable || !bbs.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: the codebook arguments must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val tables: Array[Array[Array[Double]]] = {
    def arr3(e: Expression): Array[Array[Array[Double]]] = {
      val a = e.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(a.numElements()) { i =>
        val sub = a.getArray(i)
        Array.tabulate(sub.numElements())(j =>
          sub.getArray(j).toDoubleArray())
      }
    }
    val bbsLocal = {
      val a = bbs.eval(null).asInstanceOf[ArrayData]
      Array.tabulate(a.numElements())(i => a.getArray(i).toDoubleArray())
    }
    PqKernel.sdcTables(arr3(cvs), bbsLocal)
  }

  override def eval(input: InternalRow): Any = {
    val a = pa.eval(input)
    val b = pb.eval(input)
    if (a == null || b == null) null
    else PqKernel.sdc(a.asInstanceOf[Long], b.asInstanceOf[Long], tables)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val tRef = ctx.addReferenceObj("sdcTables", tables, "double[][][]")
    val aGen = pa.genCode(ctx)
    val bGen = pb.genCode(ctx)
    val resultCode =
      code"""
        ${aGen.code}
        ${bGen.code}
        boolean ${ev.isNull} = ${aGen.isNull} || ${bGen.isNull};
        double ${ev.value} = 0.0;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.PqKernel.sdc(
            ${aGen.value}, ${bGen.value}, $tRef);
        }
        """
    ev.copy(code = resultCode)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqSdc =
    copy(newChildren(0), newChildren(1), newChildren(2), newChildren(3))
}

/** Shared shape of the fused WHOLE-VECTOR PQ kernels: children are
  * (vn: array<double> — the L2-normalized full vector, cvs, bbs) with
  * the codebook arguments foldable literals parsed once — ONE
  * expression instance (and one serialized literal copy) per plan,
  * vs the M instances the per-subspace kernels would cost a packed
  * projection. */
abstract class PqVecScanBase extends Expression {

  def vn: Expression
  def cvs: Expression
  def bbs: Expression

  override def children: Seq[Expression] = Seq(vn, cvs, bbs)
  override def nullable: Boolean = true
  override lazy val foldable: Boolean = vn.foldable

  override def checkInputDataTypes(): TypeCheckResult = {
    val okVn = vn.dataType match {
      case ArrayType(DoubleType, _) => true; case _ => false
    }
    val okCvs = cvs.dataType match {
      case ArrayType(ArrayType(ArrayType(DoubleType, _), _), _) => true
      case _ => false
    }
    val okBbs = bbs.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true; case _ => false
    }
    if (!(okVn && okCvs && okBbs))
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires " +
        "(array<double>, array<array<array<double>>>, " +
        "array<array<double>>), got " +
        children.map(_.dataType.simpleString).mkString(", "))
    else if (!cvs.foldable || !bbs.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: the codebook arguments must be literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient protected lazy val cvsLocal: Array[Array[Array[Double]]] = {
    val a = cvs.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements()) { i =>
      val sub = a.getArray(i)
      Array.tabulate(sub.numElements())(j =>
        sub.getArray(j).toDoubleArray())
    }
  }
  @transient protected lazy val bbsLocal: Array[Array[Double]] = {
    val a = bbs.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(a.numElements())(i => a.getArray(i).toDoubleArray())
  }

  override def eval(input: InternalRow): Any = {
    val v = vn.eval(input)
    if (v == null) null
    else kernel(v.asInstanceOf[ArrayData], cvsLocal, bbsLocal)
  }

  protected def kernel(vn: ArrayData, cvs: Array[Array[Array[Double]]],
      bbs: Array[Array[Double]]): Any

  protected def genVecKernelCall(ctx: CodegenContext, ev: ExprCode,
      kernelName: String): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator
    val cvsRef = ctx.addReferenceObj("pqCvs", cvsLocal, "double[][][]")
    val bbsRef = ctx.addReferenceObj("pqBbs", bbsLocal, "double[][]")
    val vGen = vn.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    val resultCode =
      code"""
        ${vGen.code}
        boolean ${ev.isNull} = ${vGen.isNull};
        $javaType ${ev.value} = null;
        if (!${ev.isNull}) {
          ${ev.value} = graft.functions.PqKernel.$kernelName(
            ${vGen.value}, $cvsRef, $bbsRef);
        }
        """
    ev.copy(code = resultCode)
  }
}

/** `graft_pq_pack(vn, cvs, bbs)` → struct(packed bigint, l2sq_sum
  * double): all M subspace codes of one normalized vector packed into
  * one word, plus the summed reconstruction error — the single-call
  * fusion of M `graft_pq_assign`s ([[PqKernel.packAll]]). */
case class PqPack(vn: Expression, cvs: Expression, bbs: Expression)
    extends PqVecScanBase {

  override def prettyName: String = "graft_pq_pack"
  override def dataType: DataType = StructType(Seq(
    StructField("packed", LongType, nullable = false),
    StructField("l2sq_sum", DoubleType, nullable = false)))

  override protected def kernel(vn: ArrayData,
      cvs: Array[Array[Array[Double]]],
      bbs: Array[Array[Double]]): Any = PqKernel.packAll(vn, cvs, bbs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = genVecKernelCall(ctx, ev, "packAll")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqPack =
    copy(newChildren(0), newChildren(1), newChildren(2))
}

/** `graft_pq_lut_all(vn, cvs, bbs)` → array<array<bigint>>: the full
  * M × 2^SubCellDims integer-scaled ADC table of one normalized query
  * — the single-call fusion of M `graft_pq_lut`s
  * ([[PqKernel.lutAll]]); the row shape [[PqAdc]] consumes. */
case class PqLutAll(vn: Expression, cvs: Expression, bbs: Expression)
    extends PqVecScanBase {

  override def prettyName: String = "graft_pq_lut_all"
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false),
      containsNull = false)

  override protected def kernel(vn: ArrayData,
      cvs: Array[Array[Array[Double]]],
      bbs: Array[Array[Double]]): Any = PqKernel.lutAll(vn, cvs, bbs)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = genVecKernelCall(ctx, ev, "lutAll")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PqLutAll =
    copy(newChildren(0), newChildren(1), newChildren(2))
}

/** `graft_adc(packed, lut)` → bigint: the asymmetric compressed
  * distance of a stored packed code word against one query's
  * integer-scaled lookup table (`array<array<bigint>>`, subspace-
  * indexed rows of `graft_pq_lut`). Unlike the codebook arguments of
  * the other PQ kernels the LUT is NOT required to be a literal — it
  * rides per-QUERY on the (bounded, broadcast) query frame, so one
  * plan serves every query in the batch; [[PqKernel.adc]] reads the
  * two levels of `ArrayData` directly (UnsafeArrayData getters are
  * O(1)), no per-row materialization. This is the scoring kernel of
  * [[graft.operators.Pq.searchIndex]]/[[graft.operators.Pq
  * .searchIvfIndex]]: candidates arrive as ONE 8-byte word per vector
  * and each costs M lookups, replacing the 8-rows-per-vector
  * (s, code) equi-join the first stored-index plan shuffled the whole
  * corpus through. */
case class PqAdc(packed: Expression, lut: Expression)
    extends BinaryExpression {

  override def prettyName: String = "graft_adc"
  override def left: Expression = packed
  override def right: Expression = lut
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLut = lut.dataType match {
      case ArrayType(ArrayType(LongType, _), _) => true
      case _ => false
    }
    if (packed.dataType == LongType && okLut)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires " +
      "(bigint, array<array<bigint>>), got " +
      children.map(_.dataType.simpleString).mkString(", "))
  }

  override def nullSafeEval(p: Any, l: Any): Any =
    PqKernel.adc(p.asInstanceOf[Long], l.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, (p, l) =>
      s"${ev.value} = graft.functions.PqKernel.adc($p, $l);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): PqAdc = copy(newLeft, newRight)
}
