package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
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
      if (raw(c) < bound) {
        val r6 = round6(raw(c))
        if (r6 < bestDist) { bestDist = r6; bestCode = c.toLong }
      }
      c += 1
    }
    new GenericInternalRow(Array[Any](bestCode, bestDist))
  }

  /** The full integer-scaled LUT row: round(dist·10⁹) per code. */
  def lut(sv: ArrayData, cvs: Array[Array[Double]],
      bbs: Array[Double]): ArrayData = {
    val n = sv.numElements()
    var aa = 0.0
    var i = 0
    while (i < n) { val x = sv.getDouble(i); aa += x * x; i += 1 }
    val out = new Array[Long](cvs.length)
    var c = 0
    while (c < cvs.length) {
      out(c) = scale9(dist(aa, sv, cvs(c), bbs(c)))
      c += 1
    }
    ArrayData.toArrayData(out)
  }

  private def dist(aa: Double, sv: ArrayData, cv: Array[Double],
      bb: Double): Double = {
    var ab = 0.0
    var i = 0
    val n = math.min(sv.numElements(), cv.length)
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
