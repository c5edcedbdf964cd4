package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel behind [[MinHashSig]] (plain object → static
  * forwarder callable from generated Java). */
object MinHashKernel {

  private val digestTL = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** Element i = lexicographic min over shingles of md5("i:"+s) as a
    * lowercase hex string — the same family the composable chain
    * computes with `array_min(transform(shingles, s ->
    * md5(concat("i:", s))))` per i. One pass over the shingles, one
    * reused MessageDigest; mins are compared on the RAW 16-byte
    * digests (unsigned byte order == hex-string lexicographic order —
    * each byte maps monotonically to two hex chars) and hex-encoded
    * once at the end. Empty input → null, matching array_min over an
    * empty array (shingle frames filter empties before this runs).
    * NULL elements are SKIPPED, matching the chain (md5 of a null
    * concat is null, which array_min ignores); an all-null array →
    * null result, like array_min over all-nulls. */
  def compute(shingles: ArrayData, numHashes: Int): ArrayData = {
    val m = shingles.numElements()
    if (m == 0) return null
    val md = digestTL.get()
    val mins = new Array[Array[Byte]](numHashes)
    val prefixes = new Array[Array[Byte]](numHashes)
    var i = 0
    while (i < numHashes) {
      prefixes(i) = (i.toString + ":").getBytes("UTF-8"); i += 1
    }
    var any = false
    var j = 0
    while (j < m) {
      if (!shingles.isNullAt(j)) {
        any = true
        val s = shingles.getUTF8String(j).getBytes
        i = 0
        while (i < numHashes) {
          md.reset()
          md.update(prefixes(i))
          md.update(s)
          val d = md.digest()
          if (mins(i) == null || unsignedLess(d, mins(i))) mins(i) = d
          i += 1
        }
      }
      j += 1
    }
    if (!any) return null
    val out = new Array[Any](numHashes)
    i = 0
    while (i < numHashes) { out(i) = hex(mins(i)); i += 1 }
    new GenericArrayData(out)
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff; val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private def hex(d: Array[Byte]): UTF8String = {
    val c = new Array[Byte](d.length * 2)
    var i = 0
    while (i < d.length) {
      c(2 * i) = hexChars((d(i) >> 4) & 0xf).toByte
      c(2 * i + 1) = hexChars(d(i) & 0xf).toByte
      i += 1
    }
    UTF8String.fromBytes(c)
  }
}

/** Native MinHash signature over a shingle array: the LSH pipeline's
  * second corpus-wide scan (after [[NgramShingles]]). The composable
  * chain evaluates numHashes separate `transform` lambdas — 8
  * intermediate arrays and an md5 expression allocation per (shingle,
  * hash) — where this kernel makes one pass with one reused digest.
  * Output is identical by construction (same md5 hex family, same
  * prefix scheme, same lexicographic min — MinHashSigSpec proves it
  * differentially), so the DuckDB twin is untouched. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  require(numHashes >= 1,
    s"graft_minhash: numHashes must be >= 1, got $numHashes")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_minhash"
  override def nullable: Boolean = true // empty shingle array → null

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any =
    MinHashKernel.compute(a.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHashKernel.compute($c, $numHashes);
      ${ev.isNull} = ${ev.value} == null;
      """)

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSig = copy(child = newChild)
}
