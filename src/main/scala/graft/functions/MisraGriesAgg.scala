package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._

/** Misra-Gries frequency sketch state: at most `capacity` counters
  * plus the TOTAL number of rows folded. The deterministic frequency
  * bound is the whole point: for every key,
  * `true_freq - n/(capacity+1) <= est <= true_freq`, and any key with
  * `true_freq > n/(capacity+1)` is GUARANTEED present — which is what
  * lets [[graft.operators.HeavyHitters]] use the sketch as an exact
  * candidate generator rather than an estimate. */
final class MGBuffer(val capacity: Int) {
  val counts = new mutable.LongMap[Long](capacity * 2)
  var n: Long = 0L

  /** Classic MG step: hit increments; a miss takes a free counter or
    * decrements ALL counters (dropping zeros). The decrement sweep is
    * O(capacity) but fires at most once per `capacity` misses —
    * amortized O(1) per row. */
  def add(key: Long): Unit = {
    n += 1
    // LongMap[Long] has primitive values: getOrNull would return 0L
    // (never null) for a miss, so probe with the default instead.
    // Live counters are always >= 1, so 0 unambiguously means absent.
    val cur = counts.getOrElse(key, 0L)
    if (cur > 0L) counts.update(key, cur + 1)
    else if (counts.size < capacity) counts.update(key, 1L)
    else {
      val dead = mutable.ArrayBuffer.empty[Long]
      counts.foreachEntry { (k, v) =>
        if (v == 1L) dead += k else counts.update(k, v - 1)
      }
      dead.foreach(counts.remove)
    }
  }

  /** Mergeable-summaries combine (Agarwal et al.): sum counters, then
    * if over capacity reduce every counter by the (capacity+1)-th
    * largest and drop non-positives — the additive-error proof gives
    * combined error <= (n1+n2)/(capacity+1), so the candidate
    * guarantee survives arbitrary merge trees (map-side partials,
    * AQE re-merges, anything). */
  def mergeIn(other: MGBuffer): Unit = {
    n += other.n
    other.counts.foreachEntry { (k, v) =>
      counts.update(k, counts.getOrElse(k, 0L) + v)
    }
    if (counts.size > capacity) {
      val vals = counts.values.toArray
      java.util.Arrays.sort(vals)
      // (capacity+1)-th largest = index size-1-capacity ascending
      val cut = vals(vals.length - 1 - capacity)
      val dead = mutable.ArrayBuffer.empty[Long]
      counts.foreachEntry { (k, v) =>
        if (v - cut <= 0L) dead += k else counts.update(k, v - cut)
      }
      dead.foreach(counts.remove)
    }
  }
}

/** `graft_mg_agg(key, capacity)` — distributed Misra-Gries heavy-hitter
  * sketch over a BIGINT key, as a native mergeable aggregate (map-side
  * partials like any sum; KB-sized state). Returns
  * `struct(counts: map<bigint,bigint>, n: bigint)`.
  *
  * This is the scale answer to "find the keys with frequency above a
  * threshold" when the key space is too large to groupBy: the sketch
  * pass shuffles only `capacity`-sized partials (vs a full exchange of
  * every distinct key), and its containment guarantee (every key with
  * freq > n/(capacity+1) is in `counts`) makes the result a provably
  * complete candidate set for an exact second pass —
  * [[graft.operators.HeavyHitters.exact]] wires the two passes up.
  *
  * NULL keys are skipped entirely (consistent with `count(col)`:
  * NULL contributes to no group) and do NOT count toward `n` either —
  * `n` counts only non-NULL rows, keeping the error bound tied to
  * rows that can actually hold a counter. */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MGBuffer] {

  override def prettyName: String = "graft_mg_agg"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = StructType(Seq(
    StructField("counts", MapType(LongType, LongType, false)),
    StructField("n", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT key, got " +
          child.dataType.simpleString)
    else if (capacity < 1 || capacity > (1 << 22))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName capacity must be in [1, ${1 << 22}], got $capacity")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: MGBuffer): Any = {
    val ks = buf.counts.keys.toArray
    java.util.Arrays.sort(ks) // deterministic map order for tests/plans
    val vs = ks.map(buf.counts)
    InternalRow(new ArrayBasedMapData(
      new GenericArrayData(ks), new GenericArrayData(vs)), buf.n)
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(16 + buf.counts.size * 16)
    val out = new DataOutputStream(bos)
    out.writeLong(buf.n)
    out.writeInt(buf.counts.size)
    buf.counts.foreachEntry { (k, v) => out.writeLong(k); out.writeLong(v) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new MGBuffer(capacity)
    buf.n = in.readLong()
    var k = in.readInt()
    while (k > 0) {
      buf.counts.update(in.readLong(), in.readLong())
      k -= 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren.head)
}
