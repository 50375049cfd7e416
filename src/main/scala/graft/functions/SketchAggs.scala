package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, Union}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable DataSketches aggregates beyond the built-in HLL pair
  * (`hll_sketch_agg`/`hll_union_agg`, the q229 tier): theta sketches
  * (distinct sets that support UNION **and INTERSECTION** — HLL can only
  * union), frequent-items sketches (heavy hitters with deterministic
  * error brackets), and KLL quantile sketches. Together they complete the
  * pre-aggregation story: a gold table stores one sketch column per
  * group, and set-overlap / top-k / quantile questions over ANY group
  * combination are answered by merging kilobyte sketches instead of
  * rescanning the corpus — the only read pattern that stays viable at
  * 100 TB.
  *
  * All three are `TypedImperativeAggregate`s (the [[TopKPairsAgg]]
  * discipline): partial sketches are built map-side, only serialized
  * sketch bytes cross the shuffle, and merge is the sketch monoid. Eval
  * emits the canonical serialized form so sketches can be PERSISTED as
  * binary columns and re-merged in later jobs (cost independent of the
  * original corpus size).
  *
  * The companion scalar expressions (estimate / overlap / top-items /
  * quantile extraction) are deliberately `CodegenFallback`: they run on
  * the sketched frame — one row per GROUP, not per corpus row — where
  * interpretation cost is irrelevant and generated code would just
  * re-state a library call.
  */
object SketchAggs {
  private[functions] def wrapTheta(bytes: Array[Byte]) =
    Sketches.wrapSketch(Memory.wrap(bytes))

  /** Misra-Gries aggregation state that carries what the library's
    * serialized form DROPS when every item has been purged (numActive =
    * 0): such a sketch serializes as EMPTY, silently resetting its
    * stream weight and maximum error — found by SketchFuzzSpec on a
    * tiny-map/wide-domain stratum, where a post-shuffle merge then
    * claimed "nothing above error 0 was missed" over a stream it never
    * accounted. `lostWeight`/`lostError` accumulate the dropped fields
    * across partials so [[freqEncode]] can restore the invariants.
    */
  private[graft] final class FreqState(
      val sk: ItemsSketch[String],
      var lostWeight: Long,
      var lostError: Long) {
    def totalWeight: Long = sk.getStreamLength + lostWeight
    def maxError: Long = sk.getMaximumError + lostError
  }

  /** Envelope format of graft freq columns:
    * `[1B magic 'G'][1B version 1][8B totalWeight][8B totalMaxError]
    * [library bytes]` (big-endian). Produced and consumed only by graft's
    * own functions; the header makes weight and error conservation EXACT
    * under any partitioning, including partials whose raw library form
    * would serialize empty. The magic/version prefix (r12 ADVICE) makes
    * the format self-identifying: raw DataSketches `ItemsSketch` bytes
    * (whose first byte is a small preamble-longs count, never 'G') decode
    * through the legacy fallback with `lost = 0` instead of being misread
    * as a garbage weight header, and anything else fails with a clear
    * message instead of a BufferUnderflowException.
    */
  private val FreqMagic: Byte = 'G'.toByte
  private val FreqVersion: Byte = 1

  private[graft] def freqEncode(st: FreqState): Array[Byte] = {
    val body = st.sk.toByteArray(new ArrayOfStringsSerDe)
    val buf = java.nio.ByteBuffer.allocate(18 + body.length)
    buf.put(FreqMagic)
    buf.put(FreqVersion)
    buf.putLong(st.totalWeight)
    buf.putLong(st.maxError)
    buf.put(body)
    buf.array()
  }

  private[graft] def freqDecode(bytes: Array[Byte]): FreqState = {
    require(bytes != null && bytes.length >= 8,
      s"not a graft freq envelope: ${if (bytes == null) "null" else s"${bytes.length} bytes"} " +
        "(expected [magic G][version][8B weight][8B maxError][sketch bytes])")
    if (bytes(0) == FreqMagic) {
      require(bytes(1) == FreqVersion,
        s"graft freq envelope version ${bytes(1)} not supported (this build reads version $FreqVersion)")
      require(bytes.length >= 18,
        s"truncated graft freq envelope: ${bytes.length} bytes < 18-byte header")
      val buf = java.nio.ByteBuffer.wrap(bytes, 2, 16)
      val totalWeight = buf.getLong()
      val totalError = buf.getLong()
      val body = java.util.Arrays.copyOfRange(bytes, 18, bytes.length)
      val sk = ItemsSketch.getInstance(Memory.wrap(body), new ArrayOfStringsSerDe)
      new FreqState(sk,
        totalWeight - sk.getStreamLength, totalError - sk.getMaximumError)
    } else {
      // legacy/raw library bytes (a store persisted with DataSketches
      // directly): nothing was ever purged-and-lost OUTSIDE the sketch's
      // own accounting, so lost = 0 is the faithful reading
      try {
        val sk = ItemsSketch.getInstance(Memory.wrap(bytes), new ArrayOfStringsSerDe)
        new FreqState(sk, 0L, 0L)
      } catch {
        case e: Exception =>
          // version-0 envelope (the round-12 headerless form:
          // [8B totalWeight][8B totalMaxError][library bytes], no magic).
          // The format is documented as persistable/re-mergeable, so a
          // store written under it must keep decoding (r13 ADVICE). Its
          // first byte is the weight MSB — 0 for any realistic weight —
          // which is never a valid DataSketches preamble, so the raw
          // attempt above fails and this fallback is unambiguous.
          val v0 =
            if (bytes.length > 16) try {
              val buf = java.nio.ByteBuffer.wrap(bytes, 0, 16)
              val totalWeight = buf.getLong()
              val totalError = buf.getLong()
              val body = java.util.Arrays.copyOfRange(bytes, 16, bytes.length)
              val sk = ItemsSketch.getInstance(Memory.wrap(body), new ArrayOfStringsSerDe)
              if (totalWeight >= sk.getStreamLength && totalError >= sk.getMaximumError)
                Some(new FreqState(sk,
                  totalWeight - sk.getStreamLength, totalError - sk.getMaximumError))
              else None
            } catch { case _: Exception => None }
            else None
          v0.getOrElse(throw new IllegalArgumentException(
            s"not a graft freq envelope (v0 or v$FreqVersion) and not raw DataSketches " +
              s"ItemsSketch bytes (${bytes.length} bytes, first byte ${bytes(0)}): ${e.getMessage}", e))
      }
    }
  }

  /** Theta sketch of a LONG key column → compact sketch bytes. */
  def thetaSketch(value: Column, lgK: Int): Column =
    GraftBridge.column(
      ThetaSketchAgg(GraftBridge.expression(value), lgK).toAggregateExpression())

  /** Union of serialized theta sketches → compact sketch bytes. */
  def thetaUnion(sketch: Column, lgK: Int): Column =
    GraftBridge.column(
      ThetaUnionAgg(GraftBridge.expression(sketch), lgK).toAggregateExpression())

  /** Distinct-count estimate of a serialized theta sketch. */
  def thetaEstimate(sketch: Column): Column =
    GraftBridge.column(ThetaEstimateExpr(GraftBridge.expression(sketch)))

  /** Pairwise set algebra of two serialized theta sketches:
    * `struct(union_est, intersect_est)`.
    */
  def thetaPair(a: Column, b: Column): Column =
    GraftBridge.column(
      ThetaPairExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** A-NOT-B estimate of two serialized theta sketches: how many distinct
    * keys the left set has that the right lacks — the incremental-ingest
    * question ("how many NEW users in this batch vs the corpus") answered
    * from kilobytes, without touching either corpus. Exact in exact mode
    * like the other theta reads.
    */
  def thetaDiff(a: Column, b: Column): Column =
    GraftBridge.column(
      ThetaDiffExpr(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** KMV sketch: the k smallest distinct values of a LONG (hash) column,
    * ascending. Deterministic under any partitioning/merge order.
    */
  def kmvBottomK(value: Column, k: Int): Column =
    GraftBridge.column(
      KmvBottomKAgg(GraftBridge.expression(value), k).toAggregateExpression())

  /** Frequent-items sketch of a STRING column → sketch bytes. */
  def freqSketch(item: Column, maxMapSize: Int): Column =
    GraftBridge.column(
      FreqItemsAgg(GraftBridge.expression(item), maxMapSize).toAggregateExpression())

  /** Merge serialized frequent-items sketches → sketch bytes. */
  def freqMerge(sketch: Column, maxMapSize: Int): Column =
    GraftBridge.column(
      FreqMergeAgg(GraftBridge.expression(sketch), maxMapSize).toAggregateExpression())

  /** Heavy hitters of a serialized frequent-items sketch under
    * NO_FALSE_NEGATIVES: every item whose true count exceeds the sketch's
    * maximum error is guaranteed present; each row carries the
    * deterministic `[lower, upper]` bracket of its true count.
    */
  def freqTopItems(sketch: Column): Column =
    GraftBridge.column(FreqTopItemsExpr(GraftBridge.expression(sketch)))

  /** KLL quantile sketch of a DOUBLE column → sketch bytes. */
  def kllSketch(value: Column, k: Int): Column =
    GraftBridge.column(
      KllDoublesAgg(GraftBridge.expression(value), k).toAggregateExpression())

  /** Merge serialized KLL sketches → sketch bytes. */
  def kllMerge(sketch: Column, k: Int): Column =
    GraftBridge.column(
      KllMergeAgg(GraftBridge.expression(sketch), k).toAggregateExpression())

  /** Summary of a serialized KLL sketch at the given ranks:
    * `struct(n, min_value, max_value, quantiles: array<double>)`.
    * n/min/max are EXACT (KLL tracks them outside the compactors); the
    * quantiles carry the k-determined normalized rank error.
    */
  def kllSummary(sketch: Column, ranks: Seq[Double]): Column =
    GraftBridge.column(KllSummaryExpr(GraftBridge.expression(sketch), ranks))
}

/** Bounded buffer of the k SMALLEST DISTINCT longs — the KMV (k minimum
  * values) sketch state. Fully deterministic (no library randomness, no
  * hash seeds): the same input multiset yields the same k minima under
  * ANY partitioning or merge order, which is what lets the q248 KMV
  * distinct estimate be ORACLE-GATED hash-exact where every other
  * approximate-distinct family is rows-only.
  */
case class KmvBottomKAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
    with ImplicitCastInputTypes {

  require(k >= 2 && k <= 65536, s"k out of range: $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def insert(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit =
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last) { if (buf.add(v)) { buf.remove(buf.last); () } }

  override def update(buffer: java.util.TreeSet[java.lang.Long],
                      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) insert(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: java.util.TreeSet[java.lang.Long],
                     other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) insert(buffer, it.next())
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Any](buffer.size)
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + 8 * buffer.size)
    bb.putInt(buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next().longValue())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { insert(buf, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvBottomKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvBottomKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KmvBottomKAgg =
    copy(child = c(0))
  override def prettyName: String = "kmv_bottom_k"
}

/** Per-group theta sketch over a long key. Buffer is a theta `Union` (it
  * accepts both raw updates and sketch merges); serialize/eval emit the
  * ORDERED compact form — the canonical representation, so in exact mode
  * (distinct ≤ 2^lgK) a union of partials is BYTE-IDENTICAL to sketching
  * the whole corpus at once (SketchSpec pins this).
  */
case class ThetaSketchAgg(
    child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with ImplicitCastInputTypes {

  require(lgK >= 4 && lgK <= 26, s"lgK out of range: $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(LongType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaSketchAgg =
    copy(child = c(0))
  override def prettyName: String = "theta_sketch"
}

/** Union of SERIALIZED theta sketches — the read path: fold a frame of
  * per-group sketch columns to one merged sketch without touching the
  * corpus.
  */
case class ThetaUnionAgg(
    child: Expression, lgK: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Union] with ImplicitCastInputTypes {

  require(lgK >= 4 && lgK <= 26, s"lgK out of range: $lgK")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buffer.union(Memory.wrap(v.asInstanceOf[Array[Byte]]))
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any = buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Memory.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): ThetaUnionAgg =
    copy(child = c(0))
  override def prettyName: String = "theta_union"
}

/** Distinct-count estimate of a serialized theta sketch. In exact mode
  * the estimate IS the exact distinct count (the sketch still holds every
  * distinct hash).
  */
case class ThetaEstimateExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = DoubleType
  override protected def nullSafeEval(bytes: Any): Any =
    SketchAggs.wrapTheta(bytes.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(c: Expression): ThetaEstimateExpr =
    copy(child = c)
  override def prettyName: String = "theta_estimate"
}

/** Union AND intersection estimates of two serialized theta sketches —
  * the set-algebra read HLL fundamentally cannot express (its registers
  * only support max-merge). Output `struct(union_est, intersect_est)`.
  */
case class ThetaPairExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = StructType(Seq(
    StructField("union_est", DoubleType, nullable = false),
    StructField("intersect_est", DoubleType, nullable = false)))

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = SketchAggs.wrapTheta(a.asInstanceOf[Array[Byte]])
    val sb = SketchAggs.wrapTheta(b.asInstanceOf[Array[Byte]])
    // Size the union from the inputs' retained entries so unioning
    // sketches built with lgK > 12 never downsamples below their own
    // precision (a nominal-entries cap only bites when retained > 2^lgK,
    // so covering retained(a)+retained(b) is always lossless).
    val lgU = {
      val ret = math.max(1L,
        sa.getRetainedEntries(true).toLong + sb.getRetainedEntries(true).toLong)
      math.min(26, math.max(12, 64 - java.lang.Long.numberOfLeadingZeros(ret - 1)))
    }
    val u = SetOperation.builder().setLogNominalEntries(lgU).buildUnion()
    u.union(sa); u.union(sb)
    val i = SetOperation.builder().buildIntersection()
    i.intersect(sa); i.intersect(sb)
    InternalRow(u.getResult.getEstimate, i.getResult.getEstimate)
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaPairExpr =
    copy(left = l, right = r)
  override def prettyName: String = "theta_pair"
}

/** A-NOT-B distinct estimate of two serialized theta sketches. */
case class ThetaDiffExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOperation.builder().buildANotB()
      .aNotB(SketchAggs.wrapTheta(a.asInstanceOf[Array[Byte]]),
        SketchAggs.wrapTheta(b.asInstanceOf[Array[Byte]]))
      .getEstimate

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaDiffExpr =
    copy(left = l, right = r)
  override def prettyName: String = "theta_diff"
}

/** Per-group frequent-items sketch over a string column (Misra-Gries-
  * family; `maxMapSize` must be a power of 2). Deterministic guarantees —
  * no randomness anywhere: every reported count sits in its
  * `[lower, upper]` bracket, and under NO_FALSE_NEGATIVES every item with
  * true count > maximum-error is reported. Buffer and column carry the
  * [[SketchAggs.freqEncode]] envelope so weight/error survive the
  * fully-purged serialization seam (see [[SketchAggs.FreqState]]).
  */
case class FreqItemsAgg(
    child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SketchAggs.FreqState]
    with ImplicitCastInputTypes {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8: $maxMapSize")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): SketchAggs.FreqState =
    new SketchAggs.FreqState(new ItemsSketch[String](maxMapSize), 0L, 0L)

  override def update(buffer: SketchAggs.FreqState, input: InternalRow): SketchAggs.FreqState = {
    val v = child.eval(input)
    if (v != null) buffer.sk.update(v.asInstanceOf[UTF8String].toString)
    buffer
  }

  override def merge(buffer: SketchAggs.FreqState, other: SketchAggs.FreqState): SketchAggs.FreqState = {
    buffer.sk.merge(other.sk)
    buffer.lostWeight += other.lostWeight
    buffer.lostError += other.lostError
    buffer
  }

  override def eval(buffer: SketchAggs.FreqState): Any =
    SketchAggs.freqEncode(buffer)

  override def serialize(buffer: SketchAggs.FreqState): Array[Byte] =
    SketchAggs.freqEncode(buffer)

  override def deserialize(bytes: Array[Byte]): SketchAggs.FreqState =
    SketchAggs.freqDecode(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqItemsAgg =
    copy(child = c(0))
  override def prettyName: String = "freq_items_sketch"
}

/** Merge of SERIALIZED frequent-items sketches (read path; envelope
  * format — see [[SketchAggs.FreqState]]).
  */
case class FreqMergeAgg(
    child: Expression, maxMapSize: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SketchAggs.FreqState]
    with ImplicitCastInputTypes {

  require(maxMapSize >= 8 && Integer.bitCount(maxMapSize) == 1,
    s"maxMapSize must be a power of 2 >= 8: $maxMapSize")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): SketchAggs.FreqState =
    new SketchAggs.FreqState(new ItemsSketch[String](maxMapSize), 0L, 0L)

  override def update(buffer: SketchAggs.FreqState, input: InternalRow): SketchAggs.FreqState = {
    val v = child.eval(input)
    if (v != null) {
      val in = SketchAggs.freqDecode(v.asInstanceOf[Array[Byte]])
      buffer.sk.merge(in.sk)
      buffer.lostWeight += in.lostWeight
      buffer.lostError += in.lostError
    }
    buffer
  }

  override def merge(buffer: SketchAggs.FreqState, other: SketchAggs.FreqState): SketchAggs.FreqState = {
    buffer.sk.merge(other.sk)
    buffer.lostWeight += other.lostWeight
    buffer.lostError += other.lostError
    buffer
  }

  override def eval(buffer: SketchAggs.FreqState): Any =
    SketchAggs.freqEncode(buffer)

  override def serialize(buffer: SketchAggs.FreqState): Array[Byte] =
    SketchAggs.freqEncode(buffer)

  override def deserialize(bytes: Array[Byte]): SketchAggs.FreqState =
    SketchAggs.freqDecode(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): FreqMergeAgg =
    copy(child = c(0))
  override def prettyName: String = "freq_items_merge"
}

/** Heavy hitters of a serialized frequent-items sketch, re-sorted to a
  * TOTAL deterministic order (estimate desc, item asc — the library sorts
  * by estimate only, leaving ties in map order).
  */
case class FreqTopItemsExpr(child: Expression)
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("estimate", LongType, nullable = false),
      StructField("lower", LongType, nullable = false),
      StructField("upper", LongType, nullable = false))),
    containsNull = false)

  override protected def nullSafeEval(bytes: Any): Any = {
    val st = SketchAggs.freqDecode(bytes.asInstanceOf[Array[Byte]])
    val rows = st.sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      .sortBy(r => (-r.getEstimate, r.getItem))
    // widen brackets by the error the envelope restored: weight a partial
    // purged away before serialization may belong to ANY item
    new GenericArrayData(rows.map { r =>
      InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate,
        math.max(0L, r.getLowerBound - st.lostError),
        r.getUpperBound + st.lostError)
    }.asInstanceOf[Array[Any]])
  }

  override protected def withNewChildInternal(c: Expression): FreqTopItemsExpr =
    copy(child = c)
  override def prettyName: String = "freq_top_items"
}

/** Per-group KLL quantile sketch over a double column. */
case class KllDoublesAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with ImplicitCastInputTypes {

  require(k >= 8 && k <= 65535, s"k out of range: $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buffer.update(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllDoublesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllDoublesAgg =
    copy(child = c(0))
  override def prettyName: String = "kll_sketch"
}

/** Merge of SERIALIZED KLL sketches (read path). */
case class KllMergeAgg(
    child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllDoublesSketch] with ImplicitCastInputTypes {

  require(k >= 8 && k <= 65535, s"k out of range: $k")

  override def children: Seq[Expression] = Seq(child)
  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null)
      buffer.merge(KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = c(0))
  override def prettyName: String = "kll_merge"
}

/** n / min / max / quantiles of a serialized KLL sketch. n, min and max
  * are EXACT (kept outside the compactors); quantiles are INCLUSIVE-rank
  * with normalized rank error eps(k) (k=200 ≈ 1.65%). An empty sketch
  * yields null.
  */
case class KllSummaryExpr(child: Expression, ranks: Seq[Double])
    extends UnaryExpression with CodegenFallback with ImplicitCastInputTypes {

  require(ranks.nonEmpty && ranks.forall(r => r >= 0.0 && r <= 1.0),
    s"ranks must be within [0,1]: $ranks")

  override def inputTypes: Seq[DataType] = Seq(BinaryType)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("n", LongType, nullable = false),
    StructField("min_value", DoubleType, nullable = false),
    StructField("max_value", DoubleType, nullable = false),
    StructField("quantiles", ArrayType(DoubleType, containsNull = false),
      nullable = false)))

  override protected def nullSafeEval(bytes: Any): Any = {
    val sk = KllDoublesSketch.heapify(
      Memory.wrap(bytes.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else InternalRow(sk.getN, sk.getMinItem, sk.getMaxItem,
      new GenericArrayData(sk.getQuantiles(ranks.toArray)))
  }

  override protected def withNewChildInternal(c: Expression): KllSummaryExpr =
    copy(child = c)
  override def prettyName: String = "kll_summary"
}
