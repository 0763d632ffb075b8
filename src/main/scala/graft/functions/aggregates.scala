package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst AGGREGATES (the tier of extension [[vector]]'s scalar
  * kernels don't cover): TypedImperativeAggregate implementations with
  * real partial aggregation — per-partition buffers update map-side,
  * merge on the reduce side, so the shuffle carries one bounded buffer
  * per (partition, group) instead of the group's rows.
  */
object aggregates {

  private val hexDigits = "0123456789abcdef".toCharArray
  private val md5TL: ThreadLocal[java.security.MessageDigest] =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  /** Deterministic per-group k-sample: the k values with the SMALLEST
    * md5(value) — "bottom-k by content hash", the group-scoped form of
    * [[graft.llm.Sampling.hashSample]]'s partition/run/engine-invariant
    * sampling (a seeded rand() sample changes under repartitioning; a
    * hash sample never does, and any SQL engine can replicate it).
    *
    * Versus the window form (row_number over hash ≤ k): no per-group full
    * sort, and partial aggregation applies — each map task keeps a
    * bounded k-element heap per group, so the exchange carries ≤ k
    * (hash, value) pairs per group per partition. At 100 TB that is the
    * difference between shuffling the table and shuffling samples.
    *
    * Returns array<string> of the k winners in hash order (deterministic).
    */
  case class BottomKByHash(child: Expression, k: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[mutable.PriorityQueue[(String, String)]] {
    require(k >= 1, s"bottom_k_by_hash: k must be >= 1, got $k")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(StringType, containsNull = false)

    // max-heap on the hash: the root is the current worst kept element
    override def createAggregationBuffer(): mutable.PriorityQueue[(String, String)] =
      mutable.PriorityQueue.empty[(String, String)](Ordering.by(_._1))

    private def md5Hex(s: String): String = {
      val md = aggregates.md5TL.get()
      md.reset()
      val d = md.digest(s.getBytes("UTF-8"))
      val sb = new java.lang.StringBuilder(32)
      var i = 0
      while (i < 16) {
        val v = d(i) & 0xff
        sb.append(aggregates.hexDigits(v >>> 4)).append(aggregates.hexDigits(v & 0xf))
        i += 1
      }
      sb.toString
    }

    private def offer(buf: mutable.PriorityQueue[(String, String)],
        h: String, v: String): Unit = {
      if (buf.size < k) buf.enqueue((h, v))
      else if (h < buf.head._1) { buf.dequeue(); buf.enqueue((h, v)) }
    }

    override def update(buf: mutable.PriorityQueue[(String, String)],
        input: InternalRow): mutable.PriorityQueue[(String, String)] = {
      val v = child.eval(input)
      if (v != null) {
        val s = v.asInstanceOf[UTF8String].toString
        offer(buf, md5Hex(s), s)
      }
      buf
    }

    override def merge(a: mutable.PriorityQueue[(String, String)],
        b: mutable.PriorityQueue[(String, String)]): mutable.PriorityQueue[(String, String)] = {
      b.foreach { case (h, v) => offer(a, h, v) }
      a
    }

    override def eval(buf: mutable.PriorityQueue[(String, String)]): Any =
      new GenericArrayData(buf.toSeq.sortBy(_._1)
        .map(p => UTF8String.fromString(p._2)).toArray[Any])

    // length-prefixed UTF-8, not writeUTF: sampled values are arbitrary
    // document-length strings, and writeUTF throws UTFDataFormatException
    // past 65535 encoded bytes — a shuffle-time crash on legal input
    private def writeStr(out: java.io.DataOutputStream, s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
    }
    private def readStr(in: java.io.DataInputStream): String = {
      val b = new Array[Byte](in.readInt())
      in.readFully(b)
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    }

    override def serialize(buf: mutable.PriorityQueue[(String, String)]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (h, v) => writeStr(out, h); writeStr(out, v) }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(String, String)] = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val buf = createAggregationBuffer()
      val n = in.readInt()
      var i = 0
      while (i < n) { buf.enqueue((readStr(in), readStr(in))); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): BottomKByHash =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): BottomKByHash =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): BottomKByHash = copy(child = cs.head)
  }

  /** Misra-Gries heavy-hitters sketch over a TOKEN-ARRAY column (MG'82;
    * merge rule from Agarwal et al., "Mergeable Summaries", PODS'12) —
    * the frequent-items member of the sketch family (HLL distinct, CMS
    * point counts, exact-at-gate quantiles). Per-partition buffers hold at
    * most `capacity` (token, count) pairs; the exchange carries ONE buffer
    * per (partition, group) — at 100 TB the vocabulary never shuffles.
    *
    * Guarantees (any processing/merge order, N = total tokens seen):
    *   est(t) <= true(t)  and  est(t) >= true(t) - N/(capacity+1)
    * (absent tokens read est = 0, which satisfies both), so every token
    * with true count > N/(capacity+1) is present in the sketch. With
    * capacity >= distinct-token count no eviction ever fires and the
    * sketch IS the exact count table — the deterministic gate setting;
    * at small capacity the surviving counts are processing-order-
    * dependent, so gates project only the order-invariant bound booleans
    * (token_cms_gate precedent).
    *
    * Returns array<struct<token, est>> sorted by (est desc, token asc).
    */
  case class MisraGries(child: Expression, capacity: Int,
      mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {
    require(capacity >= 1, s"misra_gries: capacity must be >= 1, got $capacity")

    override def children: Seq[Expression] = Seq(child)
    override def nullable: Boolean = false
    override def dataType: DataType = ArrayType(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("token", StringType, nullable = false),
        org.apache.spark.sql.types.StructField("est",
          org.apache.spark.sql.types.LongType, nullable = false))),
      containsNull = false)

    override def createAggregationBuffer(): mutable.HashMap[String, Long] =
      mutable.HashMap.empty[String, Long]

    private def offer(buf: mutable.HashMap[String, Long], t: String): Unit = {
      buf.get(t) match {
        case Some(c) => buf.update(t, c + 1)
        case None if buf.size < capacity => buf.update(t, 1L)
        case None =>
          // classic MG eviction: decrement every counter, drop zeros —
          // O(capacity), amortized O(1) per increment it cancels; the
          // in-place bulk ops are the documented-safe mutation-during-
          // traversal API (keysIterator + update is not)
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.filterInPlace((_, c) => c != 0L)
      }
    }

    override def update(buf: mutable.HashMap[String, Long],
        input: InternalRow): mutable.HashMap[String, Long] = {
      val v = child.eval(input)
      if (v != null) {
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        var i = 0
        val n = arr.numElements()
        while (i < n) {
          if (!arr.isNullAt(i)) offer(buf, arr.getUTF8String(i).toString)
          i += 1
        }
      }
      buf
    }

    override def merge(a: mutable.HashMap[String, Long],
        b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
      b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
      if (a.size > capacity) {
        // mergeable-summaries rule: subtract the (capacity+1)-th largest
        // count from every counter and drop the non-positive — keeps <=
        // capacity entries and preserves the N/(capacity+1) error bound
        val counts = a.values.toArray
        java.util.Arrays.sort(counts)
        val threshold = counts(counts.length - capacity - 1)
        a.mapValuesInPlace((_, c) => c - threshold)
        a.filterInPlace((_, c) => c > 0L)
      }
      a
    }

    override def eval(buf: mutable.HashMap[String, Long]): Any = {
      val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
      new GenericArrayData(sorted.map { case (t, c) =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](UTF8String.fromString(t), c))
      }.toArray[Any])
    }

    override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(buf.size)
      buf.foreach { case (t, c) =>
        val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        out.writeInt(b.length); out.write(b); out.writeLong(c)
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val buf = createAggregationBuffer()
      val n = in.readInt()
      var i = 0
      while (i < n) {
        val b = new Array[Byte](in.readInt())
        in.readFully(b)
        buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8),
          in.readLong())
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(o: Int): MisraGries =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): MisraGries =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        cs: IndexedSeq[Expression]): MisraGries = copy(child = cs.head)
  }

  import org.apache.spark.sql.graftx.Bridge

  /** Column form of [[BottomKByHash]] (input is cast to string). */
  def bottom_k_by_hash(v: Column, k: Int): Column =
    Bridge.column(BottomKByHash(Bridge.expression(v.cast("string")), k)
      .toAggregateExpression())

  /** Column form of [[MisraGries]] (input: array<string> of tokens). */
  def misra_gries(tokens: Column, capacity: Int): Column =
    Bridge.column(MisraGries(Bridge.expression(tokens), capacity)
      .toAggregateExpression())
}
