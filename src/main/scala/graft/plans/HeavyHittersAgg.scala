package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch as a native aggregate — the
  * one-pass hot-key detector that precedes every skew decision at
  * scale. `ngramJaccardPairs(maxDocFreq=…)`, winnowing's doc-freq cap,
  * and `ScaleOps.saltedJoin` all presuppose you KNOW which keys are
  * hot; an exact `groupBy(key).count` answer costs a full shuffle of
  * the key column. This aggregate finds every key whose frequency
  * exceeds n/(k+1) in ONE pass with k counters per partition — the
  * map-side partials are k-entry maps, so the exchange moves
  * O(k × partitions) rows instead of O(distinct keys).
  *
  * Classic Misra-Gries (1982) update: a hit increments its counter; a
  * miss with a free slot claims one; a miss with all k slots full
  * decrements EVERY counter (dropping zeros) and discards the arriving
  * item. Each decrement event destroys k+1 units of count mass, so it
  * can happen at most n/(k+1) times, giving the standard guarantee:
  *
  *   true_count − n/(k+1)  ≤  estimate  ≤  true_count
  *
  * and in particular every key with true_count > n/(k+1) survives in
  * the sketch. Merging follows Agarwal et al., "Mergeable Summaries"
  * (PODS 2012): add counters pairwise, then subtract the (k+1)-th
  * largest counter from all and drop non-positives — the subtracted
  * mass is bounded by the same n/(k+1) budget, so the guarantee holds
  * across arbitrary partitionings (spec-tested: repartition-invariant).
  *
  * k sizes a per-row O(k) worst-case kernel (the decrement sweep) and
  * a k-entry buffer — it is a sketch width, not a result limit; keep
  * it ≤ a few hundred. Estimates are UNDER-counts by construction:
  * exact counts for the surviving keys, if needed, are one semi-join
  * against the k-row sketch output away (never a full groupBy).
  *
  * Result: `array<struct<item:string, est:bigint>>`, sorted est desc
  * then item asc (deterministic across partitionings of equal-est
  * entries only when counts are — the CONTRACT gate `q_t_heavy_hitters`
  * therefore joins on item rather than trusting array order).
  */
case class HeavyHittersAgg(
    child: Expression,
    k: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[UTF8String, Long]] {

  private lazy val kVal: Int = k.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(child, k)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, k.dataType, k.foldable) match {
      case (StringType, IntegerType, true) if k.eval() != null &&
          k.eval().asInstanceOf[Int] > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"heavy_hitters expects (string, positive int literal), got $other")
    }

  override def createAggregationBuffer(): mutable.HashMap[UTF8String, Long] =
    mutable.HashMap.empty

  override def update(
      buffer: mutable.HashMap[UTF8String, Long],
      input: InternalRow): mutable.HashMap[UTF8String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      buffer.get(s) match {
        case Some(c) => buffer.update(s, c + 1)
        case None if buffer.size < kVal =>
          // clone: an unsafe-row UTF8String points into a buffer the
          // scan reuses for the next row — storing it un-copied would
          // alias every map key to whatever row comes last
          buffer.update(s.clone(), 1L)
        case None =>
          // all k slots taken: the decrement step — arriving item is
          // discarded along with one unit from every counter
          val dead = mutable.ArrayBuffer.empty[UTF8String]
          buffer.mapValuesInPlace { (key, c) =>
            if (c == 1L) dead += key
            c - 1L
          }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(
      a: mutable.HashMap[UTF8String, Long],
      b: mutable.HashMap[UTF8String, Long]): mutable.HashMap[UTF8String, Long] = {
    b.foreach { case (key, c) =>
      a.update(key, a.getOrElse(key, 0L) + c)
    }
    if (a.size > kVal) {
      // Mergeable-summaries reduction: subtract the (k+1)-th largest
      // counter from everything, keep the strictly positive — at most
      // k survive, and the removed mass stays within the n/(k+1) error
      // budget.
      val vals = a.values.toArray
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - (kVal + 1)) // (k+1)-th largest
      val dead = mutable.ArrayBuffer.empty[UTF8String]
      a.mapValuesInPlace { (key, c) =>
        if (c - cut <= 0L) dead += key
        c - cut
      }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buffer: mutable.HashMap[UTF8String, Long]): Any = {
    val sorted = buffer.toArray.sortWith { case ((i1, e1), (i2, e2)) =>
      if (e1 != e2) e1 > e2 else i1.compareTo(i2) < 0
    }
    new GenericArrayData(sorted.map { case (item, est) =>
      new GenericInternalRow(Array[Any](item, est))
    })
  }

  override def serialize(buffer: mutable.HashMap[UTF8String, Long]): Array[Byte] = {
    var bytes = 4
    buffer.foreach { case (key, _) => bytes += 4 + key.numBytes() + 8 }
    val bb = java.nio.ByteBuffer.allocate(bytes)
    bb.putInt(buffer.size)
    buffer.foreach { case (key, c) =>
      val kb = key.getBytes
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(storage: Array[Byte]): mutable.HashMap[UTF8String, Long] = {
    val bb = java.nio.ByteBuffer.wrap(storage)
    val n = bb.getInt
    val out = mutable.HashMap.empty[UTF8String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val kb = new Array[Byte](len)
      bb.get(kb)
      out.update(UTF8String.fromBytes(kb), bb.getLong)
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), k = newChildren(1))

  override def prettyName: String = "heavy_hitters"
}

object HeavyHittersAgg {
  /** SQL registration: `SELECT heavy_hitters(token, 32) FROM …`. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "heavy_hitters",
      exprs => HeavyHittersAgg(exprs(0), exprs(1)),
      "scala_udf")

  /** Column-level entry point (register + call_function, the Spark 4
    * bridge — see [[HistogramQuantileExpr]]). */
  def heavyHitters(spark: SparkSession, item: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "heavy_hitters", item, org.apache.spark.sql.functions.lit(k))
  }
}
