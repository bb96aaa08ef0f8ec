package graft.plans

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StructType}

/** Broadcast-side as-of lookup: the feature history of ONE coalesced
  * feature group, collected, sorted per entity by (ts, value), broadcast,
  * and resolved per label row with a binary search — the as-of analogue of
  * a broadcast hash join.
  *
  * When it wins: labels ≫ features (a wide 100 TB label scan against a
  * dimension-sized feature table). [[AsOfMerge]] still exchanges + sorts
  * BOTH sides; this strategy touches the label table in the SCAN stage —
  * zero exchanges anywhere in the plan (spec-asserted) — at the price of
  * collecting the feature side (the same driver-collect contract as
  * Spark's own broadcast joins, with the same "small side only" judgment).
  *
  * Semantics are pinned to the other strategies (agreement-tested):
  * inclusive `f.ts <= l.ts`; ties on ts take the max value (the per-entity
  * arrays are sorted by (ts, value) and the search takes the RIGHTMOST
  * qualifying entry); NULL feature ts = epoch⁻∞ (stored as Long.MinValue);
  * NULL label entity / ts are masked by the caller like SortMergeAsOf.
  */
final case class AsOfBroadcastLookup(
    entity: Expression,
    ts: Expression,
    table: Broadcast[Map[Any, (Array[Long], Array[InternalRow])]],
    valueType: StructType) extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(entity, ts)
  override def nullable: Boolean = true
  override def dataType: DataType = valueType
  override def prettyName: String = "asof_broadcast_lookup"

  override def eval(input: InternalRow): Any = {
    val e = entity.eval(input)
    if (e == null) return null
    table.value.get(e) match {
      case None => null
      case Some((tsArr, valArr)) =>
        val t = ts.eval(input)
        val lt = if (t == null) Long.MinValue else t.asInstanceOf[Long]
        // rightmost index with tsArr(idx) <= lt
        var lo = 0
        var hi = tsArr.length - 1
        var ans = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (tsArr(mid) <= lt) { ans = mid; lo = mid + 1 }
          else hi = mid - 1
        }
        if (ans < 0) null else valArr(ans)
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): AsOfBroadcastLookup =
    copy(entity = newChildren.head, ts = newChildren(1))
}

object AsOfBroadcast {

  /** Collect + sort + broadcast one feature group's events
    * (__e, __t timestamp, __v struct). `maxRows` is the small-side guard —
    * the same judgment as a broadcast-join threshold, made explicit. */
  def buildTable(fev: org.apache.spark.sql.DataFrame,
                 maxRows: Int): (Broadcast[Map[Any, (Array[Long], Array[InternalRow])]], StructType) = {
    val schema = fev.schema
    val valueType = schema("__v").dataType.asInstanceOf[StructType]
    val rows = fev.limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"BroadcastAsOf: feature side exceeds $maxRows rows — use SortMergeAsOf")
    val conv = CatalystTypeConverters.createToCatalystConverter(schema)
    val valOrd = org.apache.spark.sql.catalyst.expressions.InterpretedOrdering
      .forSchema(valueType.fields.map(_.dataType).toIndexedSeq)
    val grouped = rows.iterator
      .map(r => conv(r).asInstanceOf[InternalRow])
      .filter(!_.isNullAt(0)) // NULL-entity features match no label (masked)
      .map { ir =>
        val e = ir.get(0, schema("__e").dataType)
        val t = if (ir.isNullAt(1)) Long.MinValue else ir.getLong(1)
        val v = ir.getStruct(2, valueType.length).copy()
        (e, t, v)
      }.toSeq.groupBy(_._1)
    val table = grouped.map { case (e, evs) =>
      val sorted = evs.sortWith { (a, b) =>
        if (a._2 != b._2) a._2 < b._2 else valOrd.compare(a._3, b._3) < 0
      }
      e -> (sorted.map(_._2).toArray, sorted.map(_._3).toArray)
    }
    (fev.sparkSession.sparkContext.broadcast(table), valueType)
  }
}
