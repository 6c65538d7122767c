package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.GraftBridge

/** Whole-operator custom plan: per-key top-k WITHOUT a full sort.
  *
  * The composed form (`row_number().over(Window.partitionBy(key)
  * .orderBy(...)) <= k`) sorts every partition — O(n log n) buffer and
  * spill per key group. This operator keeps a bounded k-element heap per
  * key: O(n log k) time, O(#keys × k) memory, no sort spill. At 100 TB
  * (e.g. topK=20 KNN edges per node over billions of candidate pairs)
  * the difference is a full external sort vs a streaming pass.
  *
  * The full custom-operator tier: logical node → strategy → physical
  * exec (`requiredChildDistribution` = ClusteredDistribution(keys), so
  * Catalyst inserts the one hash Exchange it actually needs), exposed as
  * a plain DataFrame transform via a session-registered strategy.
  *
  * MEMORY CAVEAT: the per-key heaps live on the JVM heap OUTSIDE Spark's
  * memory manager — O(#distinct keys per partition × k) rows with no
  * spill path. With hash-partitioned keys and small k (the KNN topK=20
  * use) that is a few MB per task; for very high per-partition key
  * cardinality × large k, prefer the window-function form, which sorts
  * but spills under memory pressure.
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder], k: Int,
    child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val sortOrder = order
    val kk = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrdering: Ordering[InternalRow] =
        org.apache.spark.sql.catalyst.expressions.RowOrdering
          .create(sortOrder, childOutput)
      // per key: bounded heap ordered by the DISPLAY ordering, so the
      // heap root (max = sorts last) is the worst kept row and eviction
      // is O(log k)
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[UnsafeRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        // probe with the reused projected key; copy only on insert miss
        // (a per-row copy on hash hits is pure allocation churn)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[UnsafeRow](
              rowOrdering.asInstanceOf[Ordering[UnsafeRow]])
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < kk) {
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        } else if (rowOrdering.compare(row, heap.head) < 0) {
          // strictly better (sorts before the worst kept row) → replace
          heap.dequeue()
          heap.enqueue(row.asInstanceOf[UnsafeRow].copy())
        }
      }
      heaps.iterator.flatMap { case (_, heap) =>
        heap.dequeueAll.reverseIterator // best-first within each key
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  // sessionUUID keys: stable, never reused (identity hashes can recur
  // after a dead session is GC'd)
  @volatile private var registered = Set.empty[String]

  private def ensureStrategy(spark: SparkSession): Unit = {
    val id = graft.Cache.sessionId(spark)
    if (!registered.contains(id)) synchronized {
      if (!spark.experimental.extraStrategies.contains(TopKPerKeyStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ TopKPerKeyStrategy
      }
      registered += id
    }
  }

  /** Keep the top `k` rows per key group, best-first by `orderCols`
    * ((name, ascending) pairs compared lexicographically — "best" is the
    * row that sorts FIRST). */
  def topKPerKey(df: DataFrame, keyCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    ensureStrategy(spark)
    val plan = GraftBridge.logicalPlan(df)
    val resolve = plan.output.map(a => a.name -> a).toMap
    val keys = keyCols.map(c => resolve(c): Expression)
    val order = orderCols.map { case (c, asc) =>
      SortOrder(resolve(c), if (asc) Ascending else Descending)
    }
    GraftBridge.ofRows(spark, TopKPerKeyNode(keys, order, k, plan))
  }
}
