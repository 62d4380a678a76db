package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator top-k-per-key: the rows that would rank 1..k within
  * each key group under `order` — the "best n per group" shape a dozen
  * engine queries express as `row_number() OVER (PARTITION BY ...) <= k`.
  *
  * The window form forces a FULL SORT of every partition (sort by
  * (key, order), then rank, then throw away all but k rows per key) —
  * O(n log n) comparisons and sort spill proportional to the whole
  * input. This operator keeps a bounded heap of k rows per key in one
  * pass: O(n log k), memory bounded by (#keys-per-partition × k) rows.
  *
  * MEMORY CONTRACT — no spill path: the per-partition heap map is
  * plain JVM heap with no TaskMemoryManager accounting, and unlike
  * Spark's hash aggregate (which falls back to sort-based spilling)
  * it cannot degrade gracefully — a pathological key cardinality
  * would OOM the executor where the window form would spill and
  * finish. The operator therefore fail-louds past
  * `spark.graft.topk.maxKeysPerPartition` distinct keys per partition
  * (default 8e6 — at k=3 short rows that is ~GB-scale working set,
  * far past where the heap plan stopped being the right choice): the
  * error names the conf and the window fallback instead of dying with
  * an undiagnosable executor OOM. Keys are hash-clustered, so the cap
  * applies to keys-per-PARTITION — raising shuffle partitions lowers
  * the per-partition key count proportionally.
  *
  * This is the tier-(c) extension path (custom logical node →
  * `SparkStrategy` → physical `SparkPlan`, registered through
  * `SparkSessionExtensions`): the semantics ARE expressible with
  * built-ins (and every oracle replays the window form), but the
  * built-in plan's cost shape is wrong at scale — the one case the
  * design rules reserve for a custom operator.
  *
  * Correctness contract: `order` must be a TOTAL order (include a
  * unique tiebreak column) — the operator asserts nothing about ties;
  * like the window form, a non-total order returns an arbitrary
  * member of each tie class. Distribution: declares
  * `ClusteredDistribution(keys)`, so EnsureRequirements inserts the
  * same hash exchange a window would get — already-clustered children
  * (e.g. straight out of a groupBy on the same keys) skip the
  * exchange entirely, which the window form also does. */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "topKPerKey: k must be >= 1")
  require(keys.nonEmpty, "topKPerKey: keys must be non-empty " +
    "(global top-k is orderBy(...).limit(k), which Spark already " +
    "plans as TakeOrderedAndProject)")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(c: LogicalPlan): TopKPerKeyNode =
    copy(child = c)
}

/** Planner strategy for [[TopKPerKeyNode]] (injected by
  * `GraftExtensions`). */
class TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
                          k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val kLocal = k
    val keysLocal = keys
    val orderLocal = order
    val attrs = child.output
    val maxKeys = conf.getConfString(
      "spark.graft.topk.maxKeysPerPartition", "8000000").toLong
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(keysLocal, attrs)
      val ord = RowOrdering.create(orderLocal, attrs)
      // worst row at the head so one peek decides admission
      val worstFirst = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int =
          ord.compare(b, a)
      }
      val heaps =
        new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= maxKeys) throw new IllegalStateException(
            s"TopKPerKeyExec: more than $maxKeys distinct keys in one " +
              "partition — the heap operator has no spill path, so this " +
              "working set risks an executor OOM. Raise " +
              "spark.graft.topk.maxKeysPerPartition (with executor memory " +
              "to match), raise spark.sql.shuffle.partitions to spread " +
              "keys, or use the row_number window form, which spills.")
          heap = new java.util.PriorityQueue[InternalRow](kLocal, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kLocal) heap.add(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.add(row.copy())
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      val hIt = heaps.values().iterator()
      while (hIt.hasNext) {
        val arr = hIt.next().toArray(Array.empty[InternalRow])
        java.util.Arrays.sort(arr, ord)
        out ++= arr
      }
      out.iterator
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}
