package graft.plans

import org.apache.spark.SparkEnv
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, RowOrdering, SortOrder, SortPrefix, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.DataTypeUtils
import org.apache.spark.sql.execution.{SortPrefixUtils, SparkPlan, SparkStrategy, UnaryExecNode, UnsafeExternalRowSorter}

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
  * MEMORY CONTRACT — the hash-aggregate discipline: the heap map is
  * plain JVM heap, bounded by `spark.graft.topk.maxKeysPerPartition`
  * distinct keys (default 8e6; at k=3 short rows that is ~GB-scale
  * working set). Past the cap the operator DEGRADES to a managed
  * sort-based pass — retained candidates plus the remaining input go
  * through an `UnsafeExternalRowSorter` (TaskMemoryManager-accounted,
  * spills to disk) ordered by (key, order), and the output is the
  * first k rows per key group — exactly the hash aggregate's
  * sort-fallback shape, so a pathological key cardinality finishes
  * instead of OOMing. Eviction before the switch is safe: a row
  * evicted from a key's heap already had k better rows for that key,
  * so the candidate set entering the sort still contains every true
  * top-k row. Keys are hash-clustered, so the cap applies to
  * keys-per-PARTITION — raising shuffle partitions lowers the
  * per-partition key count proportionally.
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
      var sorter: UnsafeExternalRowSorter = null
      lazy val toUnsafe = UnsafeProjection.create(attrs, attrs)
      def insertSorter(r: InternalRow): Unit = r match {
        case u: UnsafeRow => sorter.insertRow(u)
        case other => sorter.insertRow(toUnsafe(other)) // insertRow copies
      }
      while (it.hasNext && sorter == null) {
        val row = it.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null && heaps.size() < maxKeys) {
          heap = new java.util.PriorityQueue[InternalRow](kLocal, worstFirst)
          heaps.put(key.copy(), heap)
        }
        if (heap != null) {
          if (heap.size() < kLocal) heap.add(row.copy())
          else if (ord.compare(row, heap.peek()) < 0) {
            heap.poll(); heap.add(row.copy())
          }
        } else {
          // key cap hit: switch to the managed sort-based fallback —
          // (key, order)-sorted external sort over the retained
          // candidates plus everything not yet consumed
          // real radix prefix from the first sort column (the SortExec
          // pattern) — a constant prefix would push EVERY comparison in
          // this degraded path through the full record comparator,
          // making the fallback that exists for pathological key
          // cardinality run at its slowest possible sort speed
          val boundFirst = BindReferences.bindReference(
            SortOrder(keysLocal.head, Ascending), attrs)
          val prefixExpr = SortPrefix(boundFirst)
          val prefixProj = UnsafeProjection.create(Seq(prefixExpr))
          sorter = UnsafeExternalRowSorter.create(
            DataTypeUtils.fromAttributes(attrs),
            RowOrdering.create(
              keysLocal.map(SortOrder(_, Ascending)) ++ orderLocal, attrs),
            SortPrefixUtils.getPrefixComparator(boundFirst),
            new UnsafeExternalRowSorter.PrefixComputer {
              private val p = new UnsafeExternalRowSorter.PrefixComputer.Prefix
              override def computePrefix(row: InternalRow)
                  : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
                val r = prefixProj.apply(row)
                p.isNull = r.isNullAt(0)
                p.value = if (p.isNull) prefixExpr.nullValue else r.getLong(0)
                p
              }
            },
            SparkEnv.get.memoryManager.pageSizeBytes,
            SortPrefixUtils.canSortFullyWithPrefix(boundFirst)
              && keysLocal.size == 1 && orderLocal.isEmpty)
          val hIt = heaps.values().iterator()
          while (hIt.hasNext) hIt.next().forEach(insertSorter(_))
          heaps.clear()
          insertSorter(row)
        }
      }
      if (sorter == null) {
        val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
        val hIt = heaps.values().iterator()
        while (hIt.hasNext) {
          val arr = hIt.next().toArray(Array.empty[InternalRow])
          java.util.Arrays.sort(arr, ord)
          out ++= arr
        }
        out.iterator
      } else {
        while (it.hasNext) insertSorter(it.next())
        val sorted = sorter.sort()
        // first k rows of every (key-adjacent, order-sorted) group
        new Iterator[InternalRow] {
          private var curKey: UnsafeRow = null
          private var n = 0
          private var pending: InternalRow = null
          private def fetch(): Boolean = {
            while (pending == null && sorted.hasNext) {
              val r = sorted.next()
              val k2 = keyProj(r)
              if (curKey == null || k2 != curKey) { curKey = k2.copy(); n = 0 }
              n += 1
              if (n <= kLocal) pending = r
            }
            pending != null
          }
          override def hasNext: Boolean = pending != null || fetch()
          override def next(): InternalRow = {
            if (pending == null && !fetch()) throw new NoSuchElementException
            val r = pending; pending = null; r
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(c: SparkPlan): TopKPerKeyExec =
    copy(child = c)
}
