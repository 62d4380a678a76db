package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, SortOrder}
import org.apache.spark.sql.graftbridge.ColumnBridge

import graft.plans.TopKPerKeyNode

/** Public API over the custom [[graft.plans.TopKPerKeyNode]] physical
  * top-k-per-key operator — see that node's scaladoc for the cost
  * argument vs the `row_number() OVER (...) <= k` window form.
  *
  * `orderBy` is (column, ascending) pairs and MUST form a total order
  * (append a unique id as the last tiebreak) for deterministic,
  * oracle-replayable output. */
object TopK {

  def perKey(df: DataFrame, keys: Seq[String],
             orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    val child = df.queryExecution.analyzed
    def attr(name: String) = child.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"topKPerKey: no column '$name' in ${child.output.map(_.name)}"))
    val keyExprs = keys.map(attr)
    val sortOrders = orderBy.map { case (name, asc) =>
      SortOrder(attr(name), if (asc) Ascending else Descending)
    }
    ColumnBridge.ofRows(df.sparkSession,
      TopKPerKeyNode(keyExprs, sortOrders, k, child))
  }
}
