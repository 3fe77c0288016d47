package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operators beyond raw built-ins (SURVEY.md §2.3, §2.5-2.7).
  *
  * Joins, projections, filters, unions, distinct are Catalyst built-ins
  * and used directly at query sites; this object holds only compositions
  * that add semantics — top-k per group, global top-k, sessionization.
  */
object RelOps {

  /** Top-k rows per group by `order` (ranking-window family the engine
    * exposes per SURVEY §2.5). Physical shape: one hash-partition
    * exchange on `part`, per-partition sort, early-stop rank filter —
    * no global sort, so it scales with the largest group, not the table. */
  def topKPerGroup(df: DataFrame, part: Seq[Column], order: Seq[Column],
                   k: Int, rankCol: String = "rn"): DataFrame =
    df.withColumn(rankCol,
        row_number().over(Window.partitionBy(part: _*).orderBy(order: _*)))
      .filter(col(rankCol) <= k)

  /** Global top-k: orderBy+limit plans as `TakeOrderedAndProject` —
    * per-partition heap of k, then a k-row driver merge. O(n) scan,
    * no global sort even at 100 TB. */
  def topK(df: DataFrame, order: Seq[Column], k: Int): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Gap-based sessionization over an event stream (batch form): a new
    * session starts when the gap to the previous event of the same key
    * exceeds `gapSeconds`. One exchange on `keyCol` + one sort — the
    * standard lag/cumsum formulation. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String,
                 gapSeconds: Long): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    val tsSec = unix_timestamp(col(tsCol))
    df.withColumn("_prev", lag(tsSec, 1).over(byKey))
      .withColumn("_new_session",
        when(col("_prev").isNull ||
             tsSec - col("_prev") > gapSeconds, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("_new_session")).over(
          byKey.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("_prev", "_new_session")
  }
}
