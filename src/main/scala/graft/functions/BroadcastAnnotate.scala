package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** "Annotate via broadcast side-table" utilities — the reference's liftover
  * pattern (`luigi_pipeline/lib/hail_tasks.py:199-210`: map each row's
  * coordinate through a small broadcast chain/interval table) and its
  * driver-literal map lookups (`sv_mt_schema.py:155-158`, F21/J10).
  *
  * Both are narrow on the big side: the small side broadcasts, no shuffle
  * of `df` — the only join shape that survives a 10^12-row left side. */
object BroadcastAnnotate {

  /** Left broadcast range-join: annotate each row whose `point` falls in
    * `[start, end)` of an interval row with the interval table's payload
    * columns (null when no interval matches). Intervals are expected
    * non-overlapping (single-match, the liftover shape); use plain q15-style
    * join + collect_list for the all-matches form (J7). */
  def byInterval(
      df: DataFrame,
      intervals: DataFrame,
      point: Column,
      startCol: String = "start",
      endCol: String = "end"): DataFrame =
    df.join(broadcast(intervals), point >= col(startCol) && point < col(endCol), "left")

  /** Annotate via a driver-side literal map (≲ a few thousand entries —
    * `typedLit` inlines it into the plan; null on missing key). */
  def byMap(df: DataFrame, m: Map[String, String], key: Column, outName: String): DataFrame =
    df.withColumn(outName, element_at(typedLit(m), key))
}
