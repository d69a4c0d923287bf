package graft.index

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.storage.StorageLevel

/** Deterministic dense 0-based id assignment by global sort order.
  *
  * The reference keys documents with a human-readable ≤512-char id used for
  * idempotent upserts (`luigi_pipeline/lib/model/seqr_mt_schema.py:86-88`,
  * `es.mapping.id` at `luigi_pipeline/lib/hail_tasks.py:263`); postings need
  * a *dense int64* id instead, assigned by global key order so re-builds are
  * idempotent.
  *
  * Scale notes (SURVEY.md §7 hard part 3): a single `Window.orderBy` would
  * serialize on one task and `monotonically_increasing_id` is non-dense, so
  * we range-repartition + sort, count per partition (tiny driver collect —
  * one long per partition), and add the cumulative offset in a second pass.
  * Range partition indices are ordered by key, so offsets in pid order give
  * a globally dense, sorted id. The sorted intermediate is persisted so the
  * shuffle/sort runs once, not twice.
  *
  * The partition id is materialized as a column with `spark_partition_id()`
  * (bound to the RDD partition index at this stage) rather than read from
  * `TaskContext` inside the closure: a downstream narrow `coalesce` runs
  * many parent partitions inside one task, where the task's partition id
  * would be the same for all of them and the offsets would silently
  * collapse to partition 0's.
  */
object DenseIds {

  final case class WithId(df: DataFrame, release: () => Unit)

  def assign(
      df: DataFrame,
      sortCols: Seq[String],
      idCol: String,
      numPartitions: Int): WithId = {
    val cols = sortCols.map(col)
    val sorted = df
      .repartitionByRange(numPartitions, cols: _*)
      .sortWithinPartitions(cols: _*)
      .withColumn("_pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)

    val counts: Array[Row] = sorted.groupBy(col("_pid")).count().collect()
    val byPid = counts.map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = new Array[Long](numPartitions)
    var acc = 0L
    byPid.foreach { case (pid, c) => offsets(pid) = acc; acc += c }
    // a pid with no rows never appears in `counts`; its offset is unused
    val bc = sorted.sparkSession.sparkContext.broadcast(offsets)

    val pidIdx = sorted.schema.fieldIndex("_pid")
    val outSchema = df.schema.add(idCol, LongType, nullable = false)
    val out = sorted.mapPartitions { it =>
      val off = bc.value
      var curPid = -1
      var i = 0L
      it.map { r =>
        val pid = r.getInt(pidIdx)
        if (pid != curPid) { curPid = pid; i = 0L }
        val id = off(pid) + i
        i += 1
        Row.fromSeq(r.toSeq.patch(pidIdx, Nil, 1) :+ id)
      }
    }(Encoders.row(outSchema))
    WithId(out, () => { sorted.unpersist(); () })
  }
}
