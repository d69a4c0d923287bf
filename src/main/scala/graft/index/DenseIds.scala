package graft.index

import org.apache.spark.TaskContext
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
      .persist(StorageLevel.MEMORY_AND_DISK)

    val counts: Array[Row] =
      sorted.groupBy(spark_partition_id().as("_pid")).count().collect()
    val byPid = counts.map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = new Array[Long](numPartitions)
    var acc = 0L
    byPid.foreach { case (pid, c) => offsets(pid) = acc; acc += c }
    // a pid with no rows never appears in `counts`; its offset is unused
    val bc = sorted.sparkSession.sparkContext.broadcast(offsets)

    val outSchema = sorted.schema.add(idCol, LongType, nullable = false)
    val out = sorted.mapPartitions { it =>
      val base = bc.value(TaskContext.getPartitionId())
      var i = 0L
      it.map { r =>
        val id = base + i
        i += 1
        Row.fromSeq(r.toSeq :+ id)
      }
    }(Encoders.row(outSchema))
    WithId(out, () => { sorted.unpersist(); () })
  }
}
