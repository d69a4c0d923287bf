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

  /** `total` is the exact input row count — already on the driver from the
    * per-partition counts pass, so callers never need a read-back count(). */
  final case class WithId(df: DataFrame, total: Long, release: () => Unit)

  /** A precomputed dense-id plan: key-range boundaries plus the id offset
    * and exact row count of each range, all computed from a CHEAP projection
    * of the key columns (column-pruned scan — never the content). With the
    * plan broadcast, the expensive table gets its dense ids in ONE wide pass
    * (partition by range → sort within → add offset) with no executor cache
    * of content-scale rows and no second counting job — the offsets are
    * already exact.
    *
    * `firstKeys(i)` is the least key of populated range i (ascending). A row
    * belongs to range i iff firstKeys(i) <= key < firstKeys(i+1), which
    * reproduces the planning shuffle's range assignment exactly for every
    * key that participated in planning (each planning partition holds a
    * contiguous key range and firstKeys are their minima). Requires the
    * source to be deterministic across the two reads — true for file/table
    * sources; the caller's input fingerprint guards listing changes. */
  final case class RangePlan(
      cols: Seq[String],
      firstKeys: Array[Array[String]],
      offsets: Array[Long],
      counts: Array[Long]) {

    def total: Long = offsets.lastOption.fold(0L)(_ + counts.last)
    def numRanges: Int = firstKeys.length

    /** Greatest i with firstKeys(i) <= key (lexicographic on the string
      * tuple); 0 for a key below every boundary (cannot occur for keys seen
      * at planning time). */
    def rangeOf(key: Array[String]): Int = {
      var lo = 0
      var hi = firstKeys.length - 1
      while (lo < hi) {
        val mid = (lo + hi + 1) >>> 1
        if (compareKeys(firstKeys(mid), key) <= 0) lo = mid else hi = mid - 1
      }
      lo
    }
  }

  private def compareKeys(a: Array[String], b: Array[String]): Int = {
    var i = 0
    while (i < a.length) {
      val c = a(i).compareTo(b(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  /** Build a [[RangePlan]] from the key columns alone: one identity-scale
    * job (range shuffle of the pruned projection + per-partition count/min).
    * `numRanges` may exceed the physical partition count the plan is later
    * applied with — finer ranges smooth the hash placement of ranges onto
    * partitions. */
  def plan(keys: DataFrame, cols: Seq[String], numRanges: Int): RangePlan = {
    val kcols = cols.map(col)
    val rows = keys
      .repartitionByRange(numRanges, kcols: _*)
      // stage-bound partition id: evaluated in the stage that reads the
      // range exchange, before any aggregation boundary (see class doc)
      .withColumn("_pid", spark_partition_id())
      .groupBy(col("_pid"))
      .agg(count(lit(1)).as("c"), min(struct(kcols: _*)).as("firstKey"))
      .collect()
    // empty planning partitions never appear; renumber populated ranges
    // 0..m-1 in partition-id order (== key order for a range partitioner)
    val byPid = rows.map { r =>
      val fk = r.getStruct(r.fieldIndex("firstKey"))
      (r.getInt(0), r.getLong(1), Array.tabulate(cols.length)(fk.getString))
    }.sortBy(_._1)
    val counts = byPid.map(_._2)
    val offsets = new Array[Long](counts.length)
    var acc = 0L
    var i = 0
    while (i < counts.length) { offsets(i) = acc; acc += counts(i); i += 1 }
    RangePlan(cols, byPid.map(_._3), offsets, counts)
  }

  /** One-wide-pass id assignment via a precomputed [[RangePlan]] over the
    * same DataFrame: plan from the key projection (one job: range shuffle
    * of the keys + per-range count/min collect), then a single
    * partition→sort→offset pass produces the id'd rows. Two jobs total vs
    * [[assign]]'s three, and no persist of the sorted intermediate.
    *
    * `df` MUST be deterministic across the two reads — persisted/cached
    * (the builder's term-stats case) or a pure file scan — because the
    * plan's exact per-range counts assume the assign pass sees the same
    * row multiset the planning pass did. */
  def assignPlanned(
      df: DataFrame,
      sortCols: Seq[String],
      idCol: String,
      numPartitions: Int): WithId = {
    val p = plan(df.select(sortCols.map(col): _*), sortCols, 4 * numPartitions)
    val bc = df.sparkSession.sparkContext.broadcast(p)
    val inSchema = df.schema
    val keyIdxs = sortCols.map(inSchema.fieldIndex).toArray
    val schemaPid = inSchema.add("_pid", org.apache.spark.sql.types.IntegerType, nullable = false)
    val withPid = df.mapPartitions { it =>
      val keyBuf = new Array[String](keyIdxs.length)
      it.map { r =>
        var i = 0
        while (i < keyIdxs.length) { keyBuf(i) = r.getString(keyIdxs(i)); i += 1 }
        Row.fromSeq(r.toSeq :+ bc.value.rangeOf(keyBuf))
      }
    }(Encoders.row(schemaPid))
    val pidIdx = schemaPid.fieldIndex("_pid")
    val outSchema = inSchema.add(idCol, LongType, nullable = false)
    val out = withPid
      .repartition(numPartitions, col("_pid"))
      .sortWithinPartitions((col("_pid") +: sortCols.map(col)): _*)
      .mapPartitions { it =>
        val off = bc.value.offsets
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
    WithId(out, p.total, () => ())
  }

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
    WithId(out, acc, () => { sorted.unpersist(); () })
  }
}
