package graft.index

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One live segment in a segmented index. */
final case class SegmentEntry(
    name: String,
    numDocs: Long,
    sumDl: Long,
    numTerms: Long,
    numPostings: Long,
    lineage: Long)

/** Atomic manifest of a segmented index: the list of live segments plus the
  * last ingested streaming batch id (exactly-once replay guard). */
final case class SegmentsManifest(
    segments: Seq[SegmentEntry],
    nextId: Long,
    lastBatchId: Long,
    configHash: String)

/** A multi-segment index with O(batch) ingest and tiered compaction — the
  * Lucene/ES segment model re-expressed over the builder/merger primitives.
  *
  * The reference's incremental contract is ES upsert + periodic forcemerge
  * (`hail_elasticsearch_client.py:98-116,213`): per-batch work must not
  * scale with index size. A full [[IndexMerger]] merge per delta is
  * O(index) per batch (O(N²) for a stream) — so instead each batch becomes
  * its OWN segment (an ordinary [[IndexBuilder]] build over just the batch),
  * and queries run over all segments with exact global stats
  * ([[graft.search.MultiSearcher]]).
  *
  * Invariant: document identities are DISJOINT across segments. An
  * incoming batch that overlaps existing identities triggers an eager
  * merge of ONLY the overlapped segments with the new delta (newest wins —
  * upsert semantics); untouched segments are not read, let alone
  * rewritten. With disjoint segments, global N/avgdl/df are exact sums and
  * multi-segment query scores are bit-identical to a fresh single build —
  * no tombstones, no stat drift (the ES model accepts drift until merge;
  * the correctness gate here is bit-identity, so overlap pays an eager
  * merge instead).
  *
  * Overlap detection reads only the identity columns of each segment's
  * docs table against the broadcast batch key set — metadata-scale, never
  * postings. Tiered compaction bounds the segment count: while more than
  * `maxSegments` segments exist, the two smallest merge (amortized
  * O(N log N) total work, the standard tiered-merge argument).
  *
  * Crash safety (build-then-publish at every step): new segment
  * directories are fully built (each with its own meta.json) BEFORE the
  * manifest swap; `segments.json` is written atomically (tmp+rename);
  * replaced/orphaned directories are deleted only after the swap and are
  * re-collected by [[cleanup]] on the next ingest. A reader always sees a
  * complete manifest pointing at complete segments.
  */
class SegmentedIndex(
    spark: SparkSession,
    dir: String,
    cfg: IndexConfig = IndexConfig(),
    maxSegments: Int = 4) {

  private val KeyCols = Seq("repo", "path", "commit")
  private def manifestPath = s"$dir/segments.json"

  def manifest: Option[SegmentsManifest] =
    if (Json.exists(manifestPath)) Some(Json.read(manifestPath, classOf[SegmentsManifest]))
    else None

  def segmentDir(name: String): String = s"$dir/$name"

  /** Delete any `seg-*` directory not referenced by the manifest — leftovers
    * of a crash between segment build and manifest swap (or between swap and
    * old-dir deletion). Safe at ingest start: unreferenced dirs are never
    * read. */
  private def cleanup(): Unit = {
    val live: Set[String] = manifest.map(_.segments.map(_.name).toSet).getOrElse(Set.empty)
    val p = Paths.get(dir)
    if (Files.isDirectory(p)) {
      val stream = Files.list(p)
      try stream.forEach { child =>
        val n = child.getFileName.toString
        if (n.startsWith("seg-") && !live.contains(n)) cfg.io.dropTree(spark, child.toString)
      } finally stream.close() // Files.list holds a directory fd until closed
    }
  }

  private def entryFor(name: String): SegmentEntry = {
    val m = Json.read(s"${segmentDir(name)}/meta.json", classOf[IndexMeta])
    SegmentEntry(name, m.numDocs, m.sumDl, m.numTerms, m.numPostings, m.lineage)
  }

  /** Ingest one batch (streaming micro-batch or ad-hoc delta). `batchId` is
    * the exactly-once replay guard: a batch with id ≤ lastBatchId is a
    * replay of already-published work and is skipped. */
  def ingest(batch: DataFrame, batchId: Long = -1L): Unit = {
    val cur = manifest
    if (cur.exists(m => batchId >= 0 && batchId <= m.lastBatchId)) return
    cleanup()
    val builder = new IndexBuilder(spark, cfg)

    cur match {
      case None =>
        builder.build(batch, segmentDir("seg-0"), resume = false)
        Json.write(manifestPath,
          SegmentsManifest(Seq(entryFor("seg-0")), 1L, batchId, cfg.configHash))
      case Some(m0) =>
        require(m0.configHash == cfg.configHash,
          s"segmented index at $dir has configHash ${m0.configHash}, ingest cfg is ${cfg.configHash}")
        // an ad-hoc ingest (batchId = -1) must not clobber the streaming
        // replay watermark — keep the max ever published
        val watermark = math.max(m0.lastBatchId, batchId)
        var nextId = m0.nextId

        // ---- overlap detection: identity columns only, broadcast batch keys
        val batchKeys = batch.select(KeyCols.map(col): _*).distinct()
        val overlapped: Seq[SegmentEntry] = m0.segments.filter { seg =>
          cfg.io.read(spark, s"${segmentDir(seg.name)}/docs")
            .select(KeyCols.map(col): _*)
            .join(broadcast(batchKeys), KeyCols, "left_semi")
            .limit(1).count() > 0
        }

        // ---- delta segment: O(batch) build
        val deltaName = s"seg-$nextId"; nextId += 1
        builder.build(batch, segmentDir(deltaName), resume = false)

        // ---- eager merge of overlapped segments with the delta (delta is
        // always the B side of the final merge so the newest doc wins)
        var segments: Seq[SegmentEntry] = m0.segments.filterNot(overlapped.contains)
        var newest = deltaName
        if (overlapped.nonEmpty) {
          var acc = overlapped.head.name
          for (next <- overlapped.tail.map(_.name) :+ newest) {
            val out = s"seg-$nextId"; nextId += 1
            IndexMerger.merge(spark, segmentDir(acc), segmentDir(next), segmentDir(out), cfg)
            acc = out
          }
          newest = acc
        }
        segments = segments :+ entryFor(newest)

        // ---- tiered compaction: merge the two smallest until bounded
        while (segments.length > maxSegments) {
          val Seq(a, b) = segments.sortBy(_.numPostings).take(2)
          val out = s"seg-$nextId"; nextId += 1
          IndexMerger.merge(spark, segmentDir(a.name), segmentDir(b.name), segmentDir(out), cfg)
          segments = segments.filterNot(s => s.name == a.name || s.name == b.name) :+ entryFor(out)
        }

        // ---- atomic publish, then collect replaced dirs
        val newManifest = SegmentsManifest(segments, nextId, watermark, cfg.configHash)
        Json.write(manifestPath, newManifest)
        val live = segments.map(_.name).toSet
        (m0.segments.map(_.name).toSet ++ Set(deltaName) -- live)
          .foreach(n => cfg.io.dropTree(spark, segmentDir(n)))
        cleanup()
    }
  }

  /** Delete documents by identity across segments. Only segments that
    * actually contain a deleted identity are rewritten (detected by the
    * same metadata-scale broadcast semi-probe as ingest overlap); every
    * other segment stays byte-untouched. Rewrites are physical purges
    * ([[IndexMerger.purge]]): fresh dense ids, recomputed dictionary and
    * stats — so with disjoint segments the whole index stays bit-identical
    * to a fresh single build over the surviving corpus (no tombstones, no
    * df/avgdl drift — the ES/Lucene model masks deletes and accepts drift
    * until merge; the correctness gate here forbids that). A segment whose
    * every document is deleted is dropped from the manifest.
    *
    * Crash-safe like ingest: purged segments are fully built under new
    * names BEFORE the atomic manifest swap; replaced dirs are deleted
    * after, and [[cleanup]] re-collects leftovers. */
  def delete(keys: DataFrame): Unit = manifest.foreach { m0 =>
    require(m0.configHash == cfg.configHash,
      s"segmented index at $dir has configHash ${m0.configHash}, delete cfg is ${cfg.configHash}")
    cleanup()
    val keyRows = keys.select(KeyCols.map(col): _*).distinct()
    var nextId = m0.nextId
    var segments = m0.segments
    var touched = Set.empty[String]
    for (e <- m0.segments) {
      val d = segmentDir(e.name)
      val hit = cfg.io.read(spark, s"$d/docs")
        .select(KeyCols.map(col): _*)
        .join(broadcast(keyRows), KeyCols, "left_semi")
        .limit(1).count() > 0
      if (hit) {
        val out = s"seg-$nextId"; nextId += 1
        IndexMerger.purge(spark, d, keyRows, segmentDir(out), cfg) match {
          case Some(_) =>
            segments = segments.map(s => if (s.name == e.name) entryFor(out) else s)
          case None => // the whole segment was deleted
            segments = segments.filterNot(_.name == e.name)
        }
        touched += e.name
      }
    }
    if (touched.nonEmpty) {
      Json.write(manifestPath, SegmentsManifest(segments, nextId, m0.lastBatchId, cfg.configHash))
      touched.foreach(n => cfg.io.dropTree(spark, segmentDir(n)))
      cleanup()
    }
  }

  /** Force-merge everything into one segment (the reference's forcemerge,
    * `hail_elasticsearch_client.py:213`) — restores tight block-max bounds
    * and single-segment query shape. */
  def forceMerge(): Unit = manifest.foreach { m0 =>
    var nextId = m0.nextId
    var segments = m0.segments
    while (segments.length > 1) {
      val Seq(a, b) = segments.sortBy(_.numPostings).take(2)
      val out = s"seg-$nextId"; nextId += 1
      IndexMerger.merge(spark, segmentDir(a.name), segmentDir(b.name), segmentDir(out), cfg)
      segments = segments.filterNot(s => s.name == a.name || s.name == b.name) :+ entryFor(out)
    }
    Json.write(manifestPath, SegmentsManifest(segments, nextId, m0.lastBatchId, cfg.configHash))
    (m0.segments.map(_.name).toSet -- segments.map(_.name).toSet)
      .foreach(n => cfg.io.dropTree(spark, segmentDir(n)))
    cleanup()
  }
}
