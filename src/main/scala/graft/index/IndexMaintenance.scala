package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Post-publish index maintenance.
  *
  * [[updateDocFields]] is the engine analogue of the reference's ES
  * `update`/`upsert` write operations keyed by docId
  * (`hail_scripts/elasticsearch/hail_elasticsearch_client.py:98-116`,
  * constants `elasticsearch_utils.py:15-21`): the seqr pipeline re-exports
  * refreshed annotation fields onto existing documents without reloading
  * the callset. Here: stored columns on the `docs` table are patched by
  * document identity; the posting lists — the analyzed-text side — are
  * untouched, so queries and scores are unaffected.
  */
object IndexMaintenance {

  private val KeyCols = Seq("repo", "path", "commit")
  /** columns that define index structure — never patchable */
  private val Structural = Set("docId", "sha256", "dl")

  /** Patch/add stored document fields. `updates` must carry the identity
    * key columns plus the fields to set; rows for unknown documents are
    * ignored (ES `update` semantics — no upsert of unindexed docs). The
    * docs table is rewritten atomically; a second identical call is a
    * no-op in effect (idempotent). */
  def updateDocFields(
      spark: SparkSession,
      indexDir: String,
      updates: DataFrame,
      io: TableIO = ParquetDirIO): Unit = {
    val updCols = updates.columns.filterNot(KeyCols.contains).toSeq
    require(updCols.nonEmpty, "no update columns given")
    // a keyword/analyzed column's stored value must stay in sync with its
    // postings — patching one would silently desync filters/scores
    val meta = Json.read(s"$indexDir/meta.json", classOf[IndexMeta])
    val protectedCols = Structural ++ meta.keywords ++ meta.analyzed ++ meta.nested ++
      meta.denseVectors ++ meta.denseVectors.map(f => s"_ivf_$f")
    val bad = updCols.filter(protectedCols.contains)
    require(bad.isEmpty,
      s"structural/indexed columns cannot be patched (rebuild instead): ${bad.mkString(",")}")

    val docsDir = s"$indexDir/docs"
    io.recover(spark, docsDir) // heal a prior update that died mid-swap
    val docs = io.read(spark, docsDir)
    val renamed = updCols.foldLeft(updates)((d, c) => d.withColumnRenamed(c, s"__upd_$c"))
    val joined = docs.join(renamed, KeyCols, "left")
    val patched = updCols.foldLeft(joined) { (d, c) =>
      if (docs.columns.contains(c))
        d.withColumn(c, coalesce(col(s"__upd_$c"), col(c))).drop(s"__upd_$c")
      else d.withColumnRenamed(s"__upd_$c", c)
    }

    val tmp = s"$indexDir/_docs.updating"
    io.write(patched, tmp)
    // verify row count before swapping in (guards a bad many-to-one join)
    val before = docs.count()
    val after = io.read(spark, tmp).count()
    require(after == before,
      s"update would change doc count ($before -> $after); updates must be unique per document")
    io.replace(spark, tmp, docsDir) // old docs survive a mid-swap crash
  }

  /** Delete documents by identity from a published single index, IN PLACE
    * (build-then-publish: the old index stays live until the atomic swap).
    * Physical-purge semantics — see [[IndexMerger.purge]]: the result is
    * logically identical to a fresh build over the surviving corpus.
    * Returns false (no-op) when no key matches an indexed document; refuses
    * to delete every document (drop the index directory instead — an empty
    * index has no meaningful stats to serve). */
  def deleteDocs(
      spark: SparkSession,
      indexDir: String,
      keys: DataFrame,
      cfg: IndexConfig = IndexConfig()): Boolean = {
    val keyRows = keys.select(KeyCols.map(col): _*).distinct()
    val hit = cfg.io.read(spark, s"$indexDir/docs")
      .select(KeyCols.map(col): _*)
      .join(broadcast(keyRows), KeyCols, "left_semi")
      .limit(1).count() > 0
    if (!hit) return false
    IndexMerger.purge(spark, indexDir, keyRows, indexDir, cfg) match {
      case Some(_) => true
      case None => throw new IllegalStateException(
        s"delete would remove every document of $indexDir — drop the index directory instead")
    }
  }

  /** ES `update_by_query`: patch stored fields on every document matching
    * an engine query (full bool semantics — terms, phrases, filters,
    * ranges, negations). `assignments` are Column expressions evaluated
    * over the matched document's stored row (the painless `ctx._source`
    * analogue: new values may be computed from existing stored fields).
    * Structural columns stay protected via [[updateDocFields]]. Returns the
    * number of matched (patched) documents; 0 = no-op, nothing rewritten. */
  def updateByQuery(
      spark: SparkSession,
      indexDir: String,
      query: String,
      assignments: Map[String, org.apache.spark.sql.Column],
      io: TableIO = ParquetDirIO): Long = {
    require(assignments.nonEmpty, "update_by_query needs at least one assignment")
    val sr = new graft.search.Searcher(spark, indexDir, io)
    val matched = sr.scan(query)
    val n = matched.count()
    if (n == 0L) return 0L
    val updates = matched.select(
      KeyCols.map(col) ++ assignments.toSeq.sortBy(_._1).map { case (c, e) => e.as(c) }: _*)
    updateDocFields(spark, indexDir, updates, io)
    n
  }

  /** ES `delete_by_query`: physically purge every document matching an
    * engine query — the match set feeds [[deleteDocs]], so the result is
    * logically identical to a fresh build over the survivors (no tombstone
    * drift; see the delete-semantics note there). Returns the number of
    * deleted documents; refuses to delete the whole index (ES would leave
    * an empty index — here stats would be meaningless; drop the directory
    * instead). */
  def deleteByQuery(
      spark: SparkSession,
      indexDir: String,
      query: String,
      cfg: IndexConfig = IndexConfig()): Long = {
    val sr = new graft.search.Searcher(spark, indexDir, cfg.io)
    val keys = sr.scan(query).select(KeyCols.map(col): _*)
    val n = keys.count()
    if (n > 0L) deleteDocs(spark, indexDir, keys, cfg)
    n
  }

  /** [[updateDocFields]] over a segmented index: only segments that
    * actually contain updated identities are touched (broadcast semi-probe
    * of the identity columns — metadata-scale), and each is patched
    * per-segment. Postings everywhere stay untouched. */
  def updateDocFieldsSegmented(
      spark: SparkSession,
      indexDir: String,
      updates: DataFrame,
      io: TableIO = ParquetDirIO): Unit = {
    val seg = new SegmentedIndex(spark, indexDir)
    val m = seg.manifest.getOrElse(
      throw new IllegalStateException(s"no segments.json under $indexDir"))
    val keys = updates.select(KeyCols.map(col): _*).distinct()
    for (e <- m.segments) {
      val d = seg.segmentDir(e.name)
      val hit = io.read(spark, s"$d/docs")
        .select(KeyCols.map(col): _*)
        .join(broadcast(keys), KeyCols, "left_semi")
        .limit(1).count() > 0
      if (hit) updateDocFields(spark, d, updates, io)
    }
  }
}
