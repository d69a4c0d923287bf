package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ES `_reindex`: build a NEW index from the subset of an existing index's
  * documents matching an engine query.
  *
  * ES reindex copies stored `_source`; this engine's docs relation
  * deliberately stores no content (SURVEY §1.3 — identity + lineage only),
  * so reindex re-reads the SOURCE corpus. That is the reference's own
  * shape: every ES index it ships is (re)built from the source table, never
  * from another index (`luigi_pipeline/seqr_loading.py` re-runs the
  * pipeline; ES is a sink keyed by `es.mapping.id` for idempotent
  * re-export, `luigi_pipeline/lib/hail_tasks.py:263`).
  *
  * The per-row sha256 lineage invariant makes the corpus re-read safe:
  * after the build, every reindexed document's content hash is verified
  * EQUAL (by identity key) to the hash the source index recorded at ITS
  * build time — a corpus that drifted since then fails loudly instead of
  * silently reindexing different bytes (the validation-semi-join analogue:
  * `luigi_pipeline/lib/hail_tasks.py:96-120`).
  */
object Reindex {
  private val KeyCols = Seq("repo", "path", "commit")

  /** Build `dstIndexDir` from the `query` match set of `srcIndexDir`,
    * re-reading matched documents from `corpus` (one distributed semi-join;
    * the match set is never collected). Returns the number of reindexed
    * documents. Fails if the query matches nothing (an empty index has no
    * meaningful stats) or if any matched document's content changed since
    * the source index was built. */
  def reindex(
      spark: SparkSession,
      srcIndexDir: String,
      corpus: DataFrame,
      dstIndexDir: String,
      query: String,
      cfg: IndexConfig = IndexConfig()): Long = {
    val sr = new graft.search.Searcher(spark, srcIndexDir, cfg.io)
    val matched = sr.scan(query, Seq("repo", "path", "commit", "sha256"))
    val sub = corpus.join(matched.select(KeyCols.map(col): _*), KeyCols, "left_semi")
    require(!sub.isEmpty, s"reindex query '$query' matched no documents of $srcIndexDir")
    new IndexBuilder(spark, cfg).build(sub, dstIndexDir, resume = false)
    // lineage gate: (identity, sha256) must agree row-for-row in both
    // directions — missing/changed source docs AND unexpected extras fail
    val onCols = KeyCols :+ "sha256"
    val dstDocs = cfg.io.read(spark, s"$dstIndexDir/docs").select(onCols.map(col): _*)
    val srcSel = matched.select(onCols.map(col): _*)
    val missing = srcSel.join(dstDocs, onCols, "left_anti").count()
    val extra = dstDocs.join(srcSel, onCols, "left_anti").count()
    require(missing == 0L && extra == 0L,
      s"reindex lineage mismatch vs $srcIndexDir: $missing source docs missing or " +
        s"content-drifted, $extra unexpected documents in $dstIndexDir")
    Json.read(s"$dstIndexDir/meta.json", classOf[IndexMeta]).numDocs
  }
}
