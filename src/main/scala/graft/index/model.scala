package graft.index

/** On-disk index data model.
  *
  * The index replaces the reference's Elasticsearch sink (reference:
  * `hail_scripts/elasticsearch/hail_elasticsearch_client.py:97-199` bulk
  * export; `elasticsearch_client_v7.py:47-105` index DDL): instead of
  * shipping rows to ES and letting Lucene build postings, we build the
  * postings ourselves as Datasets stored columnar (Parquet locally; the
  * writer is format-pluggable for Iceberg in production).
  *
  * Layout under `indexDir/`:
  *   - `docs/`   — one row per document: identity, lineage sha256, length
  *   - `terms/`  — term dictionary with dense termId + collection stats
  *   - `blocks/` — delta+varint posting blocks (≤ blockSize docs each),
  *                 term-major, never spanning a shard boundary
  *   - `meta.json` — corpus stats + config + lineage (the reference's
  *                 globals→`_meta` path: `hail_elasticsearch_client.py:177-181`)
  */
/** Per-field index configuration, derived from the corpus schema — the
  * `elasticsearch_schema_for_table` analogue
  * (`hail_scripts/elasticsearch/elasticsearch_utils.py:70-121`: every tstr
  * maps to an ES `keyword`) with the `disable_index` knob
  * (`luigi_pipeline/lib/model/base_mt_schema.py:224-235` → stored column,
  * no postings).
  *
  * `keyword` columns are posting-listed as exact-match `field:value` filter
  * terms (never scored, excluded from dl); `storedOnly` columns are carried
  * into the docs table but produce no postings.
  *
  * `analyzed` columns are EXTRA full-text fields (the ES multi-field
  * mapping: `content` is always analyzed; each listed column is tokenized
  * with the same analyzer and posting-listed as `field:token` tagged terms
  * carrying the FIELD's document length, so per-field BM25 is exact). Each
  * analyzed field also emits one `field:` exists-marker term per document
  * with ≥1 token, whose tf is the field length — its dictionary row then
  * carries the field's docCount (df) and total token count (cf), i.e. the
  * per-field statistics (Lucene's docCount / sumTotalTermFreq) needed for
  * idf and avgdl, and they survive merge/delete/segmenting for free because
  * the marker is an ordinary term. Analyzed columns are also stored. */
final case class FieldConfig(
    keyword: Seq[String] = Seq("lang", "repo"),
    storedOnly: Seq[String] = Nil,
    analyzed: Seq[String] = Nil,
    /** `nested` columns are array<struct> (the reference's
      * tarray(tstruct)→ES `nested` mapping, `elasticsearch_utils.py:55-59`):
      * each element's atomic sub-fields emit `field.sub:value` filter terms
      * (per DISTINCT (sub, value) per doc — candidate pruning), and the
      * whole column is stored so the query path can verify that all clauses
      * of a nested query hit the SAME element (Lucene's block-join result,
      * achieved as a two-phase candidates→verify plan). */
    nested: Seq[String] = Nil,
    /** `denseVector` columns are array<float> / array<double> (the ES 8
      * `dense_vector` mapping): stored in the docs relation for kNN search,
      * no postings. With [[IndexConfig.ivfCells]] > 0 a seeded k-means
      * coarse quantizer is trained per field at build time and every doc's
      * cell id is stored as `_ivf_<field>` — a plain int column whose
      * `isin(probedCells)` filter pushes into the columnar scan, the IVF
      * pruning path of [[graft.search.Searcher.knn]]. */
    denseVector: Seq[String] = Nil,
    /** Per-field analyzer overrides for EXTRA analyzed fields — the ES
      * mapping's `analyzer` knob (kind + index-time stopwords/synonyms,
      * [[graft.analysis.AnalyzerSpec]]). Keys must be members of
      * [[analyzed]]; `content` always uses the code-aware analyzer. Part of
      * the index configHash (an analyzer change is an index change). */
    analyzers: Map[String, graft.analysis.AnalyzerSpec] = Map.empty) {

  /** Effective analyzer of an extra analyzed field. */
  def analyzerOf(field: String): graft.analysis.AnalyzerSpec =
    analyzers.getOrElse(field, graft.analysis.AnalyzerSpec.Code)
}

object FieldConfig {
  /** Derive from the corpus schema: every string column — and every
    * array<string> column, the reference's tarray(tstr)→keyword-array
    * rule (per-sample/tag lists) — except the analyzed `content` and the
    * `storedOnly` overrides becomes a keyword field; every array<struct>
    * column becomes a `nested` field (the tarray(tstruct)→nested rule,
    * `elasticsearch_utils.py:55-59`). */
  def derive(
      schema: org.apache.spark.sql.types.StructType,
      storedOnly: Set[String] = Set.empty): FieldConfig = {
    import org.apache.spark.sql.types._
    FieldConfig(
      keyword = schema.fields.collect {
        case f if (f.dataType == StringType ||
          (f.dataType.isInstanceOf[ArrayType] &&
            f.dataType.asInstanceOf[ArrayType].elementType == StringType)) &&
          f.name != "content" && !storedOnly.contains(f.name) => f.name
      }.toSeq,
      storedOnly = storedOnly.toSeq.sorted,
      nested = schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] &&
          f.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType] &&
          !storedOnly.contains(f.name) => f.name
      }.toSeq)
  }
}

final case class IndexConfig(
    buildPartitions: Int = 32,
    /** docs per shard; shard = docId / docsPerShard. A shard is the unit of
      * query-time parallelism (the ES shard analogue — sizing rule in the
      * reference: `luigi_pipeline/lib/hail_tasks.py:274-278`). */
    docsPerShard: Long = 1L << 16,
    blockSize: Int = 128,
    k1: Double = 1.2,
    b: Double = 0.75,
    /** resume granularity for the posting-build stage (termId-range buckets,
      * the Luigi-task-marker analogue: `luigi_pipeline/lib/hail_tasks.py:70-74`) */
    buildBuckets: Int = 4,
    fields: FieldConfig = FieldConfig(),
    /** store per-posting term positions (token-stream indices) — enables
      * `"exact phrase"` queries at the cost of a 4th encoded block column */
    storePositions: Boolean = false,
    /** storage implementation for every index relation — Parquet dirs in
      * the sandbox, catalog tables (Iceberg-shaped publish) in production.
      * NOT part of configHash: the logical index bytes are format-
      * independent; resume compatibility is a layout concern the manifests
      * already live next to. */
    io: TableIO = ParquetDirIO,
    /** broadcast the term dictionary in the termId-encode join when it has
      * at most this many terms — turning the ONLY term-string shuffle of
      * the build into a narrow map stage. Beyond it (truly web-scale
      * dictionaries) the join falls back to sort-merge. Execution strategy,
      * not index bytes → excluded from configHash. */
    broadcastDictMaxTerms: Long = 5_000_000L,
    /** IVF coarse-quantizer cells per denseVector field (0 = no quantizer:
      * kNN is exact-only). Trained at build with a deterministic seeded
      * k-means ([[graft.search.Ann.kmeans]]); centroids are published as a
      * tiny `ivf_<field>` relation next to the index. Affects the stored
      * `_ivf_<field>` column → part of configHash. */
    ivfCells: Int = 0,
    /** HNSW graph ANN per denseVector field (0 = off): max neighbors per
      * node at levels > 0 (level 0 keeps 2M — the Lucene/hnswlib setting).
      * Graphs are built PER SHARD at index time (deterministic, seeded by
      * shard) and published as `hnsw_<field>` adjacency relations — the
      * Lucene per-segment dense_vector structure. Part of configHash. */
    hnswM: Int = 0,
    /** HNSW efConstruction (build beam width) — quality/build-time knob. */
    hnswEfConstruction: Int = 100,
    /** caller metadata stamped into the published IndexMeta (the `_meta`
      * globals export of the reference, `hail_elasticsearch_client.py:90`).
      * Informational only — excluded from configHash. */
    userMeta: Map[String, String] = Map.empty,
    /** INGEST QUARANTINE (the reference's es-hadoop bulk error handler,
      * `hail_elasticsearch_client.py:118-121`): when true, malformed rows —
      * null identity, null content, content over [[maxContentChars]],
      * dense vectors with non-finite elements — are diverted to a
      * `rejected/` relation (identity + reason) INSIDE the same stage-0
      * pass instead of failing the build; the index is built over the
      * survivors and the lineage invariant holds over them. Default off:
      * all-or-nothing ingest (build-then-publish makes failure safe). */
    quarantine: Boolean = false,
    /** with [[quarantine]]: reject documents whose content exceeds this
      * many chars (0 = no size limit). */
    maxContentChars: Int = 0) {

  /** Stable fingerprint of everything that affects index bytes; a stage
    * checkpoint from a different config must never be resumed. */
  def configHash: String = {
    val s = s"${graft.analysis.Analyzer.Version}|$docsPerShard|$blockSize|$k1|$b" +
      s"|k=${fields.keyword.mkString(",")}|s=${fields.storedOnly.mkString(",")}" +
      s"|p=$storePositions" +
      (if (fields.analyzed.isEmpty) "" else s"|a=${fields.analyzed.mkString(",")}") +
      (if (fields.analyzers.isEmpty) ""
       else s"|az=${fields.analyzers.toSeq.sortBy(_._1)
         .map { case (f, sp) => s"$f=${sp.encode}" }.mkString(",")}") +
      (if (fields.nested.isEmpty) "" else s"|nf=${fields.nested.mkString(",")}") +
      (if (fields.denseVector.isEmpty) ""
       else s"|dv=${fields.denseVector.mkString(",")}|ivf=$ivfCells" +
         (if (hnswM <= 0) "" else s"|hnsw=$hnswM,$hnswEfConstruction")) +
      (if (!quarantine) "" else s"|qr=1,mc=$maxContentChars")
    java.lang.Long.toHexString(
      s.foldLeft(1125899906842597L)((h, c) => 31 * h + c))
  }
}

/** One row per indexed document (identity + lineage, no content). */
final case class DocEntry(
    docId: Long,
    repo: String,
    path: String,
    commit: String,
    lang: String,
    sha256: String,
    dl: Long)

/** Term dictionary entry: dense termId assigned by global term sort order
  * (so ascending termId == ascending lexicographic term — the dictionary-
  * encoding pattern of the reference: `hail_scripts/reference_data/combine.py:63-86`). */
final case class TermStat(termId: Long, term: String, df: Long, cf: Long)

/** A posting block: ≤ blockSize (docId, tf, dl) triples for one term within
  * one shard. docIds are delta+varint encoded; tf/dl plain varint. maxTfn is
  * an admissible (rounded-up) upper bound on the BM25 tf-normalization of
  * any posting in the block — the block-max metadata WAND skips with —
  * EXACT only for the avgdl the block was built with. maxTf/minDl give an
  * avgdl-independent admissible bound (tfNorm is monotone increasing in tf
  * and decreasing in dl), which is what multi-segment queries use: global
  * avgdl differs from each segment's build-time avgdl. */
final case class PostingBlock(
    shard: Long,
    termId: Long,
    firstDoc: Long,
    lastDoc: Long,
    n: Int,
    docs: Array[Byte],
    tfs: Array[Byte],
    dls: Array[Byte],
    maxTfn: Float,
    maxTf: Long,
    minDl: Long,
    /** concatenated per-posting delta+varint position lists (posting i has
      * exactly tf_i positions); empty unless built with storePositions */
    poss: Array[Byte]) {

  def docIds: Array[Long] = Codec.decodeDeltas(docs, n)
  def tfValues: Array[Long] = Codec.decode(tfs, n)
  def dlValues: Array[Long] = Codec.decode(dls, n)

  /** Per-posting positions (ascending token-stream indices); empty arrays
    * when the index stores no positions. */
  def positions: Array[Array[Long]] = {
    if (poss == null || poss.isEmpty) return Array.fill(n)(Array.emptyLongArray)
    val tfv = tfValues
    val out = new Array[Array[Long]](n)
    var off = 0
    var i = 0
    while (i < n) {
      val (arr, next) = Codec.decodeDeltasFrom(poss, off, tfv(i).toInt)
      out(i) = arr
      off = next
      i += 1
    }
    out
  }
}

object PostingBlock {
  /** Canonical column order for `.select(...).as[PostingBlock]` readers. */
  val columns: Seq[String] = Seq(
    "shard", "termId", "firstDoc", "lastDoc", "n", "docs", "tfs", "dls",
    "maxTfn", "maxTf", "minDl", "poss")
}

/** Index-level metadata (the `_meta` / globals analogue). */
final case class IndexMeta(
    numDocs: Long,
    sumDl: Long,
    numTerms: Long,
    numPostings: Long,
    numBlocks: Long,
    analyzer: String,
    k1: Double,
    b: Double,
    blockSize: Int,
    docsPerShard: Long,
    /** xor of xxhash64(sha256(content)) over all docs — order-independent
      * corpus fingerprint, re-verified against the source (the validation
      * semi-join analogue: `luigi_pipeline/lib/hail_tasks.py:96-120`). */
    lineage: Long,
    configHash: String,
    /** which columns are keyword-indexed as `field:value` filter terms
      * (null-safe default for metas written before this field existed) */
    keywordFields: Seq[String] = Seq("lang", "repo"),
    /** whether posting blocks carry per-posting positions (phrase queries) */
    hasPositions: Boolean = false,
    /** extra analyzed (multi-field) columns — `field:token` tagged postings
      * with per-field dl; per-field stats live on the `field:` marker's
      * dictionary row (null-safe default for older metas) */
    analyzedExtra: Seq[String] = Nil,
    /** nested (array<struct>) columns — per-element `field.sub:value`
      * candidate terms + stored column for same-element verification
      * (null-safe default for metas written before this field existed) */
    nestedFields: Seq[String] = Nil,
    /** dense_vector (kNN) columns; with `ivfQuantCells` > 0 each carries a
      * stored `_ivf_<field>` cell column and a published `ivf_<field>`
      * centroid relation (null-safe defaults for older metas) */
    denseVectorFields: Seq[String] = Nil,
    ivfQuantCells: Int = 0,
    /** HNSW M of the published `hnsw_<field>` relations (0 = none built) */
    hnswM: Int = 0,
    /** caller-supplied metadata stamped into the published index — the
      * reference's `_meta` globals export (dataset provenance, genome
      * version, seed: `hail_elasticsearch_client.py:90,177-181`). Purely
      * informational: never part of configHash, carried through purge,
      * newest side wins on merge (create_or_update_mapping semantics). */
    userMeta: Map[String, String] = Map.empty,
    /** encoded per-field analyzer specs of the extra analyzed fields
      * ([[graft.analysis.AnalyzerSpec.encode]]; absent field = code
      * analyzer; null-safe default for older metas) — the query side MUST
      * analyze per-field query text with the index-time spec */
    fieldAnalyzers: Map[String, String] = Map.empty,
    /** rows diverted to the `rejected/` relation by the ingest quarantine
      * ([[IndexConfig.quarantine]]); 0 when quarantine was off */
    rejectedDocs: Long = 0L) {
  def avgdl: Double = sumDl.toDouble / numDocs.toDouble
  def analyzerSpecs: Map[String, String] =
    if (fieldAnalyzers == null) Map.empty else fieldAnalyzers
  def analyzerOf(field: String): graft.analysis.AnalyzerSpec =
    analyzerSpecs.get(field).map(graft.analysis.AnalyzerSpec.decode)
      .getOrElse(graft.analysis.AnalyzerSpec.Code)
  def keywords: Seq[String] =
    if (keywordFields == null) Seq("lang", "repo") else keywordFields
  def analyzed: Seq[String] = if (analyzedExtra == null) Nil else analyzedExtra
  def nested: Seq[String] = if (nestedFields == null) Nil else nestedFields
  def denseVectors: Seq[String] = if (denseVectorFields == null) Nil else denseVectorFields
  def meta: Map[String, String] = if (userMeta == null) Map.empty else userMeta
}

/** Per-stage / per-bucket checkpoint manifest (the `_SUCCESS` marker
  * analogue, enriched with counts + lineage per the north rule).
  *
  * `bucketWidth` is recorded by the termId-bucketed stages (tfenc and the
  * per-bucket block manifests): the on-disk `bucket=` layout depends on it,
  * so a resume under a different `buildBuckets` (same configHash — bucket
  * count affects only intermediate layout, not index bytes) must rebuild
  * rather than silently read a partial slice of the old layout. 0 = not a
  * bucketed stage / written before this field existed (treated as mismatch
  * by bucketed-stage resume). */
final case class StageManifest(
    stage: String,
    rows: Long,
    terms: Long,
    postings: Long,
    lineage: Long,
    configHash: String,
    bucketWidth: Long = 0L,
    // corpus-level stats observed during the stage-0 write (doctf manifests
    // only; 0 = written by a pre-stats build, fall back to the docs stage's
    // own observed values): total token count and the sha256 xor lineage.
    // With these on the stage-0 manifest the docs projection carries no
    // value any later stage needs, so it runs OFF the build's critical path.
    sumDl: Long = 0L,
    contentLineage: Long = 0L,
    /** rows the ingest quarantine diverted in this stage (doctf only) */
    rejected: Long = 0L)
