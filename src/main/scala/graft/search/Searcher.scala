package graft.search

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{count => sqlCount}

import graft.analysis.Analyzer
import graft.index.{IndexMeta, Json, ParquetDirIO, PostingBlock, TableIO}

/** One ranked search hit with document identity (multi-segment results are
  * identity-keyed — per-segment docIds are not globally comparable). */
final case class ScoredHit(repo: String, path: String, commit: String, score: Double)

/** One ranked search hit. */
final case class ScoredDoc(docId: Long, score: Double)

/** Top-k BM25 query engine over a built index — the replacement for the
  * Elasticsearch query side the reference delegates to (BM25 `k1=1.2,
  * b=0.75` is the ES 6/7 default similarity; deployment at
  * `gcloud_dataproc/create_es_loading_nodes.py:100-120`).
  *
  * Query plan (all Catalyst until the per-shard kernel):
  *  1. query terms → term dictionary lookup (tiny collect — the broadcast
  *     dictionary pattern, reference J10 `sv_mt_schema.py:155-158`);
  *  2. posting blocks filtered by `termId` — Parquet row-group min/max
  *     skipping applies because blocks are written termId-sorted;
  *  3. `groupByKey(shard)` → per-shard block-max WAND (document-at-a-time
  *     with block skipping, Ding & Suel–style) producing a local top-k.
  *     A shard holds ≤ docsPerShard docs, so per-task memory is bounded by
  *     queryTerms × docsPerShard/blockSize blocks regardless of corpus size;
  *  4. global `orderBy(score desc, docId asc).limit(k)` — Spark's
  *     TakeOrderedAndProject merges the per-shard heaps without collecting
  *     more than k rows to the driver.
  *
  * Determinism: per-document scores are summed in ascending termId order
  * (== ascending term order, since termIds are dense in term sort order), so
  * scores are bit-identical to the brute-force oracle, which sums in the
  * same order via `aggregate(array_sort(...))`.
  */
class Searcher(spark: SparkSession, indexDir: String, io: TableIO = ParquetDirIO) {
  import spark.implicits._

  val meta: IndexMeta = Json.read(s"$indexDir/meta.json", classOf[IndexMeta])
  private val p = Bm25Params(meta.k1, meta.b)

  /** The content field's analyzer (ES search_analyzer = index analyzer):
    * the code analyzer unless the index was built with an
    * `analyzers("content")` override ([[graft.index.FieldConfig]]). */
  private val contentSpec = meta.analyzerOf("content")
  /** Content-field query analysis under [[contentSpec]]. */
  private def ctokens(text: String): Array[String] =
    graft.analysis.AnalyzerSpec.queryTokens(contentSpec, text)

  private val termsDf = io.read(spark, s"$indexDir/terms")
  private val blocksDf = io.read(spark, s"$indexDir/blocks")
    .select(PostingBlock.columns.map(col): _*)
  private lazy val docsDf = io.read(spark, s"$indexDir/docs")

  /** Numeric stored-column check shared by range filters, stats/histogram
    * aggregations and field sort (all ES doc_values consumers). */
  private def validateNumericField(name: String): Unit = {
    val f = docsDf.schema.fields.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"field '$name' is not a stored docs column (have: ${docsDf.columns.mkString(", ")})"))
    require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"field '$name' is not numeric (${f.dataType.simpleString})")
  }

  /** Range filters apply to stored NUMERIC docs columns (ES doc_values);
    * `exists:field` filters apply to ANY stored docs column. */
  private def validateRanges(ranges: Array[Searcher.RangeFilter]): Unit =
    ranges.foreach { r =>
      if (r.existsOnly) require(docsDf.columns.contains(r.field),
        s"field '${r.field}' is not a stored docs column (have: ${docsDf.columns.mkString(", ")})")
      else validateNumericField(r.field)
    }

  /** docIds passing ALL the query's range filters, keyed by shard — computed
    * from the docs relation with the predicate pushed into the columnar scan
    * (doc_values-style evaluation). Grouped per shard so the kernel-side
    * accept array is bounded by docsPerShard regardless of corpus size. */
  private def acceptsByShard(
      ranges: Array[Searcher.RangeFilter],
      extraIds: Dataset[Long] = null): org.apache.spark.sql.KeyValueGroupedDataset[Long, Long] = {
    val dps = meta.docsPerShard
    val fromRanges: Option[Dataset[Long]] =
      if (ranges.isEmpty) None
      else {
        validateRanges(ranges)
        val pred = ranges.map(_.pred).reduce(_ && _)
        Some(docsDf.filter(pred).select(col("docId")).as[Long])
      }
    val ds = (fromRanges, Option(extraIds)) match {
      case (Some(a), Some(b)) => a.join(b.toDF("docId"), Seq("docId"), "left_semi").as[Long]
      case (Some(a), None) => a
      case (None, Some(b)) => b
      case (None, None) =>
        throw new IllegalArgumentException("accept set needs range filters or an id set")
    }
    ds.groupByKey(_ / dps)
  }

  /** docId accept set for an ES `ids`-query identity list: one broadcast
    * semi-join against the docs relation (the key list is user-bounded —
    * the ES request body — never corpus-scale). */
  private def acceptIdsOf(ids: Seq[(String, String, String)]): Dataset[Long] =
    if (ids == null) null
    else docsDf
      .join(broadcast(ids.toDF("repo", "path", "commit")),
        Seq("repo", "path", "commit"), "left_semi")
      .select(col("docId")).as[Long]

  /** Driver-side dictionary (term → (termId, df)), populated by [[warm]] —
    * the reference's J10 broadcast-map pattern for a served index: term
    * lookup becomes a hash probe instead of a Spark job per query. */
  @volatile private var dictMap: Map[String, (Long, Long)] = _
  /** SORTED content-term array (no `field:`-namespaced terms), built by
    * [[warm]] next to [[dictMap]] — the prefix-range tier: prefix and
    * literal-prefixed wildcard/regexp expansion binary-search into it
    * instead of scanning every dictionary key. */
  @volatile private var sortedTerms: Array[String] = _

  /** Pin the dictionary and posting blocks in executor memory — the ES
    * page-cache analogue for a served index. Call once before a query
    * workload; without it every query re-scans Parquet. When the dictionary
    * fits (`numTerms ≤ maxDriverDictTerms`), it is also collected to a
    * driver map so queries skip the dictionary-lookup Spark job entirely. */
  def warm(maxDriverDictTerms: Long = 2_000_000L): this.type = {
    termsDf.persist(); blocksDf.persist()
    blocksDf.count()
    if (meta.numTerms <= maxDriverDictTerms) {
      dictMap = termsDf.select("term", "termId", "df").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      sortedTerms = dictMap.keysIterator.filter(!_.contains(':')).toArray.sorted
    } else termsDf.count()
    this
  }

  def cool(): Unit = {
    termsDf.unpersist(); blocksDf.unpersist(); dictMap = null; sortedTerms = null
    hnswGraphs = Map.empty
  }

  /** One warm per-shard HNSW graph (shard number + reconstructed graph). */
  private final case class ShardGraph(shard: Long, graph: Hnsw.Graph)

  /** field → that field's per-shard graphs, ascending shard order —
    * populated by [[warmKnn]], the dense-vector analogue of [[dictMap]]. */
  @volatile private var hnswGraphs: Map[String, Array[ShardGraph]] = Map.empty

  /** Pin `field`'s per-shard HNSW graphs in driver memory — the ES
    * data-node-resident segment-graph shape, bounded like the driver
    * dictionary: only when the field's vector count fits under
    * `maxDriverVectors` (1M × 128-dim float ≈ 512 MB + adjacency). Warm
    * [[knnHnsw]] then walks the cached graphs driver-side — per-query work
    * sublinear in corpus size, zero Spark jobs for unfiltered queries —
    * with results EXACTLY equal to the cold cogroup path (same graphs via
    * [[Hnsw.fromEdges]], same [[Hnsw.searchFiltered]] policy, same merge
    * order). Returns whether the tier is now warm; above the bound the
    * cold path stays in force (on a cluster the cogroup's tasks land on
    * executors whose page cache holds the relations after [[warm]]). */
  def warmKnn(field: String, maxDriverVectors: Long = 1_000_000L): Boolean = {
    require(meta.hnswM > 0,
      "index was built without HNSW graphs (IndexConfig.hnswM = 0)")
    require(meta.denseVectors.contains(field),
      s"'$field' is not a dense_vector field of this index " +
        s"(have: ${meta.denseVectors.mkString(", ")})")
    if (hnswGraphs.contains(field)) return true
    val vecDf = docsDf
      .select(col("docId"), col(field).cast("array<float>").as("v"))
      .filter(col("v").isNotNull)
    if (vecDf.count() > maxDriverVectors) return false
    val vecById = new java.util.HashMap[Long, Array[Float]]()
    vecDf.as[(Long, Array[Float])].collect().foreach(t => vecById.put(t._1, t._2))
    val byShard = io.read(spark, s"$indexDir/hnsw_$field")
      .select("shard", "level", "docId", "neighbors")
      .as[Hnsw.Edge]
      .collect()
      .groupBy(_.shard)
      .toArray
      .sortBy(_._1)
    import scala.jdk.CollectionConverters._
    val wrapped: collection.Map[Long, Array[Float]] = vecById.asScala
    val gs = byShard.map { case (sh, es) =>
      ShardGraph(sh, Hnsw.fromEdges(es.toSeq, wrapped))
    }
    hnswGraphs = hnswGraphs + (field -> gs)
    true
  }

  /** (termId, df) for each query term present in the dictionary. */
  def lookupTerms(terms: Seq[String]): Array[(Long, Long)] =
    if (terms.isEmpty) Array.empty
    else if (dictMap != null) terms.flatMap(dictMap.get).toArray.sortBy(_._1)
    else termsDf
      .filter(col("term").isin(terms: _*))
      .select("termId", "df")
      .as[(Long, Long)]
      .collect()
      .sortBy(_._1)

  /** Dictionary terms matching each prefix (ES `prefix` query with the
    * `scoring_boolean` rewrite: every match becomes an ordinary scored term
    * with its own idf). Deterministic cap: the lexicographically smallest
    * `maxExpansions` matches per prefix — ES's `index_prefixes`-less rewrite
    * cap analogue. Warm: a driver map scan; cold: ONE Spark job over the
    * terms relation for the whole prefix set.
    *
    * All expansions match CONTENT terms only: `field:value` keyword terms,
    * `field:token` tagged per-field terms and `field:` exists markers live
    * in the same dictionary but a different namespace (':' never survives
    * the content tokenizer), and a content pattern like `la*` must never
    * silently expand to `lang:de` and score a filter term. */
  def expandPrefixMap(
      prefixes: Seq[String], maxExpansions: Int = 1024): Map[String, Array[String]] =
    if (prefixes.isEmpty) Map.empty
    else if (sortedTerms != null)
      // warm range tier: binary search + bounded scan per prefix — work is
      // O(log |dict| + matches), never O(|dict|)
      prefixes.map(pf =>
        pf -> Searcher.prefixSlice(sortedTerms, pf).take(maxExpansions)).toMap
    else {
      val matches: Array[String] =
        if (dictMap != null)
          dictMap.keysIterator
            .filter(t => !t.contains(':') && prefixes.exists(t.startsWith)).toArray
        else
          // cold range tier: the per-prefix range predicate pushes into the
          // columnar terms scan (termIds dense in term order ⇒ row groups
          // are term ranges ⇒ min/max pruning reads only matching groups)
          coldTermsScan(prefixes.map(Some(_)))
            .filter(prefixes.map(pf => col("term").startsWith(pf)).reduce(_ || _))
            .select("term").as[String].collect()
      val sorted = matches.sorted
      prefixes.map(pf => pf -> sorted.filter(_.startsWith(pf)).take(maxExpansions)).toMap
    }

  /** The terms relation pre-filtered for a pattern-expansion scan: content
    * namespace only, restricted to the patterns' literal-prefix ranges when
    * EVERY pattern has one (a single prefix-less pattern already needs the
    * whole dictionary — the documented full-scan fallback). */
  private def coldTermsScan(litPrefixes: Seq[Option[String]]): DataFrame = {
    val base = termsDf.filter(!col("term").contains(":"))
    Searcher.rangePredOf(litPrefixes.map(_.getOrElse(""))) match {
      case Some(pred) => base.filter(pred)
      case None => base
    }
  }

  /** Dictionary terms within edit distance ≤ maxEdits of each fuzzy stem
    * (ES `fuzzy` query with the `scoring_boolean` rewrite: every match
    * becomes an ordinary scored term with its own idf). Deterministic cap:
    * the lexicographically smallest `maxExpansions` matches per stem. Warm:
    * a driver map scan using [[Searcher.editWithin]] (the same unit-cost
    * model as Spark's and DuckDB's `levenshtein`); cold: ONE Spark job over
    * the terms relation for the whole fuzzy set. */
  def expandFuzzyMap(
      fuzzies: Seq[(String, Int)],
      maxExpansions: Int = 1024): Map[(String, Int), Array[String]] =
    if (fuzzies.isEmpty) Map.empty
    else {
      val matches: Array[String] =
        if (sortedTerms != null)
          // warm automaton tier: DP trie-walk over the sorted dictionary —
          // shared-prefix row reuse + dead-prefix range skips, never a
          // per-term scan (the ES Levenshtein-automaton-over-FST shape)
          fuzzies.flatMap { case (st, b) =>
            Searcher.fuzzyWalk(sortedTerms, st, b)._1
          }.distinct.toArray
        else if (dictMap != null)
          dictMap.keysIterator
            .filter(t => !t.contains(':') &&
              fuzzies.exists { case (st, b) => Searcher.editWithin(st, t, b) })
            .toArray
        else
          termsDf
            .filter(!col("term").contains(":") &&
              // length window first: |len(term) - len(stem)| ≤ bound is
              // necessary for edit distance ≤ bound and prunes the row
              // set before any quadratic levenshtein evaluation
              fuzzies.map { case (st, b) =>
                length(col("term")).between(st.length - b, st.length + b) &&
                  levenshtein(col("term"), lit(st)) <= b }.reduce(_ || _))
            .select("term").as[String].collect()
      val sorted = matches.sorted
      fuzzies.map { case (st, b) =>
        (st, b) -> sorted.filter(t => Searcher.editWithin(st, t, b)).take(maxExpansions)
      }.toMap
    }

  /** Dictionary terms matching each anchored regex — the shared engine of
    * the wildcard and regexp expansions. Warm: a driver map scan with the
    * compiled pattern; cold: ONE Spark job (`rlike` on the anchored form)
    * over the terms relation for the whole pattern set. Deterministic cap
    * as in [[expandPrefixMap]]: lexicographically smallest matches. */
  private def expandRegexMap(
      regexes: Seq[String], maxExpansions: Int): Map[String, Array[String]] =
    if (regexes.isEmpty) Map.empty
    else {
      val compiled = regexes.map(r => r -> java.util.regex.Pattern.compile(r)).toMap
      val litPfx: Map[String, String] =
        regexes.map(r => r -> Searcher.literalPrefixOfRegex(r)).toMap
      val matches: Array[String] =
        if (sortedTerms != null && regexes.forall(r => litPfx(r).nonEmpty))
          // warm range tier: each pattern tests only its prefix's slice
          regexes.flatMap(r => Searcher.prefixSlice(sortedTerms, litPfx(r))
            .filter(t => compiled(r).matcher(t).matches())).distinct.toArray
        else if (dictMap != null)
          dictMap.keysIterator
            .filter(t => !t.contains(':') &&
              compiled.valuesIterator.exists(_.matcher(t).matches())).toArray
        else
          coldTermsScan(regexes.map(r => Some(litPfx(r))))
            .filter(regexes.map(r => col("term").rlike(s"^(?:$r)$$")).reduce(_ || _))
            .select("term").as[String].collect()
      val sorted = matches.sorted
      regexes.map(r =>
        r -> sorted.filter(t => compiled(r).matcher(t).matches()).take(maxExpansions)).toMap
    }

  /** Dictionary terms matching each wildcard pattern (`s*am`, `qu?ry` —
    * ES `wildcard` query, scoring_boolean rewrite: every match becomes an
    * ordinary scored term with its own idf). `*` = any run, `?` = exactly
    * one char, matched against whole dictionary terms. */
  def expandWildcardMap(
      globs: Seq[String], maxExpansions: Int = 1024): Map[String, Array[String]] = {
    val rx = globs.map(g => g -> Searcher.globToRegex(g)).toMap
    val m = expandRegexMap(rx.values.toSeq.distinct, maxExpansions)
    globs.map(g => g -> m(rx(g))).toMap
  }

  /** Dictionary terms full-matching each regexp (`/s(ort|can)/` — ES
    * `regexp` query, scoring_boolean rewrite). Anchored like ES: the whole
    * term must match the pattern. */
  def expandRegexpMap(
      regexps: Seq[String], maxExpansions: Int = 1024): Map[String, Array[String]] =
    expandRegexMap(regexps, maxExpansions)

  /** Every expanded scored term of a parsed query's pattern clauses
    * (prefix, fuzzy, wildcard, regexp), each with its own idf under the
    * scoring_boolean rewrite. */
  private[search] def expandAll(pq: Searcher.ParsedQuery): Array[String] =
    pq.prefixes.flatMap(expandPrefixMap(pq.prefixes.toSeq).apply) ++
      pq.fuzzies.flatMap(expandFuzzyMap(pq.fuzzies.toSeq).apply) ++
      pq.wildcards.flatMap(expandWildcardMap(pq.wildcards.toSeq).apply) ++
      pq.regexps.flatMap(expandRegexpMap(pq.regexps.toSeq).apply)

  /** term → (termId, df) for each query term present in the dictionary. */
  def lookupTermStats(terms: Seq[String]): Map[String, (Long, Long)] =
    if (terms.isEmpty) Map.empty
    else if (dictMap != null) terms.flatMap(t => dictMap.get(t).map(t -> _)).toMap
    else termsDf
      .filter(col("term").isin(terms: _*))
      .select("term", "termId", "df")
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  /** Split a raw query into (content terms, keyword filter terms) using
    * this index's configured keyword fields — see [[Searcher.parseQuery]]. */
  def parseQuery(query: String): (Array[String], Array[String]) =
    Searcher.parseQuery(query, meta.keywords.toSet, contentSpec)

  /** Top-k BM25 search; returns at most k rows ordered (score desc, docId asc).
    * Keyword filters (see [[parseQuery]]) are conjunctive and non-scoring.
    * `"quoted spans"` are exact-phrase requirements (index must be built
    * with storePositions): conjunctive on the phrase's terms, verified by
    * position adjacency over the analyzer's token stream, scored by the
    * ordinary BM25 sum over the phrase's distinct terms — a documented
    * departure from Lucene's phrase-frequency scoring, mirrored exactly by
    * the oracle. Loose terms may be mixed with phrases (`"exact phrase"
    * extra term`): phrases stay required, loose terms are optional scored
    * contributions on phrase-matching documents (ES semantics for a
    * must-phrase + should-term query).
    *
    * `from` is the ES `from`/`size` pagination offset: hits ranked
    * `[from, from+k)` of the same total order (the engine computes the top
    * `from+k` and drops the prefix — ES does exactly this per shard).
    * `minShouldMatch` is the ES `minimum_should_match` bound on the scored
    * (should) clauses; phrases are must clauses and unaffected by it.
    *
    * `after` is the ES `search_after` cursor — the LAST hit of the previous
    * page: only hits strictly after it in the (score desc, docId asc) total
    * order are returned, so page N+1 costs one k-heap regardless of depth
    * (the scale-correct deep-paging shape; `from`/`size` pays an O(from+k)
    * heap and is capped at 10k in ES for exactly this reason). Mutually
    * exclusive with `from`, as in ES.
    *
    * `withinIds` is the ES `ids` query in bool filter context: hits are
    * restricted to the given identity keys (one broadcast semi-join
    * resolves them to docIds, then they ride the kernels' accept path
    * exactly like range filters — candidates only, statistics untouched).
    * An otherwise-empty query with `withinIds` is a pure ids query:
    * constant score 0, docId order. */
  def search(query: String, k: Int, from: Int = 0, minShouldMatch: Int = 1,
      after: ScoredDoc = null,
      withinIds: Seq[(String, String, String)] = null): Array[ScoredDoc] =
    searchImpl(query, k, from, minShouldMatch, after, acceptIdsOf(withinIds))

  private def searchImpl(query: String, k: Int, from: Int, minShouldMatch: Int,
      after: ScoredDoc, acceptIdsDs: Dataset[Long]): Array[ScoredDoc] = {
    require(from >= 0, s"from must be >= 0 (got $from)")
    require(from == 0 || after == null, "search_after cannot be combined with from (ES rule)")
    require(minShouldMatch >= 1, s"minShouldMatch must be >= 1 (got $minShouldMatch)")
    val kEff = from + k
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val expanded = expandAll(pq)
    // ES must_not: excluded terms (and negated keyword filters — dictionary
    // terms like any other) reject candidates, never affect stats; a term
    // absent from the dictionary excludes nothing
    val excludeIds: Set[Long] = lookupTerms(pq.allExcluded.toSeq).map(_._1).toSet
    if (pq.phrases.nonEmpty)
      return searchPhrases(pq.phrases, pq.slops, (pq.terms ++ expanded).distinct, pq.filters,
        kEff, excludeIds, pq.boostOf, pq.ranges, after, acceptIdsDs).drop(from)
    val qTerms = (pq.terms ++ expanded).distinct
    val qFilters = pq.filters
    val stats = lookupTermStats(qTerms.toSeq)
    if (stats.isEmpty) {
      // ES filter-context-only bool query (no scoring clause at all):
      // every filter-passing doc matches with constant score 0, ordered
      // docId asc. A query that HAS should clauses but none in the
      // dictionary matches nothing (minimum_should_match >= 1).
      if (pq.hasScoringClauses ||
        (pq.filters.isEmpty && pq.ranges.isEmpty && pq.allExcluded.isEmpty &&
          acceptIdsDs == null))
        return Array.empty
      // search_after on the constant-score order: every hit scores 0.0, so
      // the cursor reduces to docId > after.docId (a cursor with score > 0
      // precedes all constant-score hits and excludes nothing)
      val ids0 = matchIdsDs(pq).toDF("docId")
      val ids = if (acceptIdsDs == null) ids0
        else ids0.join(acceptIdsDs.toDF("docId"), Seq("docId"), "left_semi")
      val paged = if (after == null || after.score > 0.0) ids
        else ids.filter(col("docId") > after.docId)
      return paged.orderBy(asc("docId")).limit(kEff)
        .as[Long].collect().drop(from).map(ScoredDoc(_, 0.0))
    }
    val filterStats = lookupTerms(qFilters.toSeq)
    // a filter term absent from the dictionary matches no document at all
    if (filterStats.length < qFilters.length) return Array.empty
    val n = meta.numDocs
    val avgdl = meta.avgdl
    // query-time boost folds into the per-term idf driver-side (score =
    // (idf×boost)×tfNorm) — the oracle computes the identical JVM product,
    // so unboosted terms (×1.0) stay bit-exact
    val idfById: Map[Long, Double] =
      stats.map { case (t, (tid, df)) => tid -> BM25.idf(n, df) * pq.boostOf(t) }.toMap
    val filterIds: Set[Long] = filterStats.map(_._1).toSet
    val termIds = stats.values.map(_._1).toArray ++ filterIds ++ excludeIds
    val params = p

    val blocksKV = blocksDf
      .filter(col("termId").isin(termIds.map(Long.box): _*))
      .as[PostingBlock]
      .groupByKey(_.shard)
    val msm = minShouldMatch
    val aft = after
    val perShard =
      if (pq.ranges.isEmpty && acceptIdsDs == null)
        blocksKV.flatMapGroups { (_, blocks) =>
          Wand.topK(blocks, idfById, filterIds, avgdl, params, kEff,
            excludeTermIds = excludeIds, minShouldMatch = msm, after = aft)
        }
      else
        // range filters / ids restriction: cogroup the per-shard accept set
        // (docs-relation scan with the predicate pushed down) into the
        // kernel — a shard with no accepted doc emits nothing
        blocksKV.cogroup(acceptsByShard(pq.ranges, acceptIdsDs)) { (_, blocks, acc) =>
          val a = acc.toArray
          java.util.Arrays.sort(a)
          Wand.topK(blocks, idfById, filterIds, avgdl, params, kEff,
            excludeTermIds = excludeIds, accept = a, minShouldMatch = msm, after = aft)
        }

    perShard
      .orderBy(desc("score"), asc("docId"))
      .limit(kEff)
      .as[ScoredDoc]
      .collect()
      .drop(from)
  }

  /** Exact-phrase top-k: conjunctive document-at-a-time over the phrase
    * terms with inline position verification (no post-hoc filtering that
    * could under-fill k), then the usual global merge. `looseTerms` are the
    * optional scored extras of a mixed query (may be empty). */
  private def searchPhrases(
      phrases: Array[Array[String]],
      phraseSlops: Array[Int],
      looseTerms: Array[String],
      qFilters: Array[String],
      k: Int,
      excludeIds: Set[Long] = Set.empty,
      boostOf: String => Double = _ => 1.0,
      ranges: Array[Searcher.RangeFilter] = Array.empty,
      after: ScoredDoc = null,
      acceptIdsDs: Dataset[Long] = null,
      phraseOrdered: Array[Boolean] = null,
      phraseEnds: Array[Int] = null,
      /** Lucene/ES match_phrase scoring: score each phrase by its OCCURRENCE
        * count through the BM25 tf-norm with the phrase's summed idf as the
        * weight, instead of the distinct-term BM25 sum. Exact phrases only. */
      luceneFreq: Boolean = false): Array[ScoredDoc] = {
    if (!meta.hasPositions)
      throw new IllegalStateException(
        "phrase query on an index built without positions (IndexConfig.storePositions=false)")
    val phraseTerms = phrases.flatten.distinct
    val stats = lookupTermStats((phraseTerms ++ looseTerms).distinct.toSeq)
    // conjunctive: any phrase token absent from the dictionary → no match
    if (phraseTerms.exists(t => !stats.contains(t))) return Array.empty
    val filterStats = lookupTerms(qFilters.toSeq)
    if (filterStats.length < qFilters.length) return Array.empty
    val n = meta.numDocs
    val avgdl = meta.avgdl
    val idfById: Map[Long, Double] =
      phraseTerms.map { t =>
        val (tid, df) = stats(t); tid -> BM25.idf(n, df) * boostOf(t)
      }.toMap
    // loose terms: optional, scored only where present; a term that is also
    // part of a phrase contributes once (distinct-term scoring, as oracle)
    val optIdfById: Map[Long, Double] = looseTerms.distinct
      .flatMap(t => stats.get(t).map(t -> _))
      .collect { case (t, (tid, df)) if !idfById.contains(tid) =>
        tid -> BM25.idf(n, df) * boostOf(t)
      }
      .toMap
    val filterIds: Set[Long] = filterStats.map(_._1).toSet
    val phraseIdSeqs: Array[Array[Long]] = phrases.map(_.map(t => stats(t)._1))
    val termIds = idfById.keys.toArray ++ optIdfById.keys ++ filterIds ++ excludeIds
    val params = p
    // Lucene PhraseQuery weight: idf summed over the phrase's TOKEN
    // OCCURRENCES (duplicates count per occurrence — idfExplain over the
    // terms array), boost folded per token like every other clause
    val freqIdf: Array[Double] =
      if (!luceneFreq) null
      else phrases.map(_.map(t => BM25.idf(n, stats(t)._2) * boostOf(t)).sum)

    val blocksKV = blocksDf
      .filter(col("termId").isin(termIds.map(Long.box): _*))
      .as[PostingBlock]
      .groupByKey(_.shard)
    val aft = after
    val slops = phraseSlops
    val pOrd = phraseOrdered
    val pEnd = phraseEnds
    val perShard =
      if (ranges.isEmpty && acceptIdsDs == null)
        blocksKV.flatMapGroups { (_, blocks) =>
          Phrase.topK(blocks, phraseIdSeqs, slops, idfById, optIdfById, filterIds, avgdl,
            params, k, excludeTermIds = excludeIds, after = aft,
            phraseOrdered = pOrd, phraseEnds = pEnd, phraseFreqIdf = freqIdf)
        }
      else
        blocksKV.cogroup(acceptsByShard(ranges, acceptIdsDs)) { (_, blocks, acc) =>
          val a = acc.toArray
          java.util.Arrays.sort(a)
          Phrase.topK(blocks, phraseIdSeqs, slops, idfById, optIdfById, filterIds, avgdl,
            params, k, excludeTermIds = excludeIds, accept = a, after = aft,
            phraseOrdered = pOrd, phraseEnds = pEnd, phraseFreqIdf = freqIdf)
        }

    perShard
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
      .as[ScoredDoc]
      .collect()
  }

  /** Batch search: the whole query set runs as ONE distributed pass over
    * the posting blocks (union of all queries' terms → one scan+shuffle;
    * every query's WAND runs per shard; per-shard top-k heaps merge in a
    * tiny second stage). Amortizes Spark's per-job dispatch floor across
    * the batch — the serving shape for query workloads at scale. Results
    * are identical to calling [[search]] per query (tested). */
  def searchMany(queries: Seq[(String, Int)]): Seq[Array[ScoredDoc]] = {
    val n = meta.numDocs
    val avgdl = meta.avgdl
    val params = p

    import Searcher.Plan
    val parsed = queries.map { case (q, _) => Searcher.parseFull(q, meta.keywords.toSet, contentSpec) }
    if (parsed.exists(_.phrases.nonEmpty) && !meta.hasPositions)
      throw new IllegalStateException(
        "phrase query on an index built without positions (IndexConfig.storePositions=false)")
    // one dictionary pass per pattern kind expands every query's prefixes,
    // fuzzy stems, wildcards and regexps (batched across the whole set)
    val prefixMap = expandPrefixMap(parsed.flatMap(_.prefixes.toSeq).distinct)
    val fuzzyMap = expandFuzzyMap(parsed.flatMap(_.fuzzies.toSeq).distinct)
    val wildcardMap = expandWildcardMap(parsed.flatMap(_.wildcards.toSeq).distinct)
    val regexpMap = expandRegexpMap(parsed.flatMap(_.regexps.toSeq).distinct)
    def effTerms(pq: Searcher.ParsedQuery): Array[String] =
      (pq.terms ++ pq.prefixes.flatMap(prefixMap.apply) ++
        pq.fuzzies.flatMap(fuzzyMap.apply) ++
        pq.wildcards.flatMap(wildcardMap.apply) ++
        pq.regexps.flatMap(regexpMap.apply)).distinct
    val allTerms = parsed.flatMap(pq =>
      effTerms(pq).toSeq ++ pq.filters.toSeq ++ pq.phrases.flatten.toSeq ++
        pq.allExcluded.toSeq).distinct
    val statsByTerm: Map[String, (Long, Long)] = lookupTermStats(allTerms)

    val plans: Seq[Option[Plan]] = parsed.zip(queries).zipWithIndex.map {
      case ((pq, (_, k)), i) =>
        val phraseTerms = pq.phrases.flatten.distinct
        val filters = pq.filters.flatMap(f => statsByTerm.get(f).map(_._1))
        if (phraseTerms.exists(t => !statsByTerm.contains(t)) ||
          filters.length < pq.filters.length) None
        else {
          val phraseIdf: Map[Long, Double] = phraseTerms
            .map { t =>
              val (tid, df) = statsByTerm(t); tid -> BM25.idf(n, df) * pq.boostOf(t)
            }.toMap
          val loose: Map[Long, Double] = effTerms(pq)
            .flatMap(t => statsByTerm.get(t).map(t -> _))
            .collect { case (t, (tid, df)) if !phraseIdf.contains(tid) =>
              tid -> BM25.idf(n, df) * pq.boostOf(t)
            }
            .toMap
          val excl: Set[Long] = pq.allExcluded.flatMap(t => statsByTerm.get(t).map(_._1)).toSet
          if (phraseIdf.isEmpty && loose.isEmpty) None
          else Some(Plan(i, loose, filters.toSet, k,
            pq.phrases.map(ph => ph.map(t => statsByTerm(t)._1).toSeq).toSeq, phraseIdf, excl,
            pq.ranges.toSeq, pq.slops.toSeq))
        }
    }
    val live = plans.flatten
    if (live.isEmpty) return queries.map(_ => Array.empty[ScoredDoc])

    def runPlans(pls: Seq[Plan], blocks: Iterator[PostingBlock],
        acceptByQ: Map[Int, Array[Long]]): Iterator[(Int, Long, Double)] = {
      val arr = blocks.toArray
      pls.iterator.flatMap { pl =>
        val subset = arr.iterator.filter(b => pl.wantsBlock(b.termId))
        val accept =
          if (pl.ranges.isEmpty) null
          else acceptByQ.getOrElse(pl.qIdx, Array.empty[Long])
        val hits =
          if (pl.phraseIdSeqs.nonEmpty)
            Phrase.topK(subset, pl.phraseIdSeqs.map(_.toArray).toArray, pl.phraseSlops.toArray,
              pl.phraseIdfById, pl.idfById, pl.filterIds, avgdl, params, pl.k,
              pl.excludeIds, accept)
          else Wand.topK(subset, pl.idfById, pl.filterIds, avgdl, params, pl.k,
            excludeTermIds = pl.excludeIds, accept = accept)
        hits.map(sd => (pl.qIdx, sd.docId, sd.score))
      }
    }

    val neededIds = live.flatMap(_.allTermIds).distinct
    val blocksKV = blocksDf
      .filter(col("termId").isin(neededIds.map(Long.box): _*))
      .as[PostingBlock]
      .groupByKey(_.shard)
    val ranged = live.filter(_.ranges.nonEmpty)
    val perShard =
      if (ranged.isEmpty)
        blocksKV.flatMapGroups((_, blocks) => runPlans(live, blocks, Map.empty))
      else {
        // qIdx-tagged accept rows for every ranged query in ONE docs scan
        // union (still one action), cogrouped into the shared kernel pass
        ranged.foreach(pl => validateRanges(pl.ranges.toArray))
        val dps = meta.docsPerShard
        val accepts = ranged.map { pl =>
          docsDf.filter(pl.ranges.map(_.pred).reduce(_ && _))
            .select(lit(pl.qIdx).cast("int").as("q"), col("docId"))
            .as[(Int, Long)]
        }.reduce(_ union _)
        blocksKV.cogroup(accepts.groupByKey(_._2 / dps)) { (_, blocks, accIt) =>
          val byQ: Map[Int, Array[Long]] = accIt.toArray.groupBy(_._1).map { case (q, xs) =>
            val a = xs.map(_._2)
            java.util.Arrays.sort(a)
            q -> a
          }
          runPlans(live, blocks, byQ)
        }
      }

    val kByIdx = live.map(pl => pl.qIdx -> pl.k).toMap
    val merged: Map[Int, Array[ScoredDoc]] = perShard
      .groupByKey(_._1)
      .mapGroups { (qIdx, it) =>
        val top = it.map(t => ScoredDoc(t._2, t._3)).toArray
          .sortBy(sd => (-sd.score, sd.docId))
          .take(kByIdx(qIdx))
        (qIdx, top)
      }
      .collect().toMap
    queries.indices.map(i => merged.getOrElse(i, Array.empty[ScoredDoc]))
  }

  /** Same as [[search]] but joined back to document identity. The ≤k hits
    * are the broadcast side — the docs table is the 10^12-row side. */
  def searchWithIdentity(query: String, k: Int): DataFrame = {
    val hits = search(query, k).toSeq.toDF("docId", "score")
    docsDf.join(broadcast(hits), Seq("docId"))
      .select("docId", "repo", "path", "commit", "score")
      .orderBy(desc("score"), asc("docId"))
  }

  /** ES `match_phrase` with LUCENE PHRASE-FREQUENCY SCORING (the default —
    * what a real ES cluster computes): the phrase matches where its tokens
    * appear exactly adjacent in order, and scores
    * `idfSum × tfNorm(phraseFreq, dl, avgdl)` where `phraseFreq` is the
    * number of phrase OCCURRENCES in the doc and `idfSum` is the idf summed
    * over the phrase's token occurrences (Lucene PhraseQuery's idfExplain).
    * Documents with the same term set but more phrase repetitions rank
    * higher — the semantic the engine's quoted-`search` syntax (distinct-
    * term scoring, kept for its bit-identical oracles) deliberately departs
    * from. `luceneScoring = false` falls back to that distinct-term mode.
    * Exact phrases only (ES `match_phrase` without `slop`); requires a
    * positions index. Replaces the delegated ES contract at
    * `hail_scripts/elasticsearch/hail_elasticsearch_client.py:197-199`. */
  def matchPhrase(phrase: String, k: Int,
      luceneScoring: Boolean = true): Array[ScoredDoc] = {
    val toks = ctokens(phrase)
    require(toks.nonEmpty, "match_phrase analyzes to nothing")
    searchPhrases(Array(toks), Array(0), Array.empty[String], Array.empty[String], k,
      luceneFreq = luceneScoring)
  }

  /** Lucene/ES `span_near`: all `terms` within a window of span ≤
    * `slop` extra positions — `inOrder = true` is exactly a slop-phrase
    * (`"a b"~N`); `inOrder = false` relaxes the order (Lucene
    * SpanNearQuery(inOrder=false): any window holding one occurrence of
    * every term at distinct positions). Scored like phrases: the
    * distinct-term BM25 sum (the engine's documented phrase-scoring
    * departure, mirrored by the oracle). Requires positions. */
  def searchSpanNear(terms: Seq[String], slop: Int, inOrder: Boolean,
      k: Int): Array[ScoredDoc] = {
    require(terms.nonEmpty, "span_near needs at least one term")
    require(slop >= 0, s"slop must be >= 0 (got $slop)")
    val toks = terms.flatMap(t => ctokens(t)).toArray
    require(toks.nonEmpty, "span_near terms analyze to nothing")
    searchPhrases(Array(toks), Array(slop), Array.empty[String], Array.empty[String], k,
      phraseOrdered = Array(inOrder), phraseEnds = Array(-1))
  }

  /** Lucene/ES `span_first`: the wrapped span (an in-order chain of
    * `terms` with span ≤ `slop`) must END before position `end` of the
    * document's token stream — "matches near the start of the field".
    * A single term with `end = n` is "term within the first n tokens". */
  def searchSpanFirst(terms: Seq[String], end: Int, k: Int,
      slop: Int = 0): Array[ScoredDoc] = {
    require(terms.nonEmpty, "span_first needs at least one term")
    require(end > 0, s"end must be > 0 (got $end)")
    val toks = terms.flatMap(t => ctokens(t)).toArray
    require(toks.nonEmpty, "span_first terms analyze to nothing")
    searchPhrases(Array(toks), Array(slop), Array.empty[String], Array.empty[String], k,
      phraseOrdered = Array(true), phraseEnds = Array(end))
  }

  /** ES 8 `knn` search over a stored dense_vector column: the k nearest
    * documents by cosine similarity to `queryVec`, optionally restricted to
    * the match set of `filter` (ES knn pre-filter semantics: the result is
    * the k nearest AMONG filter-passing docs, never fewer because of
    * post-filtering).
    *
    * `nprobe = 0` is the exact path: ONE column-pruned scan of
    * (docId, vector) with a TakeOrdered top-k — the ES `exact: true` /
    * script_score shape, and the correctness oracle for the pruned path.
    *
    * `nprobe > 0` uses the index-time IVF coarse quantizer
    * ([[graft.index.IndexConfig.ivfCells]]): the query's `nprobe` nearest
    * centroids are probed and the scan keeps only docs whose STORED
    * `_ivf_<field>` cell is probed — a plain int `isin` predicate that
    * pushes into the columnar scan (row-group pruning), then exact cosine
    * re-rank inside the probed cells. Approximate with recall governed by
    * nprobe/cells, like ES's HNSW num_candidates. */
  def knn(field: String, queryVec: Array[Float], k: Int, filter: String = "",
      nprobe: Int = 0): Array[ScoredDoc] = {
    require(k > 0, "k must be > 0")
    require(meta.denseVectors.contains(field),
      s"'$field' is not a dense_vector field of this index " +
        s"(have: ${meta.denseVectors.mkString(", ")})")
    var base = docsDf
    if (filter.nonEmpty) {
      val pq = Searcher.parseFull(filter, meta.keywords.toSet, contentSpec)
      base = base.join(matchIdsDs(pq).toDF("docId"), Seq("docId"), "left_semi")
    }
    if (nprobe > 0) {
      require(meta.ivfQuantCells > 0,
        "nprobe > 0 but the index was built without an IVF quantizer (ivfCells = 0)")
      val cents = readCentroids(field)
      val cells = cents.indices
        .sortBy(c => (-Ann.cosine(queryVec, cents(c)), c)).take(nprobe)
      base = base.filter(col(s"_ivf_$field").isin(cells.map(Int.box): _*))
    }
    val bq = spark.sparkContext.broadcast(queryVec)
    base
      .select(col("docId"), col(field).cast("array<float>").as("v"))
      .filter(col("v").isNotNull)
      .as[(Long, Array[Float])]
      .map { case (id, v) => ScoredDoc(id, Ann.cosine(v, bq.value)) }
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
      .collect()
  }

  /** ES 8 `knn` over the per-shard HNSW graphs (the Lucene dense_vector
    * structure — built when [[graft.index.IndexConfig.hnswM]] > 0):
    * each shard's graph is walked in its own task (greedy descent + an
    * `ef`-bounded beam at level 0, `num_candidates` in ES terms), the
    * per-shard candidates carry EXACT cosines, and the global top-k is a
    * TakeOrdered merge — approximate recall governed by `ef`, scores never
    * approximate.
    *
    * Plan: ONE cogroup of the `hnsw_<field>` adjacency relation with the
    * column-pruned (docId, vector[, accepted]) docs projection, both
    * grouped by shard — per-task memory bounded by one shard's graph.
    * `filter` is ES pre-filter semantics applied to the candidate RESULT
    * set (the walk traverses freely — the standard filtered-HNSW shape);
    * a highly selective filter belongs on the exact [[knn]] path. */
  def knnHnsw(field: String, queryVec: Array[Float], k: Int, ef: Int = 100,
      filter: String = ""): Array[ScoredDoc] = {
    require(k > 0, "k must be > 0")
    require(meta.hnswM > 0,
      "index was built without HNSW graphs (IndexConfig.hnswM = 0)")
    require(meta.denseVectors.contains(field),
      s"'$field' is not a dense_vector field of this index " +
        s"(have: ${meta.denseVectors.mkString(", ")})")
    val efEff = math.max(ef, k)
    val dps = meta.docsPerShard

    // ---- warm driver tier (see [[warmKnn]]) ---------------------------
    // Per-shard graphs resident driver-side (the ES data-node-resident
    // segment-graph shape): a no-filter query runs ZERO Spark jobs —
    // sublinear graph walks over the cached graphs, merged exactly like
    // the cold path's TakeOrdered. A filtered query spends one Spark job
    // on the accept set, then walks warm.
    val warmGs = hnswGraphs.get(field)
    if (warmGs.isDefined) {
      val gs = warmGs.get
      val accept: Array[Long] =
        if (filter.isEmpty) null
        else {
          val a = matchIdsDs(Searcher.parseFull(filter, meta.keywords.toSet, contentSpec)).collect()
          java.util.Arrays.sort(a)
          a
        }
      if (accept != null && accept.isEmpty) return Array.empty
      val perShard = new Array[Array[ScoredDoc]](gs.length)
      java.util.stream.IntStream.range(0, gs.length).parallel().forEach { i =>
        val g = gs(i)
        // the shard's accepted slice: docIds of shard s lie in
        // [s·dps, (s+1)·dps) and `accept` is sorted — two binary searches
        val acc: Array[Long] =
          if (accept == null) null
          else {
            val lo = lowerBound(accept, g.shard * dps)
            val hi = lowerBound(accept, (g.shard + 1) * dps)
            java.util.Arrays.copyOfRange(accept, lo, hi)
          }
        perShard(i) =
          if (acc != null && acc.isEmpty) Array.empty
          else Hnsw.searchFiltered(g.graph, queryVec, k, efEff, acc)
      }
      return perShard.iterator.flatten.toArray
        .sortBy(sd => (-sd.score, sd.docId)).take(k)
    }

    val acceptDs: Dataset[Long] =
      if (filter.isEmpty) null
      else matchIdsDs(Searcher.parseFull(filter, meta.keywords.toSet, contentSpec))
    val hasFilter = acceptDs != null
    var vecs = docsDf
      .select(col("docId"), col(field).cast("array<float>").as("v"))
      .filter(col("v").isNotNull)
    vecs =
      if (acceptDs == null) vecs.withColumn("acc", lit(true))
      else vecs.join(acceptDs.toDF("docId").withColumn("acc", lit(true)),
        Seq("docId"), "left")
    val edgesKV = io.read(spark, s"$indexDir/hnsw_$field")
      .select("shard", "level", "docId", "neighbors")
      .as[Hnsw.Edge]
      .groupByKey(_.shard)
    val vecsKV = vecs
      .select(col("docId"), col("v"), coalesce(col("acc"), lit(false)).as("acc"))
      .as[(Long, Array[Float], Boolean)]
      .groupByKey(_._1 / dps)
    val bq = spark.sparkContext.broadcast(queryVec)
    val kk = k
    edgesKV.cogroup(vecsKV) { (_, es, vs) =>
      val rows = vs.toArray
      if (rows.isEmpty) Iterator.empty
      else {
        val vecById = rows.iterator.map(r => r._1 -> r._2).toMap
        val accepted: Array[Long] =
          if (!hasFilter) null
          else {
            val a = rows.iterator.filter(_._3).map(_._1).toArray
            java.util.Arrays.sort(a)
            a
          }
        if (accepted != null && accepted.isEmpty) Iterator.empty
        else {
          val g = Hnsw.fromEdges(es.toSeq, vecById)
          Hnsw.searchFiltered(g, bq.value, kk, efEff, accepted).iterator
        }
      }
    }
      .orderBy(desc("score"), asc("docId"))
      .limit(k)
      .collect()
  }

  /** First index in sorted `a` whose value is >= `x`. */
  private def lowerBound(a: Array[Long], x: Long): Int = {
    var lo = 0
    var hi = a.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (a(mid) < x) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** ES hybrid search with RECIPROCAL RANK FUSION (the ES 8.8+ `rrf`
    * retriever): the text query's BM25 ranking and the dense_vector kNN
    * ranking are fused by rank, not score —
    * `score(d) = Σ_rankings 1/(rankConstant + rank_d)` over the rankings
    * that contain `d` in their top `windowSize` — so the two branches'
    * incomparable score scales never need calibration. Both branches see
    * the same optional `filter` (pre-filter, as in the ES retriever tree);
    * ties order (fused score desc, docId asc). Runs the two k-bounded
    * branch queries and fuses the ≤ 2·windowSize candidates driver-side —
    * the same shape ES uses (per-shard top windows, coordinator fusion). */
  def hybridRrf(query: String, field: String, queryVec: Array[Float], k: Int,
      windowSize: Int = 100, rankConstant: Int = 60,
      filter: String = "",
      /** > 0: drive the vector branch through the per-shard HNSW graphs
        * with this beam width (`num_candidates`) — the shape a real ES 8
        * rrf retriever runs; 0 = exact cosine branch. */
      hnswEf: Int = 0): Array[ScoredDoc] = {
    require(k > 0 && windowSize >= k,
      s"need windowSize >= k > 0 (got k=$k, windowSize=$windowSize)")
    require(rankConstant >= 1, s"rankConstant must be >= 1 (got $rankConstant)")
    // The pre-filter is FILTER CONTEXT (score-neutral), exactly as in the ES
    // retriever tree: its match set rides the text branch's accept channel
    // (candidates restricted, BM25 statistics and scores untouched) — never
    // spliced into the scored query, where a bare term would become an extra
    // should clause and shift the BM25 ranking. The knn branch resolves the
    // SAME match set through its own semi-join, so both branches see one
    // filter semantics.
    val textRank: Array[ScoredDoc] =
      if (filter.isEmpty) search(query, windowSize)
      else searchImpl(query, windowSize, 0, 1, null,
        matchIdsDs(Searcher.parseFull(filter, meta.keywords.toSet, contentSpec)))
    val knnRank: Array[ScoredDoc] =
      if (hnswEf > 0) knnHnsw(field, queryVec, windowSize, hnswEf, filter)
      else knn(field, queryVec, windowSize, filter)
    val fused = new java.util.HashMap[Long, Double]()
    def add(ranking: Array[ScoredDoc]): Unit = {
      var i = 0
      while (i < ranking.length) {
        fused.merge(ranking(i).docId, 1.0 / (rankConstant + i + 1), (a, b) => a + b)
        i += 1
      }
    }
    add(textRank); add(knnRank)
    import scala.jdk.CollectionConverters._
    fused.entrySet().asScala.toArray
      .map(e => ScoredDoc(e.getKey, e.getValue))
      .sortBy(sd => (-sd.score, sd.docId))
      .take(k)
  }

  /** The published IVF centroids of a dense_vector field (tiny relation,
    * collected once per call — [[warm]]-style caching left to the caller). */
  private def readCentroids(field: String): Array[Array[Float]] =
    io.read(spark, s"$indexDir/ivf_$field")
      .select("cell", "centroid")
      .as[(Int, Array[Float])]
      .collect()
      .sortBy(_._1)
      .map(_._2)

  /** Validate a nested path + clause set against the index config and the
    * stored docs schema; returns the element StructType. */
  private def validateNested(
      path: String, clauses: Seq[(String, String)]): org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    require(meta.nested.contains(path),
      s"'$path' is not a nested field of this index (have: ${meta.nested.mkString(", ")})")
    require(clauses.nonEmpty, "nested query needs at least one (subField, value) clause")
    val st = docsDf.schema(path).dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    clauses.foreach { case (sub, _) =>
      val f = st.fields.find(_.name == sub).getOrElse(throw new IllegalArgumentException(
        s"'$sub' is not a sub-field of nested '$path' (have: ${st.fieldNames.mkString(", ")})"))
      require(f.dataType == StringType || f.dataType == BooleanType ||
        f.dataType == IntegerType || f.dataType == LongType ||
        f.dataType == ShortType || f.dataType == ByteType,
        s"nested term clause on '$path.$sub' needs a string/integral/boolean " +
          s"sub-field (got ${f.dataType.simpleString}); use range filters for floats")
    }
    st
  }

  /** Same-element Column predicate for a nested clause set — TRUE iff some
    * element of `path` satisfies every clause (values compared through
    * `cast(string)`, the same canonical form the index's `field.sub:value`
    * candidate terms use). */
  private def nestedPred(path: String, clauses: Seq[(String, String)]): Column =
    exists(col(path), e =>
      clauses.map { case (sub, v) => e.getField(sub).cast("string") === lit(v) }
        .reduce(_ && _))

  /** Verified docId accept set of an ES `nested` filter: documents with at
    * least one element of `path` matching ALL clauses — the semantics
    * Lucene's block-join gives `nested { bool { must: [term...] } } }`.
    *
    * Two-phase plan (candidates → verify), never a full docs scan:
    *  1. candidate docIds from the conjunction of the per-element
    *     `path.sub:value` candidate terms' postings (docs where every clause
    *     matches in SOME element — a superset of the answer);
    *  2. same-element verification against the STORED array<struct> column,
    *     restricted to the candidates by an inner join (the docs-relation
    *     scan reads only (docId, path) — column-pruned).
    * None = some clause's candidate term is absent from the dictionary, so
    * no element anywhere matches that clause → empty result. */
  private def nestedAcceptIds(
      path: String, clauses: Seq[(String, String)]): Option[Dataset[Long]] = {
    validateNested(path, clauses)
    val ct = clauses.map { case (sub, v) => s"$path.$sub:$v" }.distinct
    val stats = lookupTerms(ct)
    if (stats.length < ct.length) return None
    val filterIds = stats.map(_._1).toSet
    val avgdl = meta.avgdl
    val params = p
    val cand = blocksDf
      .filter(col("termId").isin(filterIds.toSeq.map(Long.box): _*))
      .as[PostingBlock]
      .groupByKey(_.shard)
      .flatMapGroups((_, b) => Wand.matchingConjunctive(b, filterIds, avgdl, params))
    Some(docsDf
      .join(cand.toDF("docId"), Seq("docId"))
      .filter(nestedPred(path, clauses))
      .select(col("docId")).as[Long])
  }

  /** ES `nested` query in bool filter context: top-k BM25 over `query`
    * (full bool semantics — terms, keyword filters, negations, even
    * phrases) restricted to documents where ONE element of the
    * nested `path` column satisfies ALL `clauses` (same-element semantics —
    * what distinguishes `nested` from a flat object mapping). An empty
    * `query` is pure filter context: every nested-matching doc at constant
    * score 0, docId order (ES bool-filter-only scoring). Statistics are
    * untouched by the filter, as in ES. */
  def searchNested(query: String, path: String, clauses: Seq[(String, String)], k: Int,
      minShouldMatch: Int = 1): Array[ScoredDoc] =
    nestedAcceptIds(path, clauses) match {
      case None => Array.empty
      case Some(ids) => searchImpl(query, k, 0, minShouldMatch, null, ids)
    }

  /** ES `nested` terms aggregation: buckets over `path.subField` where the
    * UNIT is the nested element (Lucene's hidden child doc) — each element
    * of each query-matching parent counts once, null sub-values skipped.
    * Returns ≤ topN (value, count) ordered (count desc, value asc). */
  def nestedFacets(query: String, path: String, subField: String, topN: Int)
      : Array[(String, Long)] = {
    validateNested(path, Seq(subField -> ""))
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    docsDf.join(matchIdsDs(pq).toDF("docId"), Seq("docId"))
      .filter(col(path).isNotNull)
      .select(explode(col(path)).as("e"))
      .select(col("e").getField(subField).cast("string").as("value"))
      .filter(col("value").isNotNull)
      .groupBy("value")
      .agg(sqlCount(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("value"))
      .limit(topN)
      .as[(String, Long)]
      .collect()
  }

  /** The query's FULL match set as a Dataset[docId] — the ES QUERY-CONTEXT
    * bool match: scored terms are should clauses (≥ minShouldMatch must be
    * present; each prefix/fuzzy expansion is its own clause), phrases are
    * must clauses (position-verified), keyword filters and ranges are
    * filter clauses, negations are must_not. An entirely empty query is
    * `match_all` (the ES default query for aggregations). Plan: match-only
    * kernel walk per shard (no heap — emission bounded by docsPerShard per
    * task); filter-context-only queries drive the walk from the filter
    * conjunction's postings; match_all/range-only queries come straight off
    * the docs relation (predicate pushed into the columnar scan). */
  private def matchIdsDs(
      pq: Searcher.ParsedQuery, minShouldMatch: Int = 1): Dataset[Long] = {
    if (pq.phrases.nonEmpty && !meta.hasPositions)
      throw new IllegalStateException(
        "phrase query on an index built without positions (IndexConfig.storePositions=false)")
    val expanded = expandAll(pq)
    val qTerms = (pq.terms ++ expanded).distinct
    val phraseTerms = pq.phrases.flatten.distinct
    val stats = lookupTermStats((qTerms ++ phraseTerms ++ pq.filters).distinct.toSeq)
    val excludeIds: Set[Long] = lookupTerms(pq.allExcluded.toSeq).map(_._1).toSet
    val empty = spark.emptyDataset[Long]
    val filterIdArr = pq.filters.flatMap(f => stats.get(f).map(_._1))
    if (filterIdArr.length < pq.filters.length) return empty
    val filterIds = filterIdArr.toSet
    val params = p
    val avgdl = meta.avgdl

    def run(termIds: Set[Long],
        kern: (Iterator[PostingBlock], Array[Long]) => Iterator[Long]): Dataset[Long] = {
      val kv = blocksDf
        .filter(col("termId").isin(termIds.toSeq.map(Long.box): _*))
        .as[PostingBlock]
        .groupByKey(_.shard)
      if (pq.ranges.isEmpty) kv.flatMapGroups((_, b) => kern(b, null))
      else kv.cogroup(acceptsByShard(pq.ranges)) { (_, b, acc) =>
        val a = acc.toArray
        java.util.Arrays.sort(a)
        kern(b, a)
      }
    }

    if (pq.phrases.nonEmpty) {
      if (phraseTerms.exists(t => !stats.contains(t))) return empty
      val reqIds = phraseTerms.map(t => stats(t)._1).toSet
      val phraseIdSeqs = pq.phrases.map(_.map(t => stats(t)._1))
      val slops = pq.slops
      run(reqIds ++ filterIds ++ excludeIds, (b, a) =>
        Phrase.matching(b, phraseIdSeqs, slops, reqIds, filterIds, avgdl, params, excludeIds, a))
    } else if (pq.hasScoringClauses) {
      val anyIds = qTerms.flatMap(t => stats.get(t).map(_._1)).toSet
      if (anyIds.isEmpty) empty
      else run(anyIds ++ filterIds ++ excludeIds, (b, a) =>
        Wand.matching(b, anyIds, filterIds, avgdl, params, excludeIds, a, minShouldMatch))
    } else if (filterIds.nonEmpty) {
      // ES filter context only: the keyword-filter conjunction drives the walk
      run(filterIds ++ excludeIds, (b, a) =>
        Wand.matchingConjunctive(b, filterIds, avgdl, params, excludeIds, a))
    } else {
      // match_all / range-only / must_not-only: base set from the docs
      // relation (range predicate pushed into the columnar scan), minus the
      // excluded terms' disjunctive match set
      val base: Dataset[Long] =
        if (pq.ranges.isEmpty) docsDf.select(col("docId")).as[Long]
        else {
          validateRanges(pq.ranges)
          docsDf.filter(pq.ranges.map(_.pred).reduce(_ && _)).select(col("docId")).as[Long]
        }
      if (excludeIds.isEmpty) base
      else {
        val ex = run(excludeIds, (b, a) =>
          Wand.matching(b, excludeIds, Set.empty, avgdl, params, Set.empty, a))
        base.toDF("docId").join(ex.toDF("docId"), Seq("docId"), "left_anti")
          .as[Long]
      }
    }
  }

  /** Facet counts — the ES `terms` aggregation in query context: for every
    * value of a stored docs column, how many documents MATCH the query
    * (all matches, not top-k — [[matchIdsDs]] semantics, including
    * filter-only and match_all queries). Docs missing the field are skipped
    * (ES agg rule). Returns ≤ topN (value, count) rows ordered
    * (count desc, value asc).
    *
    * Plan: match-only kernel walk per shard → distributed join with the
    * docs relation on docId → partial-aggregated groupBy(field) →
    * TakeOrdered(topN). */
  def facets(query: String, field: String, topN: Int): Array[(String, Long)] = {
    val f = docsDf.schema.fields.find(_.name == field).getOrElse(
      throw new IllegalArgumentException(
        s"facet field '$field' is not a stored docs column (have: ${docsDf.columns.mkString(", ")})"))
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val matched = docsDf.join(matchIdsDs(pq).toDF("docId"), Seq("docId"))
      .filter(col(field).isNotNull)
    // an array field buckets per DISTINCT element (the ES terms-agg rule
    // for array fields: a doc counts once per distinct value it carries)
    val bucketed = f.dataType match {
      case org.apache.spark.sql.types.ArrayType(_, _) =>
        matched.select(explode(array_distinct(col(field))).as("value"))
          .select(col("value").cast("string").as("value"))
      case _ => matched.select(col(field).cast("string").as("value"))
    }
    bucketed
      .groupBy("value")
      .agg(sqlCount(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("value"))
      .limit(topN)
      .as[(String, Long)]
      .collect()
  }

  /** ES `_count`: how many documents match the query — full bool semantics
    * via [[matchIdsDs]]; an empty query counts every document (match_all). */
  def count(query: String, minShouldMatch: Int = 1): Long =
    matchIdsDs(Searcher.parseFull(query, meta.keywords.toSet, contentSpec), minShouldMatch).count()

  /** ES `stats` aggregation in query context over a stored NUMERIC docs
    * column: ONE row (cnt, mn, mx, sm, av) over the matching documents that
    * have the field (nulls skipped — ES agg rule; cnt is the count of
    * field-bearing matches, min/max/sum/avg over their values). */
  def statsAgg(query: String, field: String, minShouldMatch: Int = 1): DataFrame = {
    validateNumericField(field)
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val v = col(field).cast("double")
    docsDf.join(matchIdsDs(pq, minShouldMatch).toDF("docId"), Seq("docId"))
      .filter(col(field).isNotNull)
      .agg(sqlCount(lit(1)).as("cnt"),
        min(v).as("mn"), max(v).as("mx"), sum(v).as("sm"), avg(v).as("av"))
  }

  /** ES `extended_stats` aggregation in query context: everything
    * [[statsAgg]] reports plus `sum_of_squares`, `variance` and
    * `std_deviation` — POPULATION variance, as ES computes it
    * (`sum_of_squares/n − mean²`). One distributed partial aggregation
    * over the match set; null fields skipped. */
  def extendedStatsAgg(query: String, field: String, minShouldMatch: Int = 1): DataFrame = {
    validateNumericField(field)
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val v = col(field).cast("double")
    docsDf.join(matchIdsDs(pq, minShouldMatch).toDF("docId"), Seq("docId"))
      .filter(col(field).isNotNull)
      .agg(sqlCount(lit(1)).as("cnt"),
        min(v).as("mn"), max(v).as("mx"), sum(v).as("sm"), avg(v).as("av"),
        sum(v * v).as("sum_sq"),
        var_pop(v).as("variance"),
        stddev_pop(v).as("std_dev"))
  }

  /** ES `histogram` aggregation in query context: fixed-interval buckets
    * (key = floor(value / interval) * interval) over the matching docs'
    * field values, count per bucket, ordered by key asc. Empty buckets are
    * omitted (ES `min_doc_count: 1`); null fields skipped (ES agg rule). */
  def histogram(
      query: String, field: String, interval: Double, minShouldMatch: Int = 1): DataFrame = {
    require(interval > 0, s"histogram interval must be > 0 (got $interval)")
    validateNumericField(field)
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    docsDf.join(matchIdsDs(pq, minShouldMatch).toDF("docId"), Seq("docId"))
      .filter(col(field).isNotNull)
      .groupBy((floor(col(field).cast("double") / interval) * interval).as("bucket"))
      .agg(sqlCount(lit(1)).as("cnt"))
      .orderBy(asc("bucket"))
  }

  /** ES sort-by-field (doc_values sort, `missing: _last`): the query's
    * match set ordered by a stored NUMERIC docs column instead of
    * relevance — ties and missing values break by docId asc. No scoring
    * work at all: the kernels run in match-only mode, then Spark's
    * TakeOrderedAndProject merges per-partition top-k. Returns ≤k rows
    * (docId, field). */
  def searchSortedBy(
      query: String, field: String, ascending: Boolean, k: Int,
      minShouldMatch: Int = 1): DataFrame = {
    validateNumericField(field)
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val ord = if (ascending) col(field).asc_nulls_last else col(field).desc_nulls_last
    docsDf.join(matchIdsDs(pq, minShouldMatch).toDF("docId"), Seq("docId"))
      .select(col("docId"), col(field))
      .orderBy(ord, asc("docId"))
      .limit(k)
  }

  /** ES scroll / `search_after`-export analogue: the query's FULL match set
    * as a DataFrame of stored fields — never collected to the driver, no
    * heap, no order (the reindex/export serving shape: downstream writes it
    * straight back out, partition-parallel). `fields` selects stored docs
    * columns on top of the `docId` key; empty = every stored column. Full
    * bool semantics via [[matchIdsDs]], including filter-only and match_all
    * queries. */
  def scan(query: String, fields: Seq[String] = Nil, minShouldMatch: Int = 1): DataFrame = {
    val cols =
      if (fields.isEmpty) docsDf.columns.toSeq
      else {
        fields.foreach(f => require(docsDf.columns.contains(f),
          s"scan field '$f' is not a stored docs column (have: ${docsDf.columns.mkString(", ")})"))
        ("docId" +: fields).distinct
      }
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    docsDf.select(cols.map(col): _*)
      .join(matchIdsDs(pq, minShouldMatch).toDF("docId"), Seq("docId"))
  }

  /** ES `terms` aggregation with a `stats` SUB-aggregation: for each value
    * of `bucketField` over the match set, the count of docs plus
    * min/max/sum/avg of `valueField` (nulls skipped per ES agg rule — a doc
    * missing `bucketField` is skipped entirely; one missing only
    * `valueField` counts but contributes no stats). Top `topN` buckets by
    * (count desc, value asc) — the ES terms-agg order. */
  def facetsStats(query: String, bucketField: String, valueField: String, topN: Int,
      minShouldMatch: Int = 1): DataFrame = {
    require(docsDf.columns.contains(bucketField),
      s"bucket field '$bucketField' is not a stored docs column (have: ${docsDf.columns.mkString(", ")})")
    validateNumericField(valueField)
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val v = col(valueField).cast("double")
    docsDf.join(matchIdsDs(pq, minShouldMatch).toDF("docId"), Seq("docId"))
      .filter(col(bucketField).isNotNull)
      .groupBy(col(bucketField).cast("string").as("value"))
      .agg(sqlCount(lit(1)).as("cnt"),
        min(v).as("mn"), max(v).as("mx"), sum(v).as("sm"), avg(v).as("av"))
      .orderBy(desc("cnt"), asc("value"))
      .limit(topN)
  }

  /** ES `range` aggregation in query context: explicit half-open buckets
    * over a stored numeric field — `bounds` b₀<b₁<…<bₙ define n+1 buckets
    * (-∞,b₀), [b₀,b₁), …, [bₙ,∞), from-inclusive/to-exclusive, EVERY bucket
    * present even when empty (the ES range-agg contract, unlike histogram's
    * min_doc_count). Returns (lo, hi, cnt) rows ordered by bucket; lo/hi
    * null at the open ends. Plan: one partial-aggregated pass over the
    * matching docs bucketed by a codegen'd bound count, left-joined onto
    * the literal bucket table (broadcast). */
  def rangeAgg(query: String, field: String, bounds: Seq[Double],
      minShouldMatch: Int = 1): DataFrame = {
    require(bounds.nonEmpty, "range aggregation needs at least one bound")
    require(bounds == bounds.sorted && bounds.distinct == bounds,
      s"range bounds must be strictly increasing (got ${bounds.mkString(", ")})")
    validateNumericField(field)
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val v = col(field).cast("double")
    // bucket index per doc = number of bounds <= value (from-inclusive)
    val bucketIdx = bounds.foldLeft(lit(0))((acc, b) => acc + when(v >= b, 1).otherwise(0))
    val counts = docsDf.join(matchIdsDs(pq, minShouldMatch).toDF("docId"), Seq("docId"))
      .filter(col(field).isNotNull)
      .groupBy(bucketIdx.as("idx"))
      .agg(sqlCount(lit(1)).as("cnt"))
    import spark.implicits._
    val buckets = (0 to bounds.size).map { i =>
      (i,
        if (i == 0) None else Some(bounds(i - 1)),
        if (i == bounds.size) None else Some(bounds(i)))
    }.toDF("idx", "lo", "hi")
    buckets.join(counts, Seq("idx"), "left")
      .select(col("lo"), col("hi"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy(asc_nulls_first("lo"))
  }

  /** ES `cardinality` aggregation in query context: number of distinct
    * values of a stored docs column over the match set (nulls skipped).
    * `exact = false` is the ES shape — HyperLogLog++ (the very algorithm ES
    * uses), constant memory per partition at any scale; `exact = true`
    * pays a distinct shuffle for the precise count (the small-cardinality /
    * verification path, and the DuckDB-comparable form). */
  def cardinality(query: String, field: String, exact: Boolean = false,
      rsd: Double = 0.05, minShouldMatch: Int = 1): Long = {
    require(docsDf.columns.contains(field),
      s"cardinality field '$field' is not a stored docs column (have: ${docsDf.columns.mkString(", ")})")
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val matched = docsDf.join(matchIdsDs(pq, minShouldMatch).toDF("docId"), Seq("docId"))
      .filter(col(field).isNotNull)
    val aggCol = if (exact) countDistinct(col(field)) else approx_count_distinct(col(field), rsd)
    matched.agg(aggCol.as("c")).head().getLong(0)
  }

  /** Every matching doc WITH its exact BM25 score, as a distributed
    * Dataset — the scored analogue of [[matchIdsDs]], behind ES `top_hits`
    * (every match may top its own bucket, so no global-k pruning is
    * admissible; [[Wand.scoreAll]] per shard). Filter-only / match_all
    * queries score 0.0 (ES constant-score filter context). Phrase queries
    * are not supported in scored-all form. */
  private def scoredMatchesDs(
      pq: Searcher.ParsedQuery, minShouldMatch: Int = 1,
      disMaxTieBreaker: Option[Double] = None): Dataset[ScoredDoc] = {
    require(pq.phrases.isEmpty, "top_hits does not support phrase queries")
    if (!pq.hasScoringClauses)
      return matchIdsDs(pq, minShouldMatch).map(ScoredDoc(_, 0.0))
    val expanded = expandAll(pq)
    val qTerms = (pq.terms ++ expanded).distinct
    val stats = lookupTermStats((qTerms ++ pq.filters).distinct.toSeq)
    val excludeIds: Set[Long] = lookupTerms(pq.allExcluded.toSeq).map(_._1).toSet
    val empty = spark.emptyDataset[ScoredDoc]
    val filterIdArr = pq.filters.flatMap(f => stats.get(f).map(_._1))
    if (filterIdArr.length < pq.filters.length) return empty
    val filterIds = filterIdArr.toSet
    val n = meta.numDocs
    val idfById: Map[Long, Double] = qTerms.flatMap(t =>
      stats.get(t).map { case (tid, df) => tid -> BM25.idf(n, df) * pq.boostOf(t) }).toMap
    if (idfById.isEmpty) return empty
    val params = p
    val avgdl = meta.avgdl
    val termIds = idfById.keySet ++ filterIds ++ excludeIds
    val kv = blocksDf
      .filter(col("termId").isin(termIds.toSeq.map(Long.box): _*))
      .as[PostingBlock]
      .groupByKey(_.shard)
    val msm = minShouldMatch
    val dmTb = disMaxTieBreaker
    def kernel(b: Iterator[PostingBlock], acc: Array[Long]): Iterator[ScoredDoc] =
      dmTb match {
        case Some(tb) => Wand.scoreAllDisMax(b, idfById, filterIds, avgdl, params, tb,
          excludeTermIds = excludeIds, accept = acc, minShouldMatch = msm)
        case None => Wand.scoreAll(b, idfById, filterIds, avgdl, params,
          excludeTermIds = excludeIds, accept = acc, minShouldMatch = msm)
      }
    if (pq.ranges.isEmpty)
      kv.flatMapGroups((_, b) => kernel(b, null))
    else
      kv.cogroup(acceptsByShard(pq.ranges)) { (_, b, acc) =>
        val a = acc.toArray
        java.util.Arrays.sort(a)
        kernel(b, a)
      }
  }

  /** ES `top_hits` inside a `terms` aggregation: the top `topNBuckets`
    * values of a stored docs column by match count (terms-agg bucket order:
    * count desc, value asc), each carrying its `hitsPerBucket` best hits by
    * relevance (score desc, docId asc). Returns flat rows
    * (value, cnt, rank, docId, score) in bucket-then-rank order.
    *
    * Plan: exhaustive per-shard scoring walk (scored matches stay
    * distributed) → join with the docs relation on docId → ONE shuffle by
    * bucket value serving both the count aggregation (partial map-side) and
    * the per-bucket top-k window; bucket selection is a broadcast of ≤
    * topNBuckets rows. The window's per-partition state is one bucket's
    * matches — bounded by bucket cardinality skew, the same bound ES's
    * per-bucket hit heaps have. */
  def topHits(query: String, bucketField: String, topNBuckets: Int, hitsPerBucket: Int,
      minShouldMatch: Int = 1): DataFrame = {
    require(topNBuckets > 0 && hitsPerBucket > 0, "topNBuckets and hitsPerBucket must be > 0")
    require(docsDf.columns.contains(bucketField),
      s"bucket field '$bucketField' is not a stored docs column (have: ${docsDf.columns.mkString(", ")})")
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val scored = scoredMatchesDs(pq, minShouldMatch).toDF("docId", "score")
    val joined = docsDf.join(scored, Seq("docId"))
      .filter(col(bucketField).isNotNull)
      .select(col(bucketField).cast("string").as("value"), col("docId"), col("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("value")).orderBy(desc("score"), asc("docId"))
    val ranked = joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= hitsPerBucket)
    val topBuckets = joined.groupBy("value").agg(sqlCount(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("value")).limit(topNBuckets)
    ranked.join(broadcast(topBuckets), Seq("value"))
      .select(col("value"), col("cnt"), col("rank"), col("docId"), col("score"))
      .orderBy(desc("cnt"), asc("value"), asc("rank"))
  }

  /** ES `percentiles` aggregation in query context over a stored NUMERIC
    * docs column: one row (p, value) per requested percentile, computed
    * over the matching documents that have the field (nulls skipped).
    * `exact=false` (the default, ES's own behavior — t-digest) uses
    * `approx_percentile`; `exact=true` computes the true linear-interpolated
    * quantile (DuckDB `quantile_cont` convention — Spark's `percentile`),
    * which buffers the match set's values per group and is the
    * small-result/verification mode, not the 100 TB default. */
  def percentilesAgg(query: String, field: String, ps: Seq[Double],
      exact: Boolean = false, minShouldMatch: Int = 1): DataFrame = {
    validateNumericField(field)
    require(ps.nonEmpty && ps.forall(x => x >= 0.0 && x <= 1.0),
      "percentiles must be fractions in [0, 1]")
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val matched = docsDf.join(matchIdsDs(pq, minShouldMatch).toDF("docId"), Seq("docId"))
      .filter(col(field).isNotNull)
    val fn = if (exact) "percentile" else "approx_percentile"
    val qs = matched.agg(
      expr(s"$fn(cast($field as double), array(${ps.mkString(",")}))").as("qs"))
    qs.select(posexplode(col("qs")).as(Seq("i", "value")))
      .select(element_at(typedLit(ps), col("i").cast("int") + 1).as("p"), col("value"))
  }

  /** ES `collapse`: top-k hits AFTER keeping only the single best hit
    * (score desc, docId asc) per distinct value of a stored docs column —
    * search-result dedup by field, e.g. one hit per repo. Documents whose
    * collapse field is NULL each stay their own group (ES keeps them as
    * distinct hits). Returns (docId, value, score) in hit order.
    *
    * Plan: exhaustive per-shard scored walk (any match may be its group's
    * best, so global-k pruning is inadmissible — the `top_hits` argument)
    * → join the docs relation for the collapse key → ONE shuffle by key
    * for the per-group argmax (window bounded by group size, the same
    * bound ES's grouping heads carry) → global top-k merge. */
  def collapse(query: String, field: String, k: Int, minShouldMatch: Int = 1): DataFrame = {
    require(k > 0, "k must be > 0")
    require(docsDf.columns.contains(field),
      s"collapse field '$field' is not a stored docs column (have: ${docsDf.columns.mkString(", ")})")
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val scored = scoredMatchesDs(pq, minShouldMatch).toDF("docId", "score")
    val joined = docsDf.select(col("docId"), col(field).cast("string").as("value"))
      .join(scored, Seq("docId"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("value")).orderBy(desc("score"), asc("docId"))
    val best = joined.filter(col("value").isNotNull)
      .withColumn("_r", row_number().over(w)).filter(col("_r") === 1).drop("_r")
    best.unionByName(joined.filter(col("value").isNull))
      .orderBy(desc("score"), asc("docId")).limit(k)
      .select(col("docId"), col("value"), col("score"))
  }

  /** ES `dis_max` query over the analyzed clauses of `query`: a document
    * scores its BEST single term contribution plus `tieBreaker ×` the
    * remaining matching terms' contributions (`max + tb·(sum − max)`,
    * Lucene DisjunctionMaxQuery) instead of the bool-query sum — the
    * standard shape when clauses are alternative phrasings of the same
    * concept and stacking them would overcount. Keyword/range filters,
    * negations, prefixes/fuzzies/wildcards/regexps and boosts all behave
    * exactly as in [[search]]; phrase clauses are not supported (they are
    * conjunctive, not alternatives). Top-k (score desc, docId asc).
    *
    * Plan: exhaustive per-shard dis_max walk (a doc-dependent max admits
    * no sum-of-bounds WAND pivot) → per-partition top-k →
    * TakeOrderedAndProject merge. */
  def searchDisMax(query: String, k: Int, tieBreaker: Double = 0.0,
      minShouldMatch: Int = 1): Array[ScoredDoc] = {
    require(k > 0, "k must be > 0")
    require(tieBreaker >= 0.0 && tieBreaker <= 1.0,
      s"tieBreaker must be in [0, 1] (got $tieBreaker)")
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    require(pq.phrases.isEmpty, "dis_max does not support phrase clauses")
    require(pq.hasScoringClauses, "dis_max needs at least one scoring clause")
    scoredMatchesDs(pq, minShouldMatch, disMaxTieBreaker = Some(tieBreaker))
      .orderBy(desc("score"), asc("docId")).limit(k).collect()
  }

  /** ES `multi_match`: ONE query string scored over SEVERAL analyzed
    * fields — `content` plus any [[FieldConfig.analyzed]] extra field,
    * each optionally boosted ES-style (`"source^2"`). Per-field BM25 is
    * EXACT: a field's tagged `field:token` postings carry the field's own
    * document length, its df is the tagged term's dictionary df, and its
    * docCount / avgdl come from the `field:` marker's dictionary row
    * (Lucene's per-field docCount / sumTotalTermFreq) — not the
    * content-wide statistics.
    *
    * `matchType` is ES `type`: `best_fields` (default) combines the
    * per-field scores dis_max-style — best field + `tieBreaker ×` the
    * rest; `most_fields` sums them; `cross_fields` treats the fields as
    * one blended field, the Lucene BlendedTermQuery shape — each token's
    * document frequency is BLENDED (max across the fields), its idf is
    * computed against the index docCount, the token is scored in each
    * field with that shared idf but the field's own tf/dl/avgdl, the
    * per-token field scores combine dis_max-style (best + tieBreaker ×
    * rest) and the per-token results SUM. Keyword/range filters and negations
    * behave exactly as in [[search]]; phrases and pattern clauses are not
    * supported (per-field position/pattern semantics — extension point).
    * `minShouldMatch` bounds the DISTINCT QUERY TOKENS matched in at
    * least one field. A listed field absent from this index's analyzed
    * set is rejected; a field whose marker is missing (no document has
    * it) simply contributes nothing, as in ES. Top-k (score desc, docId
    * asc).
    *
    * Plan: per-shard grouped block-max WAND ([[Wand.topKFields]] — the
    * plain sum-of-bounds pivot upper-bounds BOTH combine modes, so
    * skipping stays admissible; bounds derived per cursor from
    * (maxTf, minDl) under the FIELD's avgdl) → per-shard top-k →
    * TakeOrderedAndProject merge. */
  def multiMatch(query: String, fields: Seq[String], k: Int,
      matchType: String = "best_fields", tieBreaker: Double = 0.0,
      minShouldMatch: Int = 1): Array[ScoredDoc] = {
    require(k > 0, "k must be > 0")
    val mode = matchType match {
      case "most_fields" => Wand.MostFields
      case "best_fields" => Wand.BestFields
      case "cross_fields" => Wand.CrossFields
      case other => throw new IllegalArgumentException(
        s"matchType must be best_fields, most_fields or cross_fields (got '$other')")
    }
    require(tieBreaker >= 0.0 && tieBreaker <= 1.0,
      s"tieBreaker must be in [0, 1] (got $tieBreaker)")
    require(minShouldMatch >= 1, s"minShouldMatch must be >= 1 (got $minShouldMatch)")
    require(fields.nonEmpty, "multi_match needs at least one field")
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    require(pq.phrases.isEmpty && pq.prefixes.isEmpty && pq.fuzzies.isEmpty &&
      pq.wildcards.isEmpty && pq.regexps.isEmpty,
      "multi_match supports plain terms, keyword/range filters and negations only")
    require(pq.terms.nonEmpty, "multi_match needs at least one scored term")
    val fieldSpecs: Seq[(String, Double)] = fields.map { f =>
      val i = f.lastIndexOf('^')
      if (i < 0) (f, 1.0) else (f.take(i), f.drop(i + 1).toDouble)
    }
    require(fieldSpecs.map(_._1).distinct.length == fieldSpecs.length,
      "multi_match fields must be distinct")
    for ((f, b) <- fieldSpecs) {
      require(b > 0.0, s"field boost must be > 0 (got $f^$b)")
      require(f == "content" || meta.analyzed.contains(f),
        s"'$f' is not an analyzed field of this index " +
          s"(analyzed: ${("content" +: meta.analyzed).mkString(", ")})")
    }
    // per-field statistics: content from meta; an extra field from its
    // `field:` marker dictionary row — (df, cf) = (docCount, token total)
    val markerStats: Map[String, (Long, Long)] = {
      val markers = fieldSpecs.collect { case (f, _) if f != "content" => s"$f:" }
      if (markers.isEmpty) Map.empty
      else termsDf.filter(col("term").isin(markers: _*))
        .select("term", "df", "cf").collect()
        .map(r => r.getString(0).dropRight(1) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    // per-field query analysis (ES search_analyzer = index analyzer): a
    // field with a non-code AnalyzerSpec re-analyzes the RAW scored tokens
    // with its own kind + stop filter (synonyms are index-time injections —
    // the query token already matches them in the postings)
    val contentTokens: Array[String] = pq.terms.distinct
    val fieldTokens: Map[String, Array[String]] = fieldSpecs.map { case (f, _) =>
      val spec = meta.analyzerOf(f)
      f -> (if (spec.isCode) contentTokens
            else graft.analysis.AnalyzerSpec
              .queryTokens(spec, pq.rawPlain.mkString(" ")).distinct)
    }.toMap
    // unified token identity across fields (msm + cross_fields blending
    // count DISTINCT query tokens): same analyzed string = same token
    val tokens: Array[String] = fieldSpecs.flatMap(fs => fieldTokens(fs._1)).distinct.toArray
    val tokIdxOf: Map[String, Int] = tokens.zipWithIndex.toMap
    if (mode == Wand.CrossFields)
      require(fieldSpecs.forall { case (f, _) =>
        fieldTokens(f).sameElements(contentTokens) },
        "cross_fields requires all queried fields to share the content analyzer " +
          "(ES groups cross_fields terms per analyzer)")
    // one clause per (field present in index) × (that field's tokens)
    final case class Clause(term: String, group: Int, tokIdx: Int, nF: Long,
        avgdlF: Double, fieldBoost: Double)
    val clauses: Seq[Clause] = fieldSpecs.zipWithIndex.flatMap { case ((f, fb), g) =>
      val statsF: Option[(Long, Double)] =
        if (f == "content") Some((meta.numDocs, meta.avgdl))
        else markerStats.get(f).map { case (dc, ttf) => (dc, ttf.toDouble / dc.toDouble) }
      statsF.toSeq.flatMap { case (nF, avgdlF) =>
        fieldTokens(f).map { t =>
          Clause(if (f == "content") t else s"$f:$t", g, tokIdxOf(t), nF, avgdlF, fb)
        }
      }
    }
    if (clauses.isEmpty) return Array.empty
    val stats = lookupTermStats((clauses.map(_.term) ++ pq.filters).distinct)
    val excludeIds: Set[Long] = lookupTerms(pq.allExcluded.toSeq).map(_._1).toSet
    val filterIdArr = pq.filters.flatMap(f => stats.get(f).map(_._1))
    if (filterIdArr.length < pq.filters.length) return Array.empty
    val filterIds = filterIdArr.toSet
    // cross_fields: blended per-token df (max across the fields), idf
    // against the index docCount, clause group = TOKEN
    val dfBlend: Map[Int, Long] =
      if (mode != Wand.CrossFields) Map.empty
      else clauses.groupBy(_.tokIdx).map { case (ti, cs) =>
        ti -> cs.flatMap(c => stats.get(c.term).map(_._2)).foldLeft(0L)(math.max)
      }
    val infoById: Map[Long, Wand.FieldTermInfo] = clauses.flatMap { c =>
      stats.get(c.term).map { case (tid, df) =>
        val idf =
          if (mode == Wand.CrossFields) BM25.idf(meta.numDocs, dfBlend(c.tokIdx))
          else BM25.idf(c.nF, df)
        tid -> Wand.FieldTermInfo(
          idf * c.fieldBoost * pq.boostOf(tokens(c.tokIdx)),
          c.avgdlF,
          if (mode == Wand.CrossFields) c.tokIdx else c.group,
          c.tokIdx)
      }
    }.toMap
    if (infoById.isEmpty) return Array.empty
    val params = p
    val gAvgdl = meta.avgdl
    val numGroups = if (mode == Wand.CrossFields) tokens.length else fieldSpecs.size
    val numTokens = tokens.length
    val tb = tieBreaker
    val msm = minShouldMatch
    val termIds = infoById.keySet ++ filterIds ++ excludeIds
    import spark.implicits._
    val kv = blocksDf
      .filter(col("termId").isin(termIds.toSeq.map(Long.box): _*))
      .as[PostingBlock]
      .groupByKey(_.shard)
    val kk = k
    val md = mode
    val scored =
      if (pq.ranges.isEmpty)
        kv.flatMapGroups((_, b) => Wand.topKFields(b, infoById, numGroups, numTokens,
          filterIds, gAvgdl, params, tb, md, kk, excludeIds, null, msm))
      else
        kv.cogroup(acceptsByShard(pq.ranges)) { (_, b, acc) =>
          val a = acc.toArray
          java.util.Arrays.sort(a)
          Wand.topKFields(b, infoById, numGroups, numTokens,
            filterIds, gAvgdl, params, tb, md, kk, excludeIds, a, msm)
        }
    scored.orderBy(desc("score"), asc("docId")).limit(k).collect()
  }

  /** ES `match_phrase_prefix` (search-as-you-type): an exact phrase whose
    * LAST token is a prefix — `matchPhrasePrefix("data mer")` matches
    * "data merge", "data merger", … . The trailing stem expands to the
    * lexicographically smallest `maxExpansions` dictionary terms (ES caps
    * at 50), each completing the phrase as one VARIANT; a document matches
    * if ANY variant phrase matches at `slop`, and scores as its BEST
    * matching variant (phrase scoring is the distinct-term BM25 sum, the
    * engine's documented departure, so variants differ only in the final
    * term's contribution). Top-k (score desc, docId asc).
    *
    * Plan: ONE batched kernel pass for the whole variant set
    * ([[searchMany]] — union of the variants' terms, one scan, every
    * variant's kernel per shard), then a driver-side max-merge. Per-variant
    * top-k + max-merge is EXACT for the global top-k: if a doc's best
    * variant is v with score s, every doc ranked above it globally that
    * matches v has variant-v rank above it too, so a global top-k doc is
    * inside v's top-k. */
  def matchPhrasePrefix(phrase: String, k: Int, maxExpansions: Int = 50,
      slop: Int = 0): Array[ScoredDoc] = {
    require(k > 0, "k must be > 0")
    require(maxExpansions > 0, "maxExpansions must be > 0")
    require(slop >= 0, "slop must be >= 0")
    val toks = ctokens(phrase)
    require(toks.nonEmpty, "match_phrase_prefix needs at least one token")
    val stem = toks.last
    val lead = toks.dropRight(1)
    val expansions = expandPrefixMap(Seq(stem), maxExpansions)(stem)
    if (expansions.isEmpty) return Array.empty
    if (lead.isEmpty) // single-token prefix degenerates to the ES prefix query
      return search(stem + "*", k)
    val suffix = if (slop > 0) s"~$slop" else ""
    val variants = expansions.toSeq.map(e =>
      (lead :+ e).mkString("\"", " ", "\"") + suffix -> k)
    val perVariant = searchMany(variants)
    val best = new java.util.HashMap[Long, Double]()
    perVariant.foreach(_.foreach { h =>
      best.merge(h.docId, h.score, (a, b) => math.max(a, b))
    })
    import scala.jdk.CollectionConverters._
    best.entrySet().iterator().asScala
      .map(e => ScoredDoc(e.getKey.longValue(), e.getValue.doubleValue())).toArray
      .sortBy(h => (-h.score, h.docId)).take(k)
  }

  /** ES `boosting` query: hits of the `positive` query ranked by the
    * ordinary summed BM25, except that any hit ALSO matching the
    * `negative` query has its score multiplied by `negativeBoost`
    * (∈ [0, 1]) — demotion without exclusion, the ES answer to "rank
    * apple-the-fruit above apple-the-company without dropping the
    * latter". The negative clause contributes NO score of its own and is
    * pure match context: terms, phrases, keyword/range filters and
    * negations are all legal in it. Top-k (score desc, docId asc).
    *
    * Plan: exhaustive per-shard scored walk of the positive query (the
    * demotion reorders the full match set, so no global-k pruning of the
    * base ranking is admissible) LEFT-joined on docId with the negative
    * query's match-id set, conditional multiply, then a
    * TakeOrderedAndProject top-k merge. */
  def searchBoosting(positive: String, negative: String, k: Int,
      negativeBoost: Double = 0.5, minShouldMatch: Int = 1): Array[ScoredDoc] = {
    require(k > 0, "k must be > 0")
    require(negativeBoost >= 0.0 && negativeBoost <= 1.0,
      s"negativeBoost must be in [0, 1] (got $negativeBoost)")
    val ppq = Searcher.parseFull(positive, meta.keywords.toSet, contentSpec)
    require(ppq.phrases.isEmpty, "boosting's positive query must be a term query (no phrases)")
    require(ppq.hasScoringClauses, "boosting needs a scoring positive query")
    val npq = Searcher.parseFull(negative, meta.keywords.toSet, contentSpec)
    val neg = matchIdsDs(npq).toDF("docId").withColumn("demote", lit(true))
    scoredMatchesDs(ppq, minShouldMatch).toDF("docId", "score")
      .join(neg, Seq("docId"), "left")
      .select(col("docId"),
        when(col("demote"), col("score") * negativeBoost)
          .otherwise(col("score")).as("score"))
      .orderBy(desc("score"), asc("docId")).limit(k)
      .collect().map(r => ScoredDoc(r.getLong(0), r.getDouble(1)))
  }

  /** ES `match_phrase` on an ANALYZED EXTRA FIELD
    * ([[graft.index.FieldConfig.analyzed]]): the quoted span must occur in
    * THAT field's token stream — tagged `field:token` postings store
    * within-FIELD positions, so adjacency/slop verification is exact per
    * field — and scores as the field's distinct-term BM25 sum (field idf
    * from the `field:` marker's docCount, field avgdl from its token
    * total; the same per-field statistics multi_match uses). Top-k
    * (score desc, docId asc). Requires storePositions. */
  def matchPhraseField(field: String, phrase: String, k: Int,
      slop: Int = 0): Array[ScoredDoc] = {
    require(k > 0, "k must be > 0")
    require(slop >= 0, "slop must be >= 0")
    require(meta.analyzed.contains(field),
      s"'$field' is not an analyzed extra field of this index " +
        s"(analyzed: ${meta.analyzed.mkString(", ")})")
    if (!meta.hasPositions)
      throw new IllegalStateException(
        "phrase query on an index built without positions (IndexConfig.storePositions=false)")
    // the FIELD's analyzer tokenizes the phrase (ES search_analyzer = index
    // analyzer). A leading/trailing stopword is simply dropped (its indexed
    // positions left gaps, so the remaining tokens are stream-adjacent); an
    // INTERIOR stopword would need ES position-increment gap matching —
    // rejected rather than silently matching tighter spans.
    val fSpec = meta.analyzerOf(field)
    val toks = graft.analysis.AnalyzerSpec.queryTokens(fSpec, phrase)
    require(toks.nonEmpty, "match_phrase needs at least one token")
    if (fSpec.stopwords.nonEmpty) {
      val base = graft.analysis.AnalyzerSpec.queryTokens(fSpec.copy(stopwords = Nil), phrase)
      val inner = base.dropWhile(fSpec.stopwords.contains)
        .reverse.dropWhile(fSpec.stopwords.contains).reverse
      require(!inner.exists(fSpec.stopwords.contains),
        s"phrase has an interior stopword of field '$field' — position-gap " +
          "phrase matching is not supported; drop the stopword from the phrase")
    }
    val tagged = toks.map(t => s"$field:$t")
    val mk = termsDf.filter(col("term") === s"$field:").select("df", "cf").collect()
    if (mk.isEmpty) return Array.empty // no document has the field
    val nF = mk(0).getLong(0)
    val avgdlF = mk(0).getLong(1).toDouble / nF.toDouble
    val distinctTagged = tagged.distinct.toSeq
    val stats = lookupTermStats(distinctTagged)
    if (distinctTagged.exists(t => !stats.contains(t))) return Array.empty // conjunctive
    val idfById: Map[Long, Double] = distinctTagged.map { t =>
      val (tid, df) = stats(t); tid -> BM25.idf(nF, df)
    }.toMap
    val phraseIdSeqs = Array(tagged.map(t => stats(t)._1))
    val params = p
    val kk = k
    val slops = Array(slop)
    import spark.implicits._
    blocksDf.filter(col("termId").isin(idfById.keySet.toSeq.map(Long.box): _*))
      .as[PostingBlock]
      .groupByKey(_.shard)
      .flatMapGroups { (_, blocks) =>
        Phrase.topK(blocks, phraseIdSeqs, slops, idfById, Map.empty, Set.empty,
          avgdlF, params, kk)
      }
      .orderBy(desc("score"), asc("docId")).limit(k).collect()
  }

  /** ES `_analyze` against a FIELD's configured analyzer: the
    * (position, token) stream the index stores for `text` in that field —
    * kind + index-time stopword gaps + synonym injections, exactly what
    * [[graft.index.IndexBuilder]] emits. `content` (and any field without
    * an override) uses the code-aware analyzer. */
  def analyzeField(field: String, text: String): Array[(Long, String)] = {
    require(field == "content" || meta.analyzed.contains(field),
      s"'$field' is not an analyzed field of this index " +
        s"(analyzed: ${("content" +: meta.analyzed).mkString(", ")})")
    val spec =
      meta.analyzerOf(field)
    val (toks, poss, _) = graft.analysis.AnalyzerSpec.tokenizeIndexed(spec, text)
    poss.zip(toks)
  }

  /** ES `_termvectors` (with `term_statistics`): one document's term
    * vector for an analyzed field — per term its in-document frequency
    * (tf) plus the index-wide doc frequency (df) and total term frequency
    * (cf), term-ordered. `field` is `content` or a
    * [[graft.index.FieldConfig.analyzed]] extra field (tagged terms are
    * presented untagged; the `field:` exists-marker is excluded).
    *
    * Plan: resolve the identity to its docId (point read), then decode
    * ONLY the owning shard's posting blocks (the `shard =` predicate is
    * pushed into the columnar blocks scan) probing each block's sorted
    * docIds — the by-document read over the by-term layout, same shape as
    * [[significantTerms]] but bounded by ONE shard; dictionary join adds
    * term/df/cf. */
  def termVectors(repo: String, path: String, commit: String,
      field: String = "content"): DataFrame = {
    require(field == "content" || meta.analyzed.contains(field),
      s"'$field' is not an analyzed field of this index " +
        s"(analyzed: ${("content" +: meta.analyzed).mkString(", ")})")
    import spark.implicits._
    val doc = getDoc(repo, path, commit).getOrElse(
      return Seq.empty[(String, Long, Long, Long)].toDF("term", "tf", "df", "cf"))
    val docId = doc.getAs[Long]("docId")
    val shard = docId / meta.docsPerShard
    val did = docId
    val pairs = blocksDf.filter(col("shard") === shard)
      .as[PostingBlock]
      .flatMap { b =>
        val i = java.util.Arrays.binarySearch(b.docIds, did)
        if (i >= 0) Iterator((b.termId, b.tfValues(i))) else Iterator.empty
      }.toDF("termId", "tf")
    val named = pairs.join(termsDf.select("termId", "term", "df", "cf"), Seq("termId"))
    val scoped =
      if (field == "content") named.filter(!col("term").contains(":"))
      else named.filter(col("term").startsWith(s"$field:") && col("term") =!= s"$field:")
        .withColumn("term", expr(s"substring(term, ${field.length + 2})"))
    scoped.select(col("term"), col("tf"), col("df"), col("cf")).orderBy(asc("term"))
  }

  /** ES GET / `_mget` analogue: fetch one document's stored fields by its
    * identity key (repo, path, commit) — ES's `_id` is exactly this
    * identity in the docId mapping (`es.mapping.id`,
    * `luigi_pipeline/lib/hail_tasks.py:263`). Returns the full stored-docs
    * row or None. The predicate is pushed into the columnar docs scan
    * (identity columns are min/max-indexed per Parquet row group), so the
    * lookup reads only matching row groups — the doc-values point-read
    * shape. */
  def getDoc(repo: String, path: String, commit: String): Option[org.apache.spark.sql.Row] =
    docsDf.filter(col("repo") === repo && col("path") === path && col("commit") === commit)
      .limit(1).collect().headOption

  /** ES `function_score` with a `field_value_factor` function over a stored
    * NUMERIC docs column: every match's BM25 score is combined with
    * `fvf = modifier(factor × field)` (missing/null field → `missing`).
    * `modifier` ∈ none | log1p | sqrt | ln1p is applied AFTER the factor,
    * `boostMode` ∈ multiply | sum | max | min | replace | avg combines
    * (score, fvf) — ES defaults: modifier none, boost_mode multiply.
    * Top-k (score desc, docId asc).
    *
    * Plan: exhaustive per-shard scored walk (a doc-dependent multiplier
    * breaks WAND's static upper bounds) → broadcast-free join with the
    * docs relation on docId (field read from the columnar scan) → top-k
    * merge. */
  def functionScore(query: String, field: String, k: Int,
      factor: Double = 1.0, modifier: String = "none",
      boostMode: String = "multiply", missing: Double = 1.0,
      minShouldMatch: Int = 1): DataFrame = {
    require(k > 0, "k must be > 0")
    validateNumericField(field)
    val mods = Set("none", "log1p", "sqrt", "ln1p")
    require(mods.contains(modifier), s"modifier must be one of ${mods.mkString(", ")}")
    val modes = Set("multiply", "sum", "max", "min", "replace", "avg")
    require(modes.contains(boostMode), s"boostMode must be one of ${modes.mkString(", ")}")
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val scored = scoredMatchesDs(pq, minShouldMatch).toDF("docId", "score_bm25")
    val raw = coalesce(col(field).cast("double"), lit(missing)) * factor
    val fvf = modifier match {
      case "none" => raw
      case "log1p" => log10(raw + 1.0) // ES log1p is base-10 log(1+x)
      case "sqrt" => sqrt(raw)
      case "ln1p" => log(raw + 1.0)
    }
    val combined = boostMode match {
      case "multiply" => col("score_bm25") * col("fvf")
      case "sum" => col("score_bm25") + col("fvf")
      case "max" => greatest(col("score_bm25"), col("fvf"))
      case "min" => least(col("score_bm25"), col("fvf"))
      case "replace" => col("fvf")
      case "avg" => (col("score_bm25") + col("fvf")) / 2.0
    }
    docsDf.select(col("docId"), fvf.as("fvf"))
      .join(scored, Seq("docId"))
      .select(col("docId"), combined.as("score"))
      .orderBy(desc("score"), asc("docId")).limit(k)
  }

  /** ES `rescore`: re-rank the top `window` hits of `query` with a second
    * query's scores — `scoreMode` ∈ total | multiply | avg | max | min
    * combines `queryWeight × base` with `rescoreWeight × secondary` (ES
    * semantics: a window doc NOT matching the rescore query keeps
    * `queryWeight × base` alone), then the best k of the window are
    * returned (score desc, docId asc). Docs outside the window are
    * untouched — exactly ES's contract (rescore never promotes a doc the
    * base query ranked below the window).
    *
    * Plan: the base top-window via the ordinary WAND search, then ONE
    * accept-gated per-shard scoring walk of the rescore query restricted
    * to the ≤window base hits; the combine runs on the driver over ≤window
    * rows (k-bounded, the ES coordinating-node shape). */
  def rescore(query: String, rescoreQuery: String, window: Int, k: Int,
      queryWeight: Double = 1.0, rescoreWeight: Double = 1.0,
      scoreMode: String = "total", minShouldMatch: Int = 1): Array[ScoredDoc] = {
    require(window > 0 && k > 0 && k <= window,
      s"need 0 < k <= window (got k=$k window=$window)")
    val modes = Set("total", "multiply", "avg", "max", "min")
    require(modes.contains(scoreMode), s"scoreMode must be one of ${modes.mkString(", ")}")
    val base = search(query, window, minShouldMatch = minShouldMatch)
    if (base.isEmpty) return base
    val rpq = Searcher.parseFull(rescoreQuery, meta.keywords.toSet, contentSpec)
    require(rpq.phrases.isEmpty, "rescore query must be a term query (no phrases)")
    val acceptIds = base.map(_.docId).sorted
    val sec: Map[Long, Double] = {
      val expanded = expandAll(rpq)
      val qTerms = (rpq.terms ++ expanded).distinct
      val stats = lookupTermStats((qTerms ++ rpq.filters).distinct.toSeq)
      val filterIdArr = rpq.filters.flatMap(f => stats.get(f).map(_._1))
      val n = meta.numDocs
      val idfById: Map[Long, Double] = qTerms.flatMap(t =>
        stats.get(t).map { case (tid, df) => tid -> BM25.idf(n, df) * rpq.boostOf(t) }).toMap
      if (idfById.isEmpty || filterIdArr.length < rpq.filters.length) Map.empty
      else {
        val filterIds = filterIdArr.toSet
        val excludeIds: Set[Long] = lookupTerms(rpq.allExcluded.toSeq).map(_._1).toSet
        val params = p
        val avgdl = meta.avgdl
        val termIds = idfById.keySet ++ filterIds ++ excludeIds
        val acc = acceptIds
        blocksDf
          .filter(col("termId").isin(termIds.toSeq.map(Long.box): _*))
          .as[PostingBlock]
          .groupByKey(_.shard)
          .flatMapGroups((_, b) => Wand.scoreAll(b, idfById, filterIds, avgdl, params,
            excludeTermIds = excludeIds, accept = acc))
          .collect().map(sd => sd.docId -> sd.score).toMap
      }
    }
    base.map { h =>
      val b = queryWeight * h.score
      val combined = sec.get(h.docId) match {
        case None => b
        case Some(r0) =>
          val r = rescoreWeight * r0
          scoreMode match {
            case "total" => b + r
            case "multiply" => b * r
            case "avg" => (b + r) / 2.0
            case "max" => math.max(b, r)
            case "min" => math.min(b, r)
          }
      }
      ScoredDoc(h.docId, combined)
    }.sortBy(sd => (-sd.score, sd.docId)).take(k)
  }

  /** ES `date_histogram` (calendar_interval) in query context over a
    * stored DATE/TIMESTAMP docs column: one row (bucket, cnt) per
    * NON-EMPTY calendar bucket of the match set (ES with min_doc_count=1),
    * ascending; null dates skipped. `interval` ∈ year | quarter | month |
    * week | day (Spark `date_trunc` — ISO weeks, like ES). Distributed
    * with partial aggregation; bucket cardinality is calendar-bounded. */
  def dateHistogram(query: String, field: String, interval: String,
      minShouldMatch: Int = 1): DataFrame = {
    val allowed = Set("year", "quarter", "month", "week", "day")
    require(allowed.contains(interval.toLowerCase),
      s"interval must be one of ${allowed.mkString(", ")} (got '$interval')")
    val f = docsDf.schema.fields.find(_.name == field).getOrElse(throw new IllegalArgumentException(
      s"field '$field' is not a stored docs column (have: ${docsDf.columns.mkString(", ")})"))
    require(f.dataType == org.apache.spark.sql.types.DateType ||
      f.dataType == org.apache.spark.sql.types.TimestampType,
      s"field '$field' is not a date/timestamp column (${f.dataType.simpleString})")
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    docsDf.join(matchIdsDs(pq, minShouldMatch).toDF("docId"), Seq("docId"))
      .filter(col(field).isNotNull)
      .groupBy(date_trunc(interval.toLowerCase, col(field)).cast("date").as("bucket"))
      .agg(sqlCount(lit(1)).as("cnt"))
      .orderBy("bucket")
  }

  /** ES `_explain` for the top-k hits of a query: per (hit, contributing
    * term) row with the BM25 pieces — term frequency `tf`, document
    * frequency `df`, `idf`, and the term's `contribution` =
    * boost·idf·tfNorm(tf, dl) — plus the hit's total score. Phrase
    * queries are not supported (their own kernel; explain covers the
    * term/expansion path). Returns (docId, term, tf, df, idf,
    * contribution, score) ordered (score desc, docId asc, term asc).
    *
    * Plan: the ordinary top-k search (the ranking being explained), then
    * ONE termId-filtered block scan re-scoring ONLY the ≤k hit docs
    * (docId set broadcast with the task closure) — per-term pieces never
    * exist for non-hits, and the pieces sum to the hit's score by
    * construction (asserted in tests, bit-exact). */
  def explainHits(query: String, k: Int, minShouldMatch: Int = 1): DataFrame = {
    import spark.implicits._
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    require(pq.phrases.isEmpty, "explainHits does not support phrase queries")
    val hits = search(query, k, minShouldMatch = minShouldMatch)
    def emptyOut = Seq.empty[(Long, String, Long, Long, Double, Double, Double)]
      .toDF("docId", "term", "tf", "df", "idf", "contribution", "score")
    if (hits.isEmpty) return emptyOut
    val hitScore: Map[Long, Double] = hits.map(h => h.docId -> h.score).toMap
    val expanded = expandAll(pq)
    val qTerms = (pq.terms ++ expanded).distinct
    val stats = lookupTermStats(qTerms.toSeq)
    // per-term metadata, driver-small (≤ query width × expansions)
    val n = meta.numDocs
    val termRows = qTerms.flatMap(t => stats.get(t).map { case (tid, df) =>
      (tid, t, df, BM25.idf(n, df), pq.boostOf(t))
    })
    if (termRows.isEmpty) return emptyOut
    val byTid: Map[Long, (String, Long, Double, Double)] =
      termRows.map { case (tid, t, df, idf, b) => tid -> (t, df, idf, b) }.toMap
    val docSet = hitScore.keySet
    val avgdl = meta.avgdl
    val params = p
    blocksDf
      .filter(col("termId").isin(byTid.keySet.toSeq.map(Long.box): _*))
      .as[PostingBlock]
      .flatMap { b =>
        val (t, df, idf, boost) = byTid(b.termId)
        val ids = b.docIds; val tfs = b.tfValues; val dls = b.dlValues
        (0 until ids.length).iterator.collect {
          case i if docSet.contains(ids(i)) =>
            val contrib = boost * idf * BM25.tfNorm(tfs(i), dls(i), avgdl, params)
            (ids(i), t, tfs(i), df, idf, contrib, hitScore(ids(i)))
        }
      }
      .toDF("docId", "term", "tf", "df", "idf", "contribution", "score")
      .orderBy(desc("score"), asc("docId"), asc("term"))
  }

  /** ES term suggester ("did you mean"): for each analyzed token of `text`,
    * candidate dictionary terms within `maxEdits`, ranked the ES way —
    * edit distance asc, then document frequency desc, then term asc — top
    * `topN` per token, the token itself never suggested. `mode` follows
    * ES `suggest_mode`: "missing" (default) suggests only for tokens absent
    * from the dictionary; "always" for every token. Driver-side over the
    * dictionary (warm: map scan; cold: one Spark job), like all dictionary
    * expansions. Returns (token, suggestion, df, distance) per option. */
  def suggest(text: String, topN: Int = 5, maxEdits: Int = 2,
      mode: String = "missing"): Seq[(String, String, Long, Int)] = {
    require(maxEdits >= 1 && maxEdits <= 2, s"maxEdits must be 1 or 2 (got $maxEdits)")
    require(mode == "missing" || mode == "always", s"unknown suggest_mode '$mode'")
    val tokens = ctokens(text).distinct.toSeq
    if (tokens.isEmpty) return Seq.empty
    val present: Set[String] = lookupTermStats(tokens).keySet
    val want = if (mode == "missing") tokens.filterNot(present) else tokens
    if (want.isEmpty) return Seq.empty
    val expansions = expandFuzzyMap(want.map((_, maxEdits)))
    val allCand = expansions.valuesIterator.flatten.toSeq.distinct
    val dfByTerm: Map[String, Long] = lookupTermStats(allCand).map { case (t, (_, df)) => t -> df }
    def dist(a: String, b: String): Int =
      if (a == b) 0 else if (Searcher.editWithin(a, b, 1)) 1 else 2
    want.flatMap { tok =>
      expansions((tok, maxEdits)).toSeq
        .filter(_ != tok)
        .map(c => (tok, c, dfByTerm.getOrElse(c, 0L), dist(tok, c)))
        .sortBy { case (_, c, df, d) => (d, -df, c) }
        .take(topN)
    }
  }

  /** ES completion suggester (search-as-you-type): dictionary terms
    * starting with `prefix`, ranked by the weight convention the reference
    * stack uses when no explicit weights are indexed — document frequency
    * desc, term asc — top `topN` as (term, df) rows. The expansion cap is
    * [[expandPrefixMap]]'s deterministic lexicographic `maxExpansions`
    * (ES caps completion candidates per shard the same way); warm = one
    * driver map scan, cold = one Spark dictionary job. */
  def suggestCompletion(prefix: String, topN: Int = 5,
      maxExpansions: Int = 10000): Seq[(String, Long)] = {
    require(prefix.nonEmpty, "completion prefix must be non-empty")
    val stem = ctokens(prefix) match {
      case Array(one) => one
      case _ => throw new IllegalArgumentException(
        s"completion prefix must analyze to exactly one term (got '$prefix')")
    }
    val cands = expandPrefixMap(Seq(stem), maxExpansions)(stem)
    lookupTermStats(cands.toSeq).toSeq
      .map { case (t, (_, df)) => (t, df) }
      .sortBy { case (t, df) => (-df, t) }
      .take(topN)
  }

  /** ES `highlight` (plain-highlighter semantics): one snippet per top-k
    * hit — a window of `window` analyzed tokens each side of the FIRST
    * occurrence of any scored query term (minimal token position; phrase
    * tokens and expanded prefix/fuzzy terms count), every matched token in
    * the fragment wrapped `<em>…</em>`. The index stores no content (by
    * design — it never duplicates the corpus), so like the ES plain
    * highlighter working off `_source`, snippets come from `source` — the
    * original corpus table, identity-joined against the ≤k hits (broadcast;
    * k-bounded re-analysis, no positions requirement, pure Column builtins,
    * codegen'd, no UDF). Docs whose field holds no highlight term
    * (keyword-filter-only matches) get a null snippet, the ES "no
    * fragment" case. Returns (docId, score, snippet) in rank order. */
  def highlight(query: String, k: Int, source: DataFrame, window: Int = 3,
      field: String = "content", minShouldMatch: Int = 1): DataFrame = {
    require(window >= 0, s"window must be >= 0 (got $window)")
    val f = source.schema.fields.find(_.name == field).getOrElse(throw new IllegalArgumentException(
      s"highlight field '$field' is not a source column (have: ${source.columns.mkString(", ")})"))
    require(f.dataType == org.apache.spark.sql.types.StringType,
      s"highlight field '$field' is not a string column (${f.dataType.simpleString})")
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val expanded = expandAll(pq)
    val hlTerms = (pq.terms ++ expanded ++ pq.phrases.flatten).distinct
    require(hlTerms.nonEmpty, "highlight needs at least one scored term or phrase")
    val hits = search(query, k, minShouldMatch = minShouldMatch)
    if (hits.isEmpty)
      return Seq.empty[(Long, Double, String)].toDF("docId", "score", "snippet")
    // ≤k hit identities resolved from the docs relation, then broadcast
    // into the source scan — the source side streams, never shuffles
    val hitsDf = hits.toSeq.map(h => (h.docId, h.score)).toDF("docId", "score")
    val idents = docsDf.select("docId", "repo", "path", "commit")
      .join(broadcast(hitsDf), Seq("docId"))
    val snippet = Searcher.snippetCol(col(field), hlTerms.toSeq, window)
    source.select(Seq("repo", "path", "commit", field).distinct.map(col): _*)
      .join(broadcast(idents), Seq("repo", "path", "commit"))
      .select(col("docId"), col("score"), snippet.as("snippet"))
      .orderBy(desc("score"), asc("docId"))
  }

  /** ES `more_like_this` (`like:` free text): select the text's most
    * characteristic terms against THIS index's statistics — per-term
    * `tf(text) · idf(index)`, gated by ES's `min_term_freq` /
    * `min_doc_freq` knobs, top `maxQueryTerms` by (score desc, term asc) —
    * and run them as an ordinary disjunctive BM25 query. `excludeDocIds`
    * drops given docs from the result (ES `include: false` — the source
    * document itself, when the text came from the index): candidates only,
    * statistics untouched. The like-text analysis and term selection are
    * driver-side (one text); the search is the normal distributed path. */
  def moreLikeThis(likeText: String, k: Int, maxQueryTerms: Int = 25,
      minTermFreq: Int = 2, minDocFreq: Int = 5,
      excludeDocIds: Set[Long] = Set.empty): Array[ScoredDoc] = {
    require(maxQueryTerms > 0 && minTermFreq >= 1 && minDocFreq >= 1,
      "maxQueryTerms must be > 0; minTermFreq and minDocFreq must be >= 1")
    val tf: Map[String, Int] = ctokens(likeText)
      .groupBy(identity).map { case (t, xs) => t -> xs.length }
    val cand = tf.collect { case (t, f) if f >= minTermFreq => t }.toSeq.sorted
    val stats = lookupTermStats(cand)
    val n = meta.numDocs
    val sel = cand
      .flatMap(t => stats.get(t).collect {
        case (_, df) if df >= minDocFreq => (t, tf(t).toDouble * BM25.idf(n, df))
      })
      .sortBy { case (t, s) => (-s, t) }
      .take(maxQueryTerms)
      .map(_._1)
    if (sel.isEmpty) return Array.empty
    search(sel.mkString(" "), k + excludeDocIds.size)
      .filter(h => !excludeDocIds.contains(h.docId))
      .take(k)
  }

  /** ES `significant_terms` aggregation in query context: content terms
    * whose document frequency in the match set (foreground) is anomalously
    * high against the whole index (background), scored with ES's JLH:
    * `(fgRate − bgRate) · fgRate / bgRate`, keeping only fgRate > bgRate.
    * Keyword filter terms (`field:value` — ':' never survives the content
    * tokenizer) are excluded; `minDocCount` is the ES noise floor.
    *
    * Plan: the one place the engine reads postings BY DOCUMENT rather than
    * by term, and the postings relation is the columnar source for exactly
    * that — decode (termId, docId) pairs from a 3-column pruned scan of the
    * blocks relation, join to the match set BEFORE any shuffle (AQE
    * broadcasts it when small), partial-aggregated count per termId (the
    * per-task emission is bounded by each task's posting bytes, never
    * materializing the full pair set), then one dictionary-sized join for
    * term/df. Returns ≤ topN (term, fg, bg, score) by (score desc, term). */
  def significantTerms(query: String, topN: Int, minDocCount: Int = 3,
      minShouldMatch: Int = 1): DataFrame = {
    require(topN > 0 && minDocCount >= 1, "topN must be > 0 and minDocCount >= 1")
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val matched = matchIdsDs(pq, minShouldMatch).toDF("docId")
    val fgTotal = matched.count().toDouble
    if (fgTotal == 0)
      return Seq.empty[(String, Long, Long, Double)].toDF("term", "fg", "bg", "score")
    val n = meta.numDocs.toDouble
    val pairs = blocksDf.select(col("termId"), col("n"), col("docs"))
      .as[(Long, Int, Array[Byte])]
      .flatMap { case (tid, cnt, docs) =>
        graft.index.Codec.decodeDeltas(docs, cnt).map(d => (tid, d))
      }
      .toDF("termId", "docId")
    val fg = pairs.join(matched, Seq("docId"))
      .groupBy("termId").agg(sqlCount(lit(1)).as("fg"))
    val fgRate = col("fg") / fgTotal
    val bgRate = col("df") / n
    fg.join(termsDf.select("term", "termId", "df"), Seq("termId"))
      .filter(!col("term").contains(":") && col("fg") >= minDocCount && fgRate > bgRate)
      .select(col("term"), col("fg"), col("df").as("bg"),
        ((fgRate - bgRate) * fgRate / bgRate).as("score"))
      .orderBy(desc("score"), asc("term"))
      .limit(topN)
  }

  /** ES `_mget`: stored fields for a batch of identity keys in ONE
    * column-pruned scan of the docs relation (vs one point read per id —
    * [[getDoc]]). The requested keys are the broadcast side; the docs table
    * is the 10^12-row side. Keys absent from the index are simply absent
    * from the result (ES `found: false`). */
  def mget(keys: Seq[(String, String, String)]): DataFrame = {
    require(keys.nonEmpty, "mget needs at least one identity key")
    docsDf.join(broadcast(keys.toDF("repo", "path", "commit")),
      Seq("repo", "path", "commit"))
  }

  /** ES `filters` aggregation: one named bucket per (name, query) pair,
    * each counting ITS query's full match set (full bool semantics per
    * filter, including filter-only / match_all / must_not shapes). The
    * per-filter match plans run as ONE tagged union — one Spark action for
    * the whole aggregation — and empty buckets are present at count 0 (the
    * ES contract: every named filter always appears). Returns (bucket, cnt)
    * ordered by bucket name asc. */
  def filtersAgg(filters: Seq[(String, String)]): DataFrame = {
    require(filters.nonEmpty, "filters aggregation needs at least one named filter")
    require(filters.map(_._1).distinct.length == filters.length,
      "filters aggregation bucket names must be unique")
    val tagged = filters.map { case (name, q) =>
      matchIdsDs(Searcher.parseFull(q, meta.keywords.toSet, contentSpec))
        .toDF("docId").select(lit(name).as("bucket"))
    }.reduce(_ unionByName _)
    val names = filters.map(_._1).toDF("bucket")
    names
      .join(tagged.groupBy("bucket").agg(sqlCount(lit(1)).as("cnt")), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy(asc("bucket"))
  }

  /** ES `composite` aggregation (single terms source): deterministic
    * key-ordered bucket pages over the match set — page N+1 resumes from
    * `afterKey` (exclusive), so paging through ALL buckets of an unbounded-
    * cardinality field costs one bounded pass per page (the agg-side
    * `search_after`; ES built composite precisely because deep terms-agg
    * paging doesn't scale). Returns ≤size (key, cnt) rows ordered key asc;
    * docs missing the field are skipped (ES agg rule). */
  def compositeAgg(query: String, field: String, size: Int,
      afterKey: Option[String] = None, minShouldMatch: Int = 1): DataFrame = {
    require(size > 0, s"composite size must be > 0 (got $size)")
    require(docsDf.columns.contains(field),
      s"field '$field' is not a stored docs column (have: ${docsDf.columns.mkString(", ")})")
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    docsDf.join(matchIdsDs(pq, minShouldMatch).toDF("docId"), Seq("docId"))
      .filter(col(field).isNotNull)
      .groupBy(col(field).cast("string").as("key"))
      .agg(sqlCount(lit(1)).as("cnt"))
      .filter(afterKey.map(a => col("key") > lit(a)).getOrElse(lit(true)))
      .orderBy(asc("key"))
      .limit(size)
  }

  /** Orderable stored-column check for field sorts (ES sorts on any
    * doc_values field: numeric, keyword, date or boolean). */
  private def validateOrderableField(name: String): Unit = {
    import org.apache.spark.sql.types._
    val f = docsDf.schema.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(
        s"field '$name' is not a stored docs column (have: ${docsDf.columns.mkString(", ")})"))
    require(f.dataType.isInstanceOf[NumericType] || f.dataType == StringType ||
      f.dataType == DateType || f.dataType == TimestampType || f.dataType == BooleanType,
      s"field '$name' is not sortable (${f.dataType.simpleString})")
  }

  /** ES multi-field sort (`sort: [{f1: desc}, {f2: asc}]`): the match set
    * ordered by a sequence of stored doc_values columns — numeric, keyword
    * (string), date or boolean — missing values last (ES `missing: _last`),
    * final tie-break docId asc. `sorts` maps field → ascending?. No scoring
    * work at all (match-only kernels); Spark's TakeOrderedAndProject merges
    * per-partition top-k. Returns ≤k rows (docId, sort fields…). */
  def searchSortedByFields(query: String, sorts: Seq[(String, Boolean)], k: Int,
      minShouldMatch: Int = 1): DataFrame = {
    require(sorts.nonEmpty, "need at least one sort field")
    require(sorts.map(_._1).distinct.length == sorts.length, "duplicate sort field")
    sorts.foreach { case (f, _) => validateOrderableField(f) }
    val pq = Searcher.parseFull(query, meta.keywords.toSet, contentSpec)
    val ord = sorts.map { case (f, up) =>
      if (up) col(f).asc_nulls_last else col(f).desc_nulls_last
    } :+ col("docId").asc
    docsDf.join(matchIdsDs(pq, minShouldMatch).toDF("docId"), Seq("docId"))
      .select(col("docId") +: sorts.map(s => col(s._1)): _*)
      .orderBy(ord: _*)
      .limit(k)
  }

  /** ES `_stats` (index-level statistics), MEASURED from the index
    * relations — one aggregation pass each over docs and terms — and
    * cross-checked against the build-time meta counts, so a served index
    * whose relations drifted from the published `meta.json` fails loudly
    * instead of silently mis-scoring (df/N/avgdl all feed BM25). One row:
    * (num_docs, num_terms, num_postings, sum_dl, avg_dl). */
  /** ES `_cat/shards` analogue: per-SHARD statistics measured from the
    * index relations — documents, content-token total, postings, and
    * encoded block count per shard. The block count is a PACKING
    * invariant (⌈postings/blockSize⌉ per (term, shard)) the DuckDB oracle
    * recomputes from the raw corpus, so this row is a standing gate on
    * the pack stage's on-disk layout, the same way [[indexStats]] gates
    * the dictionary. One partial-aggregated pass per relation. */
  def shardStats(): DataFrame = {
    val d = docsDf
      .groupBy(expr(s"docId div ${meta.docsPerShard}").as("shard"))
      .agg(sqlCount(lit(1)).as("num_docs"), sum("dl").as("sum_dl"))
    val b = blocksDf
      .groupBy(col("shard"))
      .agg(sum(col("n")).as("num_postings"), sqlCount(lit(1)).as("num_blocks"))
    d.join(b, Seq("shard"))
      .select(col("shard"), col("num_docs"), col("num_postings"),
        col("num_blocks"), col("sum_dl"))
      .orderBy(asc("shard"))
  }

  /** ES `_field_caps`: one row per queryable field with its mapped type
    * and capabilities — what Kibana-style clients introspect before
    * building queries. Derived from the index meta + the stored docs
    * schema (no data scan): `text` fields are searchable (scored),
    * `keyword` searchable + aggregatable, `nested` searchable (nested
    * query path), `dense_vector` knn-searchable, numeric stored columns
    * aggregatable (range filters / stats aggs), other stored columns
    * retrievable only. Internal columns (docId, sha256, dl, `_ivf_*`) are
    * not exposed. */
  def fieldCaps(): DataFrame = {
    import org.apache.spark.sql.types._
    val internal = Set("docId", "sha256", "dl") ++ meta.denseVectors.map(f => s"_ivf_$f")
    val rows = docsDf.schema.fields.toSeq
      .filterNot(f => internal.contains(f.name))
      .map { f =>
        val (tpe, searchable, aggregatable) =
          if (f.name == "content") ("text", true, false)
          else if (meta.analyzed.contains(f.name)) ("text", true, false)
          else if (meta.keywords.contains(f.name)) ("keyword", true, true)
          else if (meta.nested.contains(f.name)) ("nested", true, true)
          else if (meta.denseVectors.contains(f.name)) ("dense_vector", true, false)
          else f.dataType match {
            case _: NumericType => (f.dataType.simpleString, false, true)
            case _ => (f.dataType.simpleString, false, false)
          }
        (f.name, tpe, searchable, aggregatable)
      } :+ (("content", "text", true, false))
    rows.distinct.sortBy(_._1)
      .toDF("field", "type", "searchable", "aggregatable")
  }

  def indexStats(): DataFrame = {
    val d = docsDf.agg(sqlCount(lit(1)).as("n"), sum("dl").as("s")).head()
    val (nDocs, sumDl) = (d.getLong(0), d.getLong(1))
    val t = termsDf.agg(sqlCount(lit(1)).as("n"), sum("df").as("p")).head()
    val (nTerms, nPostings) = (t.getLong(0), t.getLong(1))
    require(nDocs == meta.numDocs && sumDl == meta.sumDl && nTerms == meta.numTerms &&
      nPostings == meta.numPostings,
      s"index stats drift: measured (docs=$nDocs, sumDl=$sumDl, terms=$nTerms, " +
        s"postings=$nPostings) vs meta (${meta.numDocs}, ${meta.sumDl}, " +
        s"${meta.numTerms}, ${meta.numPostings})")
    Seq((nDocs, nTerms, nPostings, sumDl, sumDl.toDouble / nDocs))
      .toDF("num_docs", "num_terms", "num_postings", "sum_dl", "avg_dl")
  }

  /** The ingest quarantine's reject channel ([[graft.index.IndexConfig
    * .quarantine]]): (repo, path, commit, lang, reason) of every row the
    * build diverted — the es-hadoop error-handler output a reprocessing
    * pipeline consumes. Empty when nothing was rejected (or quarantine was
    * off); `meta.rejectedDocs` carries the count either way. */
  def rejected(): DataFrame =
    if (meta.rejectedDocs == 0L)
      Seq.empty[(String, String, String, String, String)]
        .toDF("repo", "path", "commit", "lang", "reason")
    else io.read(spark, s"$indexDir/rejected")
}

object Searcher {
  /** The highlight fragment as a Column over a raw text column: window of
    * `window` analyzed tokens each side of the first occurrence of any
    * `hlTerms` member, matches wrapped `<em>…</em>`, null when none occurs.
    * Shared by [[Searcher.highlight]] and [[MultiSearcher.highlight]]. */
  private[search] def snippetCol(text: Column, hlTerms: Seq[String], window: Int): Column = {
    val SENT = Int.MaxValue.toLong
    val toks = Analyzer.analyze(text)
    // 1-based position of the first highlight-term occurrence (sentinel: none)
    val firstPos = least(
      hlTerms.map(t => coalesce(nullif(array_position(toks, lit(t)), lit(0L)), lit(SENT))) :+
        lit(SENT): _*)
    val start = greatest(lit(1L), firstPos - window)
    val len = firstPos + window - start + 1
    val termArr = array(hlTerms.map(lit(_)): _*)
    val frag = transform(slice(toks, start.cast("int"), len.cast("int")),
      t => when(array_contains(termArr, t), concat(lit("<em>"), t, lit("</em>"))).otherwise(t))
    when(firstPos === SENT, lit(null)).otherwise(array_join(frag, " "))
  }

  /** One query's compiled form inside [[Searcher.searchMany]]'s executors.
    * `idfById` holds the scored loose terms; a phrase query additionally
    * carries its ordered per-phrase termId sequences and their (required)
    * idf map — `phraseIdSeqs.isEmpty` selects the WAND kernel, otherwise
    * the conjunctive phrase kernel with `idfById` as optional extras. */
  private[search] final case class Plan(
      qIdx: Int,
      idfById: Map[Long, Double],
      filterIds: Set[Long],
      k: Int,
      phraseIdSeqs: Seq[Seq[Long]] = Nil,
      phraseIdfById: Map[Long, Double] = Map.empty,
      excludeIds: Set[Long] = Set.empty,
      ranges: Seq[RangeFilter] = Nil,
      /** per-phrase slop, parallel to [[phraseIdSeqs]] (empty = all 0) */
      phraseSlops: Seq[Int] = Nil) {
    def allTermIds: Iterable[Long] =
      idfById.keys ++ phraseIdfById.keys ++ filterIds ++ excludeIds
    def wantsBlock(termId: Long): Boolean =
      idfById.contains(termId) || phraseIdfById.contains(termId) ||
        filterIds.contains(termId) || excludeIds.contains(termId)
  }

  /** Split a raw query into (content terms, keyword filter terms). Filter
    * syntax mirrors the reference query set's lang-tagged field match
    * (`lang:scala foo` — FIXTURES.md §2): a whitespace token `field:value`
    * whose prefix is a configured keyword field is a non-scored required
    * filter (ES `keyword` semantics); everything else is analyzed content.
    * The keyword field set comes from the index meta (schema-derived at
    * build — [[graft.index.FieldConfig]]). */
  def parseQuery(
      query: String,
      keywordFields: Set[String] = Set("lang", "repo"),
      cspec: graft.analysis.AnalyzerSpec = graft.analysis.AnalyzerSpec.Code)
      : (Array[String], Array[String]) = {
    val parts = query.trim.split("\\s+").filter(_.nonEmpty)
    val (filters, content) = parts.partition { t =>
      val i = t.indexOf(':')
      i > 0 && keywordFields.contains(t.substring(0, i))
    }
    (graft.analysis.AnalyzerSpec.queryTokens(cspec, content.mkString(" ")).distinct.sorted,
      filters.distinct.sorted)
  }

  /** A query parsed into loose terms, keyword filters, exact phrases
    * (each phrase = the analyzer's ORDERED token sequence for the quoted
    * span — order and duplicates preserved, unlike loose terms), excluded
    * terms (`-token`, ES `must_not` match semantics: a document containing
    * ANY of a token's analyzed terms is rejected; stats/idf stay
    * index-wide), and prefix patterns (`stem*`, ES `prefix` query with the
    * `scoring_boolean` rewrite: each dictionary term matching the stem
    * becomes an ordinary scored term with its own idf). */
  final case class ParsedQuery(
      terms: Array[String], filters: Array[String], phrases: Array[Array[String]],
      excluded: Array[String] = Array.empty, prefixes: Array[String] = Array.empty,
      /** negated keyword filters (`-lang:scala`, ES must_not term filter):
        * the literal `field:value` filter terms whose documents are
        * rejected — looked up in the dictionary exactly like positive
        * filters, driven as anti-cursors exactly like excluded terms. */
      excludedFilters: Array[String] = Array.empty,
      /** per-term boosts (`term^2.5`, the ES query-time boost): the boosted
        * token's analyzed terms each score `boost × idf × tfNorm`. Keys are
        * ANALYZED terms; stats (df/idf base) stay untouched — a boost
        * scales a term's contribution, never global statistics. */
      boosts: Map[String, Double] = Map.empty,
      /** fuzzy patterns (`token~1` / `token~2`, ES `fuzzy` query with the
        * scoring_boolean rewrite): (stem, maxEdits) pairs expanded against
        * the dictionary by Levenshtein distance; each match becomes an
        * ordinary scored term with its own idf. */
      fuzzies: Array[(String, Int)] = Array.empty,
      /** numeric range filters (`field:>=N` / `field:<N` / `field:lo..hi`,
        * the ES `range` query in FILTER context over doc-values columns —
        * the reference exports `xpos` as an int64 precisely for this:
        * `hail_scripts/computed_fields/variant_id.py:86-91`). Candidates
        * only; never stats. Negated (`-field:>=N`) = ES must_not range. */
      ranges: Array[RangeFilter] = Array.empty,
      /** wildcard patterns (`s*am`, `qu?ry` — ES `wildcard` query with the
        * scoring_boolean rewrite): `*` any run, `?` one char, matched
        * against whole dictionary terms; each match an ordinary scored
        * term with its own idf. Lowercased (dictionary terms are). */
      wildcards: Array[String] = Array.empty,
      /** regexp patterns (`/s(ort|can)/` — ES `regexp` query with the
        * scoring_boolean rewrite): anchored full-term match, each matching
        * dictionary term an ordinary scored term with its own idf. */
      regexps: Array[String] = Array.empty,
      /** per-phrase slop (`"a b"~2` — ES `match_phrase` slop restricted to
        * IN-ORDER spans, Lucene `span_near(in_order=true)`): phrase i
        * matches a document iff its token stream has strictly increasing
        * indices i₁<…<i_m hitting the phrase terms in order with total
        * span `(i_m - i₁) - (m-1) ≤ slop`. Empty/short = slop 0 (exact
        * adjacency) — the default shape is unchanged. Parallel to
        * [[phrases]]. */
      phraseSlops: Array[Int] = Array.empty,
      /** RAW plain scored tokens (whitespace tokens that became [[terms]]),
        * BEFORE analysis — per-field query paths (multi_match over a field
        * with a non-code analyzer) re-analyze these with that field's
        * index-time spec. */
      rawPlain: Array[String] = Array.empty) {
    /** slop of phrase i (0 when unspecified) — [[phraseSlops]] padded */
    def slopOf(i: Int): Int = if (i < phraseSlops.length) phraseSlops(i) else 0
    /** [[phraseSlops]] padded to one entry per phrase */
    def slops: Array[Int] = Array.tabulate(phrases.length)(slopOf)
    /** every dictionary lookup the exclusion side needs */
    def allExcluded: Array[String] = excluded ++ excludedFilters
    /** true iff the query has any SHOULD-type (scored) clause — literal
      * terms, prefix patterns or fuzzy stems. A query with such clauses but
      * no dictionary match matches nothing (minimum_should_match ≥ 1); a
      * query with NONE is pure filter context (constant-score). */
    def hasScoringClauses: Boolean =
      terms.nonEmpty || prefixes.nonEmpty || fuzzies.nonEmpty ||
        wildcards.nonEmpty || regexps.nonEmpty
    /** boost for an analyzed term (1.0 unless the query marked it `term^w`;
      * multiplying by 1.0 is bit-exact, so unboosted paths are unchanged) */
    def boostOf(t: String): Double = boosts.getOrElse(t, 1.0)
  }

  /** One parsed numeric range filter over a stored docs column (ES `range`
    * filter over doc_values). Bounds are doubles (absent side = ±Inf);
    * `pred` is the shared Catalyst predicate — used verbatim by the
    * engine's docs-relation accept scan AND the oracle's corpus gate, so
    * the two cannot diverge. A missing (null) field value never matches the
    * range; under negation it therefore PASSES (ES must_not semantics: a
    * doc without the field is not in the must_not set). */
  final case class RangeFilter(
      field: String,
      lo: Double, loInc: Boolean,
      hi: Double, hiInc: Boolean,
      negated: Boolean = false,
      /** ES `exists` query (`exists:field` token): matches documents whose
        * stored column is non-null — any column type, no bounds. Negated
        * (`-exists:field`) = ES must_not exists ≡ the classic `missing`
        * filter: matches documents WITHOUT the field. */
      existsOnly: Boolean = false) {
    def pred: org.apache.spark.sql.Column = {
      if (existsOnly) {
        return if (negated) col(field).isNull else col(field).isNotNull
      }
      val c = col(field).cast("double")
      val lp =
        if (lo.isNegInfinity) lit(true) else if (loInc) c >= lit(lo) else c > lit(lo)
      val hp =
        if (hi.isPosInfinity) lit(true) else if (hiInc) c <= lit(hi) else c < lit(hi)
      val in = coalesce(lp && hp, lit(false))
      if (negated) !in else in
    }
  }

  /** `field:>=N` / `field:>N` / `field:<=N` / `field:<N` / `field:lo..hi`
    * range-filter token shape (values numeric; `..` bounds inclusive). */
  private val RangePattern =
    ("^([A-Za-z_][A-Za-z0-9_]*):(?:(>=|<=|>|<)(-?\\d+(?:\\.\\d+)?)" +
      "|(-?\\d+(?:\\.\\d+)?)\\.\\.(-?\\d+(?:\\.\\d+)?))$").r

  /** `exists:field` token shape (the ES `exists` query). */
  private val ExistsPattern = "^exists:([A-Za-z_][A-Za-z0-9_]*)$".r

  /** Parse one token as a range filter, if it has the range shape. */
  def parseRange(tok: String, negated: Boolean): Option[RangeFilter] = tok match {
    case ExistsPattern(f) =>
      Some(RangeFilter(f, Double.NegativeInfinity, loInc = true,
        Double.PositiveInfinity, hiInc = true, negated, existsOnly = true))
    case RangePattern(f, op, v, lo, hi) =>
      if (op != null) {
        val d = v.toDouble
        op match {
          case ">=" => Some(RangeFilter(f, d, loInc = true, Double.PositiveInfinity, hiInc = true, negated))
          case ">" => Some(RangeFilter(f, d, loInc = false, Double.PositiveInfinity, hiInc = true, negated))
          case "<=" => Some(RangeFilter(f, Double.NegativeInfinity, loInc = true, d, hiInc = true, negated))
          case _ => Some(RangeFilter(f, Double.NegativeInfinity, loInc = true, d, hiInc = false, negated))
        }
      } else Some(RangeFilter(f, lo.toDouble, loInc = true, hi.toDouble, hiInc = true, negated))
    case _ => None
  }

  /** `"quoted span"` extractor with optional `~N` slop suffix
    * (`"a b"~2`), shared with the oracle. */
  val PhrasePattern: scala.util.matching.Regex = "\"([^\"]*)\"(?:~(\\d+))?".r

  /** `token~N` fuzzy pattern (N ∈ 1..2, the ES edit-distance bound). */
  private val FuzzyPattern = "^(.+)~([12])$".r

  /** `token^W` boost suffix (W a positive decimal). */
  private val BoostPattern = "^(.+)\\^(\\d+(?:\\.\\d+)?)$".r

  /** [[parseQuery]] plus `"quoted phrase"`, `-negated`, `prefix*`,
    * `fuzzy~N` and `term^boost` extraction. A `-token` excludes every
    * analyzed term of the token; a `stem*` token is a prefix pattern and a
    * `stem~N` token a fuzzy pattern when the stem analyzes to exactly one
    * term (otherwise the operator suffix is dropped and the token is
    * ordinary content — a multi-subtoken stem like `camelCase*` has no
    * single dictionary pattern to scan); a `tok^2.5` token is ordinary
    * scored content whose analyzed terms each carry the boost. Phrase spans
    * are extracted first, so `-`, `*`, `~`, `^` inside quotes are never
    * operators. */
  def parseFull(query: String, keywordFields: Set[String],
      cspec: graft.analysis.AnalyzerSpec = graft.analysis.AnalyzerSpec.Code): ParsedQuery = {
    // content-field analysis under the index's configured content analyzer
    def ctok(text: String): Array[String] =
      graft.analysis.AnalyzerSpec.queryTokens(cspec, text)
    val phrasePairs = PhrasePattern.findAllMatchIn(query)
      .map(m => (ctok(m.group(1)),
        Option(m.group(2)).map(_.toInt).getOrElse(0)))
      .filter(_._1.nonEmpty).toArray
    val phrases = phrasePairs.map(_._1)
    val rest = PhrasePattern.replaceAllIn(query, " ")
    val parts = rest.trim.split("\\s+").filter(_.nonEmpty)
    val (negParts0, rest1) = parts.partition(t => t.length > 1 && t.startsWith("-"))
    // range-shaped tokens (both polarities) before any other operator: the
    // `field:OP num` shape is unambiguous and must not fall through to the
    // content analyzer
    val (rangeParts, rest2a) = rest1.partition(t => parseRange(t, negated = false).isDefined)
    val (negRangeParts, negParts) =
      negParts0.partition(t => parseRange(t.drop(1), negated = true).isDefined)
    // `/regex/` tokens before any other operator: regex metachars (`~`,
    // `^`, `*`) inside the slashes are never operators
    val (regexpParts, rest2) = rest2a.partition(t =>
      t.length > 2 && t.startsWith("/") && t.endsWith("/"))
    val (fuzzyParts, rest3) = rest2.partition {
      case FuzzyPattern(stem, _) => ctok(stem).length == 1
      case _ => false
    }
    val (prefParts, rest4a) = rest3.partition { t =>
      t.length > 1 && t.endsWith("*") &&
        ctok(t.dropRight(1)).length == 1
    }
    // wildcard tokens: `*`/`?` anywhere in a plain-char token (the pure
    // trailing-star shape was already taken by the cheaper prefix path)
    val (wildParts, rest4) = rest4a.partition { t =>
      t.matches("[A-Za-z0-9_*?]+") &&
        t.exists(c => c == '*' || c == '?') && t.exists(c => c != '*' && c != '?')
    }
    val (boostParts, plain) = rest4.partition {
      case BoostPattern(stem, _) => ctok(stem).nonEmpty
      case _ => false
    }
    // a negated token that is itself a keyword filter (`-lang:scala`) is a
    // must_not TERM FILTER, not a negated content match
    val (negFilters, negContent) = negParts.map(_.drop(1)).partition { t =>
      val i = t.indexOf(':')
      i > 0 && keywordFields.contains(t.substring(0, i))
    }
    val excluded = ctok(negContent.mkString(" ")).distinct.sorted
    val prefixes = prefParts.map(t => ctok(t.dropRight(1)).head).distinct
    val fuzzies = fuzzyParts.collect {
      case FuzzyPattern(stem, nStr) => (ctok(stem).head, nStr.toInt)
    }.distinct
    // boosted tokens are scored content; each analyzed term carries the
    // boost (last occurrence wins on a repeated term)
    val boosts: Map[String, Double] = boostParts.collect {
      case BoostPattern(stem, w) => ctok(stem).distinct.sorted.map(_ -> w.toDouble)
    }.flatten.toMap
    val (terms, filters) = parseQuery(plain.mkString(" "), keywordFields, cspec)
    val ranges = (rangeParts.flatMap(parseRange(_, negated = false)) ++
      negRangeParts.flatMap(t => parseRange(t.drop(1), negated = true))).distinct
    ParsedQuery((terms ++ boosts.keys).distinct, filters, phrases, excluded, prefixes,
      negFilters.distinct.sorted, boosts, fuzzies, ranges,
      wildcards = wildParts.map(_.toLowerCase).distinct,
      regexps = regexpParts.map(t => t.substring(1, t.length - 1)).distinct,
      phraseSlops = phrasePairs.map(_._2),
      rawPlain = plain.filter { t =>
        val i = t.indexOf(':')
        !(i > 0 && keywordFields.contains(t.substring(0, i)))
      })
  }

  /** ES query-time synonyms (`synonym_graph` in the search analyzer,
    * expand=true): rewrite a query so every PLAIN content token with an
    * entry in `synonyms` also contributes its synonyms as additional
    * scored should-terms (each with its own idf — the scoring_boolean
    * shape, the same rewrite ES applies to multi-token synonyms). Quoted
    * phrases, `field:value` filters, negations, ranges and pattern tokens
    * (`*`, `?`, `~`, `^`, `/re/`) pass through untouched — synonyms apply
    * to plain analyzed terms only. Keys are matched on the lowercased
    * token. Deterministic: appended in map-then-list order. */
  def expandSynonyms(query: String, synonyms: Map[String, Seq[String]]): String = {
    if (synonyms.isEmpty) return query
    val phraseSpans = PhrasePattern.findAllIn(query).toSeq
    val rest = PhrasePattern.replaceAllIn(query, " ")
    val toks = rest.trim.split("\\s+").filter(_.nonEmpty).toSeq
    def isPlain(t: String): Boolean =
      !t.startsWith("-") && !t.contains(":") && !t.contains("/") &&
        !t.exists(c => c == '*' || c == '?' || c == '~' || c == '^')
    val extra = toks.filter(isPlain)
      .flatMap(t => synonyms.getOrElse(t.toLowerCase, Nil))
      .distinct
      .filterNot(s => toks.exists(_.equalsIgnoreCase(s)))
    (phraseSpans ++ toks ++ extra).mkString(" ")
  }

  // ---- sorted-dictionary range tier (the FST-lite prefix index) ----------
  // Dictionary terms are stored (and collected) in sorted order, so any
  // pattern with a LITERAL PREFIX expands over the [prefix, prefix+\uffff]
  // range instead of the whole dictionary: warm = binary search into the
  // sorted term array; cold = a range predicate pushed into the columnar
  // terms scan (termIds are dense in term sort order, so the relation's
  // row groups are term ranges and parquet min/max stats prune them).
  // Fuzzy (edits can rewrite the first character) and prefix-less patterns
  // keep the documented full-scan fallback.

  /** Upper bound of the prefix range: every string starting with `pf`
    * compares ≤ this (dictionary terms never contain \uffff). */
  def prefixRangeUpper(pf: String): String = pf + '\uffff'

  /** Leading literal chars of an anchored term regex — the run of plain
    * word characters before the first metacharacter (conservative: any
    * non-[A-Za-z0-9_] stops the scan). globToRegex output keeps literal
    * prefixes literal, so this serves wildcards and regexps alike.
    *
    * Two constructs void the "leading literals are mandatory" assumption
    * and must NOT narrow the dictionary range (a dropped term = a wrong
    * result, the range tier is an optimization only):
    *   - top-level alternation: /sort|scan/ matches "scan", which shares
    *     no prefix with the left branch → full-scan fallback ("");
    *   - a quantifier directly after the run makes its LAST char optional
    *     (ab?c, ab* and ab{0,2}c all match inputs without the 'b') →
    *     drop that char from the mandatory prefix. */
  def literalPrefixOfRegex(r: String): String = {
    // Scan for an unescaped '|' at paren depth 0 outside a char class.
    var i = 0; var depth = 0; var inClass = false
    while (i < r.length) {
      r.charAt(i) match {
        case '\\'                          => i += 1 // skip escaped char
        case '[' if !inClass               => inClass = true
        case ']' if inClass                => inClass = false
        case '(' if !inClass               => depth += 1
        case ')' if !inClass && depth > 0  => depth -= 1
        case '|' if !inClass && depth == 0 => return ""
        case _                             =>
      }
      i += 1
    }
    val run = r.takeWhile(c => c.isLetterOrDigit || c == '_')
    if (run.nonEmpty && run.length < r.length &&
        "?*{".indexOf(r.charAt(run.length)) >= 0) run.dropRight(1)
    else run
  }

  /** One range predicate per prefixed pattern, for the cold terms scan.
    * None when some pattern has no literal prefix (full scan fallback —
    * a single prefix-less pattern already needs the whole dictionary). */
  def rangePredOf(prefixes: Seq[String]): Option[org.apache.spark.sql.Column] =
    if (prefixes.isEmpty || prefixes.exists(_.isEmpty)) None
    else Some(prefixes.map(pf =>
      col("term") >= lit(pf) && col("term") <= lit(prefixRangeUpper(pf))).reduce(_ || _))

  /** All entries of a SORTED array within the prefix's range — binary
    * search to the lower bound, linear scan while the prefix holds. */
  def prefixSlice(sorted: Array[String], pf: String): Array[String] = {
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) < pf) lo = mid + 1 else hi = mid
    }
    val out = Array.newBuilder[String]
    var i = lo
    while (i < sorted.length && sorted(i).startsWith(pf)) { out += sorted(i); i += 1 }
    out.result()
  }

  /** Translate a wildcard pattern (`*` any run, `?` one char) to an
    * equivalent regex over dictionary terms — the same translation the
    * oracle applies, so engine and oracle cannot diverge on a pattern. */
  def globToRegex(glob: String): String =
    glob.map {
      case '*' => ".*"
      case '?' => "."
      case c if c.isLetterOrDigit => c.toString
      case c => java.util.regex.Pattern.quote(c.toString)
    }.mkString

  /** Fuzzy expansion over a SORTED dictionary via an incremental
    * Levenshtein DP walk with shared-prefix reuse and dead-prefix skipping
    * — the FST/automaton tier for `term~N` (ES walks a Levenshtein
    * automaton over its FST; a DP row per trie depth IS that automaton's
    * state, and the sorted array IS the trie's ordered leaf walk):
    *  - consecutive terms share a prefix → their DP rows up to the shared
    *    depth are identical and are NOT recomputed;
    *  - a prefix whose whole row exceeds `bound` can never reach an accept
    *    state on ANY extension → binary-search straight past every term
    *    sharing that dead prefix.
    * Returns (matches in sorted order, rows computed) — the second number
    * is the scan metric tests assert against (≪ Σ term lengths, where the
    * full scan's DP cost is Σ term lengths rows). Matches are EXACTLY the
    * editWithin ≤ bound set (same unit-cost model), just found faster. */
  def fuzzyWalk(sorted: Array[String], stem: String, bound: Int): (Array[String], Long) = {
    val n = stem.length
    val out = Array.newBuilder[String]
    var rowsComputed = 0L
    // rows(d) = DP row after consuming d chars of the current term;
    // row(i) = min edits aligning those d chars with stem.take(i)
    var rows = new Array[Array[Int]](16)
    rows(0) = Array.tabulate(n + 1)(identity)
    var prev = ""
    var idx = 0
    while (idx < sorted.length) {
      val t = sorted(idx)
      var common = 0
      val maxCommon = math.min(t.length, prev.length)
      while (common < maxCommon && t.charAt(common) == prev.charAt(common)) common += 1
      if (t.length + 1 > rows.length) {
        val grown = new Array[Array[Int]](math.max(rows.length * 2, t.length + 1))
        System.arraycopy(rows, 0, grown, 0, rows.length)
        rows = grown
      }
      var d = common
      var dead = -1
      while (d < t.length && dead < 0) {
        val c = t.charAt(d)
        val prevRow = rows(d)
        val row = new Array[Int](n + 1)
        row(0) = prevRow(0) + 1
        var rowMin = row(0)
        var i = 1
        while (i <= n) {
          val sub = prevRow(i - 1) + (if (stem.charAt(i - 1) == c) 0 else 1)
          val del = prevRow(i) + 1
          val ins = row(i - 1) + 1
          val v = math.min(sub, math.min(del, ins))
          row(i) = v
          if (v < rowMin) rowMin = v
          i += 1
        }
        rows(d + 1) = row
        rowsComputed += 1
        if (rowMin > bound) dead = d + 1
        d += 1
      }
      prev = t
      if (dead >= 0) {
        // skip every term sharing the dead prefix: first index whose term
        // exceeds the prefix's range upper bound (same shape as the prefix tier)
        val upper = prefixRangeUpper(t.substring(0, dead))
        var lo = idx + 1
        var hi = sorted.length
        while (lo < hi) {
          val mid = (lo + hi) >>> 1
          if (sorted(mid) <= upper) lo = mid + 1 else hi = mid
        }
        idx = lo
      } else {
        if (rows(t.length)(n) <= bound) out += t
        idx += 1
      }
    }
    (out.result(), rowsComputed)
  }

  /** Unrestricted Levenshtein edit distance ≤ `bound` test — the SAME cost
    * model as Spark's and DuckDB's `levenshtein` (unit insert/delete/
    * substitute), so warm driver-map expansion, cold Spark-job expansion and
    * the DuckDB oracle agree on the match set. Early-exits on the length
    * bound and on a row whose minimum exceeds the bound. */
  def editWithin(a: String, b: String, bound: Int): Boolean = {
    val (n, m) = (a.length, b.length)
    if (math.abs(n - m) > bound) return false
    var prev = Array.tabulate(m + 1)(identity)
    var cur = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      cur(0) = i
      var rowMin = i
      var j = 1
      while (j <= m) {
        val sub = prev(j - 1) + (if (a.charAt(i - 1) == b.charAt(j - 1)) 0 else 1)
        val del = prev(j) + 1
        val ins = cur(j - 1) + 1
        val v = math.min(sub, math.min(del, ins))
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (rowMin > bound) return false
      val t = prev; prev = cur; cur = t
      i += 1
    }
    prev(m) <= bound
  }
}

/** Conjunctive exact-phrase kernel: document-at-a-time intersection of the
  * phrase's term cursors within one shard, position-verified before any
  * heap insert, scored by the BM25 sum over the phrase's distinct terms in
  * ascending termId order (bit-identical to the oracle's plan). No WAND
  * pruning — conjunction is already selective; block skipping still applies
  * through cursor advances, and positions are decoded ONLY for fully
  * aligned candidate documents.
  *
  * Loose (unquoted) terms mixed into a phrase query ride along as OPTIONAL
  * scored cursors (`optIdfById`): they never gate candidacy — the phrase
  * conjunction does — but when present on a candidate document their BM25
  * contribution is added, interleaved with the required terms in ascending
  * termId order so the sum stays bit-identical to the oracle's
  * `aggregate(array_sort(...))` over ALL contributing terms. */
object Phrase {

  private final class PCursor(
      val termId: Long,
      val idf: Double,
      blocks: Array[PostingBlock],
      avgdl: Double,
      p: Bm25Params) {

    private var bi = 0
    private var ids: Array[Long] = _
    private var tfs: Array[Long] = _
    private var dls: Array[Long] = _
    private var poss: Array[Array[Long]] = _
    private var pi = 0
    var curDoc: Long = Long.MinValue
    advanceTo(Long.MinValue)

    def advanceTo(d: Long): Unit = {
      while (bi < blocks.length && blocks(bi).lastDoc < d) { bi += 1; ids = null }
      if (bi >= blocks.length) { curDoc = Long.MaxValue; return }
      if (ids == null) {
        val b = blocks(bi)
        ids = b.docIds; tfs = b.tfValues; dls = b.dlValues; poss = null; pi = 0
      }
      while (pi < ids.length && ids(pi) < d) pi += 1
      if (pi >= ids.length) { bi += 1; ids = null; advanceTo(d) }
      else curDoc = ids(pi)
    }

    def next(): Unit = if (curDoc != Long.MaxValue) advanceTo(curDoc + 1)

    def score: Double = idf * BM25.tfNorm(tfs(pi), dls(pi), avgdl, p)

    /** Length of the current posting's document (for phrase-freq tf-norm). */
    def dl: Long = dls(pi)

    /** Positions of the current posting (block decoded lazily, once). */
    def positions: Array[Long] = {
      if (poss == null) poss = blocks(bi).positions
      poss(pi)
    }
  }

  /** True iff the per-slot sorted position arrays admit a strictly
    * increasing in-order chain i₁<…<i_m with span `(i_m - i₁) - (m-1) ≤
    * slop` — the slop-phrase match predicate (slop 0 = exact adjacency).
    * Greedy: for each start i₁ ascending, the minimal-next-position chain
    * minimizes i_m, so it decides that start exactly; a start whose chain
    * dies (some slot has no position after the previous pick) kills all
    * larger starts too (the greedy chain is monotone in its start). */
  private[search] def orderedNear(slots: Array[Array[Long]], slop: Int): Boolean =
    spanMatch(slots, slop, ordered = true, endBound = -1)

  /** Span match predicate over per-slot sorted position arrays — the shared
    * verifier of phrase, `span_near` and `span_first` queries.
    *
    * ordered = true: a strictly increasing chain i₁<…<i_m with span
    * `(i_m - i₁) - (m-1) ≤ slop` (slop 0 = exact adjacency — the phrase
    * predicate). Greedy: for each start i₁ ascending, the minimal-next
    * chain minimizes i_m, so it decides that start exactly; a start whose
    * chain dies kills all larger starts too.
    *
    * ordered = false (Lucene `SpanNearQuery(inOrder=false)`): any window
    * holding one position of EVERY slot at DISTINCT positions with the same
    * span bound `(max - min) - (m-1) ≤ slop`. Duplicate slots (the same term
    * filling c ≥ 2 slots shares one position array) need c DISTINCT
    * positions from that array, so the check groups slots by their position
    * array and counts: a window [s, s + slop + (m-1)] matches iff every
    * group has ≥ its multiplicity positions inside it. Candidate starts are
    * exactly the positions themselves (any match's minimum position is one),
    * so sweeping s over the sorted union is exact — and distinct groups'
    * arrays are disjoint (one token occupies one position), so counting per
    * group never double-books a position across groups.
    *
    * endBound ≥ 0 (Lucene `SpanFirstQuery`): the matching span must also END
    * before position `endBound` (last position < endBound). In the ordered
    * sweep i_m is monotone in the start, so the first start with
    * i_m ≥ endBound ends the search; unordered windows cap their right edge
    * at `endBound - 1`. */
  private[search] def spanMatch(
      slots: Array[Array[Long]], slop: Int, ordered: Boolean, endBound: Int): Boolean = {
    val m = slots.length
    if (m == 1) {
      val arr = slots(0)
      return arr.length > 0 && (endBound < 0 || arr(0) < endBound)
    }
    if (ordered) {
      val first = slots(0)
      var f = 0
      while (f < first.length) {
        val p0 = first(f)
        var prev = p0
        var j = 1
        while (j < m) {
          val arr = slots(j)
          var ins = java.util.Arrays.binarySearch(arr, prev + 1)
          if (ins < 0) ins = -ins - 1
          if (ins >= arr.length) return false // no larger start can do better
          prev = arr(ins)
          j += 1
        }
        if (endBound >= 0 && prev >= endBound) return false // i_m monotone in start
        if ((prev - p0) - (m - 1) <= slop) return true
        f += 1
      }
      false
    } else {
      // group slots sharing one position array (duplicate query terms):
      // reference identity is enough — duplicate slots are built by mapping
      // the same termId to the same decoded array
      val groups = new java.util.IdentityHashMap[Array[Long], Int]()
      var j = 0
      while (j < m) {
        if (slots(j).isEmpty) return false
        groups.merge(slots(j), 1, (a, b) => a + b)
        j += 1
      }
      var arrs = new Array[Array[Long]](groups.size)
      var mult = new Array[Int](groups.size)
      var g = 0
      val git = groups.entrySet().iterator()
      while (git.hasNext) {
        val e = git.next(); arrs(g) = e.getKey; mult(g) = e.getValue; g += 1
      }
      // merge content-equal groups that arrived as distinct instances (a
      // caller that rebuilt per-slot arrays) — ≤ m groups, cheap pairwise
      if (arrs.length > 1) {
        var i2 = 0
        while (i2 < arrs.length) {
          var j2 = i2 + 1
          while (j2 < arrs.length) {
            if (mult(j2) > 0 && mult(i2) > 0 && java.util.Arrays.equals(arrs(i2), arrs(j2))) {
              mult(i2) += mult(j2); mult(j2) = 0
            }
            j2 += 1
          }
          i2 += 1
        }
        val keep = mult.indices.filter(mult(_) > 0)
        if (keep.length < arrs.length) {
          arrs = keep.map(arrs).toArray
          mult = keep.map(mult).toArray
        }
      }
      val win = slop.toLong + (m - 1) // window length: (mx - mn) - (m-1) <= slop
      // sweep candidate starts = every position of every group, ascending;
      // per group a cursor to its first uninspected start (monotone in s)
      val cur = new Array[Int](arrs.length)
      while (true) {
        // s = smallest uninspected candidate start across groups
        var s = Long.MaxValue
        var gi = 0
        while (gi < arrs.length) {
          if (cur(gi) < arrs(gi).length && arrs(gi)(cur(gi)) < s) s = arrs(gi)(cur(gi))
          gi += 1
        }
        if (s == Long.MaxValue) return false
        if (endBound >= 0 && s >= endBound) return false // later windows only move right
        var hi = s + win
        if (endBound >= 0 && endBound.toLong - 1L < hi) hi = endBound.toLong - 1L
        // every group must contribute `mult` distinct positions in [s, hi]
        var ok = true
        gi = 0
        while (ok && gi < arrs.length) {
          val a = arrs(gi)
          // first index >= s (advance this group's cursor if it IS the min)
          var lo = java.util.Arrays.binarySearch(a, s)
          if (lo < 0) lo = -lo - 1
          val need = lo + mult(gi) - 1
          ok = need < a.length && a(need) <= hi
          gi += 1
        }
        if (ok) return true
        // advance every cursor sitting on s (inspect each start once)
        gi = 0
        while (gi < arrs.length) {
          if (cur(gi) < arrs(gi).length && arrs(gi)(cur(gi)) == s) cur(gi) += 1
          gi += 1
        }
      }
      false
    }
  }

  /** Number of EXACT (slop 0, in-order) occurrences of the phrase whose
    * per-slot sorted position arrays are `slots` — Lucene's phrase frequency
    * for an exact match_phrase: starts p in slots(0) with p+j present in
    * slots(j) for every later slot. Duplicate terms share one array and the
    * strictly increasing offsets keep their picks distinct. */
  private[search] def countExact(slots: Array[Array[Long]]): Long = {
    val first = slots(0)
    var n = 0L
    var f = 0
    while (f < first.length) {
      val p0 = first(f)
      var ok = true
      var j = 1
      while (ok && j < slots.length) {
        ok = java.util.Arrays.binarySearch(slots(j), p0 + j) >= 0
        j += 1
      }
      if (ok) n += 1
      f += 1
    }
    n
  }

  def topK(
      blocks: Iterator[PostingBlock],
      phraseIdSeqs: Array[Array[Long]],
      phraseSlops: Array[Int],
      idfByTermId: Map[Long, Double],
      optIdfById: Map[Long, Double],
      filterTermIds: Set[Long],
      avgdl: Double,
      p: Bm25Params,
      k: Int,
      excludeTermIds: Set[Long] = Set.empty,
      /** sorted docIds passing the query's range filters in THIS shard
        * (null = no range filter); see [[Wand.topK]] */
      accept: Array[Long] = null,
      /** ES `search_after` cursor; see [[Wand.topK]] */
      after: ScoredDoc = null,
      /** per-phrase in-order flag (null = all ordered — plain phrases);
        * false = Lucene span_near(inOrder=false) window semantics */
      phraseOrdered: Array[Boolean] = null,
      /** per-phrase span_first end bound (null / -1 = unbounded) */
      phraseEnds: Array[Int] = null,
      /** LUCENE PHRASE-FREQUENCY SCORING (ES/Lucene match_phrase): when
        * non-null, entry pi is the phrase's summed idf (Σ idf over its token
        * occurrences, Lucene PhraseQuery's idfExplain) and the phrase scores
        * `idfSum × tfNorm(phraseFreq, dl, avgdl)` with phraseFreq = exact
        * occurrence count, REPLACING the distinct-term BM25 sum over the
        * phrase's terms. Loose (optional) terms still contribute their own
        * per-term BM25. Exact phrases only (slop 0, ordered, no end bound). */
      phraseFreqIdf: Array[Double] = null): Iterator[ScoredDoc] = {

    if (accept != null && accept.isEmpty) return Iterator.empty
    val byTerm = blocks.toArray.groupBy(_.termId)
    // conjunctive: every phrase term must have postings in this shard
    val reqIds = idfByTermId.keys.toArray.sorted
    val req = new Array[PCursor](reqIds.length)
    var i = 0
    while (i < reqIds.length) {
      byTerm.get(reqIds(i)) match {
        case Some(blks) =>
          req(i) = new PCursor(reqIds(i), idfByTermId(reqIds(i)), blks.sortBy(_.firstDoc), avgdl, p)
        case None => return Iterator.empty
      }
      i += 1
    }
    // optional loose-term cursors: absent-in-shard terms simply contribute 0
    val opt: Array[PCursor] = optIdfById.keys.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks => new PCursor(tid, optIdfById(tid), blks.sortBy(_.firstDoc), avgdl, p))
    }
    // scoring walks required + optional cursors merged in ascending termId
    // order (oracle sum-order contract)
    val scoreCursors: Array[PCursor] = (req ++ opt).sortBy(_.termId)
    val scoreRequired: Array[Boolean] = scoreCursors.map(c => idfByTermId.contains(c.termId))
    val filters: Array[PCursor] = filterTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks => new PCursor(tid, 0.0, blks.sortBy(_.firstDoc), avgdl, p))
    }
    if (filters.length < filterTermIds.size) return Iterator.empty
    // negative non-scoring cursors (ES must_not); see Wand.topK
    val excludes: Array[PCursor] = excludeTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks => new PCursor(tid, 0.0, blks.sortBy(_.firstDoc), avgdl, p))
    }

    def passesFilters(d: Long): Boolean = {
      var j = 0
      while (j < filters.length) {
        val f = filters(j)
        if (f.curDoc < d) f.advanceTo(d)
        if (f.curDoc != d) return false
        j += 1
      }
      true
    }

    def isExcluded(d: Long): Boolean = {
      var j = 0
      while (j < excludes.length) {
        val e = excludes(j)
        if (e.curDoc < d) e.advanceTo(d)
        if (e.curDoc == d) return true
        j += 1
      }
      false
    }

    if (phraseFreqIdf != null) {
      require(phraseFreqIdf.length == phraseIdSeqs.length,
        "phraseFreqIdf must be parallel to phraseIdSeqs")
      require(phraseSlops.forall(_ == 0) && phraseOrdered == null && phraseEnds == null,
        "phrase-frequency scoring supports exact phrases only (slop 0, ordered)")
    }
    val posByTid = new java.util.HashMap[Long, Array[Long]]()
    // per-phrase exact occurrence counts, filled on match in lucene mode
    val freqs: Array[Long] =
      if (phraseFreqIdf == null) null else new Array[Long](phraseIdSeqs.length)
    def phrasesMatch(): Boolean = {
      posByTid.clear()
      var j = 0
      while (j < req.length) { posByTid.put(req(j).termId, req(j).positions); j += 1 }
      var pi = 0
      while (pi < phraseIdSeqs.length) {
        if (freqs != null) {
          val f = countExact(phraseIdSeqs(pi).map(posByTid.get))
          if (f == 0L) return false
          freqs(pi) = f
        } else {
          val ord = phraseOrdered == null || phraseOrdered(pi)
          val end = if (phraseEnds == null) -1 else phraseEnds(pi)
          if (!spanMatch(phraseIdSeqs(pi).map(posByTid.get), phraseSlops(pi), ord, end))
            return false
        }
        pi += 1
      }
      true
    }

    val worstFirst = new java.util.Comparator[ScoredDoc] {
      def compare(a: ScoredDoc, b: ScoredDoc): Int = {
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c else java.lang.Long.compare(b.docId, a.docId)
      }
    }
    val heap = new java.util.PriorityQueue[ScoredDoc](k, worstFirst)

    var done = false
    while (!done) {
      // candidate = max over required cursors; align all to it
      var cand = Long.MinValue
      var j = 0
      while (j < req.length) { if (req(j).curDoc > cand) cand = req(j).curDoc; j += 1 }
      if (cand == Long.MaxValue) done = true
      else {
        var aligned = true
        j = 0
        while (j < req.length) {
          if (req(j).curDoc < cand) { req(j).advanceTo(cand); if (req(j).curDoc != cand) aligned = false }
          j += 1
        }
        if (aligned) {
          if ((accept == null || java.util.Arrays.binarySearch(accept, cand) >= 0) &&
            passesFilters(cand) && !isExcluded(cand) && phrasesMatch()) {
            var s = 0.0
            if (freqs != null) {
              // Lucene match_phrase scoring: per-phrase idfSum × tfNorm of
              // the phrase OCCURRENCE count; the phrase's terms do not also
              // score individually
              val dl = req(0).dl
              var pi2 = 0
              while (pi2 < freqs.length) {
                s += phraseFreqIdf(pi2) * BM25.tfNorm(freqs(pi2), dl, avgdl, p)
                pi2 += 1
              }
              // optional loose terms still contribute their own BM25
              j = 0
              while (j < scoreCursors.length) {
                val c = scoreCursors(j)
                if (!scoreRequired(j)) {
                  if (c.curDoc < cand) c.advanceTo(cand)
                  if (c.curDoc == cand) s += c.score
                }
                j += 1
              }
            } else {
              // required + present-optional contributions, ascending termId —
              // oracle-identical summation order
              j = 0
              while (j < scoreCursors.length) {
                val c = scoreCursors(j)
                if (scoreRequired(j)) s += c.score
                else {
                  if (c.curDoc < cand) c.advanceTo(cand)
                  if (c.curDoc == cand) s += c.score
                }
                j += 1
              }
            }
            if (after == null || s < after.score ||
              (s == after.score && cand > after.docId)) {
              if (heap.size < k) heap.add(ScoredDoc(cand, s))
              else if (s > heap.peek().score) { heap.poll(); heap.add(ScoredDoc(cand, s)) }
            }
          }
          j = 0
          while (j < req.length) { req(j).next(); j += 1 }
        }
      }
    }
    val out = new Array[ScoredDoc](heap.size)
    i = 0
    while (!heap.isEmpty) { out(i) = heap.poll(); i += 1 }
    out.iterator
  }

  /** All docIds whose positions align EVERY phrase in this shard (the ES
    * query-context match set of a must-phrase bool query) gated by filter/
    * must_not/range clauses — the phrase analogue of [[Wand.matching]].
    * Loose terms never gate (should clauses); no scoring, no heap. */
  def matching(
      blocks: Iterator[PostingBlock],
      phraseIdSeqs: Array[Array[Long]],
      phraseSlops: Array[Int],
      requiredTermIds: Set[Long],
      filterTermIds: Set[Long],
      avgdl: Double,
      p: Bm25Params,
      excludeTermIds: Set[Long] = Set.empty,
      accept: Array[Long] = null,
      phraseOrdered: Array[Boolean] = null,
      phraseEnds: Array[Int] = null): Iterator[Long] = {
    if (accept != null && accept.isEmpty) return Iterator.empty
    val byTerm = blocks.toArray.groupBy(_.termId)
    val reqIds = requiredTermIds.toArray.sorted
    val req = new Array[PCursor](reqIds.length)
    var i = 0
    while (i < reqIds.length) {
      byTerm.get(reqIds(i)) match {
        case Some(blks) => req(i) = new PCursor(reqIds(i), 0.0, blks.sortBy(_.firstDoc), avgdl, p)
        case None => return Iterator.empty
      }
      i += 1
    }
    val filters: Array[PCursor] = filterTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks => new PCursor(tid, 0.0, blks.sortBy(_.firstDoc), avgdl, p))
    }
    if (filters.length < filterTermIds.size) return Iterator.empty
    val excludes: Array[PCursor] = excludeTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks => new PCursor(tid, 0.0, blks.sortBy(_.firstDoc), avgdl, p))
    }
    def passesFilters(d: Long): Boolean = {
      var j = 0
      while (j < filters.length) {
        val f = filters(j)
        if (f.curDoc < d) f.advanceTo(d)
        if (f.curDoc != d) return false
        j += 1
      }
      true
    }
    def isExcluded(d: Long): Boolean = {
      var j = 0
      while (j < excludes.length) {
        val e = excludes(j)
        if (e.curDoc < d) e.advanceTo(d)
        if (e.curDoc == d) return true
        j += 1
      }
      false
    }
    val posByTid = new java.util.HashMap[Long, Array[Long]]()
    def phrasesMatch(): Boolean = {
      posByTid.clear()
      var j = 0
      while (j < req.length) { posByTid.put(req(j).termId, req(j).positions); j += 1 }
      var pi = 0
      while (pi < phraseIdSeqs.length) {
        val ord = phraseOrdered == null || phraseOrdered(pi)
        val end = if (phraseEnds == null) -1 else phraseEnds(pi)
        if (!spanMatch(phraseIdSeqs(pi).map(posByTid.get), phraseSlops(pi), ord, end))
          return false
        pi += 1
      }
      true
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var done = false
    while (!done) {
      var cand = Long.MinValue
      var j = 0
      while (j < req.length) { if (req(j).curDoc > cand) cand = req(j).curDoc; j += 1 }
      if (cand == Long.MaxValue) done = true
      else {
        var aligned = true
        j = 0
        while (j < req.length) {
          if (req(j).curDoc < cand) { req(j).advanceTo(cand); if (req(j).curDoc != cand) aligned = false }
          j += 1
        }
        if (aligned) {
          if ((accept == null || java.util.Arrays.binarySearch(accept, cand) >= 0) &&
            passesFilters(cand) && !isExcluded(cand) && phrasesMatch()) out += cand
          j = 0
          while (j < req.length) { req(j).next(); j += 1 }
        }
      }
    }
    out.iterator
  }
}

/** Block-max WAND kernel: document-at-a-time top-k over the posting blocks
  * of one shard. Pure JVM code, runs inside `flatMapGroups`. */
object Wand {

  /** Cursor over one term's blocks (sorted by firstDoc) within a shard.
    * Blocks are decoded lazily — a shallow (block-level) advance never
    * decodes, which is what makes block-max skipping cheap.
    *
    * `exactBounds=false` is the multi-segment mode: the stored maxTfn was
    * computed with the segment's build-time avgdl and is NOT admissible
    * under the query's global avgdl, so bounds are derived from the
    * avgdl-independent (maxTf, minDl) pair instead (tfNorm is monotone
    * ↑tf ↓dl; a 2-ulp pad absorbs double-eval noise). Looser bounds mean
    * less skipping, never wrong results; compaction restores tight bounds. */
  private final class TermCursor(
      val termId: Long,
      val idf: Double,
      blocks: Array[PostingBlock],
      avgdl: Double,
      p: Bm25Params,
      exactBounds: Boolean) {

    private val blockBound: Array[Double] = {
      val a = new Array[Double](blocks.length)
      var i = 0
      while (i < blocks.length) {
        a(i) =
          if (exactBounds) blocks(i).maxTfn.toDouble
          else math.nextUp(math.nextUp(
            BM25.tfNorm(blocks(i).maxTf, blocks(i).minDl, avgdl, p)))
        i += 1
      }
      a
    }

    val termUB: Double = {
      var m = 0.0
      var i = 0
      while (i < blockBound.length) {
        if (blockBound(i) > m) m = blockBound(i)
        i += 1
      }
      idf * m
    }

    private var bi = 0
    private var docIds: Array[Long] = _
    private var tfs: Array[Long] = _
    private var dls: Array[Long] = _
    private var pi = 0
    var curDoc: Long = _
    decodeAndSeek(Long.MinValue)

    def exhausted: Boolean = bi >= blocks.length

    /** Upper bound for the block the cursor currently points at. */
    def blockUB: Double = if (exhausted) 0.0 else idf * blockBound(bi)

    /** Last docId of the current block (shallow — no decode needed). */
    def blockLast: Long = if (exhausted) Long.MaxValue else blocks(bi).lastDoc

    /** Move the block pointer (not the posting pointer) so the current
      * block may contain d: first block with lastDoc >= d. */
    def shallowAdvance(d: Long): Unit = {
      while (bi < blocks.length && blocks(bi).lastDoc < d) {
        bi += 1
        docIds = null
      }
      if (exhausted) curDoc = Long.MaxValue
    }

    private def decodeAndSeek(d: Long): Unit = {
      if (exhausted) { curDoc = Long.MaxValue; return }
      if (docIds == null) {
        val b = blocks(bi)
        docIds = b.docIds; tfs = b.tfValues; dls = b.dlValues
        pi = 0
      }
      while (pi < docIds.length && docIds(pi) < d) pi += 1
      if (pi >= docIds.length) {
        bi += 1; docIds = null
        decodeAndSeek(d)
      } else curDoc = docIds(pi)
    }

    /** Advance to the first posting with docId >= d. */
    def advanceTo(d: Long): Unit = {
      shallowAdvance(d)
      decodeAndSeek(d)
    }

    /** Advance past the current posting. */
    def next(): Unit = {
      pi += 1
      if (pi >= docIds.length) {
        bi += 1; docIds = null
        decodeAndSeek(Long.MinValue)
      } else curDoc = docIds(pi)
    }

    /** BM25 contribution of the current posting. */
    def score: Double = idf * BM25.tfNorm(tfs(pi), dls(pi), avgdl, p)
  }

  /** Worst-hit-first comparator: smaller score is worse; on equal score the
    * larger docId is worse (tie-break is docId ascending). */
  private val worstFirst = new java.util.Comparator[ScoredDoc] {
    def compare(a: ScoredDoc, b: ScoredDoc): Int = {
      val c = java.lang.Double.compare(a.score, b.score)
      if (c != 0) c else java.lang.Long.compare(b.docId, a.docId)
    }
  }

  def topK(
      blocks: Iterator[PostingBlock],
      idfByTermId: Map[Long, Double],
      filterTermIds: Set[Long],
      avgdl: Double,
      p: Bm25Params,
      k: Int,
      exactBounds: Boolean = true,
      excludeTermIds: Set[Long] = Set.empty,
      /** sorted docIds passing the query's range filters in THIS shard
        * (null = no range filter). Pruning-only gate at full evaluation —
        * removing candidates never loosens WAND's upper bounds, so block
        * skipping stays admissible. */
      accept: Array[Long] = null,
      /** ES `minimum_should_match`: a candidate needs ≥ this many DISTINCT
        * scored term clauses present (each prefix/fuzzy expansion is its own
        * clause, the scoring_boolean rewrite). Rejecting candidates never
        * loosens WAND's upper bounds, so pruning stays admissible. */
      minShouldMatch: Int = 1,
      /** ES `search_after` cursor: admit only hits STRICTLY after this
        * (score, docId) in the (score desc, docId asc) total order — i.e.
        * score < after.score, or equal score with docId > after.docId.
        * Scores are deterministic JVM doubles, so the page-1 tail compares
        * bit-exactly. Rejection-only gate at insertion: block-max skipping
        * stays admissible (the heap threshold only ever comes from admitted
        * hits, which genuinely bound the k-th qualifying score). */
      after: ScoredDoc = null): Iterator[ScoredDoc] = {

    if (accept != null && accept.isEmpty) return Iterator.empty
    val byTerm = blocks.toArray.groupBy(_.termId)
    // required non-scoring cursors (keyword filters); conjunctive
    val filters: Array[TermCursor] = filterTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks => new TermCursor(tid, 0.0, blks.sortBy(_.firstDoc), avgdl, p, exactBounds))
    }
    // a required filter with no postings in this shard → nothing can match
    if (filters.length < filterTermIds.size) return Iterator.empty
    // negative non-scoring cursors (ES must_not): a doc present in ANY is
    // rejected. Removing candidates never loosens WAND's upper bounds, so
    // pruning stays admissible; an excluded term with no postings in this
    // shard excludes nothing.
    val excludes: Array[TermCursor] = excludeTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks => new TermCursor(tid, 0.0, blks.sortBy(_.firstDoc), avgdl, p, exactBounds))
    }
    val cursors: Array[TermCursor] = byTerm.iterator
      .filter { case (tid, _) => !filterTermIds.contains(tid) && !excludeTermIds.contains(tid) }
      .map { case (tid, blks) =>
        new TermCursor(tid, idfByTermId(tid), blks.sortBy(_.firstDoc), avgdl, p, exactBounds)
      }.toArray
    if (cursors.isEmpty) return Iterator.empty

    /** true iff every filter cursor contains `d`. */
    def passesFilters(d: Long): Boolean = {
      var i = 0
      while (i < filters.length) {
        val f = filters(i)
        if (f.curDoc < d) f.advanceTo(d)
        if (f.curDoc != d) return false
        i += 1
      }
      true
    }

    /** true iff any exclusion cursor contains `d`. */
    def isExcluded(d: Long): Boolean = {
      var i = 0
      while (i < excludes.length) {
        val e = excludes(i)
        if (e.curDoc < d) e.advanceTo(d)
        if (e.curDoc == d) return true
        i += 1
      }
      false
    }

    val heap = new java.util.PriorityQueue[ScoredDoc](k, worstFirst)
    // scratch for in-termId-order summation at full evaluation
    val matched = new Array[TermCursor](cursors.length)

    var live = cursors.count(!_.exhausted)
    while (live > 0) {
      // sort live cursors to the front by curDoc (insertion sort; tiny n)
      java.util.Arrays.sort(cursors, new java.util.Comparator[TermCursor] {
        def compare(a: TermCursor, b: TermCursor): Int =
          java.lang.Long.compare(a.curDoc, b.curDoc)
      })
      val theta = if (heap.size < k) -1.0 else heap.peek().score

      // find pivot: smallest prefix whose term upper bounds can beat theta
      var acc = 0.0
      var pvt = -1
      var i = 0
      while (pvt < 0 && i < cursors.length) {
        if (cursors(i).curDoc != Long.MaxValue) {
          acc += cursors(i).termUB
          if (acc > theta) pvt = i
        } else i = cursors.length // exhausted tail
        i += 1
      }
      if (pvt < 0) return drain(heap)
      val pivotDoc = cursors(pvt).curDoc
      if (pivotDoc == Long.MaxValue) return drain(heap)
      // fold cursors sitting on the same doc into the pivot group, so the
      // block-max check sees every term that can contribute to pivotDoc and
      // the skip bound is strictly past it (termination guarantee)
      while (pvt + 1 < cursors.length && cursors(pvt + 1).curDoc == pivotDoc) pvt += 1

      // block-max refinement: shallow-advance blocks, re-check with block UBs
      var ubSum = 0.0
      var j = 0
      while (j <= pvt) {
        cursors(j).shallowAdvance(pivotDoc)
        ubSum += cursors(j).blockUB
        j += 1
      }
      if (ubSum <= theta) {
        // whole aligned block range cannot beat theta — jump past it
        var d = Long.MaxValue
        j = 0
        while (j <= pvt) {
          val bl = cursors(j).blockLast
          if (bl < d) d = bl
          j += 1
        }
        val next = if (d == Long.MaxValue) Long.MaxValue else d + 1
        val bound =
          if (pvt + 1 < cursors.length && cursors(pvt + 1).curDoc < next)
            cursors(pvt + 1).curDoc
          else next
        j = 0
        while (j <= pvt) {
          if (cursors(j).curDoc < bound) cursors(j).advanceTo(bound)
          j += 1
        }
      } else if (cursors(0).curDoc == pivotDoc) {
        // full evaluation: all cursors on pivotDoc, summed in termId order
        var m = 0
        j = 0
        while (j < cursors.length && cursors(j).curDoc == pivotDoc) {
          matched(m) = cursors(j); m += 1; j += 1
        }
        if (m >= minShouldMatch &&
          (accept == null || java.util.Arrays.binarySearch(accept, pivotDoc) >= 0) &&
          passesFilters(pivotDoc) && !isExcluded(pivotDoc)) {
          java.util.Arrays.sort(matched, 0, m, new java.util.Comparator[TermCursor] {
            def compare(a: TermCursor, b: TermCursor): Int =
              java.lang.Long.compare(a.termId, b.termId)
          })
          var s = 0.0
          j = 0
          while (j < m) { s += matched(j).score; j += 1 }
          if (after == null || s < after.score ||
            (s == after.score && pivotDoc > after.docId)) {
            if (heap.size < k) heap.add(ScoredDoc(pivotDoc, s))
            else if (s > heap.peek().score) { heap.poll(); heap.add(ScoredDoc(pivotDoc, s)) }
          }
        }
        j = 0
        while (j < m) { matched(j).next(); j += 1 }
      } else {
        // advance the lagging cursors up to the pivot
        j = 0
        while (j < pvt) {
          if (cursors(j).curDoc < pivotDoc) cursors(j).advanceTo(pivotDoc)
          j += 1
        }
      }
      live = cursors.count(!_.exhausted)
    }
    drain(heap)
  }

  private def drain(heap: java.util.PriorityQueue[ScoredDoc]): Iterator[ScoredDoc] = {
    val out = new Array[ScoredDoc](heap.size)
    var i = 0
    while (!heap.isEmpty) { out(i) = heap.poll(); i += 1 }
    out.iterator
  }

  /** All matching docIds in this shard — the ES QUERY-CONTEXT match set of
    * a bool query (should-terms with `minimum_should_match`, filter,
    * must_not, range): a doc matches iff it contains ≥ minShouldMatch
    * distinct scored terms (each expanded prefix/fuzzy term is its own
    * should clause, the scoring_boolean rewrite), every filter term, no
    * excluded term, and passes the range accept set. No scoring, no heap —
    * a plain disjunctive document-at-a-time walk; output ≤ docsPerShard per
    * task. Drives facet (ES terms-aggregation) counting, where every match
    * counts, so no block-max skipping applies. */
  def matching(
      blocks: Iterator[PostingBlock],
      anyTermIds: Set[Long],
      filterTermIds: Set[Long],
      avgdl: Double,
      p: Bm25Params,
      excludeTermIds: Set[Long] = Set.empty,
      accept: Array[Long] = null,
      minShouldMatch: Int = 1): Iterator[Long] = {
    if (accept != null && accept.isEmpty) return Iterator.empty
    val byTerm = blocks.toArray.groupBy(_.termId)
    val filters: Array[TermCursor] = filterTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks =>
        new TermCursor(tid, 0.0, blks.sortBy(_.firstDoc), avgdl, p, exactBounds = true))
    }
    if (filters.length < filterTermIds.size) return Iterator.empty
    val excludes: Array[TermCursor] = excludeTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks =>
        new TermCursor(tid, 0.0, blks.sortBy(_.firstDoc), avgdl, p, exactBounds = true))
    }
    val any: Array[TermCursor] = anyTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks =>
        new TermCursor(tid, 0.0, blks.sortBy(_.firstDoc), avgdl, p, exactBounds = true))
    }
    if (any.isEmpty) return Iterator.empty

    def passesFilters(d: Long): Boolean = {
      var i = 0
      while (i < filters.length) {
        val f = filters(i)
        if (f.curDoc < d) f.advanceTo(d)
        if (f.curDoc != d) return false
        i += 1
      }
      true
    }
    def isExcluded(d: Long): Boolean = {
      var i = 0
      while (i < excludes.length) {
        val e = excludes(i)
        if (e.curDoc < d) e.advanceTo(d)
        if (e.curDoc == d) return true
        i += 1
      }
      false
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var d = Long.MaxValue
    var i = 0
    while (i < any.length) { if (any(i).curDoc < d) d = any(i).curDoc; i += 1 }
    while (d != Long.MaxValue) {
      // distinct should-clauses on d (each cursor = one clause)
      var hits = 0
      i = 0
      while (i < any.length) { if (any(i).curDoc == d) hits += 1; i += 1 }
      if (hits >= minShouldMatch &&
        (accept == null || java.util.Arrays.binarySearch(accept, d) >= 0) &&
        passesFilters(d) && !isExcluded(d)) out += d
      var nd = Long.MaxValue
      i = 0
      while (i < any.length) {
        val c = any(i)
        if (c.curDoc == d) c.next()
        if (c.curDoc < nd) nd = c.curDoc
        i += 1
      }
      d = nd
    }
    out.iterator
  }

  /** Every matching doc WITH its exact BM25 score — the exhaustive scoring
    * walk behind per-bucket top-k (ES `top_hits` inside a terms
    * aggregation), where every match may be the best of its own bucket so
    * no global top-k pruning is admissible. Same match semantics as
    * [[matching]]; same bit-exact summation order as [[topK]] (ascending
    * termId — the cursor array is built sorted and never re-ordered).
    * Output ≤ docsPerShard rows per task. */
  def scoreAll(
      blocks: Iterator[PostingBlock],
      idfByTermId: Map[Long, Double],
      filterTermIds: Set[Long],
      avgdl: Double,
      p: Bm25Params,
      exactBounds: Boolean = true,
      excludeTermIds: Set[Long] = Set.empty,
      accept: Array[Long] = null,
      minShouldMatch: Int = 1): Iterator[ScoredDoc] = {
    if (accept != null && accept.isEmpty) return Iterator.empty
    val byTerm = blocks.toArray.groupBy(_.termId)
    val filters: Array[TermCursor] = filterTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks =>
        new TermCursor(tid, 0.0, blks.sortBy(_.firstDoc), avgdl, p, exactBounds))
    }
    if (filters.length < filterTermIds.size) return Iterator.empty
    val excludes: Array[TermCursor] = excludeTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks =>
        new TermCursor(tid, 0.0, blks.sortBy(_.firstDoc), avgdl, p, exactBounds))
    }
    // scored cursors in ascending termId order — the summation order
    val scored: Array[TermCursor] = idfByTermId.keysIterator.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks =>
        new TermCursor(tid, idfByTermId(tid), blks.sortBy(_.firstDoc), avgdl, p, exactBounds))
    }
    if (scored.isEmpty) return Iterator.empty

    def passesFilters(d: Long): Boolean = {
      var i = 0
      while (i < filters.length) {
        val f = filters(i)
        if (f.curDoc < d) f.advanceTo(d)
        if (f.curDoc != d) return false
        i += 1
      }
      true
    }
    def isExcluded(d: Long): Boolean = {
      var i = 0
      while (i < excludes.length) {
        val e = excludes(i)
        if (e.curDoc < d) e.advanceTo(d)
        if (e.curDoc == d) return true
        i += 1
      }
      false
    }

    val out = scala.collection.mutable.ArrayBuffer.empty[ScoredDoc]
    var d = Long.MaxValue
    var i = 0
    while (i < scored.length) { if (scored(i).curDoc < d) d = scored(i).curDoc; i += 1 }
    while (d != Long.MaxValue) {
      var hits = 0
      var s = 0.0
      i = 0
      while (i < scored.length) {
        if (scored(i).curDoc == d) { hits += 1; s += scored(i).score }
        i += 1
      }
      if (hits >= minShouldMatch &&
        (accept == null || java.util.Arrays.binarySearch(accept, d) >= 0) &&
        passesFilters(d) && !isExcluded(d)) out += ScoredDoc(d, s)
      var nd = Long.MaxValue
      i = 0
      while (i < scored.length) {
        val c = scored(i)
        if (c.curDoc == d) c.next()
        if (c.curDoc < nd) nd = c.curDoc
        i += 1
      }
      d = nd
    }
    out.iterator
  }

  /** [[scoreAll]] with ES `dis_max` combination: a document's score is its
    * BEST single term contribution plus `tieBreaker ×` the others —
    * `max + tb·(sum − max)` — instead of the bool-query sum. tb = 0 is pure
    * dis_max (Lucene DisjunctionMaxQuery), tb = 1 degenerates to the sum.
    * Exhaustive per-shard walk: a doc-dependent max admits no simple
    * sum-of-upper-bounds WAND pivot, and the per-shard walk is the same
    * cost the aggregation surfaces already pay. */
  def scoreAllDisMax(
      blocks: Iterator[PostingBlock],
      idfByTermId: Map[Long, Double],
      filterTermIds: Set[Long],
      avgdl: Double,
      p: Bm25Params,
      tieBreaker: Double,
      excludeTermIds: Set[Long] = Set.empty,
      accept: Array[Long] = null,
      minShouldMatch: Int = 1): Iterator[ScoredDoc] = {
    if (accept != null && accept.isEmpty) return Iterator.empty
    val byTerm = blocks.toArray.groupBy(_.termId)
    val filters: Array[TermCursor] = filterTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks =>
        new TermCursor(tid, 0.0, blks.sortBy(_.firstDoc), avgdl, p, exactBounds = true))
    }
    if (filters.length < filterTermIds.size) return Iterator.empty
    val excludes: Array[TermCursor] = excludeTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks =>
        new TermCursor(tid, 0.0, blks.sortBy(_.firstDoc), avgdl, p, exactBounds = true))
    }
    val scored: Array[TermCursor] = idfByTermId.keysIterator.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks =>
        new TermCursor(tid, idfByTermId(tid), blks.sortBy(_.firstDoc), avgdl, p,
          exactBounds = true))
    }
    if (scored.isEmpty) return Iterator.empty
    def passesFilters(d: Long): Boolean = {
      var i = 0
      while (i < filters.length) {
        val f = filters(i)
        if (f.curDoc < d) f.advanceTo(d)
        if (f.curDoc != d) return false
        i += 1
      }
      true
    }
    def isExcluded(d: Long): Boolean = {
      var i = 0
      while (i < excludes.length) {
        val e = excludes(i)
        if (e.curDoc < d) e.advanceTo(d)
        if (e.curDoc == d) return true
        i += 1
      }
      false
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[ScoredDoc]
    var d = Long.MaxValue
    var i = 0
    while (i < scored.length) { if (scored(i).curDoc < d) d = scored(i).curDoc; i += 1 }
    while (d != Long.MaxValue) {
      var hits = 0
      var s = 0.0
      var sMax = 0.0
      i = 0
      while (i < scored.length) {
        if (scored(i).curDoc == d) {
          hits += 1
          val c = scored(i).score
          s += c
          if (c > sMax) sMax = c
        }
        i += 1
      }
      if (hits >= minShouldMatch &&
        (accept == null || java.util.Arrays.binarySearch(accept, d) >= 0) &&
        passesFilters(d) && !isExcluded(d))
        out += ScoredDoc(d, sMax + tieBreaker * (s - sMax))
      var nd = Long.MaxValue
      i = 0
      while (i < scored.length) {
        val c = scored(i)
        if (c.curDoc == d) c.next()
        if (c.curDoc < nd) nd = c.curDoc
        i += 1
      }
      d = nd
    }
    out.iterator
  }

  /** One `multi_match` clause's scoring inputs: the clause's idf (already
    * field- and term-boosted), its FIELD's avgdl (per-field BM25
    * tf-normalization), the group it combines into (field for
    * best_fields/most_fields, TOKEN for cross_fields), and which query
    * token it came from (for `minimum_should_match` over distinct
    * tokens). */
  final case class FieldTermInfo(idf: Double, avgdl: Double, group: Int, token: Int)

  /** `multi_match` combine modes over the per-group (sum, max) pairs:
    * most_fields = Σ group sums; best_fields = best group sum +
    * tb·(rest); cross_fields = Σ over TOKEN groups of (best clause +
    * tb·(rest)) — the BlendedTermQuery shape (the caller groups clauses
    * by token and blends df into the idf). Every mode is upper-bounded by
    * the plain sum of clause contributions (tb ≤ 1), so the WAND
    * sum-of-bounds pivot stays admissible for all three. */
  val MostFields = 0
  val BestFields = 1
  val CrossFields = 2

  @inline private def combineGroups(
      mode: Int, tb: Double, groupSum: Array[Double], groupMax: Array[Double],
      numGroups: Int): Double = {
    var s = 0.0
    var g = 0
    if (mode == CrossFields) {
      while (g < numGroups) {
        s += groupMax(g) + tb * (groupSum(g) - groupMax(g))
        g += 1
      }
      s
    } else {
      var sMax = 0.0
      while (g < numGroups) {
        s += groupSum(g)
        if (groupSum(g) > sMax) sMax = groupSum(g)
        g += 1
      }
      if (mode == MostFields) s else sMax + tb * (s - sMax)
    }
  }

  /** Block-max WAND top-k with per-FIELD grouped combination — the ES
    * `multi_match` kernel. Each scored cursor carries its own avgdl (its
    * field's), contributions sum WITHIN a field group, and the groups
    * combine doc-locally: `most_fields` = Σ groups, `best_fields` =
    * best group + tieBreaker × the rest.
    *
    * The sum-of-upper-bounds pivot IS admissible for BOTH modes: with
    * tieBreaker ≤ 1, `max + tb·(sum − max) ≤ sum ≤ Σ termUB` — the plain
    * WAND bound upper-bounds the combined score (it is merely looser for
    * best_fields, so skipping is safe, just less aggressive). Block bounds
    * are always DERIVED from the avgdl-independent (maxTf, minDl) pair —
    * the stored maxTfn was computed under the content avgdl and is not
    * admissible under a field's own avgdl. `minShouldMatch` counts
    * DISTINCT query tokens matched in ≥1 field (msm > 1 never loosens the
    * bound — it only rejects candidates). Accumulation order matches
    * [[scoreAllFields]] exactly (per-group sums in ascending termId,
    * groups combined in index order), so the two kernels are bit-identical
    * on the docs they both emit. */
  def topKFields(
      blocks: Iterator[PostingBlock],
      infoById: Map[Long, FieldTermInfo],
      numGroups: Int,
      numTokens: Int,
      filterTermIds: Set[Long],
      filterAvgdl: Double,
      p: Bm25Params,
      tieBreaker: Double,
      mode: Int,
      k: Int,
      excludeTermIds: Set[Long] = Set.empty,
      accept: Array[Long] = null,
      minShouldMatch: Int = 1): Iterator[ScoredDoc] = {
    if (accept != null && accept.isEmpty) return Iterator.empty
    val byTerm = blocks.toArray.groupBy(_.termId)
    val filters: Array[TermCursor] = filterTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks =>
        new TermCursor(tid, 0.0, blks.sortBy(_.firstDoc), filterAvgdl, p, exactBounds = true))
    }
    if (filters.length < filterTermIds.size) return Iterator.empty
    val excludes: Array[TermCursor] = excludeTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks =>
        new TermCursor(tid, 0.0, blks.sortBy(_.firstDoc), filterAvgdl, p, exactBounds = true))
    }
    val cursors: Array[TermCursor] = infoById.keysIterator.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map { blks =>
        val info = infoById(tid)
        new TermCursor(tid, info.idf, blks.sortBy(_.firstDoc), info.avgdl, p,
          exactBounds = false)
      }
    }
    if (cursors.isEmpty) return Iterator.empty
    def passesFilters(d: Long): Boolean = {
      var i = 0
      while (i < filters.length) {
        val f = filters(i)
        if (f.curDoc < d) f.advanceTo(d)
        if (f.curDoc != d) return false
        i += 1
      }
      true
    }
    def isExcluded(d: Long): Boolean = {
      var i = 0
      while (i < excludes.length) {
        val e = excludes(i)
        if (e.curDoc < d) e.advanceTo(d)
        if (e.curDoc == d) return true
        i += 1
      }
      false
    }
    val heap = new java.util.PriorityQueue[ScoredDoc](k, worstFirst)
    val matched = new Array[TermCursor](cursors.length)
    val groupSum = new Array[Double](numGroups)
    val groupMax = new Array[Double](numGroups)
    val tokenHit = new Array[Boolean](numTokens)

    var live = cursors.count(!_.exhausted)
    while (live > 0) {
      java.util.Arrays.sort(cursors, new java.util.Comparator[TermCursor] {
        def compare(a: TermCursor, b: TermCursor): Int =
          java.lang.Long.compare(a.curDoc, b.curDoc)
      })
      val theta = if (heap.size < k) -1.0 else heap.peek().score
      var acc = 0.0
      var pvt = -1
      var i = 0
      while (pvt < 0 && i < cursors.length) {
        if (cursors(i).curDoc != Long.MaxValue) {
          acc += cursors(i).termUB
          if (acc > theta) pvt = i
        } else i = cursors.length
        i += 1
      }
      if (pvt < 0) return drain(heap)
      val pivotDoc = cursors(pvt).curDoc
      if (pivotDoc == Long.MaxValue) return drain(heap)
      while (pvt + 1 < cursors.length && cursors(pvt + 1).curDoc == pivotDoc) pvt += 1
      var ubSum = 0.0
      var j = 0
      while (j <= pvt) {
        cursors(j).shallowAdvance(pivotDoc)
        ubSum += cursors(j).blockUB
        j += 1
      }
      if (ubSum <= theta) {
        var d = Long.MaxValue
        j = 0
        while (j <= pvt) {
          val bl = cursors(j).blockLast
          if (bl < d) d = bl
          j += 1
        }
        val next = if (d == Long.MaxValue) Long.MaxValue else d + 1
        val bound =
          if (pvt + 1 < cursors.length && cursors(pvt + 1).curDoc < next)
            cursors(pvt + 1).curDoc
          else next
        j = 0
        while (j <= pvt) {
          if (cursors(j).curDoc < bound) cursors(j).advanceTo(bound)
          j += 1
        }
      } else if (cursors(0).curDoc == pivotDoc) {
        var m = 0
        j = 0
        while (j < cursors.length && cursors(j).curDoc == pivotDoc) {
          matched(m) = cursors(j); m += 1; j += 1
        }
        // distinct matched tokens + grouped combine, in termId order
        java.util.Arrays.sort(matched, 0, m, new java.util.Comparator[TermCursor] {
          def compare(a: TermCursor, b: TermCursor): Int =
            java.lang.Long.compare(a.termId, b.termId)
        })
        java.util.Arrays.fill(groupSum, 0.0)
        java.util.Arrays.fill(groupMax, 0.0)
        java.util.Arrays.fill(tokenHit, false)
        var hits = 0
        j = 0
        while (j < m) {
          val info = infoById(matched(j).termId)
          val sc = matched(j).score
          groupSum(info.group) += sc
          if (sc > groupMax(info.group)) groupMax(info.group) = sc
          if (!tokenHit(info.token)) { tokenHit(info.token) = true; hits += 1 }
          j += 1
        }
        if (hits >= minShouldMatch &&
          (accept == null || java.util.Arrays.binarySearch(accept, pivotDoc) >= 0) &&
          passesFilters(pivotDoc) && !isExcluded(pivotDoc)) {
          val combined = combineGroups(mode, tieBreaker, groupSum, groupMax, numGroups)
          if (heap.size < k) heap.add(ScoredDoc(pivotDoc, combined))
          else if (combined > heap.peek().score) {
            heap.poll(); heap.add(ScoredDoc(pivotDoc, combined))
          }
        }
        j = 0
        while (j < m) { matched(j).next(); j += 1 }
      } else {
        j = 0
        while (j < pvt) {
          if (cursors(j).curDoc < pivotDoc) cursors(j).advanceTo(pivotDoc)
          j += 1
        }
      }
      live = cursors.count(!_.exhausted)
    }
    drain(heap)
  }

  /** [[scoreAll]] with per-FIELD grouped combination — the exhaustive
    * (every-match) form of [[topKFields]], behind scored-ALL surfaces.
    * Same accumulation order — bit-identical scores. */
  def scoreAllFields(
      blocks: Iterator[PostingBlock],
      infoById: Map[Long, FieldTermInfo],
      numGroups: Int,
      numTokens: Int,
      filterTermIds: Set[Long],
      filterAvgdl: Double,
      p: Bm25Params,
      tieBreaker: Double,
      mode: Int,
      excludeTermIds: Set[Long] = Set.empty,
      accept: Array[Long] = null,
      minShouldMatch: Int = 1): Iterator[ScoredDoc] = {
    if (accept != null && accept.isEmpty) return Iterator.empty
    val byTerm = blocks.toArray.groupBy(_.termId)
    val filters: Array[TermCursor] = filterTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks =>
        new TermCursor(tid, 0.0, blks.sortBy(_.firstDoc), filterAvgdl, p, exactBounds = true))
    }
    if (filters.length < filterTermIds.size) return Iterator.empty
    val excludes: Array[TermCursor] = excludeTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks =>
        new TermCursor(tid, 0.0, blks.sortBy(_.firstDoc), filterAvgdl, p, exactBounds = true))
    }
    val ids: Array[Long] = infoById.keysIterator.toArray.sorted
    val scored: Array[TermCursor] = ids.flatMap { tid =>
      byTerm.get(tid).map { blks =>
        val info = infoById(tid)
        new TermCursor(tid, info.idf, blks.sortBy(_.firstDoc), info.avgdl, p,
          exactBounds = false) // stored maxTfn used content avgdl; bounds unused here anyway
      }
    }
    if (scored.isEmpty) return Iterator.empty
    val groupOf: Array[Int] = scored.map(c => infoById(c.termId).group)
    val tokenOf: Array[Int] = scored.map(c => infoById(c.termId).token)
    def passesFilters(d: Long): Boolean = {
      var i = 0
      while (i < filters.length) {
        val f = filters(i)
        if (f.curDoc < d) f.advanceTo(d)
        if (f.curDoc != d) return false
        i += 1
      }
      true
    }
    def isExcluded(d: Long): Boolean = {
      var i = 0
      while (i < excludes.length) {
        val e = excludes(i)
        if (e.curDoc < d) e.advanceTo(d)
        if (e.curDoc == d) return true
        i += 1
      }
      false
    }
    val groupSum = new Array[Double](numGroups)
    val groupMax = new Array[Double](numGroups)
    val tokenHit = new Array[Boolean](numTokens)
    val out = scala.collection.mutable.ArrayBuffer.empty[ScoredDoc]
    var d = Long.MaxValue
    var i = 0
    while (i < scored.length) { if (scored(i).curDoc < d) d = scored(i).curDoc; i += 1 }
    while (d != Long.MaxValue) {
      java.util.Arrays.fill(groupSum, 0.0)
      java.util.Arrays.fill(groupMax, 0.0)
      java.util.Arrays.fill(tokenHit, false)
      var hits = 0
      i = 0
      while (i < scored.length) {
        if (scored(i).curDoc == d) {
          val sc = scored(i).score
          groupSum(groupOf(i)) += sc
          if (sc > groupMax(groupOf(i))) groupMax(groupOf(i)) = sc
          if (!tokenHit(tokenOf(i))) { tokenHit(tokenOf(i)) = true; hits += 1 }
        }
        i += 1
      }
      if (hits >= minShouldMatch &&
        (accept == null || java.util.Arrays.binarySearch(accept, d) >= 0) &&
        passesFilters(d) && !isExcluded(d))
        out += ScoredDoc(d, combineGroups(mode, tieBreaker, groupSum, groupMax, numGroups))
      var nd = Long.MaxValue
      i = 0
      while (i < scored.length) {
        val c = scored(i)
        if (c.curDoc == d) c.next()
        if (c.curDoc < nd) nd = c.curDoc
        i += 1
      }
      d = nd
    }
    out.iterator
  }

  /** Match set of a FILTER-ONLY bool query (ES filter context with no
    * scoring clause): the conjunction of the keyword-filter postings drives
    * the walk — docs in EVERY filter term's postings, not in any excluded
    * term's, passing the range accept set. The caller guarantees
    * `filterTermIds.nonEmpty` (a rangeless, filterless query has no cursor
    * to drive from and is answered from the docs relation instead). */
  def matchingConjunctive(
      blocks: Iterator[PostingBlock],
      filterTermIds: Set[Long],
      avgdl: Double,
      p: Bm25Params,
      excludeTermIds: Set[Long] = Set.empty,
      accept: Array[Long] = null): Iterator[Long] = {
    if (accept != null && accept.isEmpty) return Iterator.empty
    val byTerm = blocks.toArray.groupBy(_.termId)
    val reqIds = filterTermIds.toArray.sorted
    val req = new Array[TermCursor](reqIds.length)
    var i = 0
    while (i < reqIds.length) {
      byTerm.get(reqIds(i)) match {
        case Some(blks) =>
          req(i) = new TermCursor(reqIds(i), 0.0, blks.sortBy(_.firstDoc), avgdl, p, exactBounds = true)
        case None => return Iterator.empty
      }
      i += 1
    }
    val excludes: Array[TermCursor] = excludeTermIds.toArray.sorted.flatMap { tid =>
      byTerm.get(tid).map(blks =>
        new TermCursor(tid, 0.0, blks.sortBy(_.firstDoc), avgdl, p, exactBounds = true))
    }
    def isExcluded(d: Long): Boolean = {
      var j = 0
      while (j < excludes.length) {
        val e = excludes(j)
        if (e.curDoc < d) e.advanceTo(d)
        if (e.curDoc == d) return true
        j += 1
      }
      false
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var done = false
    while (!done) {
      var cand = Long.MinValue
      var j = 0
      while (j < req.length) { if (req(j).curDoc > cand) cand = req(j).curDoc; j += 1 }
      if (cand == Long.MaxValue) done = true
      else {
        var aligned = true
        j = 0
        while (j < req.length) {
          if (req(j).curDoc < cand) {
            req(j).advanceTo(cand); if (req(j).curDoc != cand) aligned = false
          }
          j += 1
        }
        if (aligned) {
          if ((accept == null || java.util.Arrays.binarySearch(accept, cand) >= 0) &&
            !isExcluded(cand)) out += cand
          j = 0
          while (j < req.length) { req(j).next(); j += 1 }
        }
      }
    }
    out.iterator
  }
}
