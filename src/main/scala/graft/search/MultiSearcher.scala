package graft.search

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{count => sqlCount}

import graft.index.{IndexMeta, Json, ParquetDirIO, PostingBlock, SegmentedIndex, SegmentsManifest, TableIO}

/** Top-k BM25 over a segmented index ([[graft.index.SegmentedIndex]]):
  * query-time multi-segment WAND/phrase kernels with EXACT global
  * statistics, run as ONE unioned plan.
  *
  * Segments hold disjoint document identities (the SegmentedIndex
  * invariant), so N, avgdl and per-term df are exact sums over segment
  * dictionaries, and per-document scores — summed in ascending termId
  * order, which inside every segment equals ascending term order — are
  * bit-identical to a fresh single-index build over the union corpus
  * (tested). The cross-segment tie-break is document identity, which in a
  * fresh build IS the docId order, so rankings match exactly too.
  *
  * Serving shape (the ES multi-shard fan-out analogue): all segments'
  * posting blocks are one segment-tagged unioned relation, so a query batch
  * is ONE kernel action regardless of segment count — blocks filter →
  * per-(segment, shard) kernel → per-(query, segment) top-k → collect
  * (≤ Σk·S rows) — at docId level ([[searchManyIds]]) that one action is the
  * whole query, the exact work shape of the single-segment
  * [[Searcher.searchMany]]; [[searchMany]] adds one tiny predicate scan of
  * the pinned docs relation to resolve the ≤ Σk·S candidate identities
  * (no broadcast exchange, no per-segment jobs). [[warm]] pins the unioned
  * blocks/docs and collects the per-segment dictionaries to a driver map, so
  * a warm query also skips the dictionary job — matching the single-segment
  * [[Searcher]]'s warm shape. Cold, the dictionary lookup is one more job
  * over the unioned terms relation (not one per segment).
  *
  * Per-segment block-max bounds: each segment's stored maxTfn was computed
  * with that segment's own avgdl; under the global avgdl the kernel derives
  * admissible bounds from (maxTf, minDl) instead (see
  * [[PostingBlock]] / Wand `exactBounds`). A segment whose build-time avgdl
  * happens to equal the global one (e.g. single-segment index) keeps the
  * tight stored bounds.
  *
  * Phrase queries (`"quoted spans"`, incl. mixed with loose terms and in
  * [[searchMany]] batches) run the conjunctive position-verified kernel for
  * their segment plans — every segment must be built with storePositions.
  */
class MultiSearcher(spark: SparkSession, dir: String, io: TableIO = ParquetDirIO) {
  import spark.implicits._

  private val segIndex = new SegmentedIndex(spark, dir)
  val manifest: SegmentsManifest = segIndex.manifest.getOrElse(
    throw new IllegalStateException(s"no segments.json under $dir"))
  private val segs: Seq[(String, IndexMeta)] = manifest.segments.map { e =>
    val d = segIndex.segmentDir(e.name)
    (d, Json.read(s"$d/meta.json", classOf[IndexMeta]))
  }
  require(segs.nonEmpty, s"segmented index at $dir has no segments")

  /** The content field's analyzer (identical across segments — it is part
    * of the configHash every segment shares). */
  private val contentSpec = segs.head._2.analyzerOf("content")
  private def ctokens(text: String): Array[String] =
    graft.analysis.AnalyzerSpec.queryTokens(contentSpec, text)

  val numDocs: Long = segs.map(_._2.numDocs).sum
  val sumDl: Long = segs.map(_._2.sumDl).sum
  def avgdl: Double = sumDl.toDouble / numDocs.toDouble
  private val p = Bm25Params(segs.head._2.k1, segs.head._2.b)
  private val allPositions = segs.forall(_._2.hasPositions)

  // ---- segment-tagged unioned relations, built once per searcher
  private def taggedUnion(sub: String, cols: Seq[String]): DataFrame =
    segs.zipWithIndex.map { case ((d, _), i) =>
      io.read(spark, s"$d/$sub").select(cols.map(col): _*).withColumn("seg", lit(i))
    }.reduce(_ unionByName _)

  private val blocksAll = taggedUnion("blocks", PostingBlock.columns)
  private val docsAll = taggedUnion("docs", Seq("docId", "repo", "path", "commit"))
  private val termsAll = taggedUnion("terms", Seq("term", "termId", "df"))

  /** per-segment driver dictionaries, populated by [[warm]] */
  @volatile private var dictMaps: Array[Map[String, (Long, Long)]] = _
  /** sorted DISTINCT content terms across all segments, built by [[warm]] —
    * the prefix-range expansion tier (see [[Searcher.prefixSlice]]) */
  @volatile private var sortedTerms: Array[String] = _

  /** Pin the unioned blocks and docs in executor memory and (when the total
    * dictionary fits) collect per-segment term dictionaries to the driver —
    * the segmented analogue of [[Searcher.warm]]. */
  def warm(maxDriverDictTerms: Long = 2_000_000L): this.type = {
    blocksAll.persist(); docsAll.persist()
    blocksAll.count(); docsAll.count()
    if (segs.map(_._2.numTerms).sum <= maxDriverDictTerms) {
      val rows = termsAll.select("seg", "term", "termId", "df").collect()
      val maps = Array.fill(segs.length)(Map.newBuilder[String, (Long, Long)])
      rows.foreach(r => maps(r.getInt(0)) += (r.getString(1) -> ((r.getLong(2), r.getLong(3)))))
      dictMaps = maps.map(_.result())
      sortedTerms = dictMaps.iterator.flatMap(_.keysIterator)
        .filter(!_.contains(':')).toArray.distinct.sorted
    }
    this
  }

  def cool(): Unit = {
    blocksAll.unpersist(); docsAll.unpersist(); dictMaps = null; sortedTerms = null
    hnswGraphs = Map.empty
  }

  /** One warm (segment, shard) HNSW graph. */
  private final case class SegShardGraph(seg: Int, shard: Long, graph: Hnsw.Graph)

  /** field → every segment's per-shard graphs — the segmented analogue of
    * [[Searcher.warmKnn]]'s driver tier (Lucene keeps per-SEGMENT graphs
    * resident the same way). */
  @volatile private var hnswGraphs: Map[String, Array[SegShardGraph]] = Map.empty

  /** Pin every segment's per-shard HNSW graphs in driver memory (bounded by
    * the total vector count like the driver dictionary). Warm [[knnHnsw]]
    * then walks the cached graphs driver-side — zero Spark jobs for
    * unfiltered queries, one accept-set job for filtered ones — with
    * results EXACTLY equal to the cold cogroup path (same graphs, same
    * [[Hnsw.searchFiltered]] policy, same merge order). */
  def warmKnn(field: String, maxDriverVectors: Long = 1_000_000L): Boolean = {
    require(segs.forall(_._2.hnswM > 0),
      "a segment was built without HNSW graphs (IndexConfig.hnswM = 0)")
    require(segs.head._2.denseVectors.contains(field),
      s"'$field' is not a dense_vector field of this index " +
        s"(have: ${segs.head._2.denseVectors.mkString(", ")})")
    if (hnswGraphs.contains(field)) return true
    val vecDf = taggedUnion("docs", Seq("docId", field))
      .select(col("seg"), col("docId"), col(field).cast("array<float>").as("v"))
      .filter(col("v").isNotNull)
    if (vecDf.count() > maxDriverVectors) return false
    val bySeg = Array.fill(segs.length)(new java.util.HashMap[Long, Array[Float]]())
    vecDf.as[(Int, Long, Array[Float])].collect()
      .foreach(t => bySeg(t._1).put(t._2, t._3))
    import scala.jdk.CollectionConverters._
    val gs = segs.indices.flatMap { sIdx =>
      val edges = io.read(spark, s"${segs(sIdx)._1}/hnsw_$field")
        .select("shard", "level", "docId", "neighbors")
        .as[Hnsw.Edge]
        .collect()
      val vm: collection.Map[Long, Array[Float]] = bySeg(sIdx).asScala
      edges.groupBy(_.shard).toSeq.sortBy(_._1).map { case (sh, es) =>
        SegShardGraph(sIdx, sh, Hnsw.fromEdges(es.toSeq, vm))
      }
    }.toArray
    hnswGraphs = hnswGraphs + (field -> gs)
    true
  }

  /** Per-segment term → (termId, df) for the given terms: zero jobs warm,
    * ONE job cold (unioned terms relation), never one job per segment. */
  private def lookup(terms: Seq[String]): Array[Map[String, (Long, Long)]] =
    if (terms.isEmpty) Array.fill(segs.length)(Map.empty)
    else if (dictMaps != null)
      dictMaps.map(m => terms.flatMap(t => m.get(t).map(t -> _)).toMap)
    else {
      val rows = termsAll.filter(col("term").isin(terms: _*))
        .select("seg", "term", "termId", "df").collect()
      val maps = Array.fill(segs.length)(Map.newBuilder[String, (Long, Long)])
      rows.foreach(r => maps(r.getInt(0)) += (r.getString(1) -> ((r.getLong(2), r.getLong(3)))))
      maps.map(_.result())
    }

  /** Dictionary terms matching each prefix across ALL segments (a term may
    * exist in only some segments) — the segmented analogue of
    * [[Searcher.expandPrefixMap]]. Warm: driver map scans; cold: one job
    * over the unioned terms relation. */
  private def expandPrefixMap(
      prefixes: Seq[String], maxExpansions: Int = 1024): Map[String, Array[String]] =
    if (prefixes.isEmpty) Map.empty
    else if (sortedTerms != null)
      // warm range tier: binary search + bounded scan (see Searcher)
      prefixes.map(pf =>
        pf -> Searcher.prefixSlice(sortedTerms, pf).take(maxExpansions)).toMap
    else {
      val matches: Array[String] =
        if (dictMaps != null)
          dictMaps.iterator.flatMap(_.keysIterator)
            .filter(t => !t.contains(':') && prefixes.exists(t.startsWith)).toArray.distinct
        else
          coldTermsScan(prefixes.map(Some(_)))
            .filter(prefixes.map(pf => col("term").startsWith(pf)).reduce(_ || _))
            .select("term").distinct().as[String].collect()
      val sorted = matches.sorted
      prefixes.map(pf => pf -> sorted.filter(_.startsWith(pf)).take(maxExpansions)).toMap
    }

  /** Unioned terms relation pre-filtered for a pattern scan — the segmented
    * [[Searcher]]`.coldTermsScan`: range-restricted when every pattern has a
    * literal prefix. */
  private def coldTermsScan(litPrefixes: Seq[Option[String]]): DataFrame = {
    val base = termsAll.filter(!col("term").contains(":"))
    Searcher.rangePredOf(litPrefixes.map(_.getOrElse(""))) match {
      case Some(pred) => base.filter(pred)
      case None => base
    }
  }

  /** Dictionary terms within the edit bound of each fuzzy stem across ALL
    * segments — the segmented analogue of [[Searcher.expandFuzzyMap]].
    * Warm: driver map scans; cold: one job over the unioned terms. */
  private def expandFuzzyMap(
      fuzzies: Seq[(String, Int)],
      maxExpansions: Int = 1024): Map[(String, Int), Array[String]] =
    if (fuzzies.isEmpty) Map.empty
    else {
      val matches: Array[String] =
        if (sortedTerms != null)
          // warm automaton tier over the cross-segment sorted dictionary
          // (see [[Searcher.fuzzyWalk]])
          fuzzies.flatMap { case (st, b) =>
            Searcher.fuzzyWalk(sortedTerms, st, b)._1
          }.distinct.toArray
        else if (dictMaps != null)
          dictMaps.iterator.flatMap(_.keysIterator)
            .filter(t => !t.contains(':') &&
              fuzzies.exists { case (st, b) => Searcher.editWithin(st, t, b) })
            .toArray.distinct
        else
          termsAll.filter(!col("term").contains(":") &&
              fuzzies.map { case (st, b) =>
                length(col("term")).between(st.length - b, st.length + b) &&
                  levenshtein(col("term"), lit(st)) <= b }.reduce(_ || _))
            .select("term").distinct().as[String].collect()
      val sorted = matches.sorted
      fuzzies.map { case (st, b) =>
        (st, b) -> sorted.filter(t => Searcher.editWithin(st, t, b)).take(maxExpansions)
      }.toMap
    }

  /** Dictionary terms full-matching each anchored regex across ALL
    * segments — the shared engine of the segmented wildcard/regexp
    * expansions (see [[Searcher.expandWildcardMap]]). */
  private def expandRegexMap(
      regexes: Seq[String], maxExpansions: Int): Map[String, Array[String]] =
    if (regexes.isEmpty) Map.empty
    else {
      val compiled = regexes.map(r => r -> java.util.regex.Pattern.compile(r)).toMap
      val litPfx: Map[String, String] =
        regexes.map(r => r -> Searcher.literalPrefixOfRegex(r)).toMap
      val matches: Array[String] =
        if (sortedTerms != null && regexes.forall(r => litPfx(r).nonEmpty))
          regexes.flatMap(r => Searcher.prefixSlice(sortedTerms, litPfx(r))
            .filter(t => compiled(r).matcher(t).matches())).distinct.toArray
        else if (dictMaps != null)
          dictMaps.iterator.flatMap(_.keysIterator)
            .filter(t => !t.contains(':') &&
              compiled.valuesIterator.exists(_.matcher(t).matches()))
            .toArray.distinct
        else
          coldTermsScan(regexes.map(r => Some(litPfx(r))))
            .filter(regexes.map(r => col("term").rlike(s"^(?:$r)$$")).reduce(_ || _))
            .select("term").distinct().as[String].collect()
      val sorted = matches.sorted
      regexes.map(r =>
        r -> sorted.filter(t => compiled(r).matcher(t).matches()).take(maxExpansions)).toMap
    }

  private def expandWildcardMap(
      globs: Seq[String], maxExpansions: Int = 1024): Map[String, Array[String]] = {
    val rx = globs.map(g => g -> Searcher.globToRegex(g)).toMap
    val m = expandRegexMap(rx.values.toSeq.distinct, maxExpansions)
    globs.map(g => g -> m(rx(g))).toMap
  }

  /** Every expanded scored term of the query's pattern clauses, across all
    * segment dictionaries — the segmented [[Searcher]]`.expandAll`. */
  private def expandAllSeg(pqs: Seq[Searcher.ParsedQuery]): Searcher.ParsedQuery => Array[String] = {
    val prefixMap = expandPrefixMap(pqs.flatMap(_.prefixes.toSeq).distinct)
    val fuzzyMap = expandFuzzyMap(pqs.flatMap(_.fuzzies.toSeq).distinct)
    val wildMap = expandWildcardMap(pqs.flatMap(_.wildcards.toSeq).distinct)
    val reMap = expandRegexMap(pqs.flatMap(_.regexps.toSeq).distinct, 1024)
    pq => pq.prefixes.flatMap(prefixMap.apply) ++ pq.fuzzies.flatMap(fuzzyMap.apply) ++
      pq.wildcards.flatMap(wildMap.apply) ++ pq.regexps.flatMap(reMap.apply)
  }

  /** Top-k, ordered (score desc, identity asc); identity-keyed results. */
  def search(query: String, k: Int): Array[ScoredHit] = searchMany(Seq(query -> k)).head

  /** Parse + plan a query batch: per-(query, segment) kernel plans with
    * EXACT global statistics (df summed over segment dictionaries — disjoint
    * identities). Zero Spark jobs warm, one dictionary job cold. */
  private def planQueries(
      queries: Seq[(String, Int)]): (Seq[MultiSearcher.SegPlan], Double) = {
    import MultiSearcher.SegPlan
    val kw = segs.head._2.keywords.toSet
    val parsed = queries.map { case (q, _) => Searcher.parseFull(q, kw, contentSpec) }
    if (parsed.exists(_.phrases.nonEmpty) && !allPositions)
      throw new IllegalStateException(
        "phrase query but a segment was built without positions (storePositions=false)")

    val expand = expandAllSeg(parsed)
    def effTerms(pq: Searcher.ParsedQuery): Array[String] =
      (pq.terms ++ expand(pq)).distinct
    val allTerms = parsed.flatMap(pq =>
      effTerms(pq).toSeq ++ pq.filters.toSeq ++ pq.phrases.flatten.toSeq ++
        pq.allExcluded.toSeq).distinct
    if (allTerms.isEmpty) return (Nil, avgdl)
    val dicts = lookup(allTerms)

    // exact global df = sum over segment dictionaries (disjoint identities)
    val globalDf: Map[String, Long] =
      allTerms.map(t => t -> dicts.map(_.get(t).map(_._2).getOrElse(0L)).sum).toMap
    val idfByTerm: Map[String, Double] = globalDf.collect {
      case (t, df) if df > 0 => t -> BM25.idf(numDocs, df)
    }
    val gAvgdl = avgdl

    val plans: Seq[SegPlan] = parsed.zip(queries).zipWithIndex.flatMap {
      case ((pq, (_, k)), qi) =>
        val phraseTerms = pq.phrases.flatten.distinct
        // conjunctive globally: a phrase token with no postings anywhere
        if (phraseTerms.exists(t => !idfByTerm.contains(t))) Nil
        else segs.indices.flatMap { s =>
          val dict = dicts(s)
          val filterIds = pq.filters.flatMap(f => dict.get(f).map(_._1))
          // every phrase term and filter term must exist in THIS segment
          if (phraseTerms.exists(t => !dict.contains(t)) ||
            filterIds.length < pq.filters.length) Nil
          else {
            // per-query boost folds into the plan's idf (global idf values
            // stay shared across queries; boost scales a term's
            // contribution AND its WAND bound — still admissible)
            val phraseIdf: Map[Long, Double] =
              phraseTerms.map(t => dict(t)._1 -> idfByTerm(t) * pq.boostOf(t)).toMap
            val loose: Map[Long, Double] = effTerms(pq)
              .flatMap(t => dict.get(t).map(st => (st._1, t)))
              .collect { case (tid, t) if !phraseIdf.contains(tid) && idfByTerm.contains(t) =>
                tid -> idfByTerm(t) * pq.boostOf(t)
              }.toMap
            // ES must_not: segment-local ids of the excluded terms — a term
            // absent from THIS segment excludes nothing here
            val excl: Set[Long] = pq.allExcluded.flatMap(t => dict.get(t).map(_._1)).toSet
            if (phraseIdf.isEmpty && loose.isEmpty) Nil
            else Seq(SegPlan(qi, s, loose, filterIds.toSet, k,
              pq.phrases.map(ph => ph.map(t => dict(t)._1).toSeq).toSeq, phraseIdf,
              exactBounds = segs(s)._2.avgdl == gAvgdl, excludeIds = excl,
              ranges = pq.ranges.toSeq, phraseSlops = pq.slops.toSeq))
          }
        }
    }
    (plans, gAvgdl)
  }

  /** Batch search: the whole query set — terms, filters, phrases, mixed —
    * in one pass. Results identical to calling [[search]] per query. */
  def searchMany(queries: Seq[(String, Int)]): Seq[Array[ScoredHit]] = {
    val (plans, gAvgdl) = planQueries(queries)
    if (plans.isEmpty) return queries.map(_ => Array.empty[ScoredHit])
    val kByIdx: Map[Int, Int] = plans.map(pl => pl.qIdx -> pl.k).toMap
    resolveHits(kernelTopK(plans, gAvgdl, p), queries.length, kByIdx)
  }

  /** Identity resolution + driver-side final merge shared by the scored
    * entry points: one tiny predicate scan of the PINNED docs relation for
    * the ≤ Σk·S collected candidates (no broadcast exchange, no recompute
    * of the kernel plan), then per-query merge where the cross-segment
    * tie-break is document identity — which in a fresh single build IS the
    * docId order, so rankings are rank-identical to a fresh build. */
  private def resolveHits(perSeg: Array[(Int, Int, Long, Double)], nQueries: Int,
      kByIdx: Map[Int, Int]): Seq[Array[ScoredHit]] = {
    if (perSeg.isEmpty) return Seq.fill(nQueries)(Array.empty[ScoredHit])
    val bySegIds: Map[Int, Array[Long]] =
      perSeg.groupBy(_._2).map { case (s, rs) => s -> rs.map(_._3).distinct }
    val idPred = bySegIds.map { case (s, ids) =>
      col("seg") === s && col("docId").isin(ids.map(Long.box): _*)
    }.reduce(_ || _)
    val idents: Map[(Int, Long), (String, String, String)] =
      docsAll.filter(idPred).select("seg", "docId", "repo", "path", "commit").collect()
        .map(r => (r.getInt(0), r.getLong(1)) ->
          ((r.getString(2), r.getString(3), r.getString(4)))).toMap

    val byQuery = perSeg.groupBy(_._1)
    (0 until nQueries).map { qi =>
      byQuery.getOrElse(qi, Array.empty)
        .map { case (_, s, d, score) =>
          val (repo, path, commit) = idents((s, d))
          ScoredHit(repo, path, commit, score)
        }
        .sortBy(h => (-h.score, h.repo, h.path, h.commit))
        .take(kByIdx.getOrElse(qi, 0))
    }
  }

  /** docId-level batch search — ONE Spark action regardless of segment
    * count, the exact work shape of the single-segment
    * [[Searcher.searchMany]] (no identity resolution). Returns per query the
    * global top-k as (segment, docId, score), ordered by (score desc,
    * segment asc, docId asc): inside a segment docId order IS identity
    * order, but an EXACT score tie across two segments orders by segment
    * here rather than by identity — use [[searchMany]] where the
    * identity-resolved ES-style ordering contract matters. */
  def searchManyIds(queries: Seq[(String, Int)]): Seq[Array[(Int, ScoredDoc)]] = {
    val (plans, gAvgdl) = planQueries(queries)
    if (plans.isEmpty) return queries.map(_ => Array.empty[(Int, ScoredDoc)])
    val kByIdx: Map[Int, Int] = plans.map(pl => pl.qIdx -> pl.k).toMap
    val byQuery = kernelTopK(plans, gAvgdl, p).groupBy(_._1)
    queries.indices.map { qi =>
      byQuery.getOrElse(qi, Array.empty)
        .sortBy(t => (-t._4, t._2, t._3))
        .take(kByIdx.getOrElse(qi, 0))
        .map(t => (t._2, ScoredDoc(t._3, t._4)))
    }
  }

  /** ES `nested` query over the segmented index — [[Searcher.searchNested]]
    * semantics, exact across segments: top-k BM25 over `query` (global
    * statistics) restricted to documents where ONE element of the nested
    * `path` column satisfies ALL `clauses` (same-element verification
    * against each segment's stored column). An empty/filter-only `query` is
    * pure filter context: constant score 0, identity order. Two-phase plan
    * per the single-segment contract: per-segment candidate conjunction over
    * the `path.sub:value` candidate terms' postings, same-element verify on
    * the column-pruned (seg, docId, path) docs scan, then the verified set
    * rides the kernels' accept path (statistics untouched). */
  def searchNested(query: String, path: String, clauses: Seq[(String, String)], k: Int,
      minShouldMatch: Int = 1): Array[ScoredHit] = {
    require(segs.head._2.nested.contains(path),
      s"'$path' is not a nested field of this index (have: ${segs.head._2.nested.mkString(", ")})")
    require(clauses.nonEmpty, "nested query needs at least one (subField, value) clause")
    val ct = clauses.map { case (sub, v) => s"$path.$sub:$v" }.distinct
    val dicts = lookup(ct)
    val candPlans: Seq[MultiSearcher.SegPlan] = segs.indices.flatMap { s =>
      val ids = ct.flatMap(dicts(s).get).map(_._1)
      if (ids.length < ct.length) Nil // a missing candidate term matches nothing in this segment
      else Seq(MultiSearcher.SegPlan(0, s, Map.empty, ids.toSet, k, Nil, Map.empty,
        exactBounds = true))
    }
    if (candPlans.isEmpty) return Array.empty
    val samePred = exists(col(path), e =>
      clauses.map { case (sub, v) => e.getField(sub).cast("string") === lit(v) }
        .reduce(_ && _))
    val verified: Dataset[(Int, Int, Long)] =
      taggedUnion("docs", Seq("docId", path))
        .join(runMatchKernels(candPlans, avgdl).toDF("seg", "docId"), Seq("seg", "docId"))
        .filter(samePred)
        .select(lit(0).cast("int").as("q"), col("seg"), col("docId"))
        .as[(Int, Int, Long)]

    val kw = segs.head._2.keywords.toSet
    val pq = Searcher.parseFull(query, kw, contentSpec)
    if (!pq.hasScoringClauses && pq.phrases.isEmpty) {
      // pure filter context (match_all / keyword filters / ranges only):
      // every verified match at constant score 0, identity order
      val m = matchedSegDoc(query, minShouldMatch)
      val rows = m.join(verified.toDF("q", "seg", "docId").drop("q"), Seq("seg", "docId"),
          "left_semi")
        .join(docsAll, Seq("seg", "docId"))
        .select("repo", "path", "commit")
        .orderBy("repo", "path", "commit").limit(k).collect()
      return rows.map(r => ScoredHit(r.getString(0), r.getString(1), r.getString(2), 0.0))
    }

    val (plans0, gAvgdl) = planQueries(Seq(query -> k))
    if (plans0.isEmpty) return Array.empty
    // a query-level range filter must INTERSECT the verified set (the
    // accept channel is one set per query) — pre-intersect here, then strip
    // ranges from the plans so acceptsKV doesn't re-add them disjunctively
    val preIntersected: Dataset[(Int, Int, Long)] =
      if (pq.ranges.isEmpty) verified
      else {
        val fields = pq.ranges.map(_.field).distinct.toSeq
        val passing = taggedUnion("docs", Seq("docId") ++ fields)
          .filter(pq.ranges.map(_.pred).reduce(_ && _))
          .select("seg", "docId")
        verified.toDF("q", "seg", "docId")
          .join(passing, Seq("seg", "docId"), "left_semi")
          .as[(Int, Int, Long)]
      }
    val plans = plans0.map(_.copy(ranges = Nil, needsAccept = true,
      minShouldMatch = minShouldMatch))
    val kByIdx: Map[Int, Int] = plans.map(pl => pl.qIdx -> pl.k).toMap
    resolveHits(kernelTopK(plans, gAvgdl, p, Some(preIntersected)), 1, kByIdx).head
  }

  /** ES `match_phrase` with Lucene phrase-frequency scoring over the
    * segmented index — [[Searcher.matchPhrase]] semantics with EXACT global
    * statistics (idfSum from global df, tf-norm against the global avgdl),
    * so results equal a fresh single build. Conjunctive: a segment missing
    * any phrase token contributes nothing; a token with no postings
    * anywhere → empty. */
  def matchPhrase(phrase: String, k: Int,
      luceneScoring: Boolean = true): Array[ScoredHit] = {
    if (!allPositions) throw new IllegalStateException(
      "phrase query but a segment was built without positions (storePositions=false)")
    val toks = ctokens(phrase)
    require(toks.nonEmpty, "match_phrase analyzes to nothing")
    val dicts = lookup(toks.distinct)
    val globalDf: Map[String, Long] =
      toks.distinct.map(t => t -> dicts.map(_.get(t).map(_._2).getOrElse(0L)).sum).toMap
    if (globalDf.valuesIterator.exists(_ == 0L)) return Array.empty
    val gAvgdl = avgdl
    // Lucene PhraseQuery weight: idf summed over token OCCURRENCES
    val idfSum = toks.map(t => BM25.idf(numDocs, globalDf(t))).sum
    val plans = segs.indices.flatMap { s =>
      val dict = dicts(s)
      if (toks.exists(t => !dict.contains(t))) Nil
      else {
        val idf: Map[Long, Double] =
          toks.distinct.map(t => dict(t)._1 -> BM25.idf(numDocs, globalDf(t))).toMap
        Seq(MultiSearcher.SegPlan(0, s, Map.empty, Set.empty, k,
          Seq(toks.map(t => dict(t)._1)), idf,
          exactBounds = segs(s)._2.avgdl == gAvgdl, phraseSlops = Seq(0),
          phraseFreqIdf = if (luceneScoring) Seq(idfSum) else Nil))
      }
    }
    if (plans.isEmpty) return Array.empty
    resolveHits(kernelTopK(plans, gAvgdl, p), 1, Map(0 -> k)).head
  }

  /** Lucene/ES `span_near` over the segmented index —
    * [[Searcher.searchSpanNear]] semantics with exact global statistics.
    * Conjunctive: a segment missing any term contributes nothing; a term
    * with no postings anywhere → empty. */
  def searchSpanNear(terms: Seq[String], slop: Int, inOrder: Boolean,
      k: Int): Array[ScoredHit] = {
    require(slop >= 0, s"slop must be >= 0 (got $slop)")
    spanSearch(terms, slop, inOrder, -1, k)
  }

  /** Lucene/ES `span_first` over the segmented index —
    * [[Searcher.searchSpanFirst]] semantics with exact global statistics. */
  def searchSpanFirst(terms: Seq[String], end: Int, k: Int,
      slop: Int = 0): Array[ScoredHit] = {
    require(end > 0, s"end must be > 0 (got $end)")
    spanSearch(terms, slop, inOrder = true, end, k)
  }

  private def spanSearch(terms: Seq[String], slop: Int, inOrder: Boolean,
      end: Int, k: Int): Array[ScoredHit] = {
    require(terms.nonEmpty, "span query needs at least one term")
    if (!allPositions) throw new IllegalStateException(
      "span query but a segment was built without positions (storePositions=false)")
    val toks = terms.flatMap(t => ctokens(t))
    require(toks.nonEmpty, "span query terms analyze to nothing")
    val dicts = lookup(toks.distinct)
    // exact global df (disjoint segment identities); conjunctive globally
    val globalDf: Map[String, Long] =
      toks.distinct.map(t => t -> dicts.map(_.get(t).map(_._2).getOrElse(0L)).sum).toMap
    if (globalDf.valuesIterator.exists(_ == 0L)) return Array.empty
    val gAvgdl = avgdl
    val plans = segs.indices.flatMap { s =>
      val dict = dicts(s)
      if (toks.exists(t => !dict.contains(t))) Nil // conjunctive in this segment
      else {
        val idf: Map[Long, Double] =
          toks.distinct.map(t => dict(t)._1 -> BM25.idf(numDocs, globalDf(t))).toMap
        Seq(MultiSearcher.SegPlan(0, s, Map.empty, Set.empty, k,
          Seq(toks.map(t => dict(t)._1)), idf,
          exactBounds = segs(s)._2.avgdl == gAvgdl,
          phraseSlops = Seq(slop), phraseOrdered = Seq(inOrder), phraseEnds = Seq(end)))
      }
    }
    if (plans.isEmpty) return Array.empty
    resolveHits(kernelTopK(plans, gAvgdl, p), 1, Map(0 -> k)).head
  }

  /** ES 8 `knn` over the segmented index — [[Searcher.knn]] semantics.
    * Cosine needs no corpus statistics, so scores are identical to a fresh
    * single-index build; with `nprobe > 0` each segment probes its OWN
    * quantizer's nearest cells (Lucene builds per-segment vector
    * structures the same way), so the candidate set is the union of
    * per-segment probes and the exact re-rank stays global. */
  def knn(field: String, queryVec: Array[Float], k: Int, filter: String = "",
      nprobe: Int = 0): Array[ScoredHit] = {
    require(k > 0, "k must be > 0")
    require(segs.head._2.denseVectors.contains(field),
      s"'$field' is not a dense_vector field of this index " +
        s"(have: ${segs.head._2.denseVectors.mkString(", ")})")
    val ivfCol = s"_ivf_$field"
    var base = taggedUnion("docs",
      Seq("docId", field) ++ (if (nprobe > 0) Seq(ivfCol) else Nil))
    if (filter.nonEmpty)
      base = base.join(matchedSegDoc(filter), Seq("seg", "docId"), "left_semi")
    if (nprobe > 0) {
      require(segs.forall(_._2.ivfQuantCells > 0),
        "nprobe > 0 but a segment was built without an IVF quantizer (ivfCells = 0)")
      val pred = segs.indices.map { s =>
        val cents = io.read(spark, s"${segs(s)._1}/ivf_$field")
          .select("cell", "centroid").as[(Int, Array[Float])]
          .collect().sortBy(_._1).map(_._2)
        val cells = cents.indices
          .sortBy(c => (-Ann.cosine(queryVec, cents(c)), c)).take(nprobe)
        col("seg") === s && col(ivfCol).isin(cells.map(Int.box): _*)
      }.reduce(_ || _)
      base = base.filter(pred)
    }
    val bq = spark.sparkContext.broadcast(queryVec)
    val top = base
      .select(col("seg"), col("docId"), col(field).cast("array<float>").as("v"))
      .filter(col("v").isNotNull)
      .as[(Int, Long, Array[Float])]
      .map { case (s, id, v) => (s, id, Ann.cosine(v, bq.value)) }
      .toDF("seg", "docId", "score")
      .orderBy(desc("score"), asc("seg"), asc("docId"))
      .limit(k)
      .as[(Int, Long, Double)]
      .collect()
    resolveHits(top.map(t => (0, t._1, t._2, t._3)), 1, Map(0 -> k)).head
  }

  /** ES 8 `knn` over the segments' per-shard HNSW graphs —
    * [[Searcher.knnHnsw]] semantics across segments: every (segment, shard)
    * graph is walked in its own task (ONE cogroup over the tagged unions),
    * candidates carry exact cosines, and the global top-k merges them.
    * Lucene searches per-segment HNSW graphs the same way. */
  def knnHnsw(field: String, queryVec: Array[Float], k: Int, ef: Int = 100,
      filter: String = ""): Array[ScoredHit] = {
    require(k > 0, "k must be > 0")
    require(segs.forall(_._2.hnswM > 0),
      "a segment was built without HNSW graphs (IndexConfig.hnswM = 0)")
    require(segs.head._2.denseVectors.contains(field),
      s"'$field' is not a dense_vector field of this index " +
        s"(have: ${segs.head._2.denseVectors.mkString(", ")})")
    val efEff = math.max(ef, k)
    val dpsBySeg: Array[Long] = segs.map(_._2.docsPerShard).toArray

    // ---- warm driver tier (see [[warmKnn]]): per-(segment, shard) graphs
    // resident driver-side; identical ranking to the cold cogroup below.
    val warmGs = hnswGraphs.get(field)
    if (warmGs.isDefined) {
      val gs = warmGs.get
      // accept sets per segment: sorted docId arrays from the filter's
      // (seg, docId) match set — one Spark job, only when filtered
      val acceptBySeg: Array[Array[Long]] =
        if (filter.isEmpty) null
        else {
          val rows = matchedSegDoc(filter).select("seg", "docId")
            .as[(Int, Long)].collect()
          val arr = Array.fill(segs.length)(Array.newBuilder[Long])
          rows.foreach(t => arr(t._1) += t._2)
          arr.map { b => val a = b.result(); java.util.Arrays.sort(a); a }
        }
      def lowerBound(a: Array[Long], x: Long): Int = {
        var lo = 0; var hi = a.length
        while (lo < hi) { val mid = (lo + hi) >>> 1; if (a(mid) < x) lo = mid + 1 else hi = mid }
        lo
      }
      val perShard = new Array[Array[(Int, Long, Double)]](gs.length)
      java.util.stream.IntStream.range(0, gs.length).parallel().forEach { i =>
        val g = gs(i)
        val dps = dpsBySeg(g.seg)
        val acc: Array[Long] =
          if (acceptBySeg == null) null
          else {
            val segAcc = acceptBySeg(g.seg)
            val lo = lowerBound(segAcc, g.shard * dps)
            val hi = lowerBound(segAcc, (g.shard + 1) * dps)
            java.util.Arrays.copyOfRange(segAcc, lo, hi)
          }
        perShard(i) =
          if (acc != null && acc.isEmpty) Array.empty
          else Hnsw.searchFiltered(g.graph, queryVec, k, efEff, acc)
            .map(sd => (g.seg, sd.docId, sd.score))
      }
      val top = perShard.iterator.flatten.toArray
        .sortBy(t => (-t._3, t._1, t._2)).take(k)
      return resolveHits(top.map(t => (0, t._1, t._2, t._3)), 1, Map(0 -> k)).head
    }

    val hasFilter = filter.nonEmpty
    var vecs = taggedUnion("docs", Seq("docId", field))
      .select(col("seg"), col("docId"), col(field).cast("array<float>").as("v"))
      .filter(col("v").isNotNull)
    vecs =
      if (filter.isEmpty) vecs.withColumn("acc", lit(true))
      else vecs.join(matchedSegDoc(filter).withColumn("acc", lit(true)),
        Seq("seg", "docId"), "left")
    val edgesKV = segs.indices.map { s =>
      io.read(spark, s"${segs(s)._1}/hnsw_$field")
        .select(lit(s).as("seg"), col("shard"), col("level"), col("docId"), col("neighbors"))
    }.reduce(_ unionByName _)
      .as[(Int, Long, Int, Long, Array[Long])]
      .groupByKey(t => (t._1, t._2))
    val vecsKV = vecs
      .select(col("seg"), col("docId"), col("v"), coalesce(col("acc"), lit(false)).as("acc"))
      .as[(Int, Long, Array[Float], Boolean)]
      .groupByKey(t => (t._1, t._2 / dpsBySeg(t._1)))
    val bq = spark.sparkContext.broadcast(queryVec)
    val kk = k
    val top = edgesKV.cogroup(vecsKV) { (key, es, vs) =>
      val rows = vs.toArray
      if (rows.isEmpty) Iterator.empty
      else {
        val vecById = rows.iterator.map(r => r._2 -> r._3).toMap
        val accepted: Array[Long] =
          if (!hasFilter) null
          else {
            val a = rows.iterator.filter(_._4).map(_._2).toArray
            java.util.Arrays.sort(a)
            a
          }
        if (accepted != null && accepted.isEmpty) Iterator.empty
        else {
          val g = Hnsw.fromEdges(
            es.map(e => Hnsw.Edge(e._2, e._3, e._4, e._5)).toSeq, vecById)
          Hnsw.searchFiltered(g, bq.value, kk, efEff, accepted).iterator
            .map(sd => (key._1, sd.docId, sd.score))
        }
      }
    }
      .toDF("seg", "docId", "score")
      .orderBy(desc("score"), asc("seg"), asc("docId"))
      .limit(k)
      .as[(Int, Long, Double)]
      .collect()
    resolveHits(top.map(t => (0, t._1, t._2, t._3)), 1, Map(0 -> k)).head
  }

  /** ES hybrid search (RRF retriever) over the segmented index —
    * [[Searcher.hybridRrf]] semantics, fused on DOCUMENT IDENTITY (the
    * only cross-segment-stable key). Both branches are already exact
    * w.r.t. a fresh single build, so the fused ranking is too. */
  def hybridRrf(query: String, field: String, queryVec: Array[Float], k: Int,
      windowSize: Int = 100, rankConstant: Int = 60,
      filter: String = "",
      /** > 0: vector branch through the per-segment HNSW graphs with this
        * beam width ([[Searcher.hybridRrf]]); 0 = exact cosine branch. */
      hnswEf: Int = 0): Array[ScoredHit] = {
    require(k > 0 && windowSize >= k,
      s"need windowSize >= k > 0 (got k=$k, windowSize=$windowSize)")
    require(rankConstant >= 1, s"rankConstant must be >= 1 (got $rankConstant)")
    // filter is FILTER CONTEXT (score-neutral, ES retriever-tree semantics):
    // its (seg, docId) match set rides the scored kernels' accept channel —
    // candidates restricted, global statistics and BM25 scores untouched.
    // The knn branch resolves the same match set via its own semi-join.
    val textRank =
      if (filter.isEmpty) search(query, windowSize)
      else {
        val (plans0, gAvgdl) = planQueries(Seq(query -> windowSize))
        if (plans0.isEmpty) Array.empty[ScoredHit]
        else {
          val acc0 = matchedSegDoc(filter)
            .select(lit(0).cast("int").as("q"), col("seg"), col("docId"))
            .as[(Int, Int, Long)]
          // a range filter inside the TEXT query must INTERSECT the accept
          // set (the channel is one set per query) — pre-intersect and strip,
          // as searchNested does
          val pqT = Searcher.parseFull(query, segs.head._2.keywords.toSet, contentSpec)
          val acc =
            if (pqT.ranges.isEmpty) acc0
            else {
              val fields = pqT.ranges.map(_.field).distinct.toSeq
              val passing = taggedUnion("docs", Seq("docId") ++ fields)
                .filter(pqT.ranges.map(_.pred).reduce(_ && _))
                .select("seg", "docId")
              acc0.toDF("q", "seg", "docId")
                .join(passing, Seq("seg", "docId"), "left_semi")
                .as[(Int, Int, Long)]
            }
          val plans = plans0.map(_.copy(ranges = Nil, needsAccept = true))
          resolveHits(kernelTopK(plans, gAvgdl, p, Some(acc)), 1,
            Map(0 -> windowSize)).head
        }
      }
    val knnRank =
      if (hnswEf > 0) knnHnsw(field, queryVec, windowSize, hnswEf, filter)
      else knn(field, queryVec, windowSize, filter)
    val fused = new java.util.HashMap[(String, String, String), Double]()
    def add(ranking: Array[ScoredHit]): Unit = {
      var i = 0
      while (i < ranking.length) {
        val h = ranking(i)
        fused.merge((h.repo, h.path, h.commit), 1.0 / (rankConstant + i + 1), (a, b) => a + b)
        i += 1
      }
    }
    add(textRank); add(knnRank)
    import scala.jdk.CollectionConverters._
    fused.entrySet().asScala.toArray
      .map(e => ScoredHit(e.getKey._1, e.getKey._2, e.getKey._3, e.getValue))
      .sortBy(h => (-h.score, h.repo, h.path, h.commit))
      .take(k)
  }

  /** One action: blocks filter → per-(seg, shard) kernels → per-(query,
    * segment) top-k (docId tie-break — identical to identity order inside a
    * segment) → collect. Output is ≤ k per (query, segment): driver-bounded
    * by Σk·S, independent of shard count. */
  private def kernelTopK(plans: Seq[MultiSearcher.SegPlan], gAvgdl: Double,
      params: Bm25Params,
      extraAccept: Option[Dataset[(Int, Int, Long)]] = None): Array[(Int, Int, Long, Double)] = {
    val plansBySeg: Map[Int, Seq[MultiSearcher.SegPlan]] = plans.groupBy(_.seg)
    val kByIdx: Map[Int, Int] = plans.map(pl => pl.qIdx -> pl.k).toMap

    def run(s: Int, blocks: Iterator[PostingBlock],
        acceptByQ: Map[Int, Array[Long]]): Iterator[(Int, Int, Long, Double)] = {
      val arr = blocks.toArray
      plansBySeg(s).iterator.flatMap { pl =>
        val subset = arr.iterator.filter(b => pl.wantsBlock(b.termId))
        val accept =
          if (!pl.usesAccept) null
          else acceptByQ.getOrElse(pl.qIdx, Array.empty[Long])
        val hits =
          if (pl.phraseIdSeqs.nonEmpty)
            Phrase.topK(subset, pl.phraseIdSeqs.map(_.toArray).toArray, pl.phraseSlops.toArray,
              pl.phraseIdfById, pl.idfById, pl.filterIds, gAvgdl, params, pl.k,
              pl.excludeIds, accept,
              phraseOrdered = if (pl.phraseOrdered.isEmpty) null else pl.phraseOrdered.toArray,
              phraseEnds = if (pl.phraseEnds.isEmpty) null else pl.phraseEnds.toArray,
              phraseFreqIdf = if (pl.phraseFreqIdf.isEmpty) null else pl.phraseFreqIdf.toArray)
          else Wand.topK(subset, pl.idfById, pl.filterIds, gAvgdl, params, pl.k,
            pl.exactBounds, pl.excludeIds, accept, minShouldMatch = pl.minShouldMatch)
        hits.map(sd => (pl.qIdx, s, sd.docId, sd.score))
      }
    }

    val grouped = segBlocks(plansBySeg)
    val perSeg = acceptsKV(plans, extraAccept) match {
      case None =>
        grouped.flatMapGroups { (key, it) => run(key._1, it.map(_._2), Map.empty) }
      case Some(acc) =>
        grouped.cogroup(acc) { (key, it, accIt) =>
          run(key._1, it.map(_._2), MultiSearcher.acceptArrays(accIt))
        }
    }
    perSeg
      .groupByKey(t => (t._1, t._2))
      .flatMapGroups { (_, it) =>
        val arr = it.toArray
        val k = kByIdx(arr(0)._1)
        arr.sortBy(t => (-t._4, t._3)).take(k).iterator
      }
      .collect()
  }

  /** The segment-tagged blocks relation filtered to the plans' termIds,
    * grouped by (segment, shard) — the kernel-input shape. */
  private def segBlocks(plansBySeg: Map[Int, Seq[MultiSearcher.SegPlan]]) = {
    val pred = plansBySeg.map { case (s, pls) =>
      val ids = pls.flatMap(_.allTermIds).distinct
      col("seg") === s && col("termId").isin(ids.map(Long.box): _*)
    }.reduce(_ || _)
    blocksAll.filter(pred)
      .select(col("seg").as("_1"), struct(PostingBlock.columns.map(col): _*).as("_2"))
      .as[(Int, PostingBlock)]
      .groupByKey { case (s, b) => (s, b.shard) }
  }

  /** qIdx-tagged range-accept rows for every ranged query, keyed by
    * (segment, shard) for the kernel cogroup — ONE unioned scan of the
    * segments' docs relations with the range predicates pushed down. None
    * when no query carries a range filter. */
  private def acceptsKV(plans: Seq[MultiSearcher.SegPlan],
      extra: Option[Dataset[(Int, Int, Long)]] = None)
      : Option[org.apache.spark.sql.KeyValueGroupedDataset[(Int, Long), (Int, Int, Long)]] = {
    val byQuery: Map[Int, Seq[Searcher.RangeFilter]] = plans
      .filter(_.ranges.nonEmpty).groupBy(_.qIdx).map { case (q, pls) => q -> pls.head.ranges }
    if (byQuery.isEmpty) {
      val dpsBySegE: Array[Long] = segs.map(_._2.docsPerShard).toArray
      return extra.map(_.groupByKey(t => (t._2, t._3 / dpsBySegE(t._2))))
    }
    val fields = byQuery.values.flatten.map(_.field).toSeq.distinct
    val docsSchema = io.read(spark, s"${segs.head._1}/docs").schema
    byQuery.values.flatten.foreach { r =>
      val fld = docsSchema.fields.find(_.name == r.field)
        .getOrElse(throw new IllegalArgumentException(
          s"range filter field '${r.field}' is not a stored docs column " +
            s"(have: ${docsSchema.fieldNames.mkString(", ")})"))
      // `exists:field` applies to any column type; numeric ranges need numbers
      if (!r.existsOnly)
        require(fld.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
          s"range filter field '${r.field}' is not numeric (${fld.dataType.simpleString})")
    }
    val docsForRanges = taggedUnion("docs", Seq("docId") ++ fields)
    val dpsBySeg: Array[Long] = segs.map(_._2.docsPerShard).toArray
    val fromRanges = byQuery.toSeq.map { case (q, rs) =>
      docsForRanges.filter(rs.map(_.pred).reduce(_ && _))
        .select(lit(q).cast("int").as("q"), col("seg"), col("docId"))
        .as[(Int, Int, Long)]
    }.reduce(_ union _)
    val accepts = extra.map(fromRanges.union).getOrElse(fromRanges)
    Some(accepts.groupByKey(t => (t._2, t._3 / dpsBySeg(t._2))))
  }

  /** Match-only kernel pass over a plan set: per-(segment, shard) walks with
    * no heap and no scoring, emitting the (seg, docId) match set. Plans with
    * scoring clauses run the disjunctive walk (≥ `minShouldMatch` distinct
    * should-cursors present), phrase plans the position-verified walk, and
    * SCORELESS plans (idfById and phrases both empty — ES filter context)
    * the conjunctive walk driven by their filter postings. */
  private def runMatchKernels(plans: Seq[MultiSearcher.SegPlan], gAvgdl: Double,
      minShouldMatch: Int = 1): Dataset[(Int, Long)] = {
    val params = p
    val msm = minShouldMatch
    val plansBySeg = plans.groupBy(_.seg)

    def run(s: Int, blocks: Iterator[PostingBlock],
        acceptByQ: Map[Int, Array[Long]]): Iterator[(Int, Long)] = {
      val arr = blocks.toArray
      plansBySeg(s).iterator.flatMap { pl =>
        val subset = arr.iterator.filter(b => pl.wantsBlock(b.termId))
        val accept =
          if (!pl.usesAccept) null
          else acceptByQ.getOrElse(pl.qIdx, Array.empty[Long])
        val ids =
          if (pl.phraseIdSeqs.nonEmpty)
            Phrase.matching(subset, pl.phraseIdSeqs.map(_.toArray).toArray,
              pl.phraseSlops.toArray, pl.phraseIdfById.keySet, pl.filterIds, gAvgdl,
              params, pl.excludeIds, accept,
              phraseOrdered = if (pl.phraseOrdered.isEmpty) null else pl.phraseOrdered.toArray,
              phraseEnds = if (pl.phraseEnds.isEmpty) null else pl.phraseEnds.toArray)
          else if (pl.idfById.nonEmpty)
            Wand.matching(subset, pl.idfById.keySet, pl.filterIds, gAvgdl, params,
              pl.excludeIds, accept, msm)
          else
            Wand.matchingConjunctive(subset, pl.filterIds, gAvgdl, params,
              pl.excludeIds, accept)
        ids.map(d => (s, d))
      }
    }

    val grouped = segBlocks(plansBySeg)
    acceptsKV(plans) match {
      case None => grouped.flatMapGroups { (key, it) => run(key._1, it.map(_._2), Map.empty) }
      case Some(acc) =>
        grouped.cogroup(acc) { (key, it, accIt) =>
          run(key._1, it.map(_._2), MultiSearcher.acceptArrays(accIt))
        }
    }
  }

  /** Scored-all kernel pass over a plan set — [[Wand.scoreAll]] per
    * (segment, shard): every matching doc with its exact global-stats BM25
    * score. Scoreless (filter-context) plans emit their match set at
    * constant score 0.0. Phrase plans are rejected upstream. */
  private def runScoreKernels(plans: Seq[MultiSearcher.SegPlan], gAvgdl: Double,
      minShouldMatch: Int = 1): Dataset[(Int, Long, Double)] = {
    val params = p
    val msm = minShouldMatch
    val plansBySeg = plans.groupBy(_.seg)

    def run(s: Int, blocks: Iterator[PostingBlock],
        acceptByQ: Map[Int, Array[Long]]): Iterator[(Int, Long, Double)] = {
      val arr = blocks.toArray
      plansBySeg(s).iterator.flatMap { pl =>
        val subset = arr.iterator.filter(b => pl.wantsBlock(b.termId))
        val accept =
          if (!pl.usesAccept) null
          else acceptByQ.getOrElse(pl.qIdx, Array.empty[Long])
        if (pl.idfById.nonEmpty)
          Wand.scoreAll(subset, pl.idfById, pl.filterIds, gAvgdl, params,
            pl.exactBounds, pl.excludeIds, accept, msm).map(sd => (s, sd.docId, sd.score))
        else
          Wand.matchingConjunctive(subset, pl.filterIds, gAvgdl, params,
            pl.excludeIds, accept).map(d => (s, d, 0.0))
      }
    }

    val grouped = segBlocks(plansBySeg)
    acceptsKV(plans) match {
      case None => grouped.flatMapGroups { (key, it) => run(key._1, it.map(_._2), Map.empty) }
      case Some(acc) =>
        grouped.cogroup(acc) { (key, it, accIt) =>
          run(key._1, it.map(_._2), MultiSearcher.acceptArrays(accIt))
        }
    }
  }

  /** Every matching doc WITH its exact BM25 score as (seg, docId, score) —
    * the scored analogue of [[matchedSegDoc]], behind the segmented ES
    * `top_hits`. Filter-only / match_all queries score 0.0 (constant-score
    * filter context). Phrase queries are not supported in scored-all form. */
  private def scoredSegDoc(query: String, minShouldMatch: Int = 1): DataFrame = {
    import MultiSearcher.SegPlan
    val kw = segs.head._2.keywords.toSet
    val pq = Searcher.parseFull(query, kw, contentSpec)
    require(pq.phrases.isEmpty, "top_hits does not support phrase queries")
    def emptyOut = spark.emptyDataset[(Int, Long, Double)].toDF("seg", "docId", "score")

    if (pq.hasScoringClauses) {
      val (plans, gAvgdl) = planQueries(Seq(query -> 1))
      if (plans.isEmpty) return emptyOut
      runScoreKernels(plans, gAvgdl, minShouldMatch).toDF("seg", "docId", "score")
    } else
      matchedSegDoc(query, minShouldMatch).withColumn("score", lit(0.0))
  }

  /** ES `top_hits` inside a `terms` aggregation over the segmented index —
    * [[Searcher.topHits]] semantics, exact across segments (disjoint
    * identities: counts sum, scores use global stats). Per-bucket hit order
    * is (score desc, identity asc) — per-segment docIds are not globally
    * comparable, so DOCUMENT IDENTITY is the tie-break, as in every
    * segmented result. Returns flat rows
    * (value, cnt, rank, repo, path, commit, score). */
  def topHits(query: String, bucketField: String, topNBuckets: Int, hitsPerBucket: Int,
      minShouldMatch: Int = 1): DataFrame = {
    require(topNBuckets > 0 && hitsPerBucket > 0, "topNBuckets and hitsPerBucket must be > 0")
    val docsSchema = io.read(spark, s"${segs.head._1}/docs").schema
    require(docsSchema.fieldNames.contains(bucketField),
      s"bucket field '$bucketField' is not a stored docs column (have: ${docsSchema.fieldNames.mkString(", ")})")
    val joined = scoredSegDoc(query, minShouldMatch)
      .join(taggedUnion("docs", Seq("docId", bucketField, "repo", "path", "commit")),
        Seq("seg", "docId"))
      .filter(col(bucketField).isNotNull)
      .select(col(bucketField).cast("string").as("value"),
        col("repo"), col("path"), col("commit"), col("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("value"))
      .orderBy(desc("score"), asc("repo"), asc("path"), asc("commit"))
    val ranked = joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= hitsPerBucket)
    val topBuckets = joined.groupBy("value").agg(sqlCount(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("value")).limit(topNBuckets)
    ranked.join(broadcast(topBuckets), Seq("value"))
      .select(col("value"), col("cnt"), col("rank"),
        col("repo"), col("path"), col("commit"), col("score"))
      .orderBy(desc("cnt"), asc("value"), asc("rank"))
  }

  /** ES `percentiles` aggregation over the segmented index —
    * [[Searcher.percentilesAgg]] semantics, exact across segments. */
  def percentilesAgg(query: String, field: String, ps: Seq[Double],
      exact: Boolean = false, minShouldMatch: Int = 1): DataFrame = {
    validateNumericDocsField(field)
    require(ps.nonEmpty && ps.forall(x => x >= 0.0 && x <= 1.0),
      "percentiles must be fractions in [0, 1]")
    val matched = matchedSegDoc(query, minShouldMatch)
      .join(taggedUnion("docs", Seq("docId", field)), Seq("seg", "docId"))
      .filter(col(field).isNotNull)
    val fn = if (exact) "percentile" else "approx_percentile"
    matched.agg(expr(s"$fn(cast($field as double), array(${ps.mkString(",")}))").as("qs"))
      .select(posexplode(col("qs")).as(Seq("i", "value")))
      .select(element_at(typedLit(ps), col("i").cast("int") + 1).as("p"), col("value"))
  }

  /** ES `collapse` over the segmented index — [[Searcher.collapse]]
    * semantics, exact across segments (global-stats scores; per-group and
    * global order tie-break on DOCUMENT IDENTITY, as in every segmented
    * result). Returns (value, repo, path, commit, score) in hit order. */
  def collapse(query: String, field: String, k: Int, minShouldMatch: Int = 1): DataFrame = {
    require(k > 0, "k must be > 0")
    val docsSchema = io.read(spark, s"${segs.head._1}/docs").schema
    require(docsSchema.fieldNames.contains(field),
      s"collapse field '$field' is not a stored docs column (have: ${docsSchema.fieldNames.mkString(", ")})")
    val joined = scoredSegDoc(query, minShouldMatch)
      .join(taggedUnion("docs", Seq("docId", field, "repo", "path", "commit")),
        Seq("seg", "docId"))
      .select(col(field).cast("string").as("value"),
        col("repo"), col("path"), col("commit"), col("score"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("value"))
      .orderBy(desc("score"), asc("repo"), asc("path"), asc("commit"))
    val best = joined.filter(col("value").isNotNull)
      .withColumn("_r", row_number().over(w)).filter(col("_r") === 1).drop("_r")
    best.unionByName(joined.filter(col("value").isNull))
      .orderBy(desc("score"), asc("repo"), asc("path"), asc("commit")).limit(k)
      .select(col("value"), col("repo"), col("path"), col("commit"), col("score"))
  }

  /** ES `date_histogram` over the segmented index —
    * [[Searcher.dateHistogram]] semantics, exact across segments (counts
    * sum over disjoint identities). */
  def dateHistogram(query: String, field: String, interval: String,
      minShouldMatch: Int = 1): DataFrame = {
    val allowed = Set("year", "quarter", "month", "week", "day")
    require(allowed.contains(interval.toLowerCase),
      s"interval must be one of ${allowed.mkString(", ")} (got '$interval')")
    val f = io.read(spark, s"${segs.head._1}/docs").schema.fields.find(_.name == field)
      .getOrElse(throw new IllegalArgumentException(
        s"field '$field' is not a stored docs column"))
    require(f.dataType == org.apache.spark.sql.types.DateType ||
      f.dataType == org.apache.spark.sql.types.TimestampType,
      s"field '$field' is not a date/timestamp column (${f.dataType.simpleString})")
    matchedSegDoc(query, minShouldMatch)
      .join(taggedUnion("docs", Seq("docId", field)), Seq("seg", "docId"))
      .filter(col(field).isNotNull)
      .groupBy(date_trunc(interval.toLowerCase, col(field)).cast("date").as("bucket"))
      .agg(sqlCount(lit(1)).as("cnt"))
      .orderBy("bucket")
  }

  /** ES term suggester over the segmented index — [[Searcher.suggest]]
    * semantics with EXACT global document frequencies (per-term df summed
    * over disjoint segments); candidates come from the UNION of segment
    * dictionaries. */
  def suggest(text: String, topN: Int = 5, maxEdits: Int = 2,
      mode: String = "missing"): Seq[(String, String, Long, Int)] = {
    require(maxEdits >= 1 && maxEdits <= 2, s"maxEdits must be 1 or 2 (got $maxEdits)")
    require(mode == "missing" || mode == "always", s"unknown suggest_mode '$mode'")
    val tokens = ctokens(text).distinct.toSeq
    if (tokens.isEmpty) return Seq.empty
    val presentDicts = lookup(tokens)
    val present: Set[String] =
      tokens.filter(t => presentDicts.exists(_.contains(t))).toSet
    val want = if (mode == "missing") tokens.filterNot(present) else tokens
    if (want.isEmpty) return Seq.empty
    val expansions = expandFuzzyMap(want.map((_, maxEdits)))
    val allCand = expansions.valuesIterator.flatten.toSeq.distinct
    val dicts = lookup(allCand)
    val dfByTerm: Map[String, Long] =
      allCand.map(t => t -> dicts.map(_.get(t).map(_._2).getOrElse(0L)).sum).toMap
    def dist(a: String, b: String): Int =
      if (a == b) 0 else if (Searcher.editWithin(a, b, 1)) 1 else 2
    want.flatMap { tok =>
      expansions((tok, maxEdits)).toSeq
        .filter(_ != tok)
        .map(c => (tok, c, dfByTerm.getOrElse(c, 0L), dist(tok, c)))
        .sortBy { case (_, c, df, dd) => (dd, -df, c) }
        .take(topN)
    }
  }

  /** The query's FULL match set as (seg, docId) — [[Searcher]]'s
    * `matchIdsDs` semantics across the segmented index: scored terms are
    * should clauses (≥ minShouldMatch present), phrases must, keyword
    * filters and ranges filter, negations must_not; a query with no scoring
    * clause is pure filter context and an entirely empty query is
    * match_all. Segment identities are disjoint (the SegmentedIndex
    * invariant), so the union over segments IS the global match set. */
  private def matchedSegDoc(query: String, minShouldMatch: Int = 1): DataFrame = {
    import MultiSearcher.SegPlan
    val kw = segs.head._2.keywords.toSet
    val pq = Searcher.parseFull(query, kw, contentSpec)
    def emptyOut = spark.emptyDataset[(Int, Long)].toDF("seg", "docId")

    if (pq.hasScoringClauses || pq.phrases.nonEmpty) {
      val (plans, gAvgdl) = planQueries(Seq(query -> 1))
      if (plans.isEmpty) return emptyOut
      runMatchKernels(plans, gAvgdl, minShouldMatch).toDF("seg", "docId")
    } else if (pq.filters.nonEmpty) {
      // ES filter context: conjunctive plans per segment that has EVERY
      // filter term (a missing filter posting matches nothing there)
      val allTerms = (pq.filters ++ pq.allExcluded).distinct.toSeq
      val dicts = lookup(allTerms)
      val plans: Seq[SegPlan] = segs.indices.flatMap { s =>
        val dict = dicts(s)
        val filterIds = pq.filters.flatMap(f => dict.get(f).map(_._1))
        if (filterIds.length < pq.filters.length) Nil
        else Seq(SegPlan(0, s, Map.empty, filterIds.toSet, 1, Nil, Map.empty,
          exactBounds = true,
          excludeIds = pq.allExcluded.flatMap(t => dict.get(t).map(_._1)).toSet,
          ranges = pq.ranges.toSeq))
      }
      if (plans.isEmpty) return emptyOut
      runMatchKernels(plans, avgdl).toDF("seg", "docId")
    } else {
      // match_all / range-only / must_not-only: base set from the unioned
      // docs relations (range predicate pushed into the columnar scans),
      // minus the excluded terms' disjunctive match set
      val rangeFields = pq.ranges.map(_.field).distinct.toSeq
      val base = {
        val docs = taggedUnion("docs", Seq("docId") ++ rangeFields)
        val filtered =
          if (pq.ranges.isEmpty) docs
          else docs.filter(pq.ranges.map(_.pred).reduce(_ && _))
        filtered.select(col("seg"), col("docId"))
      }
      if (pq.allExcluded.isEmpty) return base
      val dicts = lookup(pq.allExcluded.distinct.toSeq)
      val exPlans: Seq[SegPlan] = segs.indices.flatMap { s =>
        val ids = pq.allExcluded.flatMap(t => dicts(s).get(t).map(_._1)).toSet
        if (ids.isEmpty) Nil
        else Seq(SegPlan(0, s, ids.map(_ -> 0.0).toMap, Set.empty, 1, Nil, Map.empty,
          exactBounds = true))
      }
      if (exPlans.isEmpty) return base
      val ex = runMatchKernels(exPlans, avgdl).toDF("seg", "docId")
      base.join(ex, Seq("seg", "docId"), "left_anti")
    }
  }

  /** Facet counts over the segmented index — [[Searcher.facets]] semantics
    * (ES `terms` aggregation in query context), EXACT across segments:
    * identities are disjoint (the SegmentedIndex invariant), so per-value
    * counts sum. One distributed pass: match-only kernels per (segment,
    * shard) → join each segment's docs relation for the field → global
    * partial-aggregated count → TakeOrdered(topN). */
  def facets(query: String, field: String, topN: Int): Array[(String, Long)] = {
    val docsSchema = io.read(spark, s"${segs.head._1}/docs").schema
    val f = docsSchema.fields.find(_.name == field).getOrElse(
      throw new IllegalArgumentException(
        s"facet field '$field' is not a stored docs column (have: ${docsSchema.fieldNames.mkString(", ")})"))
    val matched = matchedSegDoc(query)
      .join(taggedUnion("docs", Seq("docId", field)), Seq("seg", "docId"))
      .filter(col(field).isNotNull)
    // array fields bucket per DISTINCT element, as in [[Searcher.facets]]
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

  /** ES `_count` over the segmented index: exact (disjoint identities sum);
    * an empty query counts every live document (match_all). */
  def count(query: String, minShouldMatch: Int = 1): Long =
    matchedSegDoc(query, minShouldMatch).count()

  /** ES `stats` aggregation in query context over a stored NUMERIC docs
    * column — [[Searcher.statsAgg]] semantics, exact across segments. */
  def statsAgg(query: String, field: String, minShouldMatch: Int = 1): DataFrame = {
    validateNumericDocsField(field)
    val v = col(field).cast("double")
    matchedSegDoc(query, minShouldMatch)
      .join(taggedUnion("docs", Seq("docId", field)), Seq("seg", "docId"))
      .filter(col(field).isNotNull)
      .agg(sqlCount(lit(1)).as("cnt"),
        min(v).as("mn"), max(v).as("mx"), sum(v).as("sm"), avg(v).as("av"))
  }

  /** ES GET by `_id` over the segmented index: one document's stored fields
    * fetched by identity key. Segments hold DISJOINT identities (the
    * SegmentedIndex upsert invariant), so at most one segment owns the key;
    * the predicate is pushed into every segment's columnar docs scan in the
    * one unioned plan and only matching row groups are read. */
  def getDoc(repo: String, path: String, commit: String): Option[org.apache.spark.sql.Row] = {
    val cols = io.read(spark, s"${segs.head._1}/docs").columns.toSeq
    taggedUnion("docs", cols)
      .filter(col("repo") === repo && col("path") === path && col("commit") === commit)
      .limit(1).collect().headOption
  }

  /** ES `extended_stats` aggregation over the segmented index —
    * [[Searcher.extendedStatsAgg]] semantics (population variance/stddev,
    * ES's own convention), exact across segments: one partial aggregation
    * over the unioned match set, no per-segment moment merging to drift. */
  def extendedStatsAgg(query: String, field: String, minShouldMatch: Int = 1): DataFrame = {
    validateNumericDocsField(field)
    val v = col(field).cast("double")
    matchedSegDoc(query, minShouldMatch)
      .join(taggedUnion("docs", Seq("docId", field)), Seq("seg", "docId"))
      .filter(col(field).isNotNull)
      .agg(sqlCount(lit(1)).as("cnt"),
        min(v).as("mn"), max(v).as("mx"), sum(v).as("sm"), avg(v).as("av"),
        sum(v * v).as("sum_sq"),
        var_pop(v).as("variance"),
        stddev_pop(v).as("std_dev"))
  }

  /** ES `histogram` aggregation in query context — [[Searcher.histogram]]
    * semantics (fixed-interval buckets, min_doc_count 1, nulls skipped),
    * exact across segments. */
  def histogram(query: String, field: String, interval: Double,
      minShouldMatch: Int = 1): DataFrame = {
    require(interval > 0, s"histogram interval must be > 0 (got $interval)")
    validateNumericDocsField(field)
    matchedSegDoc(query, minShouldMatch)
      .join(taggedUnion("docs", Seq("docId", field)), Seq("seg", "docId"))
      .filter(col(field).isNotNull)
      .groupBy((floor(col(field).cast("double") / interval) * interval).as("bucket"))
      .agg(sqlCount(lit(1)).as("cnt"))
      .orderBy(asc("bucket"))
  }

  /** ES sort-by-field over the segmented index — [[Searcher.searchSortedBy]]
    * semantics, with DOCUMENT IDENTITY as the tie/missing break (docIds are
    * per-segment and not globally comparable). Returns ≤k rows
    * (repo, path, commit, field). */
  def searchSortedBy(query: String, field: String, ascending: Boolean, k: Int,
      minShouldMatch: Int = 1): DataFrame = {
    validateNumericDocsField(field)
    val ord = if (ascending) col(field).asc_nulls_last else col(field).desc_nulls_last
    matchedSegDoc(query, minShouldMatch)
      .join(taggedUnion("docs", Seq("docId", "repo", "path", "commit", field)),
        Seq("seg", "docId"))
      .select(col("repo"), col("path"), col("commit"), col(field))
      .orderBy(ord, asc("repo"), asc("path"), asc("commit"))
      .limit(k)
  }

  private def validateNumericDocsField(name: String): Unit = {
    val docsSchema = io.read(spark, s"${segs.head._1}/docs").schema
    val f = docsSchema.fields.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"field '$name' is not a stored docs column (have: ${docsSchema.fieldNames.mkString(", ")})"))
    require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"field '$name' is not numeric (${f.dataType.simpleString})")
  }

  private def validateOrderableDocsField(name: String): Unit = {
    import org.apache.spark.sql.types._
    val docsSchema = io.read(spark, s"${segs.head._1}/docs").schema
    val f = docsSchema.fields.find(_.name == name).getOrElse(throw new IllegalArgumentException(
      s"field '$name' is not a stored docs column (have: ${docsSchema.fieldNames.mkString(", ")})"))
    require(f.dataType.isInstanceOf[NumericType] || f.dataType == StringType ||
      f.dataType == DateType || f.dataType == TimestampType || f.dataType == BooleanType,
      s"field '$name' is not sortable (${f.dataType.simpleString})")
  }

  /** ES multi-field sort over the segmented index —
    * [[Searcher.searchSortedByFields]] semantics with DOCUMENT IDENTITY as
    * the final tie-break (docIds are per-segment). Returns ≤k rows
    * (repo, path, commit, sort fields…). */
  def searchSortedByFields(query: String, sorts: Seq[(String, Boolean)], k: Int,
      minShouldMatch: Int = 1): DataFrame = {
    require(sorts.nonEmpty, "need at least one sort field")
    require(sorts.map(_._1).distinct.length == sorts.length, "duplicate sort field")
    sorts.foreach { case (f, _) => validateOrderableDocsField(f) }
    val ord = sorts.map { case (f, up) =>
      if (up) col(f).asc_nulls_last else col(f).desc_nulls_last
    } ++ Seq(asc("repo"), asc("path"), asc("commit"))
    matchedSegDoc(query, minShouldMatch)
      .join(taggedUnion("docs",
        (Seq("docId", "repo", "path", "commit") ++ sorts.map(_._1)).distinct),
        Seq("seg", "docId"))
      .select(Seq(col("repo"), col("path"), col("commit")) ++ sorts.map(s => col(s._1)): _*)
      .orderBy(ord: _*)
      .limit(k)
  }

  /** ES `multi_match` over the segmented index — [[Searcher.multiMatch]]
    * semantics with EXACT global per-field statistics: a field's docCount /
    * token total are SUMS of its `field:` marker's (df, cf) over the
    * segment dictionaries (disjoint identities), per-clause df sums the
    * tagged term's df the same way, and every segment's kernel scores with
    * those global values. A field analyzed in only some segments simply
    * contributes nothing elsewhere. Returns ≤k rows
    * (repo, path, commit, score), (score desc, identity asc) — per-segment
    * docIds are not globally comparable, so identity is the tie-break. */
  def multiMatch(query: String, fields: Seq[String], k: Int,
      matchType: String = "best_fields", tieBreaker: Double = 0.0,
      minShouldMatch: Int = 1): DataFrame = {
    import MultiSearcher.SegPlan
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
    val kw = segs.head._2.keywords.toSet
    val pq = Searcher.parseFull(query, kw, contentSpec)
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
      require(f == "content" || segs.exists(_._2.analyzed.contains(f)),
        s"'$f' is not an analyzed field of any segment")
    }
    def emptyOut = Seq.empty[(String, String, String, Double)]
      .toDF("repo", "path", "commit", "score")
    // global per-field stats: Σ over the segments' marker dictionary rows
    val markers = fieldSpecs.collect { case (f, _) if f != "content" => s"$f:" }
    val markerBySeg: Seq[Map[String, (Long, Long)]] = segs.map { case (d, _) =>
      if (markers.isEmpty) Map.empty[String, (Long, Long)]
      else io.read(spark, s"$d/terms").filter(col("term").isin(markers: _*))
        .select("term", "df", "cf").collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    val fieldStats: Map[String, (Long, Double)] = fieldSpecs.flatMap { case (f, _) =>
      if (f == "content") Some(f -> ((numDocs, avgdl)))
      else {
        val dc = markerBySeg.map(_.get(s"$f:").map(_._1).getOrElse(0L)).sum
        val ttf = markerBySeg.map(_.get(s"$f:").map(_._2).getOrElse(0L)).sum
        if (dc == 0L) None else Some(f -> ((dc, ttf.toDouble / dc.toDouble)))
      }
    }.toMap
    // per-field query analysis with the field's index-time AnalyzerSpec
    // (same rule as [[Searcher.multiMatch]]; specs agree across segments —
    // they share the config that built them)
    val contentTokens: Array[String] = pq.terms.distinct
    val fieldTokens: Map[String, Array[String]] = fieldSpecs.map { case (f, _) =>
      val spec =
        if (f == "content") contentSpec
        else segs.collectFirst {
          case (_, m) if m.analyzerSpecs.contains(f) =>
            graft.analysis.AnalyzerSpec.decode(m.analyzerSpecs(f))
        }.getOrElse(graft.analysis.AnalyzerSpec.Code)
      f -> (if (spec.isCode) contentTokens
            else graft.analysis.AnalyzerSpec
              .queryTokens(spec, pq.rawPlain.mkString(" ")).distinct)
    }.toMap
    val tokens: Array[String] = fieldSpecs.flatMap(fs => fieldTokens(fs._1)).distinct.toArray
    val tokIdxOf: Map[String, Int] = tokens.zipWithIndex.toMap
    if (mode == Wand.CrossFields)
      require(fieldSpecs.forall { case (f, _) => fieldTokens(f).sameElements(contentTokens) },
        "cross_fields requires all queried fields to share the content analyzer " +
          "(ES groups cross_fields terms per analyzer)")
    final case class Clause(term: String, group: Int, tokIdx: Int, nF: Long,
        avgdlF: Double, fieldBoost: Double)
    val clauses: Seq[Clause] = fieldSpecs.zipWithIndex.flatMap { case ((f, fb), g) =>
      fieldStats.get(f).toSeq.flatMap { case (nF, avgdlF) =>
        fieldTokens(f).map { t =>
          Clause(if (f == "content") t else s"$f:$t", g, tokIdxOf(t), nF, avgdlF, fb)
        }
      }
    }
    if (clauses.isEmpty) return emptyOut
    val allTerms = (clauses.map(_.term) ++ pq.filters ++ pq.allExcluded).distinct
    val dicts = lookup(allTerms)
    val globalDf: Map[String, Long] =
      clauses.map(_.term).distinct.map(t =>
        t -> dicts.map(_.get(t).map(_._2).getOrElse(0L)).sum).toMap
    // cross_fields: blended per-token df (max across fields, global sums)
    val dfBlend: Map[Int, Long] =
      if (mode != Wand.CrossFields) Map.empty
      else clauses.groupBy(_.tokIdx).map { case (ti, cs) =>
        ti -> cs.map(c => globalDf(c.term)).foldLeft(0L)(math.max)
      }
    // one plan + one FieldTermInfo map per segment that can contribute
    val plansAndInfo: Seq[(SegPlan, Map[Long, Wand.FieldTermInfo])] =
      segs.indices.flatMap { s =>
        val dict = dicts(s)
        val filterIds = pq.filters.flatMap(f => dict.get(f).map(_._1))
        if (filterIds.length < pq.filters.length) Nil // a required filter absent here
        else {
          val info: Map[Long, Wand.FieldTermInfo] = clauses.flatMap { c =>
            dict.get(c.term).collect {
              case (tid, _) if globalDf(c.term) > 0 =>
                val idf =
                  if (mode == Wand.CrossFields) BM25.idf(numDocs, dfBlend(c.tokIdx))
                  else BM25.idf(c.nF, globalDf(c.term))
                tid -> Wand.FieldTermInfo(
                  idf * c.fieldBoost * pq.boostOf(tokens(c.tokIdx)),
                  c.avgdlF,
                  if (mode == Wand.CrossFields) c.tokIdx else c.group,
                  c.tokIdx)
            }
          }.toMap
          if (info.isEmpty) Nil
          else {
            val excl: Set[Long] = pq.allExcluded.flatMap(t => dict.get(t).map(_._1)).toSet
            Seq((SegPlan(0, s, info.map { case (tid, fi) => tid -> fi.idf },
              filterIds.toSet, k, Nil, Map.empty, exactBounds = true,
              excludeIds = excl, ranges = pq.ranges.toSeq), info))
          }
        }
      }
    if (plansAndInfo.isEmpty) return emptyOut
    val plans = plansAndInfo.map(_._1)
    val infoBySeg: Map[Int, Map[Long, Wand.FieldTermInfo]] =
      plansAndInfo.map { case (pl, info) => pl.seg -> info }.toMap
    val plansBySeg = plans.groupBy(_.seg)
    val params = p
    val tb = tieBreaker
    val md = mode
    val msm = minShouldMatch
    val gAvgdl = avgdl
    val nG = if (mode == Wand.CrossFields) tokens.length else fieldSpecs.size
    val nT = tokens.length
    val kk = k
    def run(s: Int, blocks: Iterator[PostingBlock],
        acceptByQ: Map[Int, Array[Long]]): Iterator[(Int, Long, Double)] = {
      val pl = plansBySeg(s).head
      val accept =
        if (!pl.usesAccept) null else acceptByQ.getOrElse(0, Array.empty[Long])
      Wand.topKFields(blocks.filter(b => pl.wantsBlock(b.termId)), infoBySeg(s),
        nG, nT, pl.filterIds, gAvgdl, params, tb, md, kk, pl.excludeIds, accept, msm)
        .map(sd => (s, sd.docId, sd.score))
    }
    val grouped = segBlocks(plansBySeg)
    val scored = acceptsKV(plans) match {
      case None => grouped.flatMapGroups { (key, it) => run(key._1, it.map(_._2), Map.empty) }
      case Some(acc) =>
        grouped.cogroup(acc) { (key, it, accIt) =>
          run(key._1, it.map(_._2), MultiSearcher.acceptArrays(accIt))
        }
    }
    scored.toDF("seg", "docId", "score")
      .join(taggedUnion("docs", Seq("docId", "repo", "path", "commit")), Seq("seg", "docId"))
      .select("repo", "path", "commit", "score")
      .orderBy(desc("score"), asc("repo"), asc("path"), asc("commit"))
      .limit(k)
  }

  /** ES `_mget` over the segmented index — [[Searcher.mget]] semantics:
    * stored fields for a batch of identity keys in ONE scan of the unioned
    * docs relations (segments hold disjoint identities, so each key has at
    * most one owner). Missing keys are simply absent. */
  def mget(keys: Seq[(String, String, String)]): DataFrame = {
    require(keys.nonEmpty, "mget needs at least one identity key")
    val cols = io.read(spark, s"${segs.head._1}/docs").columns.toSeq
    taggedUnion("docs", cols)
      .join(broadcast(keys.toDF("repo", "path", "commit")),
        Seq("repo", "path", "commit"))
      .drop("seg")
  }

  /** ES `filters` aggregation over the segmented index —
    * [[Searcher.filtersAgg]] semantics: one named bucket per (name, query),
    * exact counts across segments (disjoint identities sum), empty buckets
    * present at 0, one tagged-union action for the whole aggregation. */
  def filtersAgg(filters: Seq[(String, String)]): DataFrame = {
    require(filters.nonEmpty, "filters aggregation needs at least one named filter")
    require(filters.map(_._1).distinct.length == filters.length,
      "filters aggregation bucket names must be unique")
    val tagged = filters.map { case (name, q) =>
      matchedSegDoc(q).select(lit(name).as("bucket"))
    }.reduce(_ unionByName _)
    val names = filters.map(_._1).toDF("bucket")
    names
      .join(tagged.groupBy("bucket").agg(sqlCount(lit(1)).as("cnt")), Seq("bucket"), "left")
      .select(col("bucket"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy(asc("bucket"))
  }

  /** ES `composite` aggregation over the segmented index —
    * [[Searcher.compositeAgg]] semantics: key-ordered bucket pages resuming
    * from `afterKey` (exclusive); counts exact across segments. */
  def compositeAgg(query: String, field: String, size: Int,
      afterKey: Option[String] = None, minShouldMatch: Int = 1): DataFrame = {
    require(size > 0, s"composite size must be > 0 (got $size)")
    val docsSchema = io.read(spark, s"${segs.head._1}/docs").schema
    require(docsSchema.fieldNames.contains(field),
      s"field '$field' is not a stored docs column (have: ${docsSchema.fieldNames.mkString(", ")})")
    matchedSegDoc(query, minShouldMatch)
      .join(taggedUnion("docs", Seq("docId", field)), Seq("seg", "docId"))
      .filter(col(field).isNotNull)
      .groupBy(col(field).cast("string").as("key"))
      .agg(sqlCount(lit(1)).as("cnt"))
      .filter(afterKey.map(a => col("key") > lit(a)).getOrElse(lit(true)))
      .orderBy(asc("key"))
      .limit(size)
  }

  /** ES scroll / export analogue over the segmented index —
    * [[Searcher.scan]] semantics: the FULL match set as a DataFrame of
    * stored fields, never collected, no order. Identity columns
    * (repo, path, commit) always ride along (docIds are per-segment). */
  def scan(query: String, fields: Seq[String] = Nil, minShouldMatch: Int = 1): DataFrame = {
    val docsSchema = io.read(spark, s"${segs.head._1}/docs").schema
    val cols =
      if (fields.isEmpty) docsSchema.fieldNames.toSeq
      else {
        fields.foreach(f => require(docsSchema.fieldNames.contains(f),
          s"scan field '$f' is not a stored docs column (have: ${docsSchema.fieldNames.mkString(", ")})"))
        (Seq("docId", "repo", "path", "commit") ++ fields).distinct
      }
    matchedSegDoc(query, minShouldMatch)
      .join(taggedUnion("docs", cols), Seq("seg", "docId"))
      .drop("seg", "docId")
  }

  /** ES `terms` aggregation with a `stats` sub-aggregation —
    * [[Searcher.facetsStats]] semantics, exact across segments (disjoint
    * identities sum/merge). */
  def facetsStats(query: String, bucketField: String, valueField: String, topN: Int,
      minShouldMatch: Int = 1): DataFrame = {
    val docsSchema = io.read(spark, s"${segs.head._1}/docs").schema
    require(docsSchema.fieldNames.contains(bucketField),
      s"bucket field '$bucketField' is not a stored docs column (have: ${docsSchema.fieldNames.mkString(", ")})")
    validateNumericDocsField(valueField)
    val v = col(valueField).cast("double")
    matchedSegDoc(query, minShouldMatch)
      .join(taggedUnion("docs", Seq("docId", bucketField, valueField)), Seq("seg", "docId"))
      .filter(col(bucketField).isNotNull)
      .groupBy(col(bucketField).cast("string").as("value"))
      .agg(sqlCount(lit(1)).as("cnt"),
        min(v).as("mn"), max(v).as("mx"), sum(v).as("sm"), avg(v).as("av"))
      .orderBy(desc("cnt"), asc("value"))
      .limit(topN)
  }

  /** ES `range` aggregation — [[Searcher.rangeAgg]] semantics (explicit
    * half-open buckets, every bucket present), exact across segments. */
  def rangeAgg(query: String, field: String, bounds: Seq[Double],
      minShouldMatch: Int = 1): DataFrame = {
    require(bounds.nonEmpty, "range aggregation needs at least one bound")
    require(bounds == bounds.sorted && bounds.distinct == bounds,
      s"range bounds must be strictly increasing (got ${bounds.mkString(", ")})")
    validateNumericDocsField(field)
    val v = col(field).cast("double")
    val bucketIdx = bounds.foldLeft(lit(0))((acc, b) => acc + when(v >= b, 1).otherwise(0))
    val counts = matchedSegDoc(query, minShouldMatch)
      .join(taggedUnion("docs", Seq("docId", field)), Seq("seg", "docId"))
      .filter(col(field).isNotNull)
      .groupBy(bucketIdx.as("idx"))
      .agg(sqlCount(lit(1)).as("cnt"))
    val buckets = (0 to bounds.size).map { i =>
      (i,
        if (i == 0) None else Some(bounds(i - 1)),
        if (i == bounds.size) None else Some(bounds(i)))
    }.toDF("idx", "lo", "hi")
    buckets.join(counts, Seq("idx"), "left")
      .select(col("lo"), col("hi"), coalesce(col("cnt"), lit(0L)).as("cnt"))
      .orderBy(asc_nulls_first("lo"))
  }

  /** ES `cardinality` aggregation — [[Searcher.cardinality]] semantics.
    * Exact across segments in BOTH modes: distinct values dedup globally in
    * the exact shuffle, and HyperLogLog++ sketches merge losslessly across
    * the segment-tagged union. */
  def cardinality(query: String, field: String, exact: Boolean = false,
      rsd: Double = 0.05, minShouldMatch: Int = 1): Long = {
    val docsSchema = io.read(spark, s"${segs.head._1}/docs").schema
    require(docsSchema.fieldNames.contains(field),
      s"cardinality field '$field' is not a stored docs column (have: ${docsSchema.fieldNames.mkString(", ")})")
    val matched = matchedSegDoc(query, minShouldMatch)
      .join(taggedUnion("docs", Seq("docId", field)), Seq("seg", "docId"))
      .filter(col(field).isNotNull)
    val aggCol = if (exact) countDistinct(col(field)) else approx_count_distinct(col(field), rsd)
    matched.agg(aggCol.as("c")).head().getLong(0)
  }

  /** ES `highlight` over the segmented index — [[Searcher.highlight]]
    * semantics (plain-highlighter off the `_source` analogue: snippets come
    * from the caller's source corpus table, identity-joined against the ≤k
    * broadcast hits). Returns (repo, path, commit, score, snippet) in rank
    * order. */
  def highlight(query: String, k: Int, source: DataFrame, window: Int = 3,
      field: String = "content"): DataFrame = {
    require(window >= 0, s"window must be >= 0 (got $window)")
    val f = source.schema.fields.find(_.name == field).getOrElse(throw new IllegalArgumentException(
      s"highlight field '$field' is not a source column (have: ${source.columns.mkString(", ")})"))
    require(f.dataType == org.apache.spark.sql.types.StringType,
      s"highlight field '$field' is not a string column (${f.dataType.simpleString})")
    val kw = segs.head._2.keywords.toSet
    val pq = Searcher.parseFull(query, kw, contentSpec)
    val expanded = expandAllSeg(Seq(pq))(pq)
    val hlTerms = (pq.terms ++ expanded ++ pq.phrases.flatten).distinct
    require(hlTerms.nonEmpty, "highlight needs at least one scored term or phrase")
    val hits = searchMany(Seq(query -> k)).head
    if (hits.isEmpty)
      return Seq.empty[(String, String, String, Double, String)]
        .toDF("repo", "path", "commit", "score", "snippet")
    val hitsDf = hits.toSeq.map(h => (h.repo, h.path, h.commit, h.score))
      .toDF("repo", "path", "commit", "score")
    val snippet = Searcher.snippetCol(col(field), hlTerms.toSeq, window)
    source.select(Seq("repo", "path", "commit", field).distinct.map(col): _*)
      .join(broadcast(hitsDf), Seq("repo", "path", "commit"))
      .select(col("repo"), col("path"), col("commit"), col("score"), snippet.as("snippet"))
      .orderBy(desc("score"), asc("repo"), asc("path"), asc("commit"))
  }

  /** ES `more_like_this` over the segmented index —
    * [[Searcher.moreLikeThis]] semantics with EXACT global statistics
    * (per-term df summed over disjoint segments). `excludeIdents` drops
    * documents by identity (the source doc's ES `include: false`). */
  def moreLikeThis(likeText: String, k: Int, maxQueryTerms: Int = 25,
      minTermFreq: Int = 2, minDocFreq: Int = 5,
      excludeIdents: Set[(String, String, String)] = Set.empty): Array[ScoredHit] = {
    require(maxQueryTerms > 0 && minTermFreq >= 1 && minDocFreq >= 1,
      "maxQueryTerms must be > 0; minTermFreq and minDocFreq must be >= 1")
    val tf: Map[String, Int] = ctokens(likeText)
      .groupBy(identity).map { case (t, xs) => t -> xs.length }
    val cand = tf.collect { case (t, f) if f >= minTermFreq => t }.toSeq.sorted
    if (cand.isEmpty) return Array.empty
    val dicts = lookup(cand)
    val sel = cand
      .flatMap { t =>
        val df = dicts.map(_.get(t).map(_._2).getOrElse(0L)).sum
        if (df >= minDocFreq) Some((t, tf(t).toDouble * BM25.idf(numDocs, df))) else None
      }
      .sortBy { case (t, s) => (-s, t) }
      .take(maxQueryTerms)
      .map(_._1)
    if (sel.isEmpty) return Array.empty
    searchMany(Seq(sel.mkString(" ") -> (k + excludeIdents.size))).head
      .filter(h => !excludeIdents.contains((h.repo, h.path, h.commit)))
      .take(k)
  }

  /** ES `significant_terms` over the segmented index —
    * [[Searcher.significantTerms]] semantics, exact across segments:
    * identities are disjoint, so foreground counts sum and the background
    * df per term is the sum over segment dictionaries. One decode pass of
    * the segment-tagged blocks relation (3-column pruned scan), joined to
    * the match set before any shuffle, with per-segment termIds resolved to
    * term strings through the unioned dictionary. */
  def significantTerms(query: String, topN: Int, minDocCount: Int = 3,
      minShouldMatch: Int = 1): DataFrame = {
    require(topN > 0 && minDocCount >= 1, "topN must be > 0 and minDocCount >= 1")
    val matched = matchedSegDoc(query, minShouldMatch)
    val fgTotal = matched.count().toDouble
    if (fgTotal == 0)
      return Seq.empty[(String, Long, Long, Double)].toDF("term", "fg", "bg", "score")
    val n = numDocs.toDouble
    val pairs = blocksAll.select(col("seg"), col("termId"), col("n"), col("docs"))
      .as[(Int, Long, Int, Array[Byte])]
      .flatMap { case (s, tid, cnt, docs) =>
        graft.index.Codec.decodeDeltas(docs, cnt).map(d => (s, tid, d))
      }
      .toDF("seg", "termId", "docId")
    // per-(seg, termId) fg counts first (partial-aggregated), THEN the
    // dictionary-sized term-string join, THEN global sums — the string join
    // touches ≤ Σ numTerms rows, never the decoded pair stream
    val fg = pairs.join(matched, Seq("seg", "docId"))
      .groupBy("seg", "termId").agg(sqlCount(lit(1)).as("fgSeg"))
      .join(termsAll.select("seg", "termId", "term"), Seq("seg", "termId"))
      .groupBy("term").agg(sum("fgSeg").as("fg"))
    // exact global df = sum over segment dictionaries (disjoint identities)
    val bg = termsAll.groupBy("term").agg(sum("df").as("bg"))
    val fgRate = col("fg") / fgTotal
    val bgRate = col("bg") / n
    fg.join(bg, Seq("term"))
      .filter(!col("term").contains(":") && col("fg") >= minDocCount && fgRate > bgRate)
      .select(col("term"), col("fg"), col("bg"),
        ((fgRate - bgRate) * fgRate / bgRate).as("score"))
      .orderBy(desc("score"), asc("term"))
      .limit(topN)
  }
}

object MultiSearcher {
  /** Executor-side regroup of qIdx-tagged accept rows into per-query sorted
    * docId arrays. Lives on the companion so the cogroup kernel closure
    * never captures the [[MultiSearcher]] instance (which holds the
    * SparkSession and driver-side Datasets — not serializable). */
  private[search] def acceptArrays(accIt: Iterator[(Int, Int, Long)]): Map[Int, Array[Long]] =
    accIt.toArray.groupBy(_._1).map { case (q, xs) =>
      val a = xs.map(_._3)
      java.util.Arrays.sort(a)
      q -> a
    }

  /** One (query, segment) unit of kernel work inside [[MultiSearcher]]'s
    * executors: segment-local termIds, global idf values. */
  private[search] final case class SegPlan(
      qIdx: Int,
      seg: Int,
      idfById: Map[Long, Double],
      filterIds: Set[Long],
      k: Int,
      phraseIdSeqs: Seq[Seq[Long]],
      phraseIdfById: Map[Long, Double],
      exactBounds: Boolean,
      excludeIds: Set[Long] = Set.empty,
      ranges: Seq[Searcher.RangeFilter] = Nil,
      /** per-phrase slop, parallel to [[phraseIdSeqs]] (empty = all 0) */
      phraseSlops: Seq[Int] = Nil,
      /** restrict to an externally-supplied accept set (e.g. the verified
        * docIds of a nested filter) even when `ranges` is empty */
      needsAccept: Boolean = false,
      /** per-phrase in-order flag (empty = all ordered); false = Lucene
        * span_near(inOrder=false) window semantics */
      phraseOrdered: Seq[Boolean] = Nil,
      /** per-phrase span_first end bound (empty = unbounded) */
      phraseEnds: Seq[Int] = Nil,
      /** ES minimum_should_match on the scored (should) clauses — threaded
        * into the scored kernel exactly as the single-segment path does;
        * phrase plans are must clauses and unaffected */
      minShouldMatch: Int = 1,
      /** Lucene match_phrase mode: per-phrase summed GLOBAL idf — phrases
        * score idfSum × tfNorm(phraseFreq, dl, global avgdl) instead of the
        * distinct-term sum (empty = distinct-term mode) */
      phraseFreqIdf: Seq[Double] = Nil) {
    def allTermIds: Iterable[Long] =
      idfById.keys ++ phraseIdfById.keys ++ filterIds ++ excludeIds
    def wantsBlock(termId: Long): Boolean =
      idfById.contains(termId) || phraseIdfById.contains(termId) ||
        filterIds.contains(termId) || excludeIds.contains(termId)
    /** kernel must consult the cogrouped accept set for this plan */
    def usesAccept: Boolean = ranges.nonEmpty || needsAccept
  }
}
