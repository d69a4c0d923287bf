package graft.search

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.index.{IndexMeta, Json, PostingBlock, SegmentedIndex, SegmentsManifest}

/** Top-k BM25 over a segmented index ([[graft.index.SegmentedIndex]]):
  * query-time multi-segment WAND with EXACT global statistics.
  *
  * Segments hold disjoint document identities (the SegmentedIndex
  * invariant), so N, avgdl and per-term df are exact sums over segment
  * dictionaries, and per-document scores — summed in ascending termId
  * order, which inside every segment equals ascending term order — are
  * bit-identical to a fresh single-index build over the union corpus
  * (tested). The cross-segment tie-break is document identity, which in a
  * fresh build IS the docId order, so rankings match exactly too.
  *
  * Per-segment block-max bounds: each segment's stored maxTfn was computed
  * with that segment's own avgdl; under the global avgdl the kernel derives
  * admissible bounds from (maxTf, minDl) instead (see
  * [[PostingBlock]] / Wand `exactBounds`). A segment whose build-time avgdl
  * happens to equal the global one (e.g. single-segment index) keeps the
  * tight stored bounds.
  *
  * Each segment contributes at most k hits (shard-local top-k, segment
  * top-k, ≤k-row broadcast identity join); the driver merges ≤ S·k rows.
  * A served deployment would run the segments as one unioned plan and
  * broadcast the dictionaries; at S ≤ maxSegments the per-segment jobs are
  * equivalent and simpler.
  */
class MultiSearcher(spark: SparkSession, dir: String) {
  import spark.implicits._

  private val segIndex = new SegmentedIndex(spark, dir)
  val manifest: SegmentsManifest = segIndex.manifest.getOrElse(
    throw new IllegalStateException(s"no segments.json under $dir"))
  private val segs: Seq[(String, IndexMeta)] = manifest.segments.map { e =>
    val d = segIndex.segmentDir(e.name)
    (d, Json.read(s"$d/meta.json", classOf[IndexMeta]))
  }
  require(segs.nonEmpty, s"segmented index at $dir has no segments")

  val numDocs: Long = segs.map(_._2.numDocs).sum
  val sumDl: Long = segs.map(_._2.sumDl).sum
  def avgdl: Double = sumDl.toDouble / numDocs.toDouble
  private val p = Bm25Params(segs.head._2.k1, segs.head._2.b)

  /** Top-k, ordered (score desc, identity asc); identity-keyed results.
    * `"quoted spans"` run the exact-phrase kernel per segment (conjunctive,
    * position-verified — every segment must be built with storePositions)
    * with the same exact global stats as term queries. */
  def search(query: String, k: Int): Array[ScoredHit] = {
    val pq = Searcher.parseFull(query, segs.head._2.keywords.toSet)
    if (pq.phrases.nonEmpty) {
      require(pq.terms.isEmpty, "mixing loose terms with phrase queries is not supported")
      return searchPhrases(pq.phrases, pq.filters, k)
    }
    val (qTerms, qFilters) = (pq.terms, pq.filters)
    if (qTerms.isEmpty) return Array.empty
    val lookup = (qTerms ++ qFilters).distinct.toSeq

    // per-segment dictionary lookups → exact global df by summation
    val found: Seq[Map[String, (Long, Long)]] = segs.map { case (d, _) =>
      spark.read.parquet(s"$d/terms")
        .filter(col("term").isin(lookup: _*))
        .select("term", "termId", "df")
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    }
    val globalDf: Map[String, Long] =
      qTerms.map(t => t -> found.map(_.get(t).map(_._2).getOrElse(0L)).sum).toMap
    val idfByTerm: Map[String, Double] = globalDf.collect {
      case (t, df) if df > 0 => t -> BM25.idf(numDocs, df)
    }
    if (idfByTerm.isEmpty) return Array.empty
    val gAvgdl = avgdl
    val (kk, params) = (k, p)

    val hits: Seq[ScoredHit] = segs.zip(found).flatMap { case ((d, m), dict) =>
      val content = qTerms.flatMap(t =>
        dict.get(t).collect { case (tid, df) if df > 0 => tid -> idfByTerm(t) })
      val filterIds = qFilters.flatMap(f => dict.get(f).map(_._1)).toSet
      // a required filter term absent from this segment → no doc here matches
      if (content.isEmpty || filterIds.size < qFilters.length) Nil
      else {
        val idfById = content.toMap
        val termIds = (idfById.keys ++ filterIds).toSeq
        val exact = m.avgdl == gAvgdl
        val top = spark.read.parquet(s"$d/blocks")
          .select(PostingBlock.columns.map(col): _*)
          .filter(col("termId").isin(termIds.map(Long.box): _*))
          .as[PostingBlock]
          .groupByKey(_.shard)
          .flatMapGroups { (_, blocks) =>
            Wand.topK(blocks, idfById, filterIds, gAvgdl, params, kk, exact)
          }
          .orderBy(desc("score"), asc("docId"))
          .limit(kk)
          .toDF("docId", "score")
        spark.read.parquet(s"$d/docs")
          .join(broadcast(top), Seq("docId"))
          .select("repo", "path", "commit", "score")
          .as[ScoredHit]
          .collect()
      }
    }
    hits.sortBy(h => (-h.score, h.repo, h.path, h.commit)).take(k).toArray
  }

  /** Batch search over the segmented index: one distributed pass PER
    * SEGMENT for the whole query set (union of all queries' terms → one
    * block scan; every query's WAND runs per shard; per-shard heaps merge
    * in a tiny second stage), one identity join per segment for all
    * queries' hits, driver merge per query. Results identical to calling
    * [[search]] per query (tested). Phrases unsupported in batch form. */
  def searchMany(queries: Seq[(String, Int)]): Seq[Array[ScoredHit]] = {
    val kw = segs.head._2.keywords.toSet
    val parsed = queries.map { case (q, k) =>
      require(!q.contains('"'), "searchMany does not support phrase queries")
      val (t, f) = Searcher.parseQuery(q, kw); (t, f, k)
    }
    val allTerms = parsed.flatMap(pq => pq._1.toSeq ++ pq._2.toSeq).distinct
    if (allTerms.isEmpty) return queries.map(_ => Array.empty[ScoredHit])
    val found: Seq[Map[String, (Long, Long)]] = segs.map { case (d, _) =>
      spark.read.parquet(s"$d/terms")
        .filter(col("term").isin(allTerms: _*))
        .select("term", "termId", "df")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    val contentTerms = parsed.flatMap(_._1).distinct
    val globalDf: Map[String, Long] =
      contentTerms.map(t => t -> found.map(_.get(t).map(_._2).getOrElse(0L)).sum).toMap
    val idfByTerm: Map[String, Double] = globalDf.collect {
      case (t, df) if df > 0 => t -> BM25.idf(numDocs, df)
    }
    val gAvgdl = avgdl
    val params = p

    // (qIdx → merged hits) accumulated across segments
    val acc = scala.collection.mutable.Map[Int, Vector[ScoredHit]]()
      .withDefaultValue(Vector.empty)
    for (((d, m), dict) <- segs.zip(found)) {
      val plans = parsed.zipWithIndex.flatMap { case ((terms, filters, k), qi) =>
        val content = terms.flatMap(t =>
          dict.get(t).collect { case (tid, _) if idfByTerm.contains(t) => tid -> idfByTerm(t) })
        val filterIds = filters.flatMap(f => dict.get(f).map(_._1))
        if (content.isEmpty || filterIds.length < filters.length) None
        else Some(Searcher.Plan(qi, content.toMap, filterIds.toSet, k))
      }
      if (plans.nonEmpty) {
        val needed = plans.flatMap(pl => pl.idfById.keys ++ pl.filterIds).distinct
        val exact = m.avgdl == gAvgdl
        val kByIdx = plans.map(pl => pl.qIdx -> pl.k).toMap
        val top: Array[(Int, Long, Double)] = spark.read.parquet(s"$d/blocks")
          .select(PostingBlock.columns.map(col): _*)
          .filter(col("termId").isin(needed.map(Long.box): _*))
          .as[PostingBlock]
          .groupByKey(_.shard)
          .flatMapGroups { (_, blocks) =>
            val arr = blocks.toArray
            plans.iterator.flatMap { pl =>
              val subset = arr.iterator.filter(b =>
                pl.idfById.contains(b.termId) || pl.filterIds.contains(b.termId))
              Wand.topK(subset, pl.idfById, pl.filterIds, gAvgdl, params, pl.k, exact)
                .map(sd => (pl.qIdx, sd.docId, sd.score))
            }
          }
          .groupByKey(_._1)
          .flatMapGroups { (qIdx, it) =>
            it.toArray.sortBy(t => (-t._3, t._2)).take(kByIdx(qIdx)).iterator
          }
          .collect()
        if (top.nonEmpty) {
          val ids = top.map(_._2).distinct
          val identity: Map[Long, (String, String, String)] =
            spark.read.parquet(s"$d/docs")
              .filter(col("docId").isin(ids.map(Long.box).toSeq: _*))
              .select("docId", "repo", "path", "commit").collect()
              .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
          top.foreach { case (qi, docId, score) =>
            val (r, pth, c) = identity(docId)
            acc(qi) = acc(qi) :+ ScoredHit(r, pth, c, score)
          }
        }
      }
    }
    queries.indices.map { qi =>
      acc(qi).sortBy(h => (-h.score, h.repo, h.path, h.commit)).take(parsed(qi)._3).toArray
    }
  }

  /** Multi-segment exact-phrase top-k: the conjunctive position-verified
    * kernel per segment (no block-max involved, so segment-local bounds
    * are irrelevant), global idf/avgdl injected, identity merge. */
  private def searchPhrases(
      phrases: Array[Array[String]],
      qFilters: Array[String],
      k: Int): Array[ScoredHit] = {
    for ((d, m) <- segs)
      if (!m.hasPositions)
        throw new IllegalStateException(
          s"phrase query but segment $d was built without positions (storePositions=false)")
    val phraseTerms = phrases.flatten.distinct
    val lookup = (phraseTerms ++ qFilters).distinct.toSeq
    val found: Seq[Map[String, (Long, Long)]] = segs.map { case (d, _) =>
      spark.read.parquet(s"$d/terms")
        .filter(col("term").isin(lookup: _*))
        .select("term", "termId", "df")
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    }
    val globalDf: Map[String, Long] =
      phraseTerms.map(t => t -> found.map(_.get(t).map(_._2).getOrElse(0L)).sum).toMap
    // conjunctive: any phrase token absent index-wide → no match anywhere
    if (globalDf.values.exists(_ == 0L)) return Array.empty
    val idfByTerm = globalDf.map { case (t, df) => t -> BM25.idf(numDocs, df) }
    val gAvgdl = avgdl
    val (kk, params) = (k, p)

    val hits: Seq[ScoredHit] = segs.zip(found).flatMap { case ((d, _), dict) =>
      val filterIds = qFilters.flatMap(f => dict.get(f).map(_._1)).toSet
      // every phrase term (and filter) must exist in this segment
      if (phraseTerms.exists(t => !dict.contains(t)) || filterIds.size < qFilters.length) Nil
      else {
        val idfById = phraseTerms.map(t => dict(t)._1 -> idfByTerm(t)).toMap
        val phraseIdSeqs = phrases.map(_.map(t => dict(t)._1))
        val termIds = (idfById.keys ++ filterIds).toSeq
        val top = spark.read.parquet(s"$d/blocks")
          .select(PostingBlock.columns.map(col): _*)
          .filter(col("termId").isin(termIds.map(Long.box): _*))
          .as[PostingBlock]
          .groupByKey(_.shard)
          .flatMapGroups { (_, blocks) =>
            Phrase.topK(blocks, phraseIdSeqs, idfById, filterIds, gAvgdl, params, kk)
          }
          .orderBy(desc("score"), asc("docId"))
          .limit(kk)
          .toDF("docId", "score")
        spark.read.parquet(s"$d/docs")
          .join(broadcast(top), Seq("docId"))
          .select("repo", "path", "commit", "score")
          .as[ScoredHit]
          .collect()
      }
    }
    hits.sortBy(h => (-h.score, h.repo, h.path, h.commit)).take(k).toArray
  }
}
