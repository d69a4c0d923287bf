package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer

/** Brute-force BM25 top-k as a plain declarative DataFrame plan — the
  * correctness oracle the engine must be rank-identical to (docIDs and
  * scores), playing the role of the mocked-Elasticsearch golden rows in the
  * reference's tests (`luigi_pipeline/tests/test_seqr_sv_loading.py:411-520`).
  *
  * Fully independent of the index: recomputes N, avgdl, df and tf from the
  * raw corpus. The only shared artifacts with the engine are the analyzer
  * and the BM25 constants — deliberately, since those define the contract.
  *
  * Determinism contract with the engine (bit-identical doubles):
  *  - idf values are computed driver-side with the same [[BM25.idf]]
  *    function and injected as literals (no dependence on Catalyst's log);
  *  - the tf-normalization Column expression mirrors [[BM25.tfNorm]]'s
  *    association order exactly;
  *  - per-document contributions are summed in ascending term order via
  *    `aggregate(array_sort(...))`, the same order the engine uses
  *    (ascending dense termId == ascending term).
  */
object Oracle {

  /** Analyzed content token stream under `cspec` — the code default keeps
    * the original Column-level analyzer; other specs route through a udf
    * over the engine's own tokenizeIndexed (index-time stream: stopword
    * gaps + synonym injections). */
  private def analyzedCol(cspec: graft.analysis.AnalyzerSpec): Column =
    if (cspec.isCode) Analyzer.analyze(col("content"))
    else {
      val sp = cspec
      udf((text: String) =>
        graft.analysis.AnalyzerSpec.tokenizeIndexed(sp, text)._1.toSeq).apply(col("content"))
    }

  /** Top-k over a corpus with columns (repo, path, commit, lang, content).
    * Returns (repo, path, commit, score) ordered (score desc, identity asc).
    * Understands the engine's keyword-filter syntax (`lang:x` / `repo:y`
    * whitespace tokens): filters restrict which docs may be scored, while
    * N, avgdl and df stay index-wide — matching ES keyword-filter
    * semantics and the engine's non-scoring required cursors. */
  def bm25(
      corpus: DataFrame,
      query: String,
      k: Int,
      p: Bm25Params = BM25.Default,
      /** the engine index's keyword-filter field set (meta.keywords); None
        * falls back to the schema-derived rule (FieldConfig.derive) — pass
        * the engine's set when the index was built with a custom FieldConfig
        * so `col:value` tokens split filter-vs-content identically. */
      keywordFields: Option[Set[String]] = None,
      /** ES `minimum_should_match` over the scored (should) clauses: a doc
        * needs ≥ this many DISTINCT contributing terms — mirrors the
        * engine's per-cursor count exactly (each prefix/fuzzy expansion is
        * its own clause under the scoring_boolean rewrite). */
      minShouldMatch: Int = 1,
      /** content analyzer of the index under test (an
        * `analyzers("content")` override) — the oracle re-derives its
        * document token streams and query analysis under the same spec.
        * Code-analyzer default keeps the original Column-level path.
        * Note: dl derives from the stream length, so specs with index-time
        * stopwords/synonyms (dl = survivors, injections excluded) need the
        * per-field oracle shape instead (fts75/fts77); plain kinds (code,
        * lowercase, whitespace, porter) are exact. */
      cspec: graft.analysis.AnalyzerSpec = graft.analysis.AnalyzerSpec.Code): DataFrame = {
    // The full query grammar is parsed by the ENGINE's parser (shared on
    // purpose — the split rules cannot diverge): `"quoted spans"` are
    // exact-phrase requirements matched over the same analyzed token stream
    // the engine stores positions for (the ORDERED token sequence must
    // appear at consecutive stream indices; phrase docs are gated like
    // keyword filters — candidates, not stats — and scored by the ordinary
    // BM25 sum over the phrase's distinct terms); `-token` excludes every
    // document containing any of the token's analyzed terms (ES must_not —
    // candidates only, stats index-wide); `stem*` scores every corpus term
    // matching the stem with its own idf (ES prefix, scoring_boolean
    // rewrite; the oracle is uncapped — keep test vocabularies under the
    // engine's maxExpansions).
    val kwFields: Set[String] = keywordFields.getOrElse(
      graft.index.FieldConfig.derive(corpus.schema).keyword.toSet)
    val pq = Searcher.parseFull(query, kwFields, cspec)
    val phraseSeqs: Seq[Seq[String]] = pq.phrases.map(_.toSeq).toSeq
    val qTerms = (pq.terms ++ phraseSeqs.flatten).distinct.sorted.toSeq
    val prefixes = pq.prefixes.toSeq
    val excluded = pq.excluded.toSeq
    val filterPred: Column = filterGate(pq)
    // carry every non-content column: any of them may be a keyword filter
    val metaCols = corpus.columns.filterNot(_ == "content").toSeq
    val phraseOk: Column = phraseGate(phraseSeqs, pq.slops.toSeq)
    // ES must_not gate: true iff the doc contains ANY excluded term
    val exHit: Column = excludedGate(excluded)
    val docTok = corpus
      .select(metaCols.map(col) :+ analyzedCol(cspec).as("toks"): _*)
      .select(metaCols.map(col) :+ size(col("toks")).cast("long").as("dl") :+ col("toks"): _*)
      .withColumn("_pok", phraseOk && !exHit)
      .persist()
    try {
      val statsRow = docTok.agg(count("*").as("n"), sum("dl").as("sumDl")).head()
      val n = statsRow.getAs[Long]("n")
      val avgdl = statsRow.getAs[Long]("sumDl").toDouble / n.toDouble

      // scored-term predicate: the literal terms plus every corpus term
      // matching a prefix pattern (the engine's dictionary expansion and a
      // corpus term scan see the same term set by construction)
      val termPred: Column = (
        (if (qTerms.isEmpty) Seq.empty[Column] else Seq(col("term").isin(qTerms: _*))) ++
          prefixes.map(pf => col("term").startsWith(pf)) ++
          // fuzzy stems: every corpus term within the edit bound is scored
          // (Spark's levenshtein = the engine's editWithin cost model)
          pq.fuzzies.toSeq.map { case (st, b) =>
            levenshtein(col("term"), lit(st)) <= b } ++
          // wildcard/regexp patterns: anchored regex over whole corpus
          // terms — the SAME glob translation the engine expands with
          pq.wildcards.toSeq.map(g =>
            col("term").rlike(s"^(?:${Searcher.globToRegex(g)})$$")) ++
          pq.regexps.toSeq.map(r => col("term").rlike(s"^(?:$r)$$"))
        ).reduceOption(_ || _).getOrElse(lit(false))
      val tfq = docTok
        .select(metaCols.map(col) :+ col("_pok") :+ col("dl") :+ explode(col("toks")).as("term"): _*)
        .filter(termPred)
        .groupBy((metaCols :+ "_pok" :+ "dl" :+ "term").map(col): _*)
        .agg(count(lit(1)).as("tf"))

      val dfByTerm: Map[String, Long] = tfq.groupBy("term").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // query-time boost folds into the per-term idf (identical JVM product
      // to the engine's driver-side idf×boost — bit-exact for ×1.0 terms)
      val idfByTerm: Map[String, Double] =
        dfByTerm.map { case (t, df) => t -> BM25.idf(n, df) * pq.boostOf(t) }

      if (idfByTerm.isEmpty)
        return corpus.sparkSession.emptyDataFrame
          .select(lit("").as("repo"), lit("").as("path"), lit("").as("commit"),
            lit(0.0).as("score"))
          .limit(0)

      // mirrors BM25.tfNorm: tf / (tf + k1 * ((1-b) + (b*dl)/avgdl))
      val tfd = col("tf").cast("double")
      val tfn = tfd / (tfd + lit(p.k1) * (lit(1.0 - p.b) + lit(p.b) * col("dl").cast("double") / lit(avgdl)))
      val contrib = element_at(typedLit(idfByTerm), col("term")) * tfn

      tfq
        .filter(filterPred && col("_pok")) // filters/phrases gate candidates, not stats
        .select(col("repo"), col("path"), col("commit"),
          struct(col("term"), contrib.as("c")).as("tc"))
        .groupBy("repo", "path", "commit")
        .agg(
          aggregate(
            array_sort(collect_list(col("tc"))),
            lit(0.0),
            (acc, x) => acc + x.getField("c")).as("score"),
          count(lit(1)).as("_nclauses")) // distinct terms: tfq is per (doc, term)
        .filter(col("_nclauses") >= minShouldMatch)
        .drop("_nclauses")
        .orderBy(desc("score"), asc("repo"), asc("path"), asc("commit"))
        .limit(k)
    } finally docTok.unpersist()
  }

  /** keyword / negated-keyword / range filter gate (ES filter context). */
  private def filterGate(pq: Searcher.ParsedQuery): Column = (
    pq.filters.toSeq.map { f =>
      val Array(field, value) = f.split(":", 2)
      col(field) === value
    } ++
      // negated keyword filters (ES must_not term filter): null-safe so a
      // doc with a missing field passes, matching the engine (no posting
      // for the filter term → never excluded)
      pq.excludedFilters.toSeq.map { f =>
        val Array(field, value) = f.split(":", 2)
        !(col(field) <=> value)
      } ++
      // numeric range filters (ES range query, filter context): the SHARED
      // RangeFilter.pred Column — the engine's docs-relation accept scan
      // evaluates the identical predicate
      pq.ranges.toSeq.map(_.pred)
    ).foldLeft(lit(true))(_ && _)

  /** All-phrases-aligned gate over the analyzed `toks` column. Slop 0 =
    * exact adjacency; slop S = the engine's in-order span semantics
    * (strictly increasing indices hitting the phrase terms in order, total
    * span ≤ exact span + S), expressed as nested higher-order `exists`
    * over index windows — a genuinely different formulation from the
    * engine's greedy position-chain kernel. */
  private def phraseGate(phraseSeqs: Seq[Seq[String]], slops: Seq[Int]): Column =
    phraseSeqs.zipWithIndex.map { case (ph, pi) =>
      val m = ph.length
      val slop = if (pi < slops.length) slops(pi) else 0
      val n = size(col("toks"))
      if (slop == 0)
        when(n >= m,
          exists(sequence(lit(1), n - m + 1),
            i => ph.zipWithIndex.map { case (t, j) =>
              element_at(col("toks"), i + j) === lit(t)
            }.reduce(_ && _)))
          .otherwise(lit(false))
      else {
        // slot j (0-based) may sit anywhere in (prev, i1 + j + slop] — the
        // remaining slots still fit iff the FINAL index ≤ i1 + (m-1) + slop,
        // and intermediate slots can never exceed their own cap and leave
        // room, so per-slot caps are exact, not a relaxation
        def rest(j: Int, prev: Column, i1: Column): Column =
          if (j == m) lit(true)
          else {
            val hi = least(i1 + lit(j + slop), n)
            when(prev < hi,
              exists(sequence(prev + 1, hi),
                ij => (element_at(col("toks"), ij) === lit(ph(j))) && rest(j + 1, ij, i1)))
              .otherwise(lit(false))
          }
        when(n >= m,
          exists(sequence(lit(1), n - m + 1),
            i1 => (element_at(col("toks"), i1) === lit(ph.head)) && rest(1, i1, i1)))
          .otherwise(lit(false))
      }
    }.foldLeft(lit(true))(_ && _)

  /** ES must_not gate: true iff the doc contains ANY excluded term. */
  private def excludedGate(excluded: Seq[String]): Column =
    if (excluded.isEmpty) lit(false)
    else exists(col("toks"), t => t.isin(excluded: _*))

  /** The full bool-query match gate over a corpus row with an analyzed
    * `toks` column — mirrors [[Searcher]]'s `matchIdsDs` semantics exactly:
    * phrases are must clauses (all aligned; loose terms don't gate), scored
    * terms are should clauses (≥ `minShouldMatch` DISTINCT matching terms —
    * each prefix/fuzzy-expanded corpus term is its own clause under the
    * scoring_boolean rewrite, and the engine dedups expanded cursors so a
    * term matching two patterns still counts once), keyword/range filters
    * are filter clauses, negations must_not. A query with NO scoring clause
    * is pure filter context; entirely empty = match_all. */
  private def matchGate(pq: Searcher.ParsedQuery, minShouldMatch: Int): Column = {
    val phraseSeqs: Seq[Seq[String]] = pq.phrases.map(_.toSeq).toSeq
    val base = filterGate(pq) && !excludedGate(pq.excluded.toSeq)
    if (phraseSeqs.nonEmpty) phraseGate(phraseSeqs, pq.slops.toSeq) && base
    else if (pq.hasScoringClauses) {
      val qTerms = pq.terms.distinct.toSeq
      // one should-clause per DISTINCT matching term (engine cursor = one
      // dense termId; expansions are deduped against literals)
      val tokPred: Column => Column = t => (
        (if (qTerms.isEmpty) Seq.empty[Column] else Seq(t.isin(qTerms: _*))) ++
          pq.prefixes.toSeq.map(pf => t.startsWith(pf)) ++
          pq.fuzzies.toSeq.map { case (st, b) => levenshtein(t, lit(st)) <= b }
        ).reduce(_ || _)
      val clauseHits = size(filter(array_distinct(col("toks")), tokPred))
      (clauseHits >= minShouldMatch) && base
    } else base // ES filter context / match_all
  }

  /** The query's FULL match set the brute-force way — the oracle for
    * [[Searcher]] match-set consumers (`count`, `facets`, `statsAgg`,
    * `histogram`, `searchSortedBy`): every corpus row passing [[matchGate]],
    * original columns preserved. */
  def matchingDocs(
      corpus: DataFrame,
      query: String,
      keywordFields: Option[Set[String]] = None,
      minShouldMatch: Int = 1,
      /** content analyzer of the index under test (an
        * `analyzers("content")` override) — the oracle re-derives its
        * document token streams and query analysis under the same spec.
        * Code-analyzer default keeps the original Column-level path. */
      cspec: graft.analysis.AnalyzerSpec = graft.analysis.AnalyzerSpec.Code): DataFrame = {
    val kwFields: Set[String] = keywordFields.getOrElse(
      graft.index.FieldConfig.derive(corpus.schema).keyword.toSet)
    val pq = Searcher.parseFull(query, kwFields, cspec)
    corpus
      .withColumn("toks", analyzedCol(cspec))
      .filter(matchGate(pq, minShouldMatch))
      .drop("toks")
  }

  /** Facet counts the brute-force way — the oracle for
    * [[Searcher.facets]] / [[MultiSearcher.facets]] (ES `terms`
    * aggregation in query context): group the documents MATCHING the query
    * ([[matchGate]] semantics) by a metadata column and count, ordered
    * (count desc, value asc), top `topN`. Docs with a null field value are
    * skipped (ES agg rule). */
  def facets(
      corpus: DataFrame,
      query: String,
      field: String,
      topN: Int,
      keywordFields: Option[Set[String]] = None): Array[(String, Long)] =
    matchingDocs(corpus, query, keywordFields)
      .filter(col(field).isNotNull)
      .groupBy(col(field).cast("string").as("value"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), asc("value"))
      .limit(topN)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))

  /** ES `significant_terms` the brute-force way — the oracle for
    * [[Searcher.significantTerms]] / [[MultiSearcher.significantTerms]]:
    * per-term distinct-doc counts over the match set (fg) and the whole
    * corpus (bg) straight from the analyzed content (no index), JLH score
    * `(fgRate − bgRate) · fgRate / bgRate` in the engine's exact expression
    * order (bit-identical doubles), fgRate > bgRate only. Content terms
    * never contain ':' so the engine's keyword-filter-term exclusion needs
    * no mirror here. */
  def significantTerms(
      corpus: DataFrame,
      query: String,
      topN: Int,
      minDocCount: Int = 3,
      keywordFields: Option[Set[String]] = None): DataFrame = {
    val fgTotal = matchingDocs(corpus, query, keywordFields).count().toDouble
    val n = corpus.count().toDouble
    def termDocs(df: DataFrame): DataFrame =
      df.select(explode(array_distinct(Analyzer.analyze(col("content")))).as("term"))
    val fg = termDocs(matchingDocs(corpus, query, keywordFields))
      .groupBy("term").agg(count(lit(1)).as("fg"))
    val bg = termDocs(corpus).groupBy("term").agg(count(lit(1)).as("bg"))
    val fgRate = col("fg") / fgTotal
    val bgRate = col("bg") / n
    fg.join(bg, Seq("term"))
      .filter(col("fg") >= minDocCount && fgRate > bgRate)
      .select(col("term"), col("fg"), col("bg"),
        ((fgRate - bgRate) * fgRate / bgRate).as("score"))
      .orderBy(desc("score"), asc("term"))
      .limit(topN)
  }

  /** ES `more_like_this` term selection the brute-force way — the oracle
    * for [[Searcher.moreLikeThis]]'s driver-side selection: per-term
    * `tf(likeText) · idf(corpus)` with the min_term_freq / min_doc_freq
    * gates, top maxQueryTerms by (score desc, term asc). Run the result
    * through [[bm25]] for the expected hits. */
  def mltSelect(corpus: DataFrame, likeText: String, maxQueryTerms: Int,
      minTermFreq: Int, minDocFreq: Int): Seq[String] = {
    val tf: Map[String, Int] = Analyzer.tokenize(likeText)
      .groupBy(identity).map { case (t, xs) => t -> xs.length }
    val n = corpus.count()
    val dfMap = corpus
      .select(explode(array_distinct(Analyzer.analyze(col("content")))).as("t"))
      .groupBy("t").agg(count(lit(1)).as("df")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    tf.toSeq
      .collect { case (t, f) if f >= minTermFreq && dfMap.getOrElse(t, 0L) >= minDocFreq =>
        (t, f.toDouble * BM25.idf(n, dfMap(t)))
      }
      .sortBy { case (t, s) => (-s, t) }
      .take(maxQueryTerms)
      .map(_._1)
  }

  /** Driver-side expected snippet for [[Searcher.highlight]] oracles: the
    * same window-around-first-match rule over [[Analyzer.tokenize]]'s token
    * stream (None = no highlight term present, the engine's null snippet). */
  def snippet(content: String, hlTerms: Seq[String], window: Int): Option[String] = {
    val toks = Analyzer.tokenize(content)
    val idxs = hlTerms.map(t => toks.indexOf(t)).filter(_ >= 0)
    if (idxs.isEmpty) None
    else {
      val p = idxs.min
      val start = math.max(0, p - window)
      val end = math.min(toks.length - 1, p + window)
      Some((start to end).map { i =>
        if (hlTerms.contains(toks(i))) s"<em>${toks(i)}</em>" else toks(i)
      }.mkString(" "))
    }
  }
}
