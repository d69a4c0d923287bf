package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.analysis.Analyzer

/** ES `percolate` query — the REVERSE search: queries are registered up
  * front, then a stream of documents is matched against ALL of them in one
  * distributed pass ("which saved searches / alerts does this doc hit?").
  * ES implements this by indexing the query set and running each percolated
  * document through a one-doc in-memory index; the Spark-native shape is a
  * broadcast of the parsed query set and a narrow `mapPartitions` over the
  * incoming documents — per-doc work is O(queries) with no shuffle, so
  * percolating a 100 TB backfill is one linear pass, and a streaming
  * micro-batch composes with [[graft.streaming.StreamingIndexer]]'s
  * foreachBatch as the alerting side-channel.
  *
  * Query semantics are the engine's ES bool query context, evaluated
  * against the document itself exactly as a one-doc index would:
  *  - scored terms are SHOULD clauses (≥ minShouldMatch present);
  *  - pattern clauses (prefix / wildcard / regexp / fuzzy) expand against
  *    THE DOCUMENT'S OWN token set (ES percolator: the doc IS the index);
  *  - `"quoted phrases"` (with slop) verify against the analyzer's
  *    position stream — the same [[Phrase.spanMatch]] predicate the index
  *    kernels use;
  *  - `field:value` keyword filters match the document's column value
  *    (array columns = list containment), negations are must_not.
  * Numeric range filters are not supported here (they need typed doc
  * values; register them as a post-filter on the percolate output). */
class Percolator(
    registered: Seq[(String, String)],
    keywordFields: Set[String] = Set("lang", "repo"),
    /** content analyzer of the index the documents come from (ES
      * percolate analyzes the candidate doc with the mapped analyzer) */
    contentSpec: graft.analysis.AnalyzerSpec = graft.analysis.AnalyzerSpec.Code)
    extends Serializable {

  require(registered.nonEmpty, "no registered queries")
  require(registered.map(_._1).distinct.length == registered.length,
    "registered query ids must be distinct")

  private val parsed: Seq[(String, Searcher.ParsedQuery)] =
    registered.map { case (id, q) =>
      val pq = Searcher.parseFull(q, keywordFields, contentSpec)
      require(pq.ranges.isEmpty,
        s"percolator query '$id' uses a numeric range filter — not supported " +
          "(apply it as a post-filter on the percolate output)")
      (id, pq)
    }
  private val needPositions: Boolean = parsed.exists(_._2.phrases.nonEmpty)
  /** wildcard/regexp patterns compiled ONCE per registered query
    * (java.util.regex.Pattern is serializable), not per document */
  private val compiledPatterns: Map[String, Array[java.util.regex.Pattern]] =
    parsed.map { case (id, pq) =>
      id -> (pq.wildcards.map(g =>
          java.util.regex.Pattern.compile(s"^(?:${Searcher.globToRegex(g)})$$")) ++
        pq.regexps.map(rx => java.util.regex.Pattern.compile(s"^(?:$rx)$$")))
    }.toMap

  /** Match a batch of documents (corpus rows) against every registered
    * query: one narrow pass, output (repo, path, commit, query_id) — one
    * row per (doc, matching query). */
  def percolate(docs: DataFrame, minShouldMatch: Int = 1): DataFrame = {
    require(minShouldMatch >= 1, s"minShouldMatch must be >= 1 (got $minShouldMatch)")
    val kwCols: Seq[String] = keywordFields.toSeq.sorted.filter(docs.columns.contains)
    val sel = docs.select((Seq("repo", "path", "commit", "content") ++ kwCols).map(col): _*)
    val outSchema = StructType(Seq(
      StructField("repo", StringType), StructField("path", StringType),
      StructField("commit", StringType), StructField("query_id", StringType)))
    val ps = parsed
    val pats = compiledPatterns
    val needPos = needPositions
    val msm = minShouldMatch
    val nKw = kwCols.length
    val kwNames = kwCols.toArray
    val cspec0 = contentSpec
    sel.mapPartitions { it =>
      it.flatMap { r =>
        val toks = graft.analysis.AnalyzerSpec.queryTokens(cspec0, r.getString(3))
        val tokSet = new java.util.HashSet[String]()
        var i = 0
        while (i < toks.length) { tokSet.add(toks(i)); i += 1 }
        // positions per token, only when some registered query has phrases
        val posOf: java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Long]] =
          if (!needPos) null
          else {
            val m = new java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Long]]()
            var j = 0
            while (j < toks.length) {
              var buf = m.get(toks(j))
              if (buf == null) { buf = new scala.collection.mutable.ArrayBuffer[Long](4); m.put(toks(j), buf) }
              buf += j.toLong
              j += 1
            }
            m
          }
        // keyword column values (string → singleton, array → element set)
        val kw = new java.util.HashMap[String, Set[String]]()
        var c = 0
        while (c < nKw) {
          val v = r.get(4 + c)
          val set: Set[String] = v match {
            case null => Set.empty
            case s: String => Set(s)
            case xs: scala.collection.Seq[_] =>
              xs.iterator.collect { case e: String => e }.toSet
            case other => Set(String.valueOf(other))
          }
          kw.put(kwNames(c), set)
          c += 1
        }

        def kwMatch(filterTerm: String): Boolean = {
          val cut = filterTerm.indexOf(':')
          if (cut <= 0) return false
          val f = filterTerm.substring(0, cut)
          val v = filterTerm.substring(cut + 1)
          val set = kw.get(f)
          set != null && set.contains(v)
        }

        def matches(id: String, pq: Searcher.ParsedQuery): Boolean = {
          // filter context: every keyword filter must hold, no must_not may
          if (!pq.filters.forall(kwMatch)) return false
          if (pq.excludedFilters.exists(kwMatch)) return false
          if (pq.excluded.exists(tokSet.contains)) return false
          // must phrases: all tokens present + span verified in order
          var pi = 0
          while (pi < pq.phrases.length) {
            val ph = pq.phrases(pi)
            if (!ph.forall(tokSet.contains)) return false
            val slots = ph.map(t => posOf.get(t).toArray.sorted)
            if (!Phrase.spanMatch(slots, pq.slopOf(pi), ordered = true, endBound = -1))
              return false
            pi += 1
          }
          // should clauses, counted EXACTLY like the index side: under the
          // scoring_boolean rewrite every dictionary expansion is its own
          // should clause, and the index kernel counts the DISTINCT matched
          // terms of (literal ∪ expansions) — so here each distinct document
          // token satisfying ANY clause (literal term, prefix, fuzzy,
          // wildcard/regexp) counts once, and a token matched by several
          // clauses still counts once (it is one dictionary term index-side)
          if (!pq.hasScoringClauses) return true
          var hits = 0
          val tIt = tokSet.iterator()
          while (hits < msm && tIt.hasNext) {
            val t = tIt.next()
            if (pq.terms.contains(t) ||
              pq.prefixes.exists(t.startsWith) ||
              pq.fuzzies.exists { case (st, b) => Searcher.editWithin(st, t, b) } ||
              pats(id).exists(p => p.matcher(t).matches())) hits += 1
          }
          hits >= msm
        }

        val repo = r.getString(0); val path = r.getString(1); val commit = r.getString(2)
        ps.iterator.collect { case (id, pq) if matches(id, pq) =>
          org.apache.spark.sql.Row(repo, path, commit, id)
        }
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
