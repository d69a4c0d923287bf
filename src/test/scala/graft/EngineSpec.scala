package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index.{FieldConfig, IndexBuilder, IndexConfig, PostingBlock}
import graft.search.{Oracle, ScoredDoc, Searcher}

/** End-to-end engine tests: build over the deterministic synthesized corpus,
  * then assert rank-identical top-k (docIDs AND bit-identical BM25 scores)
  * against the brute-force DataFrame oracle for the frozen reference query
  * set, plus lineage / dense-id / resume-equivalence invariants
  * (SURVEY.md §5 modes 3 and 5; north-rule correctness gate). */
class EngineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val NumFiles = 400L
  private val Seed = 7L
  // small shards/blocks so multi-shard + multi-block + block-skip paths run
  // `nbytes` is a stored-only NUMERIC column (no postings, ES doc_values
  // analogue) so range-filter queries run against the main index
  private val cfg = IndexConfig(
    buildPartitions = 8, docsPerShard = 64L, blockSize = 16, buildBuckets = 3,
    fields = FieldConfig(keyword = Seq("lang", "repo"), storedOnly = Seq("nbytes")))

  private lazy val corpus = CorpusGen.generate(spark, NumFiles, Seed, partitions = 8).toDF()
    .withColumn("nbytes", length(col("content")).cast("long"))

  private lazy val workDir = Files.createTempDirectory("graft-engine").toString
  private lazy val indexDir = {
    val dir = s"$workDir/index"
    new IndexBuilder(spark, cfg).build(corpus, dir, resume = false)
    dir
  }
  private lazy val searcher = new Searcher(spark, indexDir)

  // positions-enabled twin of the main index (phrase-capable) — built once,
  // shared by the phrase test and the match-set tests whose query lists
  // include a phrase shape
  private lazy val posIndexDir = {
    val dir = s"$workDir/phrases"
    new IndexBuilder(spark, cfg.copy(storePositions = true)).build(corpus, dir, resume = false)
    dir
  }
  private lazy val posSearcher = new Searcher(spark, posIndexDir)

  /** The frozen reference query set: rare terms, stop terms, camelCase
    * subtokens, snake_case, multi-term, no-hit — k ∈ {10, 100}. */
  private val QuerySet: Seq[(String, Int)] = Seq(
    ("index", 10), ("merge", 10), ("codec", 10),
    ("def", 10),                    // per-language stop term (heavy df)
    ("if else return", 10),         // several stop terms at once
    ("getIndexValue", 10),          // camelCase → whole + subtokens
    ("parse_json_config", 10),      // snake_case → whole + subtokens
    ("index query score", 10),
    ("shard block batch stream", 10),
    ("http tcp udp", 10),
    ("zzz_not_a_term", 10),         // no hits
    ("merge zzz_not_a_term", 10),   // partial hit
    ("val class object", 100),
    ("query", 100),
    ("buffer cache pool queue stack", 25),
    ("error fail retry timeout", 10),
    ("lang:scala index", 10),          // keyword filter + content term
    ("lang:md the", 10),               // filter + stop term
    ("lang:go func return query", 10), // filter + multi-term
    ("lang:rs lang:go merge", 10),     // contradictory filters → empty
    ("lang:cobol merge", 10),          // filter value absent from corpus
    ("merge -index", 10),              // negated term (ES must_not)
    ("query -def -return", 25),        // two negations
    ("merge -zzz_not_a_term", 10),     // negating an absent term: no-op
    ("lang:scala query -def", 10),     // filter + negation compose
    ("ind* merge", 10),                // prefix + literal term
    ("mer*", 10),                      // pure prefix query
    ("qqqqzzzz*", 10),                 // prefix matching nothing → no hits
    ("ind* -merge lang:scala", 10),    // prefix + negation + filter
    ("query -lang:scala", 25),         // negated keyword filter (must_not)
    ("merge -lang:md -index", 10),     // negated filter + negated term
    ("query -lang:cobol", 10),         // negating an absent filter value: no-op
    ("merge~1", 10),                   // fuzzy: edit-distance-1 expansion
    ("indxe~2 query", 10),             // fuzzy typo (distance 2) + literal
    ("qzqzqzqz~2", 10),                // fuzzy matching nothing → no hits
    ("merge~1 -index lang:scala", 10), // fuzzy + negation + filter
    ("index^2 merge", 10),             // boosted term reorders vs unboosted
    ("query^0.5 def score", 25),       // fractional down-boost
    ("index^2 merge~1 -def", 10),      // boost + fuzzy + negation compose
    ("merge nbytes:>=500", 10),        // numeric range filter (ES range, filter ctx)
    ("query nbytes:200..800", 25),     // bounded range
    ("index nbytes:<400 lang:scala", 10),  // range + keyword filter
    ("merge -nbytes:>=500", 10),       // negated range (must_not range)
    ("query nbytes:>=99999999", 10),   // range matching nothing → no hits
    ("m?rge", 10),                     // wildcard: single-char hole
    ("ind*x qu?ry", 10),               // wildcard mid-star + hole, two patterns
    ("*dex merge", 10),                // leading-star wildcard + literal
    ("z?q*z", 10),                     // wildcard matching nothing → no hits
    ("m?rge -index lang:scala", 10),   // wildcard + negation + filter
    ("/ind(ex|exes)/", 10),            // regexp: alternation, anchored
    ("/m.rge/ query", 10),             // regexp + literal term
    ("/zz+qq/", 10),                   // regexp matching nothing → no hits
    ("/qu[aeiou]ry/ -def nbytes:>=200", 10), // regexp + negation + range
    ("merge exists:nbytes", 10),       // exists on an always-present column ≡ base query
    ("query -exists:nbytes", 10),      // must_not exists on an always-present column → empty
    ("index exists:nbytes lang:scala", 10)) // exists + keyword filter compose

  private def engineHits(q: String, k: Int): Seq[(String, String, String, Double)] = {
    val hits = searcher.search(q, k)
    val docs = spark.read.parquet(s"$indexDir/docs")
      .select("docId", "repo", "path", "commit").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2), r.getString(3))).toMap
    hits.toSeq.map(h => { val d = docs(h.docId); (d._1, d._2, d._3, h.score) })
  }

  private def oracleHits(q: String, k: Int): Seq[(String, String, String, Double)] =
    Oracle.bm25(corpus, q, k, keywordFields = Some(searcher.meta.keywords.toSet)).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))

  test("meta sanity: docs, avgdl, analyzer version") {
    val m = searcher.meta
    assert(m.numDocs == NumFiles)
    assert(m.avgdl > 0)
    assert(m.analyzer == graft.analysis.Analyzer.Version)
    assert(m.numPostings > 0 && m.numTerms > 0 && m.numBlocks > 0)
  }

  test("dense docIds: 0..N-1, ordered by (repo, path, commit)") {
    val docs = spark.read.parquet(s"$indexDir/docs")
      .select("docId", "repo", "path", "commit").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2), r.getString(3))))
    assert(docs.map(_._1).sorted.toSeq == (0L until NumFiles).toSeq)
    val byId = docs.sortBy(_._1).map(_._2).toSeq
    assert(byId == byId.sorted, "docId order must equal identity sort order")
  }

  test("lineage: per-row sha256 equality vs source + xor fingerprint") {
    val srcSha = corpus.select(col("repo"), col("path"), col("commit"),
      sha2(col("content"), 256).as("sha"))
    val idxSha = spark.read.parquet(s"$indexDir/docs")
      .select(col("repo"), col("path"), col("commit"), col("sha256"))
    val mismatches = srcSha.join(idxSha, Seq("repo", "path", "commit"))
      .filter(col("sha") =!= col("sha256")).count()
    assert(mismatches == 0L)
    val xor = srcSha.agg(expr("bit_xor(xxhash64(sha))")).head().getLong(0)
    assert(xor == searcher.meta.lineage)
  }

  test("block invariants: sorted docIds, within-shard, admissible maxTfn") {
    import spark.implicits._
    val blocks = spark.read.parquet(s"$indexDir/blocks")
      .select(graft.index.PostingBlock.columns.map(col): _*)
      .as[PostingBlock].collect()
    val (avgdl, p) = (searcher.meta.avgdl, graft.search.Bm25Params(cfg.k1, cfg.b))
    blocks.foreach { b =>
      val ids = b.docIds
      assert(ids.length == b.n && b.n <= cfg.blockSize)
      assert(ids.head == b.firstDoc && ids.last == b.lastDoc)
      assert(ids.zip(ids.tail).forall { case (a, c) => a < c }, "strictly increasing")
      assert(ids.forall(_ / cfg.docsPerShard == b.shard), "no shard-spanning block")
      val tfs = b.tfValues; val dls = b.dlValues
      val maxTfn = (0 until b.n).map(i => graft.search.BM25.tfNorm(tfs(i), dls(i), avgdl, p)).max
      assert(b.maxTfn.toDouble >= maxTfn, "block-max bound must be admissible")
    }
    // every (termId, docId) appears exactly once across blocks
    val all = blocks.flatMap(b => b.docIds.map(d => (b.termId, d)))
    assert(all.length == all.distinct.length)
    assert(all.length.toLong == searcher.meta.numPostings)
  }

  test("frozen query set: rank-identical docIDs and bit-identical scores vs oracle") {
    for ((q, k) <- QuerySet) {
      val eng = engineHits(q, k)
      val ora = oracleHits(q, k)
      assert(eng.map(t => (t._1, t._2, t._3)) == ora.map(t => (t._1, t._2, t._3)),
        s"doc ranking mismatch for query '$q' (k=$k)\nengine=${eng.take(5)}\noracle=${ora.take(5)}")
      eng.zip(ora).zipWithIndex.foreach { case ((e, o), i) =>
        assert(java.lang.Double.doubleToLongBits(e._4) == java.lang.Double.doubleToLongBits(o._4),
          s"score not bit-identical for query '$q' rank $i: engine=${e._4} oracle=${o._4}")
      }
    }
  }

  test("no-hit query returns empty") {
    assert(searcher.search("qqqqzzzz", 10).isEmpty)
  }

  test("keyword filter restricts hits to the filtered language") {
    val hits = searcher.search("lang:scala def val", 50)
    assert(hits.nonEmpty)
    val langs = spark.read.parquet(s"$indexDir/docs")
      .select("docId", "lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hits.forall(h => langs(h.docId) == "scala"))
    // repo filter composes with lang filter
    val someRepo = spark.read.parquet(s"$indexDir/docs")
      .filter(col("lang") === "java").select("repo").head().getString(0)
    val rHits = searcher.search(s"repo:$someRepo lang:java class", 50)
    val docs = spark.read.parquet(s"$indexDir/docs")
      .select("docId", "repo", "lang").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(rHits.forall(h => docs(h.docId) == (someRepo, "java")))
  }

  test("k larger than corpus returns all matching docs, still rank-identical") {
    val eng = engineHits("merge", 1000)
    val ora = oracleHits("merge", 1000)
    assert(eng == ora)
  }

  test("negation semantics: excluded docs absent, survivors' scores unchanged") {
    val base = searcher.search("merge", 1000).map(h => h.docId -> h.score).toMap
    val neg = searcher.search("merge -index", 1000)
    assert(neg.nonEmpty && neg.length < base.size, "negation must drop some docs")
    // docs containing 'index' are gone; the rest keep their exact score
    // (must_not rejects candidates, never perturbs stats)
    val withIndex = searcher.search("index", 100000).map(_.docId).toSet
    neg.foreach { h =>
      assert(!withIndex.contains(h.docId), s"doc ${h.docId} contains the negated term")
      assert(java.lang.Double.doubleToLongBits(h.score) ==
        java.lang.Double.doubleToLongBits(base(h.docId)),
        "negation changed a surviving doc's score")
    }
    // negated keyword filter (must_not term filter): filtered value absent
    val langs = spark.read.parquet(s"$indexDir/docs")
      .select("docId", "lang").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val nf = searcher.search("query -lang:scala", 100000)
    assert(nf.nonEmpty && nf.forall(h => langs(h.docId) != "scala"))
    assert(nf.length < searcher.search("query", 100000).length)
  }

  test("prefix semantics: expansion unions the matching terms' result sets") {
    val pre = searcher.search("mer*", 100000).map(_.docId).toSet
    val lit = searcher.search("merge", 100000).map(_.docId).toSet
    assert(pre.nonEmpty && lit.subsetOf(pre),
      "prefix must cover at least the literal term's docs")
    // every expanded doc must contain SOME dictionary term starting 'mer'
    val merTerms = searcher.expandPrefixMap(Seq("mer")).apply("mer")
    assert(merTerms.contains("merge") && merTerms.forall(_.startsWith("mer")))
    // batch parity: negation + prefix queries through searchMany match search
    val batchQs = Seq(("merge -index", 10), ("mer*", 10), ("ind* -merge lang:scala", 10))
    val batch = searcher.searchMany(batchQs)
    batchQs.zip(batch).foreach { case ((q, k), got) =>
      assert(got.toSeq == searcher.search(q, k).toSeq, s"searchMany mismatch for '$q'")
    }
  }

  test("fuzzy semantics: dictionary expansion by edit distance, each match scored") {
    // every expanded term is within the bound; the stem itself (distance 0)
    // is covered when present
    val m = searcher.expandFuzzyMap(Seq(("merge", 1)))(("merge", 1))
    assert(m.contains("merge") && m.forall(t => Searcher.editWithin("merge", t, 1)))
    val fz = searcher.search("merge~1", 100000).map(_.docId).toSet
    val lit = searcher.search("merge", 100000).map(_.docId).toSet
    assert(fz.nonEmpty && lit.subsetOf(fz),
      "fuzzy must cover at least the exact term's docs")
    // editWithin agrees with the classic DP distance on a property sweep
    val words = Seq("index", "indexes", "indxe", "merge", "mrege", "a", "", "query")
    for (a <- words; b <- words; bound <- 1 to 2) {
      val full = {
        val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0 }
        for (i <- 1 to a.length; j <- 1 to b.length)
          d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
            d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        d(a.length)(b.length)
      }
      assert(Searcher.editWithin(a, b, bound) == (full <= bound),
        s"editWithin('$a','$b',$bound) disagrees with DP distance $full")
    }
    // a fuzzy stem absent within its bound matches nothing
    assert(searcher.search("qzqzqzqz~1", 10).isEmpty)
  }

  test("wildcard/regexp semantics: anchored dictionary expansion, each match scored") {
    // wildcard expansion: every match full-matches the glob; the pure-hole
    // pattern covers at least the literal term's docs
    val wm = searcher.expandWildcardMap(Seq("m?rge"))("m?rge")
    assert(wm.contains("merge"))
    val gp = java.util.regex.Pattern.compile(Searcher.globToRegex("m?rge"))
    assert(wm.forall(t => gp.matcher(t).matches()))
    val wc = searcher.search("m?rge", 100000).map(_.docId).toSet
    val lit = searcher.search("merge", 100000).map(_.docId).toSet
    assert(wc.nonEmpty && lit.subsetOf(wc), "wildcard must cover the literal term's docs")
    // regexp expansion: anchored — 'index' matches /ind(ex|exes)/ but a
    // partial-prefix match like 'indexing' (if present) must not leak
    val rm = searcher.expandRegexpMap(Seq("ind(ex|exes)"))("ind(ex|exes)")
    assert(rm.nonEmpty && rm.forall(t => t == "index" || t == "indexes"))
    // a pattern matching no dictionary term matches nothing
    assert(searcher.search("z?q*z", 10).isEmpty)
    assert(searcher.search("/zz+qq/", 10).isEmpty)
    // a trailing-star-only token still takes the prefix path (same results
    // either way — the glob regex and startsWith agree by construction)
    val viaPrefix = searcher.search("ind*", 50).toSeq
    val viaGlob = searcher.search("ind*x*", 50).toSeq // forced wildcard shape
    assert(viaPrefix.nonEmpty && viaGlob.nonEmpty)
  }

  test("boost semantics: scales the term's contribution, never global stats") {
    // single boosted term: exactly 2× the unboosted scores, same ranking
    val base = searcher.search("merge", 50).toSeq
    val boosted = searcher.search("merge^2", 50).toSeq
    assert(base.map(_.docId) == boosted.map(_.docId))
    base.zip(boosted).foreach { case (b, w) =>
      assert(java.lang.Double.doubleToLongBits(b.score * 2.0) ==
        java.lang.Double.doubleToLongBits(w.score),
        "boost must scale the per-term contribution exactly")
    }
    // multi-term: a strong boost reorders in favor of the boosted term
    val up = searcher.search("index^100 merge", 1000)
    val idxDocs = searcher.search("index", 100000).map(_.docId).toSet
    assert(idxDocs.contains(up.head.docId),
      "heavily boosted term must dominate the top hit")
    // batch parity for fuzzy + boost through searchMany
    val batchQs = Seq(("merge~1", 10), ("index^2 merge", 10),
      ("index^2 merge~1 -def", 10))
    searcher.searchMany(batchQs).zip(batchQs).foreach { case (got, (q, k)) =>
      assert(got.toSeq == searcher.search(q, k).toSeq, s"searchMany mismatch for '$q'")
    }
  }

  test("range filter semantics: doc-values gate on candidates, stats untouched") {
    import java.lang.Double.doubleToLongBits
    // split at the median so both sides are non-trivial
    val med = corpus.stat.approxQuantile("nbytes", Array(0.5), 0.0).head.toLong
    val base = searcher.search("merge", 100000).map(h => h.docId -> h.score).toMap
    val ranged = searcher.search(s"merge nbytes:>=$med", 100000)
    assert(ranged.nonEmpty && ranged.length < base.size, "range must actually filter")
    val nbById = spark.read.parquet(s"$indexDir/docs")
      .select("docId", "nbytes").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    ranged.foreach { h =>
      assert(nbById(h.docId) >= med, s"doc ${h.docId} fails the range")
      assert(doubleToLongBits(h.score) == doubleToLongBits(base(h.docId)),
        "range filter changed a surviving doc's score (filter context must not touch stats)")
    }
    // negated range = exact complement over the matching docs
    val negRanged = searcher.search(s"merge -nbytes:>=$med", 100000).map(_.docId).toSet
    assert(negRanged == base.keySet -- ranged.map(_.docId))
    // unknown field and non-numeric field both reject loudly
    intercept[IllegalArgumentException](searcher.search("merge zzz:>=1", 10))
    intercept[IllegalArgumentException](searcher.search("merge lang:1..2", 10))
    // batch parity through searchMany (mixed ranged + unranged queries)
    val batchQs = Seq((s"merge nbytes:>=$med", 10), ("query nbytes:200..800", 25),
      ("index", 10), (s"index -nbytes:<$med lang:scala", 10))
    searcher.searchMany(batchQs).zip(batchQs).foreach { case (got, (q, k)) =>
      assert(got.toSeq == searcher.search(q, k).toSeq, s"searchMany mismatch for '$q'")
    }
  }

  test("facets: ES terms aggregation over the full match set, oracle-identical") {
    val kw = Some(searcher.meta.keywords.toSet)
    val qs = Seq("merge", "merge index", "lang:scala def", "merge -index", "mer*",
      "merge~1", "query nbytes:>=500")
    for (q <- qs) {
      val eng = searcher.facets(q, "lang", 10).toSeq
      val ora = Oracle.facets(corpus, q, "lang", 10, kw).toSeq
      assert(eng == ora, s"facet mismatch for '$q': engine=$eng oracle=$ora")
    }
    // numeric facet field (values stringified identically on both sides)
    assert(searcher.facets("merge", "nbytes", 5).toSeq ==
      Oracle.facets(corpus, "merge", "nbytes", 5, kw).toSeq)
    // counts sum to the match-set size (lang is never null here)
    val total = searcher.facets("merge", "lang", 100).map(_._2).sum
    assert(total == searcher.search("merge", 100000).length.toLong)
    // unknown facet field rejects loudly
    intercept[IllegalArgumentException](searcher.facets("merge", "zzz", 5))
  }

  test("kill/resume equivalence: crash after each stage, resume, identical index") {
    import spark.implicits._
    def logical(dir: String): Set[(Long, Long, Long, Long)] =
      spark.read.parquet(s"$dir/blocks")
        .select(graft.index.PostingBlock.columns.map(col): _*)
        .as[PostingBlock].collect()
        .flatMap { b =>
          val ids = b.docIds; val tfs = b.tfValues; val dls = b.dlValues
          (0 until b.n).map(i => (b.termId, ids(i), tfs(i), dls(i)))
        }.toSet
    val freshPostings = logical(indexDir)
    val freshMeta = searcher.meta

    for (killAt <- Seq(0, 2, 5)) {
      val dir2 = s"$workDir/resume-$killAt"
      val b = new IndexBuilder(spark, cfg)
      intercept[IndexBuilder.BuildKilled] {
        b.build(corpus, dir2, resume = false, killAfterStage = killAt)
      }
      val meta2 = b.build(corpus, dir2, resume = true)
      // numBlocks is physical layout (block cut points follow read-split
      // geometry); the index contract is the LOGICAL content, which must be
      // identical — queries are bit-identical either way
      assert(meta2.copy(numBlocks = 0L) == freshMeta.copy(numBlocks = 0L),
        s"meta mismatch after resume from stage $killAt")
      assert(logical(dir2) == freshPostings, s"postings mismatch after resume from stage $killAt")
    }
  }

  test("stale checkpoints from a different config are not resumed") {
    val dir3 = s"$workDir/reconfig"
    val b1 = new IndexBuilder(spark, cfg)
    intercept[IndexBuilder.BuildKilled] {
      b1.build(corpus, dir3, resume = false, killAfterStage = 2)
    }
    // different blockSize → different configHash → full rebuild, same logical result
    val cfg2 = cfg.copy(blockSize = 32)
    val meta = new IndexBuilder(spark, cfg2).build(corpus, dir3, resume = true)
    assert(meta.blockSize == 32)
    assert(meta.numPostings == searcher.meta.numPostings)
  }

  test("updateDocFields patches stored fields without touching postings (ES update-op analogue)") {
    import spark.implicits._
    val dir = s"$workDir/maint"
    new index.IndexBuilder(spark, cfg).build(corpus, dir, resume = false)
    val before = new Searcher(spark, dir).search("merge", 10).toSeq
    val someDocs = spark.read.parquet(s"$dir/docs")
      .select("repo", "path", "commit").limit(5).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val updates = someDocs.toSeq.toDF("repo", "path", "commit")
      .withColumn("stars", org.apache.spark.sql.functions.lit(5))
    index.IndexMaintenance.updateDocFields(spark, dir, updates)
    val docs2 = spark.read.parquet(s"$dir/docs")
    assert(docs2.columns.contains("stars"))
    assert(docs2.filter(org.apache.spark.sql.functions.col("stars") === 5).count() == 5)
    assert(docs2.filter(org.apache.spark.sql.functions.col("stars").isNull).count() ==
      NumFiles - 5)
    // postings untouched: identical search results
    val after = new Searcher(spark, dir).search("merge", 10).toSeq
    assert(after == before)
    // structural fields refuse to patch
    intercept[IllegalArgumentException] {
      index.IndexMaintenance.updateDocFields(spark, dir,
        someDocs.toSeq.toDF("repo", "path", "commit")
          .withColumn("dl", org.apache.spark.sql.functions.lit(0L)))
    }
  }

  test("schema-derived field config: extra keyword column queryable, stored-only has no postings") {
    import spark.implicits._
    val dir = s"$workDir/fields"
    // corpus with two extra metadata columns beyond the standard five
    val extended = corpus
      .withColumn("team", concat(lit("team"), (length(col("path")) % 3).cast("string")))
      .withColumn("notes", concat(lit("note for "), col("path")))
    val fcfg = cfg.copy(fields = index.FieldConfig(
      keyword = Seq("lang", "repo", "team"), storedOnly = Seq("notes")))
    new IndexBuilder(spark, fcfg).build(extended, dir, resume = false)

    val docs = spark.read.parquet(s"$dir/docs")
    assert(docs.columns.contains("team") && docs.columns.contains("notes"),
      "keyword and stored-only columns must be stored in docs")

    // `team:x` restricts hits to that team (ES keyword semantics)
    val s = new Searcher(spark, dir)
    val hits = s.search("team:team1 def val", 50)
    assert(hits.nonEmpty)
    val teamById = docs.select("docId", "team").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hits.forall(h => teamById(h.docId) == "team1"))
    // and the oracle agrees (its filter rule is schema-derived the same way)
    val ora = Oracle.bm25(extended, "team:team1 def val", 50,
      keywordFields = Some(s.meta.keywords.toSet)).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
    val eng = {
      val byId = docs.select("docId", "repo", "path", "commit").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
      hits.toSeq.map(h => { val d = byId(h.docId); (d._1, d._2, d._3, h.score) })
    }
    assert(eng == ora)

    // stored-only column produces no postings (disable_index)
    val noteTerms = spark.read.parquet(s"$dir/terms")
      .filter(col("term").startsWith("notes:")).count()
    assert(noteTerms == 0L, "stored-only column must not be posting-listed")
    // keyword terms for `team` exist in the dictionary
    assert(spark.read.parquet(s"$dir/terms")
      .filter(col("term").startsWith("team:")).count() > 0)

    // FieldConfig.derive applies the tstr→keyword rule over the schema
    val derived = index.FieldConfig.derive(extended.schema, storedOnly = Set("notes"))
    assert(derived.keyword.toSet == Set("repo", "path", "commit", "lang", "team"))
    assert(derived.storedOnly == Seq("notes"))
  }

  test("phrase queries: position-verified, rank- and bit-identical to the oracle") {
    import spark.implicits._
    val s = posSearcher
    assert(s.meta.hasPositions)

    val docsById = spark.read.parquet(s"$posIndexDir/docs")
      .select("docId", "repo", "path", "commit").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    def eng(q: String, k: Int) = s.search(q, k).toSeq
      .map(h => { val d = docsById(h.docId); (d._1, d._2, d._3, h.score) })
    def ora(q: String, k: Int) =
      Oracle.bm25(corpus, q, k, keywordFields = Some(s.meta.keywords.toSet)).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))

    val phraseQueries = Seq(
      ("\"if else\"", 20),
      ("\"else if\"", 20),             // order matters
      ("\"index merge\"", 20),
      ("\"query\"", 10),               // single-token phrase == exact term AND
      ("\"def zzz_not_a_term\"", 10),  // absent token → empty
      ("lang:scala \"def value\"", 20), // filter + phrase compose
      ("\"if else\" \"def value\"", 20), // two phrases, both required
      ("\"if else\" query", 20),        // phrase + loose term (mixed)
      ("\"index merge\" def score", 20), // phrase + two loose terms
      ("lang:scala \"def value\" query", 20), // filter + phrase + loose
      ("\"if else\" zzz_not_a_term", 20), // absent loose term contributes 0
      ("\"if else\" if", 20),           // loose term inside the phrase: counted once
      ("\"if else\" -merge", 20),       // phrase + negation
      ("\"if else\" ind*", 20),         // phrase + prefix extras
      ("\"if else\" nbytes:>=400", 20), // phrase + numeric range filter
      ("\"if else\" query -nbytes:<400", 20), // mixed + negated range
      ("\"if else\"~0", 20),            // explicit slop 0 == exact phrase
      ("\"if else\"~1", 20),            // slop 1: one extra token between
      ("\"else if\"~2", 20),            // slop is in-order: order still matters
      ("\"index merge\"~3 query", 20),  // slop phrase + loose term
      ("lang:scala \"def value\"~2", 20), // filter + slop phrase
      ("\"if else\"~2 -merge nbytes:>=200", 20) // slop + negation + range
    )
    for ((q, k) <- phraseQueries) {
      val e = eng(q, k)
      val o = ora(q, k)
      assert(e.map(t => (t._1, t._2, t._3)) == o.map(t => (t._1, t._2, t._3)),
        s"phrase ranking mismatch for $q\nengine=${e.take(5)}\noracle=${o.take(5)}")
      e.zip(o).foreach { case (a, b) =>
        assert(java.lang.Double.doubleToLongBits(a._4) == java.lang.Double.doubleToLongBits(b._4),
          s"phrase score not bit-identical for $q: $a vs $b")
      }
    }
    // at least one multi-token phrase must actually hit (not vacuous)
    assert(eng("\"if else\"", 20).nonEmpty || eng("\"index merge\"", 20).nonEmpty)
    // phrase presence is stricter than bag-of-words: the conjunctive AND of
    // both tokens has at least as many hits as the adjacent-pair phrase
    val bagHits = ora("if else", 1000).size
    assert(eng("\"if else\"", 1000).size <= bagHits)

    // ordinary WAND queries on a positions-enabled index stay bit-identical
    for ((q, k) <- QuerySet.take(8)) {
      val e = eng(q, k)
      val o = ora(q, k)
      assert(e == o, s"WAND-on-positions-index mismatch for '$q'")
    }

    // a mixed query must outrank-or-equal its pure-phrase form for the
    // docs that contain the loose term (sanity: loose terms add, not gate)
    val pure = eng("\"if else\"", 1000).map(t => (t._1, t._2, t._3)).toSet
    val mixed = eng("\"if else\" query", 1000).map(t => (t._1, t._2, t._3)).toSet
    assert(mixed == pure, "loose terms must not change the phrase candidate set")

    // phrase facets: the full phrase match set grouped by lang, oracle-equal
    for (q <- Seq("\"if else\"", "\"if else\" -merge", "\"if else\" nbytes:>=400"))
      assert(s.facets(q, "lang", 10).toSeq ==
        Oracle.facets(corpus, q, "lang", 10, Some(s.meta.keywords.toSet)).toSeq,
        s"phrase facet mismatch for $q")

    // batch form: phrases and mixed queries in searchMany match per-query
    val batchQs = Seq(("\"if else\"", 20), ("\"index merge\" def", 20),
      ("def value", 10), ("lang:scala \"def value\"", 20))
    val batch = s.searchMany(batchQs)
    batchQs.zip(batch).foreach { case ((q, k), got) =>
      assert(got.toSeq == s.search(q, k).toSeq, s"phrase batch mismatch for '$q'")
    }

    // a phrase query against an index without positions fails loudly
    intercept[IllegalStateException] {
      searcher.search("\"index merge\"", 10)
    }
    intercept[IllegalStateException] {
      searcher.searchMany(Seq(("\"index merge\"", 10)))
    }

    // slop monotonicity: the match set only grows with slop, exact ⊆ ~1 ⊆
    // ~2, and even unbounded slop stays within the IN-ORDER pair set
    def ids(q: String) = eng(q, 1000).map(t => (t._1, t._2, t._3)).toSet
    val s0 = ids("\"if else\"")
    val s1 = ids("\"if else\"~1")
    val s2 = ids("\"if else\"~2")
    val sBig = ids("\"if else\"~100000")
    assert(ids("\"if else\"~0") == s0, "explicit ~0 must equal the exact phrase")
    assert(s0.subsetOf(s1) && s1.subsetOf(s2) && s2.subsetOf(sBig),
      "slop match sets must be monotone")
    assert(s1.size > s0.size || s2.size > s1.size || sBig.size > s2.size,
      "slop must admit at least one non-adjacent in-order pair in this corpus (non-vacuous)")
    // in-order: "else if"~2 and "if else"~2 differ unless the corpus is
    // symmetric for the pair (sanity that order is enforced)
    val rev2 = ids("\"else if\"~2")
    assert(s2 != rev2 || s2 == s0, "slop phrases must stay order-sensitive")
  }

  test("collapse: one best hit per field group, then global top-k, oracle-identical") {
    val s = searcher
    // brute-force expectation: full oracle ranking → best per lang → top-k
    val langByIdent = corpus.select("repo", "path", "commit", "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getString(3)).toMap
    for (q <- Seq("index merge", "query score", "lang:scala query", "merge -index",
      "query nbytes:>=300")) {
      val full = Oracle.bm25(corpus, q, 100000, keywordFields = Some(s.meta.keywords.toSet))
        .collect().toSeq
        .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getDouble(3)))
      val bestPerLang = full.groupBy { case (ident, _) => langByIdent(ident) }
        .map { case (_, hits) => hits.minBy { case (ident, sc) => (-sc, ident) } }
        .toSeq.sortBy { case (ident, sc) => (-sc, ident) }.take(10)
      val docsById = spark.read.parquet(s"$indexDir/docs")
        .select("docId", "repo", "path", "commit").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
      val got = s.collapse(q, "lang", 10).collect().toSeq
        .map(r => (docsById(r.getLong(0)), r.getDouble(2)))
      assert(got == bestPerLang, s"collapse mismatch for '$q'\ngot=$got\nexp=$bestPerLang")
    }
    // invalid field fails loudly
    intercept[IllegalArgumentException] { s.collapse("query", "no_such_col", 5) }
  }

  test("dateHistogram: calendar-month buckets over the match set, oracle counts") {
    import spark.implicits._
    // a stored DATE column derived deterministically from the identity
    val dated = corpus.withColumn("mdate",
      date_add(to_date(lit("2021-01-01")), (crc32(col("path")) % 200).cast("int")))
    val dir = s"$workDir/dated"
    val dcfg = cfg.copy(fields = FieldConfig(
      keyword = Seq("lang", "repo"), storedOnly = Seq("nbytes", "mdate")))
    new IndexBuilder(spark, dcfg).build(dated, dir, resume = false)
    val ds = new Searcher(spark, dir)
    for (q <- Seq("index merge", "lang:scala query", "query -def")) {
      val got = ds.dateHistogram(q, "mdate", "month").collect().toSeq
        .map(r => (r.getDate(0).toString, r.getLong(1)))
      val want = Oracle.matchingDocs(dated, q, Some(ds.meta.keywords.toSet))
        .groupBy(date_trunc("month", col("mdate")).cast("date").as("bucket"))
        .agg(count(lit(1)).as("cnt")).orderBy("bucket").collect().toSeq
        .map(r => (r.getDate(0).toString, r.getLong(1)))
      assert(got == want, s"date_histogram mismatch for '$q'")
      assert(got.map(_._2).sum ==
        Oracle.matchingDocs(dated, q, Some(ds.meta.keywords.toSet)).count(),
        "bucket counts must cover the whole match set (mdate never null here)")
    }
    intercept[IllegalArgumentException] { ds.dateHistogram("query", "mdate", "century") }
    intercept[IllegalArgumentException] { ds.dateHistogram("query", "nbytes", "month") }
  }

  test("explainHits: per-term BM25 pieces sum bit-exactly to each hit's score") {
    val s = searcher
    for ((q, k) <- Seq(("index merge query", 10), ("index^2 merge~1", 10),
      ("ind* score lang:scala", 10), ("query -def nbytes:>=200", 15))) {
      val hits = s.search(q, k).toSeq
      val rows = s.explainHits(q, k).collect().toSeq
      // every hit is explained; no non-hit rows
      assert(rows.map(_.getLong(0)).toSet == hits.map(_.docId).toSet)
      val termIdOf: Map[String, Long] =
        s.lookupTermStats(rows.map(_.getString(1)).distinct).map { case (t, (tid, _)) => t -> tid }
      for (h <- hits) {
        val pieces = rows.filter(_.getLong(0) == h.docId)
        // the kernel sums cursors in ascending termId order — replaying the
        // pieces in that order must reproduce the score BIT-exactly
        val replay = pieces.sortBy(r => termIdOf(r.getString(1)))
          .foldLeft(0.0)((acc, r) => acc + r.getDouble(5))
        assert(java.lang.Double.doubleToLongBits(replay) ==
          java.lang.Double.doubleToLongBits(h.score),
          s"explain pieces do not sum to the score for '$q' doc ${h.docId}")
        // reported total equals the hit score
        pieces.foreach(r => assert(r.getDouble(6) == h.score))
      }
    }
    intercept[IllegalArgumentException] { s.explainHits("\"index merge\"", 5) }
  }

  test("searchMany batch results are identical to per-query search") {
    val batch = searcher.searchMany(QuerySet)
    QuerySet.zip(batch).foreach { case ((q, k), got) =>
      val want = searcher.search(q, k)
      assert(got.toSeq == want.toSeq, s"batch mismatch for '$q'")
    }
  }

  test("warmed searcher (driver-side dictionary) returns identical results") {
    val warmed = new Searcher(spark, indexDir).warm()
    try {
      for ((q, k) <- QuerySet) {
        assert(warmed.search(q, k).toSeq == searcher.search(q, k).toSeq,
          s"warm/cold mismatch for '$q'")
      }
      val batch = warmed.searchMany(QuerySet.take(6))
      QuerySet.take(6).zip(batch).foreach { case ((q, k), got) =>
        assert(got.toSeq == searcher.search(q, k).toSeq, s"warm batch mismatch for '$q'")
      }
    } finally warmed.cool()
  }

  /** Query-context match-set queries across every bool shape: scored,
    * filtered, phrase, negated, filter-only (constant score), range-only,
    * must_not-only and match_all. */
  private val MatchSetQueries: Seq[String] = Seq(
    "merge", "merge index", "lang:scala def", "merge -index", "mer*",
    "\"if else\" merge",        // phrase must + loose should
    "lang:scala",               // ES filter context: no scoring clause
    "lang:scala nbytes:>=500",  // filter + range, still scoreless
    "nbytes:>=500",             // range-only
    "-merge",                   // must_not-only (match_all minus merge docs)
    "",                         // match_all
    "zzz_not_a_term")           // scoring clause, no dictionary hit → empty

  test("count: ES _count with full bool semantics, oracle-identical") {
    // the positions searcher so the phrase-shaped query is answerable
    val kw = Some(posSearcher.meta.keywords.toSet)
    for (q <- MatchSetQueries) {
      assert(posSearcher.count(q) == Oracle.matchingDocs(corpus, q, kw).count(),
        s"count mismatch for '$q'")
    }
    assert(posSearcher.count("") == NumFiles)
    // a phrase _count on a positions-less index fails loudly
    intercept[IllegalStateException](searcher.count("\"if else\""))
  }

  test("minimum_should_match: pruned top-k and match set vs oracle") {
    val kw = Some(searcher.meta.keywords.toSet)
    for (q <- Seq("merge index query", "error fail retry timeout", "lang:scala index merge");
         msm <- Seq(1, 2, 3)) {
      val eng = searcher.search(q, 50, minShouldMatch = msm).toSeq
      val ora = Oracle.bm25(corpus, q, 50, keywordFields = kw, minShouldMatch = msm)
        .collect().toSeq
      assert(eng.length == ora.length, s"msm=$msm '$q': ${eng.length} vs ${ora.length}")
      eng.zip(ora).foreach { case (e, o) =>
        assert(e.score == o.getAs[Double]("score"), s"msm=$msm '$q': score drift")
      }
      assert(searcher.count(q, minShouldMatch = msm) ==
        Oracle.matchingDocs(corpus, q, kw, minShouldMatch = msm).count(),
        s"msm=$msm count mismatch for '$q'")
    }
    // msm above the clause count matches nothing
    assert(searcher.search("merge index", 10, minShouldMatch = 3).isEmpty)
    // msm=1 is the default semantics exactly
    assert(searcher.search("merge index", 20, minShouldMatch = 1).toSeq ==
      searcher.search("merge index", 20).toSeq)
  }

  test("pagination: from/size slices the one total order (ES from+size rule)") {
    // positions searcher (one query is phrase-shaped); the full order must
    // be fetched at least as deep as the deepest page it is sliced against
    for (q <- Seq("merge index query", "\"if else\" merge", "lang:scala",
      "query", "zzz_not_a_term")) {
      val full = posSearcher.search(q, 110).toSeq
      for (from <- Seq(0, 5, 17, 100)) {
        val page = posSearcher.search(q, 10, from = from).toSeq
        assert(page == full.slice(from, from + 10),
          s"page [$from,${from + 10}) of '$q' is not the slice of the full order")
      }
    }
    intercept[IllegalArgumentException](searcher.search("merge", 10, from = -1))
  }

  test("statsAgg and histogram: ES stats/histogram aggs, oracle-identical") {
    val kw = Some(searcher.meta.keywords.toSet)
    for (q <- Seq("merge index", "lang:scala", "nbytes:>=500", "", "zzz_not_a_term")) {
      val eng = searcher.statsAgg(q, "nbytes").collect()(0)
      val m = Oracle.matchingDocs(corpus, q, kw).filter(col("nbytes").isNotNull)
      val ora = m.agg(count(lit(1)).as("cnt"),
        min(col("nbytes").cast("double")), max(col("nbytes").cast("double")),
        sum(col("nbytes").cast("double")), avg(col("nbytes").cast("double"))).collect()(0)
      assert(eng.getAs[Long]("cnt") == ora.getLong(0), s"stats cnt mismatch for '$q'")
      if (ora.getLong(0) > 0L) {
        assert(eng.getAs[Double]("mn") == ora.getDouble(1), s"stats min mismatch for '$q'")
        assert(eng.getAs[Double]("mx") == ora.getDouble(2), s"stats max mismatch for '$q'")
        assert(eng.getAs[Double]("sm") == ora.getDouble(3), s"stats sum mismatch for '$q'")
        assert(math.abs(eng.getAs[Double]("av") - ora.getDouble(4)) < 1e-9,
          s"stats avg mismatch for '$q'")
      }
      val engH = searcher.histogram(q, "nbytes", 200.0).collect()
        .map(r => (r.getAs[Double]("bucket"), r.getAs[Long]("cnt"))).toSeq
      val oraH = m.groupBy((floor(col("nbytes").cast("double") / 200.0) * 200.0).as("b"))
        .agg(count(lit(1)).as("c")).orderBy(asc("b")).collect()
        .map(r => (r.getAs[Double]("b"), r.getAs[Long]("c"))).toSeq
      assert(engH == oraH, s"histogram mismatch for '$q'")
    }
    intercept[IllegalArgumentException](searcher.statsAgg("merge", "lang")) // non-numeric
    intercept[IllegalArgumentException](searcher.histogram("merge", "zzz", 10.0))
    intercept[IllegalArgumentException](searcher.histogram("merge", "nbytes", 0.0))
  }

  test("highlight: plain-highlighter snippets, rank order, oracle-identical") {
    import spark.implicits._
    // the index stores no content — snippets come from the source corpus
    // (ES _source analogue), keyed here docId → identity → content
    val identByDocId = spark.read.parquet(s"$indexDir/docs")
      .select("docId", "repo", "path", "commit").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    val contentByIdent = corpus.select("repo", "path", "commit", "content").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getString(3)).toMap
    def docsContent(id: Long): String = contentByIdent(identByDocId(id))
    // corpus-side prefix expansion (content terms never contain ':', so the
    // dictionary's keyword filter terms can't collide with a stem)
    val vocab = corpus
      .select(explode(graft.analysis.Analyzer.analyze(col("content"))).as("t"))
      .distinct().as[String].collect().toSet
    def hlTermsOf(q: String): Seq[String] = q.split("\\s+").toSeq.filter(_.nonEmpty).flatMap {
      case t if t.endsWith("*") => vocab.filter(_.startsWith(t.dropRight(1))).toSeq.sorted
      case t if t.contains(":") => Nil
      case t => graft.analysis.Analyzer.tokenize(t).toSeq
    }.distinct
    for ((q, w) <- Seq(("merge index", 3), ("lang:scala merge", 2), ("mer*", 3))) {
      val hits = searcher.search(q, 15).toSeq
      val rows = searcher.highlight(q, 15, corpus, window = w).collect()
      assert(rows.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
        hits.map(h => (h.docId, h.score)), s"highlight rank/scores differ for '$q'")
      val terms = hlTermsOf(q)
      rows.foreach { r =>
        val exp = Oracle.snippet(docsContent(r.getLong(0)), terms, w)
        assert(Option(r.getString(2)) == exp, s"snippet mismatch for '$q' doc ${r.getLong(0)}")
      }
    }
    // phrase tokens highlight too (positions index shares the corpus, and a
    // fresh deterministic build assigns the same dense docIds)
    val ph = posSearcher.highlight("\"if else\"", 10, corpus).collect()
    assert(ph.nonEmpty)
    ph.foreach { r =>
      val exp = Oracle.snippet(docsContent(r.getLong(0)), Seq("if", "else"), 3)
      assert(Option(r.getString(2)) == exp, s"phrase snippet mismatch doc ${r.getLong(0)}")
    }
    // a query with no scoring clause has nothing to highlight
    intercept[IllegalArgumentException](searcher.highlight("lang:scala", 5, corpus))
    intercept[IllegalArgumentException](searcher.highlight("merge", 5, corpus, field = "nbytes"))
  }

  test("significantTerms: ES JLH significant_terms vs brute-force oracle") {
    val kw = Some(searcher.meta.keywords.toSet)
    for (q <- Seq("merge index", "lang:scala", "codec")) {
      val eng = searcher.significantTerms(q, 20, minDocCount = 2).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      val ora = Oracle.significantTerms(corpus, q, 20, minDocCount = 2, kw).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(eng == ora, s"significant_terms mismatch for '$q'")
      assert(eng.nonEmpty, s"fixture should surface significant terms for '$q'")
      // keyword filter terms never leak into the term column
      assert(eng.forall(!_._1.contains(":")))
    }
    // empty match set → empty result, not an error (a single token with no
    // '_' so the analyzer emits no subtokens that might exist)
    assert(searcher.significantTerms("zzzqqqvv", 10).collect().isEmpty)
  }

  test("moreLikeThis: tf·idf term selection + BM25 hits, oracle-identical") {
    val src = corpus.select("repo", "path", "commit", "content")
      .orderBy("repo", "path", "commit").head()
    val likeText = src.getString(3)
    val docs = spark.read.parquet(s"$indexDir/docs")
    val srcId = docs
      .filter(col("repo") === src.getString(0) && col("path") === src.getString(1) &&
        col("commit") === src.getString(2))
      .select("docId").head().getLong(0)
    val eng = searcher.moreLikeThis(likeText, 20, maxQueryTerms = 8,
      minTermFreq = 2, minDocFreq = 3, excludeDocIds = Set(srcId)).toSeq
    val sel = Oracle.mltSelect(corpus, likeText, 8, 2, 3)
    assert(sel.nonEmpty, "fixture doc should select MLT terms")
    val srcIdent = (src.getString(0), src.getString(1), src.getString(2))
    val ora = Oracle.bm25(corpus, sel.mkString(" "), 21,
        keywordFields = Some(searcher.meta.keywords.toSet)).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .filterNot(h => (h._1, h._2, h._3) == srcIdent)
      .take(20)
    val identByDocId = docs.select("docId", "repo", "path", "commit").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    val engIdent = eng.map { h =>
      val (a, b, c) = identByDocId(h.docId); (a, b, c, h.score)
    }
    assert(engIdent == ora, "moreLikeThis hits differ from oracle")
    assert(engIdent.nonEmpty)
    // the source doc itself is excluded
    assert(!eng.exists(_.docId == srcId))
    // a like-text with no qualifying terms matches nothing
    assert(searcher.moreLikeThis("zzzqqqvv zzzqqqvv", 10).isEmpty)
  }

  test("topHits: per-bucket top-k over the exhaustive scored match set, oracle-identical") {
    val q = "index query"
    // oracle: the FULL scored match set (k > corpus), bucketed driver-side
    val all = oracleHits(q, NumFiles.toInt + 10)
    val langByIdent = corpus.select("repo", "path", "commit", "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getString(3)).toMap
    val docIdByIdent = spark.read.parquet(s"$indexDir/docs")
      .select("docId", "repo", "path", "commit").collect()
      .map(r => (r.getString(1), r.getString(2), r.getString(3)) -> r.getLong(0)).toMap
    val scoredDocs = all.map { case (r0, p0, c0, s0) =>
      (langByIdent((r0, p0, c0)), docIdByIdent((r0, p0, c0)), s0)
    }
    val counts = scoredDocs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val top3 = counts.toSeq.sortBy { case (v, c) => (-c, v) }.take(3)
    val expected = top3.flatMap { case (v, c) =>
      scoredDocs.filter(_._1 == v).sortBy(t => (-t._3, t._2)).take(2).zipWithIndex
        .map { case ((_, d, s), i) => (v, c, i + 1, d, s) }
    }
    val got = searcher.topHits(q, "lang", 3, 2).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3), r.getDouble(4)))
    assert(got == expected, s"topHits mismatch\ngot=$got\nexpected=$expected")
    // filter-only query: ES constant-score — every hit scores 0.0
    val fo = searcher.topHits("lang:scala", "lang", 2, 2).collect()
    assert(fo.nonEmpty && fo.forall(_.getDouble(4) == 0.0))
    // phrase queries are rejected in scored-all form
    intercept[IllegalArgumentException] { searcher.topHits("\"index query\"", "lang", 2, 2) }
  }

  test("percentilesAgg: exact quantile_cont over the match set vs driver computation") {
    val q = "index query"
    val vals = searcher.scan(q, Seq("nbytes")).select("nbytes")
      .collect().map(_.getLong(0).toDouble).sorted
    assert(vals.nonEmpty)
    def qc(p: Double): Double = {
      val idx = p * (vals.length - 1)
      val lo = math.floor(idx).toInt
      val hi = math.ceil(idx).toInt
      if (lo == hi) vals(lo) else vals(lo) + (idx - lo) * (vals(hi) - vals(lo))
    }
    val got = searcher.percentilesAgg(q, "nbytes", Seq(0.25, 0.5, 0.9), exact = true)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for (p <- Seq(0.25, 0.5, 0.9))
      assert(math.abs(got(p) - qc(p)) < 1e-6, s"percentile $p: got ${got(p)} want ${qc(p)}")
    // approx (t-digest-analogue) mode: one row per requested percentile
    assert(searcher.percentilesAgg(q, "nbytes", Seq(0.5)).count() == 1)
  }

  test("suggest: ES term-suggester ranking (distance asc, df desc, term asc)") {
    val vocab = corpus
      .select(explode(array_distinct(graft.analysis.Analyzer.analyze(col("content")))).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    def expected(tok: String, n: Int): Seq[(String, String, Long, Int)] = vocab.keys.toSeq
      .filter(t => t != tok && Searcher.editWithin(tok, t, 2))
      .map(t => (t, vocab(t), if (Searcher.editWithin(tok, t, 1)) 1 else 2))
      .sortBy { case (t, df, dd) => (dd, -df, t) }.take(n)
      .map { case (t, df, dd) => (tok, t, df, dd) }
    val got = searcher.suggest("mrege", topN = 3, mode = "always")
    assert(got == expected("mrege", 3), s"suggest mismatch\ngot=$got\nexpected=${expected("mrege", 3)}")
    // missing mode: a token present in the dictionary gets no options
    assert(searcher.suggest("index", topN = 3).isEmpty)
    // the token itself is never suggested, even in always mode
    assert(searcher.suggest("index", topN = 5, mode = "always").forall(_._2 != "index"))
    // a token with no candidates within the bound yields nothing
    assert(searcher.suggest("zzqzzqzzqz", topN = 3, mode = "always").isEmpty)
  }

  test("searchSortedBy: doc-values field sort over the match set, oracle order") {
    val kw = Some(searcher.meta.keywords.toSet)
    val ident = spark.read.parquet(s"$indexDir/docs")
      .select("docId", "repo", "path", "commit")
    for (q <- Seq("merge index", "lang:scala", ""); asc0 <- Seq(true, false)) {
      val eng = searcher.searchSortedBy(q, "nbytes", ascending = asc0, 25)
        .join(ident, "docId")
        .select("repo", "path", "commit", "nbytes")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
        // the join may reorder rows; engine order is (nbytes, docId) and
        // docId order IS identity order in a fresh build, so re-sorting by
        // (nbytes, identity) reconstructs the engine's own output order
        .sortBy { case (r, p0, c, n) => (if (asc0) n else -n, r, p0, c) }
      val ord = if (asc0) col("nbytes").asc_nulls_last else col("nbytes").desc_nulls_last
      val ora = Oracle.matchingDocs(corpus, q, kw)
        .orderBy(ord, col("repo").asc, col("path").asc, col("commit").asc)
        .limit(25)
        .select("repo", "path", "commit", "nbytes")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      assert(eng == ora, s"sortBy mismatch for '$q' asc=$asc0")
    }
  }

  /** Driver-side replica of the per-(doc, term) BM25 contributions: the
    * same analyzer, df/dl from the same token streams, terms in termId
    * order (the kernel's summation order) — the dis_max/rescore oracles. */
  private lazy val docTokens: Map[Long, Array[String]] = {
    val byIdent = corpus.select("repo", "path", "commit", "content").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getString(3)).toMap
    spark.read.parquet(s"$indexDir/docs")
      .select("docId", "repo", "path", "commit").collect()
      .map { r =>
        r.getLong(0) -> graft.analysis.Analyzer.tokenize(
          byIdent((r.getString(1), r.getString(2), r.getString(3))))
      }.toMap
  }

  private def contributionsInCursorOrder(
      docId: Long, terms: Seq[String]): Seq[Double] = {
    val stats = searcher.lookupTermStats(terms)
    val toks = docTokens(docId)
    val dl = toks.length.toLong
    val tf: Map[String, Int] = toks.groupBy(identity).map { case (t, xs) => t -> xs.length }
    val params = graft.search.Bm25Params(searcher.meta.k1, searcher.meta.b)
    terms.flatMap(t => stats.get(t).map { case (tid, df) => (tid, df, t) })
      .sortBy(_._1)
      .flatMap { case (_, df, t) =>
        tf.get(t).map(f => graft.search.BM25.idf(searcher.meta.numDocs, df) *
          graft.search.BM25.tfNorm(f.toLong, dl, searcher.meta.avgdl, params))
      }
  }

  test("searchDisMax: max + tieBreaker·rest combine, bit-identical to driver replica") {
    val terms = Seq("index", "merge", "query")
    for (tb <- Seq(0.0, 0.3, 1.0)) {
      val eng = searcher.searchDisMax(terms.mkString(" "), 25, tieBreaker = tb).toSeq
      assert(eng.nonEmpty)
      val expected = docTokens.keysIterator.flatMap { d =>
        val cs = contributionsInCursorOrder(d, terms)
        if (cs.isEmpty) None
        else {
          var s = 0.0; var mx = 0.0
          cs.foreach { c => s += c; if (c > mx) mx = c }
          Some(ScoredDoc(d, mx + tb * (s - mx)))
        }
      }.toSeq.sortBy(sd => (-sd.score, sd.docId)).take(25)
      assert(eng.map(_.docId) == expected.map(_.docId), s"dis_max ranking mismatch tb=$tb")
      eng.zip(expected).foreach { case (e, x) =>
        assert(java.lang.Double.doubleToLongBits(e.score) ==
          java.lang.Double.doubleToLongBits(x.score),
          s"dis_max score not bit-identical (tb=$tb): $e vs $x")
      }
      // filters/negations gate the same candidate set as the match oracle
      val fq = "index merge lang:scala -codec"
      val filtered = searcher.searchDisMax(fq, 1000, tieBreaker = tb)
      val ident = spark.read.parquet(s"$indexDir/docs")
        .select("docId", "repo", "path", "commit").collect()
        .map(r => ((r.getString(1), r.getString(2), r.getString(3)), r.getLong(0))).toMap
      val allowed = Oracle.matchingDocs(corpus, fq, Some(searcher.meta.keywords.toSet))
        .select("repo", "path", "commit").collect()
        .map(r => ident((r.getString(0), r.getString(1), r.getString(2)))).toSet
      assert(allowed.nonEmpty, "fixture query should match something")
      assert(filtered.map(_.docId).toSet == allowed, s"dis_max candidate set mismatch tb=$tb")
    }
    intercept[IllegalArgumentException] { searcher.searchDisMax("\"index merge\"", 5) }
  }

  test("functionScore: field_value_factor combine modes vs base relevance") {
    val q = "index merge"
    val ident = spark.read.parquet(s"$indexDir/docs").select("docId", "nbytes")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // base relevance = the ordinary summed BM25 (same walk, full match set)
    val base: Map[Long, Double] = docTokens.keysIterator.flatMap { d =>
      val cs = contributionsInCursorOrder(d, Seq("index", "merge"))
      if (cs.isEmpty) None else Some(d -> cs.sum)
    }.toMap
    def fvf(d: Long): Double = math.log10(1.0 + 0.01 * ident(d))
    val expect = base.toSeq.map { case (d, b) => (d, b * fvf(d)) }
      .sortBy { case (d, s) => (-s, d) }.take(20)
    val eng = searcher.functionScore(q, "nbytes", 20,
      factor = 0.01, modifier = "log1p", boostMode = "multiply")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(eng.map(_._1) == expect.map(_._1), "function_score ranking mismatch")
    eng.zip(expect).foreach { case ((_, e), (_, x)) => assert(math.abs(e - x) < 1e-12) }
    // replace mode ignores relevance entirely
    val repl = searcher.functionScore(q, "nbytes", 10, factor = 0.01,
      modifier = "log1p", boostMode = "replace")
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    repl.foreach { case (d, s) => assert(math.abs(s - fvf(d)) < 1e-12) }
    // sum / max / min algebra per returned row
    for (mode <- Seq("sum", "max", "min", "avg")) {
      val rows = searcher.functionScore(q, "nbytes", 10, factor = 0.01,
        modifier = "log1p", boostMode = mode)
        .collect().map(r => (r.getLong(0), r.getDouble(1)))
      rows.foreach { case (d, s) =>
        val b = base(d); val f = fvf(d)
        val want = mode match {
          case "sum" => b + f
          case "max" => math.max(b, f)
          case "min" => math.min(b, f)
          case "avg" => (b + f) / 2.0
        }
        assert(math.abs(s - want) < 1e-12, s"$mode combine wrong for doc $d")
      }
    }
  }

  test("rescore: window re-rank, ES score_mode algebra, window never widened") {
    val base = searcher.search("index merge", 30)
    val sec: Map[Long, Double] = docTokens.keysIterator.flatMap { d =>
      val cs = contributionsInCursorOrder(d, Seq("query"))
      if (cs.isEmpty) None else Some(d -> cs.sum)
    }.toMap
    for (mode <- Seq("total", "multiply", "avg", "max", "min")) {
      val eng = searcher.rescore("index merge", "query", window = 30, k = 15,
        queryWeight = 1.0, rescoreWeight = 2.0, scoreMode = mode).toSeq
      val expect = base.map { h =>
        val b = h.score
        val s = sec.get(h.docId) match {
          case None => b
          case Some(r0) =>
            val r = 2.0 * r0
            mode match {
              case "total" => b + r
              case "multiply" => b * r
              case "avg" => (b + r) / 2.0
              case "max" => math.max(b, r)
              case "min" => math.min(b, r)
            }
        }
        ScoredDoc(h.docId, s)
      }.sortBy(sd => (-sd.score, sd.docId)).take(15).toSeq
      assert(eng.map(_.docId) == expect.map(_.docId), s"rescore ranking mismatch mode=$mode")
      eng.zip(expect).foreach { case (e, x) =>
        assert(java.lang.Double.doubleToLongBits(e.score) ==
          java.lang.Double.doubleToLongBits(x.score), s"rescore score mismatch mode=$mode")
      }
      // every returned doc was in the base window (ES: rescore never promotes)
      val windowIds = base.map(_.docId).toSet
      assert(eng.forall(h => windowIds.contains(h.docId)))
    }
  }

  test("extendedStatsAgg: population variance/stddev over the match set") {
    val q = "index merge query"
    val matched = Oracle.matchingDocs(corpus, q, Some(searcher.meta.keywords.toSet))
      .select("nbytes").collect().map(_.getLong(0).toDouble)
    val row = searcher.extendedStatsAgg(q, "nbytes").collect()(0)
    assert(row.getLong(0) == matched.length)
    assert(row.getDouble(1) == matched.min && row.getDouble(2) == matched.max)
    val mean = matched.sum / matched.length
    assert(math.abs(row.getDouble(3) - matched.sum) < 1e-6)
    assert(math.abs(row.getDouble(4) - mean) < 1e-9)
    assert(math.abs(row.getDouble(5) - matched.map(v => v * v).sum) < 1e-3)
    val varPop = matched.map(v => (v - mean) * (v - mean)).sum / matched.length
    assert(math.abs(row.getDouble(6) - varPop) / varPop < 1e-9)
    assert(math.abs(row.getDouble(7) - math.sqrt(varPop)) / math.sqrt(varPop) < 1e-9)
  }

  test("suggestCompletion: prefix candidates ranked df desc, term asc") {
    val got = searcher.suggestCompletion("in", 5)
    assert(got.nonEmpty)
    // driver replica over the corpus token streams
    val df: Map[String, Long] = docTokens.values
      .flatMap(_.distinct.filter(_.startsWith("in"))).toSeq
      .groupBy(identity).map { case (t, xs) => t -> xs.length.toLong }
    val expect = df.toSeq.sortBy { case (t, d) => (-d, t) }.take(5)
    assert(got == expect)
    // ranking is by df first: every returned df is >= any non-returned candidate's df
    val returned = got.map(_._1).toSet
    val maxOther = (df -- returned).values.foldLeft(0L)(math.max)
    assert(got.forall(_._2 >= maxOther))
    intercept[IllegalArgumentException] { searcher.suggestCompletion("") }
    intercept[IllegalArgumentException] { searcher.suggestCompletion("two words") }
  }

  test("expandSynonyms: plain tokens expand, operators and phrases pass through") {
    val syn = Map("index" -> Seq("catalog", "registry"), "fast" -> Seq("quick"))
    assert(Searcher.expandSynonyms("index merge", syn) == "index merge catalog registry")
    // operator tokens never expand and never break
    val q = "\"index merge\" index -fast lang:scala ind* m?rge /m.rge/ nbytes:>=10 boost^2"
    val out = Searcher.expandSynonyms(q, syn)
    assert(out.contains("\"index merge\""))
    assert(out.contains("-fast") && out.contains("lang:scala") && out.contains("ind*"))
    assert(out.contains("catalog") && out.contains("registry"))
    assert(!out.contains("quick"), "negated token must not pull synonyms in")
    // already-present synonyms are not duplicated
    assert(Searcher.expandSynonyms("index catalog", syn)
      .split(" ").count(_ == "catalog") == 1)
    // identity when the map is empty or nothing matches
    assert(Searcher.expandSynonyms("merge query", syn) == "merge query")
    // expanded query ranks exactly like the manually-written union query
    val a = searcher.search(Searcher.expandSynonyms("index merge", Map("index" -> Seq("query"))), 15)
    val b = searcher.search("index merge query", 15)
    assert(a.toSeq == b.toSeq)
  }

  test("searchBoosting: demotion without exclusion, bit-identical to driver replica") {
    val ident = spark.read.parquet(s"$indexDir/docs")
      .select("docId", "repo", "path", "commit").collect()
      .map(r => ((r.getString(1), r.getString(2), r.getString(3)), r.getLong(0))).toMap
    val negQ = "query lang:scala"
    val negDocs: Set[Long] = Oracle.matchingDocs(corpus, negQ, Some(searcher.meta.keywords.toSet))
      .select("repo", "path", "commit").collect()
      .map(r => ident((r.getString(0), r.getString(1), r.getString(2)))).toSet
    assert(negDocs.nonEmpty, "fixture negative query should match something")
    val plain = searcher.search("index merge", 1000).toSeq
    for (nb <- Seq(0.0, 0.4, 1.0)) {
      val eng = searcher.searchBoosting("index merge", negQ, 25, negativeBoost = nb).toSeq
      val expected = docTokens.keysIterator.flatMap { d =>
        val cs = contributionsInCursorOrder(d, Seq("index", "merge"))
        if (cs.isEmpty) None
        else Some(ScoredDoc(d, if (negDocs(d)) cs.sum * nb else cs.sum))
      }.toSeq.sortBy(sd => (-sd.score, sd.docId)).take(25)
      assert(eng.map(_.docId) == expected.map(_.docId), s"boosting ranking mismatch nb=$nb")
      eng.zip(expected).foreach { case (e, x) =>
        assert(java.lang.Double.doubleToLongBits(e.score) ==
          java.lang.Double.doubleToLongBits(x.score),
          s"boosting score not bit-identical (nb=$nb): $e vs $x")
      }
    }
    // demoted docs are demoted, never dropped: same match set as the plain query
    val all = searcher.searchBoosting("index merge", negQ, 1000, negativeBoost = 0.4)
    assert(all.map(_.docId).toSet == plain.map(_.docId).toSet)
    // nb = 1.0 is a no-op: identical to the plain search
    val same = searcher.searchBoosting("index merge", negQ, 15, negativeBoost = 1.0)
    assert(same.toSeq == plain.take(15))
    intercept[IllegalArgumentException] {
      searcher.searchBoosting("index merge", negQ, 5, negativeBoost = 1.5)
    }
    intercept[IllegalArgumentException] { searcher.searchBoosting("lang:scala", "query", 5) }
  }

  test("getDoc: stored-field point lookup by identity key, miss is None") {
    val want = spark.read.parquet(s"$indexDir/docs")
      .select("repo", "path", "commit", "lang", "nbytes").collect()(3)
    val got = searcher.getDoc(want.getString(0), want.getString(1), want.getString(2))
    assert(got.isDefined)
    assert(got.get.getAs[String]("lang") == want.getString(3))
    assert(got.get.getAs[Long]("nbytes") == want.getLong(4))
    assert(searcher.getDoc("no-such-repo", "nope", "0000").isEmpty)
  }
}
