package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.AnalyzerSpec
import graft.index.{FieldConfig, IndexBuilder, IndexConfig, SegmentedIndex}
import graft.search.{BM25, Bm25Params, MultiSearcher, Searcher}

/** Per-field analyzer configuration (the ES mapping's `analyzer` knob):
  * kind (code / lowercase / whitespace), index-time stopwords (position
  * gaps, dl = survivors) and index-time synonyms (injected at the trigger's
  * position, discounted from dl), threaded through build, multi_match,
  * per-field phrase and `_analyze`. */
class AnalyzersSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val titleSpec = AnalyzerSpec(
    kind = "lowercase",
    stopwords = Seq("the", "of"),
    synonyms = Map("merge" -> Seq("combine")))

  private val cfg = IndexConfig(
    buildPartitions = 4, docsPerShard = 64L, blockSize = 16, buildBuckets = 2,
    storePositions = true,
    fields = FieldConfig(keyword = Seq("lang", "repo"), analyzed = Seq("title"),
      analyzers = Map("title" -> titleSpec)))

  private def corpus = Seq(
    ("r/a", "t1", "c1", "md", "alpha words here", "The Merge Of Data"),
    ("r/a", "t2", "c2", "md", "alpha merge here", "DataMerge combine"),
    ("r/a", "t3", "c3", "md", "alpha extra here", "the of the")
  ).toDF("repo", "path", "commit", "lang", "content", "title")

  private def build(): (Searcher, Map[Long, String], String) = {
    val dir = Files.createTempDirectory("graft-az").toString
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/index", resume = false)
    val se = new Searcher(spark, s"$dir/index")
    val byId = spark.read.parquet(s"$dir/index/docs")
      .select("docId", "path").as[(Long, String)].collect().toMap
    (se, byId, dir)
  }

  test("spec encode/decode round-trip; configHash changes with the analyzer") {
    // canonical form: encode sorts stopwords/synonyms, so compare encodings
    assert(AnalyzerSpec.decode(titleSpec.encode).encode == titleSpec.encode)
    assert(AnalyzerSpec.decode(AnalyzerSpec.Code.encode).encode == AnalyzerSpec.Code.encode)
    val plain = cfg.copy(fields = cfg.fields.copy(analyzers = Map.empty))
    assert(plain.configHash != cfg.configHash,
      "an analyzer override must change the index fingerprint")
  }

  test("tokenizeIndexed: stop gaps, synonym injection at trigger position, dl discount") {
    val (toks, poss, dl) = AnalyzerSpec.tokenizeIndexed(titleSpec, "The Merge Of Data")
    assert(toks.toSeq == Seq("merge", "combine", "data"))
    assert(poss.toSeq == Seq(1L, 1L, 3L)) // gaps where 'the'/'of' sat
    assert(dl == 2L) // survivors only; injections discounted
    // whitespace kind preserves case; code kind splits camelCase
    assert(AnalyzerSpec.tokenizeIndexed(AnalyzerSpec(kind = "whitespace"), "Foo BAR")
      ._1.toSeq == Seq("Foo", "BAR"))
    assert(AnalyzerSpec.tokenizeIndexed(AnalyzerSpec(kind = "lowercase"), "DataMerge x")
      ._1.toSeq == Seq("datamerge", "x"))
  }

  test("_analyze against the field's analyzer") {
    val (se, _, _) = build()
    assert(se.analyzeField("title", "The Merge Of Data").toSeq ==
      Seq((1L, "merge"), (1L, "combine"), (3L, "data")))
    // content stays code-aware
    assert(se.analyzeField("content", "DataMerge").toSeq ==
      Seq((0L, "datamerge"), (1L, "data"), (2L, "merge")))
  }

  test("multi_match over a lowercase+stop+synonym field: matching and exact scores") {
    val (se, byId, _) = build()
    def names(hits: Array[graft.search.ScoredDoc]): Seq[String] =
      hits.map(h => byId(h.docId)).toSeq

    // synonym injection: 'combine' matches t1 (injected at merge's position)
    // and t2 (literal); never t3 (stop-only title emits nothing)
    val hits = se.multiMatch("combine", Seq("title"), 10)
    assert(names(hits).toSet == Set("t1", "t2"))
    // exact per-field BM25: nF = 2 field-bearing docs, avgdlF = (2+2)/2,
    // df(title:combine) = 2, tf = 1 in both, fdl = 2 (dl discounts)
    val p = Bm25Params()
    val want = BM25.idf(2, 2) * BM25.tfNorm(1, 2, 2.0, p)
    hits.foreach(h => assert(h.score == want))

    // kind difference: lowercase keeps 'DataMerge' whole; code would split
    assert(names(se.multiMatch("datamerge", Seq("title"), 10)) == Seq("t2"))
    assert(se.multiMatch("datamerge", Seq("content", "title"), 10).length == 1)
    // stopword-only query analyzes to nothing for the field → no clauses
    assert(se.multiMatch("the", Seq("title"), 10).isEmpty)
  }

  test("per-field phrase respects stop gaps; interior stopword rejected") {
    val (se, byId, _) = build()
    // t1 title positions: merge@1, data@3 — NOT adjacent (gap from 'of')
    assert(se.matchPhraseField("title", "merge data", 10, slop = 0).isEmpty)
    assert(se.matchPhraseField("title", "merge data", 10, slop = 1)
      .map(h => byId(h.docId)).toSeq == Seq("t1"))
    // leading stopword drops cleanly
    assert(se.matchPhraseField("title", "the merge", 10, slop = 0)
      .map(h => byId(h.docId)).toSeq == Seq("t1"))
    // interior stopword needs gap matching — rejected, not silently wrong
    intercept[IllegalArgumentException] {
      se.matchPhraseField("title", "merge of data", 10)
    }
  }

  test("porter stemmer matches the published algorithm's vectors") {
    val vectors = Seq(
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti",
      "caress" -> "caress", "cats" -> "cat",
      "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "failing" -> "fail", "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "conditional" -> "condit", "rational" -> "ration",
      "generalization" -> "gener", "oscillators" -> "oscil",
      "running" -> "run", "runs" -> "run", "ran" -> "ran")
    for ((in, want) <- vectors)
      assert(graft.analysis.Porter.stem(in) == want, s"stem($in)")
    // the 'porter' kind stems index AND query tokens the same way
    val spec = AnalyzerSpec(kind = "porter")
    assert(AnalyzerSpec.tokenizeIndexed(spec, "Running Quickly")._1.toSeq ==
      AnalyzerSpec.queryTokens(spec, "runs quick").toSeq.take(1) ++ Seq("quickli"))
  }

  test("porter kind end-to-end: query 'running' matches a doc's 'runs'") {
    val pCfg = cfg.copy(fields = FieldConfig(keyword = Seq("lang", "repo"),
      analyzed = Seq("title"),
      analyzers = Map("title" -> AnalyzerSpec(kind = "porter"))))
    val dir = Files.createTempDirectory("graft-porter").toString
    new IndexBuilder(spark, pCfg).build(corpus
      .withColumn("title", concat(col("title"), lit(" runs fast"))), s"$dir/index",
      resume = false)
    val se = new Searcher(spark, s"$dir/index")
    val byId = spark.read.parquet(s"$dir/index/docs")
      .select("docId", "path").as[(Long, String)].collect().toMap
    val hits = se.multiMatch("running", Seq("title"), 10, "most_fields")
      .map(h => byId(h.docId)).toSet
    assert(hits == Set("t1", "t2", "t3"), s"stemmed query must match 'runs' (got $hits)")
  }

  test("multi-token synonym: consecutive injected positions; phrase on the target matches") {
    val mSpec = AnalyzerSpec(kind = "lowercase",
      synonyms = Map("ml" -> Seq("machine learning")))
    val (toks, poss, dl) = AnalyzerSpec.tokenizeIndexed(mSpec, "intro ml basics")
    assert(toks.toSeq == Seq("intro", "ml", "machine", "learning", "basics"))
    assert(poss.toSeq == Seq(0L, 1L, 1L, 2L, 2L))
    assert(dl == 3, "injected tokens never count toward dl")

    val sCfg = cfg.copy(fields = FieldConfig(keyword = Seq("lang", "repo"),
      analyzed = Seq("title"), analyzers = Map("title" -> mSpec)))
    val dir = Files.createTempDirectory("graft-syngraph").toString
    val c = Seq(
      ("r/a", "s1", "c1", "md", "alpha", "intro ml basics"),
      ("r/a", "s2", "c2", "md", "alpha", "machine learning handbook"),
      ("r/a", "s3", "c3", "md", "alpha", "learning machine tricks")
    ).toDF("repo", "path", "commit", "lang", "content", "title")
    new IndexBuilder(spark, sCfg).build(c, s"$dir/index", resume = false)
    val se = new Searcher(spark, s"$dir/index")
    val byId = spark.read.parquet(s"$dir/index/docs")
      .select("docId", "path").as[(Long, String)].collect().toMap
    // the phrase "machine learning" matches the literal doc AND the
    // trigger doc (injected machine@1, learning@2) — but NOT the reversed
    // token order of s3
    val got = se.matchPhraseField("title", "machine learning", 10)
      .map(h => byId(h.docId)).toSet
    assert(got == Set("s1", "s2"), s"got $got")
  }

  test("content analyzer override: lowercase content passes the oracle re-derived under it") {
    val lcSpec = AnalyzerSpec(kind = "lowercase")
    val cCfg = IndexConfig(buildPartitions = 4, docsPerShard = 64L, blockSize = 16,
      buildBuckets = 2, storePositions = true,
      fields = FieldConfig(keyword = Seq("lang", "repo"),
        analyzers = Map("content" -> lcSpec)))
    val dir = Files.createTempDirectory("graft-ctspec").toString
    val c = graft.corpus.CorpusGen.generate(spark, 150, seed = 77, partitions = 4).toDF()
    new IndexBuilder(spark, cCfg).build(c, s"$dir/index", resume = false)
    val se = new graft.search.Searcher(spark, s"$dir/index")
    assert(se.meta.analyzerOf("content") == lcSpec,
      "the content override must round-trip through IndexMeta")
    val docs = spark.read.parquet(s"$dir/index/docs")
      .select("docId", "repo", "path", "commit").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    // under lowercase, camelCase identifiers are single tokens: the index
    // must contain getindexvalue-style terms, not code-split subtokens
    val terms = spark.read.parquet(s"$dir/index/terms")
      .select("term").as[String].collect().toSet
    assert(terms.exists(t => t.length > 12 && !t.contains(":")),
      "lowercase content should keep long unsplit identifier tokens")
    // frozen query set vs the oracle RE-DERIVED under the same spec —
    // rank- and score-identical, exactly like EngineSpec's code-path gate
    for (q <- Seq("index merge codec", "getindexvalue", "lang:scala query",
      "\"merge index\"", "sc* merge", "index -merge")) {
      val got = se.search(q, 20).toSeq
        .map(h => { val d = docs(h.docId); (d._1, d._2, d._3, h.score) })
      val want = graft.search.Oracle.bm25(c, q, 20,
        keywordFields = Some(se.meta.keywords.toSet), cspec = lcSpec)
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      assert(got == want, s"engine/oracle mismatch under lowercase content for '$q'")
    }
    // a content override is part of the index fingerprint (build forced)
    assert(cCfg.configHash !=
      cCfg.copy(fields = cCfg.fields.copy(analyzers = Map.empty)).configHash)
  }

  test("segmented multi_match with per-field analyzers == single") {
    val (se, byId, dir) = build()
    val seg = new SegmentedIndex(spark, s"$dir/seg", cfg, maxSegments = 4)
    seg.ingest(corpus.filter(col("path") === "t1"))
    seg.ingest(corpus.filter(col("path") =!= "t1"))
    val ms = new MultiSearcher(spark, s"$dir/seg")
    for (q <- Seq("combine", "datamerge", "merge alpha")) {
      val got = ms.multiMatch(q, Seq("content", "title^2"), 10, "most_fields")
        .select("path", "score").as[(String, Double)].collect().toSeq.sorted
      val want = se.multiMatch(q, Seq("content", "title^2"), 10, "most_fields")
        .map(h => (byId(h.docId), h.score)).toSeq.sorted
      assert(got == want, s"segmented/single multi_match mismatch for '$q'")
    }
  }
}
