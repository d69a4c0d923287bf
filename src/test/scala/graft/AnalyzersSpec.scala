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
