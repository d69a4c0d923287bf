package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig, SegmentedIndex}
import graft.search.{MultiSearcher, Searcher}

/** Lucene/ES span queries: `span_near` (ordered = slop phrase; unordered =
  * any-direction window) and `span_first` (match must end near the field
  * start), single and segmented. */
class SpanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = IndexConfig(buildPartitions = 4, docsPerShard = 64L,
    blockSize = 16, buildBuckets = 2, storePositions = true)

  private def buildTiny(): (Searcher, Map[Long, String]) = {
    val dir = Files.createTempDirectory("graft-span").toString
    val corpus = Seq(
      ("r/a", "d1", "c1", "md", "alpha beta gamma"),
      ("r/a", "d2", "c2", "md", "beta alpha gamma"),
      ("r/a", "d3", "c3", "md", "alpha padx pady padz beta"),
      ("r/a", "d4", "c4", "md", "gamma delta epsilon"),
      ("r/a", "d5", "c5", "md", "xray yankee xray zulu xray"),
      ("r/a", "d6", "c6", "md", "xray xray beta")
    ).toDF("repo", "path", "commit", "lang", "content")
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/index", resume = false)
    val se = new Searcher(spark, s"$dir/index")
    val byId = spark.read.parquet(s"$dir/index/docs")
      .select("docId", "path").as[(Long, String)].collect().toMap
    (se, byId)
  }

  test("span_near: ordered vs unordered windows") {
    val (se, byId) = buildTiny()
    def names(hits: Array[graft.search.ScoredDoc]): Set[String] =
      hits.map(h => byId(h.docId)).toSet
    // ordered, adjacency: only "alpha beta"
    assert(names(se.searchSpanNear(Seq("alpha", "beta"), 0, inOrder = true, 10)) == Set("d1"))
    // unordered, adjacency: "beta alpha" too
    assert(names(se.searchSpanNear(Seq("alpha", "beta"), 0, inOrder = false, 10)) ==
      Set("d1", "d2"))
    // d3 has span (4-0)-(2-1) = 3: matched at slop 3, not at slop 2
    assert(names(se.searchSpanNear(Seq("alpha", "beta"), 2, inOrder = false, 10)) ==
      Set("d1", "d2"))
    assert(names(se.searchSpanNear(Seq("alpha", "beta"), 3, inOrder = false, 10)) ==
      Set("d1", "d2", "d3"))
    assert(names(se.searchSpanNear(Seq("alpha", "beta"), 3, inOrder = true, 10)) ==
      Set("d1", "d3"))
    // a term with no postings matches nothing
    assert(se.searchSpanNear(Seq("alpha", "nosuch"), 9, inOrder = false, 10).isEmpty)
  }

  test("unordered span_near with duplicate terms needs DISTINCT positions") {
    val (se, byId) = buildTiny()
    def names(hits: Array[graft.search.ScoredDoc]): Set[String] =
      hits.map(h => byId(h.docId)).toSet
    // d5: xray at positions 0,2,4 — three distinct positions, window span
    // (4-0)-(3-1)=2; d6 has only two xrays and must NOT fake a third from
    // a duplicate slot
    assert(names(se.searchSpanNear(Seq("xray", "xray", "xray"), 2, inOrder = false, 10)) ==
      Set("d5"))
    assert(se.searchSpanNear(Seq("xray", "xray", "xray"), 1, inOrder = false, 10).isEmpty)
    // two adjacent xrays: only d6 (d5's closest pair spans 1)
    assert(names(se.searchSpanNear(Seq("xray", "xray"), 0, inOrder = false, 10)) == Set("d6"))
    assert(names(se.searchSpanNear(Seq("xray", "xray"), 1, inOrder = false, 10)) ==
      Set("d5", "d6"))
    // duplicates mixed with a distinct term: d6 = xray@0, xray@1, beta@2
    assert(names(se.searchSpanNear(Seq("xray", "xray", "beta"), 0, inOrder = false, 10)) ==
      Set("d6"))
    // span_first bound applies to the whole duplicate window
    assert(names(se.searchSpanFirst(Seq("xray", "xray"), 2, 10, slop = 0)) == Set("d6"))
  }

  test("match_phrase scores by PHRASE FREQUENCY (Lucene mode); distinct mode unchanged") {
    val dir = Files.createTempDirectory("graft-mp").toString
    val corpus = Seq(
      ("r/a", "p1", "c1", "md", "data merge xa data merge yb data merge"), // pf=3, dl=8
      ("r/a", "p2", "c2", "md", "data merge only once here zz"),           // pf=1, dl=6
      ("r/a", "p3", "c3", "md", "merge data reversed data zz"),            // pf=0
      ("r/a", "p4", "c4", "md", "unrelated words entirely")
    ).toDF("repo", "path", "commit", "lang", "content")
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/index", resume = false)
    val se = new Searcher(spark, s"$dir/index")
    val byId = spark.read.parquet(s"$dir/index/docs")
      .select("docId", "path").as[(Long, String)].collect().toMap
    val got = se.matchPhrase("data merge", 10)
    assert(got.map(h => byId(h.docId)).toSeq == Seq("p1", "p2"))
    // arithmetic: idfSum × tfNorm(pf, dl, avgdl) with corpus-wide df
    import graft.search.{BM25, Bm25Params}
    val n = 4L
    val avgdl = (8 + 6 + 5 + 3) / 4.0
    val idfSum = BM25.idf(n, 3) + BM25.idf(n, 3) // data in 3 docs, merge in 3
    val p = Bm25Params()
    val wantScores = Map(
      "p1" -> idfSum * BM25.tfNorm(3, 8, avgdl, p),
      "p2" -> idfSum * BM25.tfNorm(1, 6, avgdl, p))
    got.foreach(h => assert(h.score == wantScores(byId(h.docId)),
      s"phrase-freq score mismatch for ${byId(h.docId)}"))
    // distinct-term mode (the quoted-search contract) is unchanged
    assert(se.matchPhrase("data merge", 10, luceneScoring = false).toSeq ==
      se.search("\"data merge\"", 10).toSeq)
    // segmented matchPhrase == single (global stats)
    val seg = new SegmentedIndex(spark, s"$dir/seg", cfg, maxSegments = 4)
    seg.ingest(corpus.filter(col("path").isin("p1", "p4")))
    seg.ingest(corpus.filter(col("path").isin("p2", "p3")))
    val ms = new MultiSearcher(spark, s"$dir/seg")
    val gotSeg = ms.matchPhrase("data merge", 10).map(h => (h.path, h.score)).toSeq
    assert(gotSeg == got.map(h => (byId(h.docId), h.score)).toSeq)
    // duplicate-token phrase: "data data" occurs only where data is repeated
    // adjacently — nowhere in this corpus
    assert(se.matchPhrase("data data", 10).isEmpty)
  }

  test("span_first: match must end before the bound") {
    val (se, byId) = buildTiny()
    def names(hits: Array[graft.search.ScoredDoc]): Set[String] =
      hits.map(h => byId(h.docId)).toSet
    assert(names(se.searchSpanFirst(Seq("beta"), 1, 10)) == Set("d2"))
    assert(names(se.searchSpanFirst(Seq("beta"), 2, 10)) == Set("d1", "d2"))
    assert(names(se.searchSpanFirst(Seq("beta"), 5, 10)) == Set("d1", "d2", "d3", "d6"))
    // phrase span: "alpha beta" chain must END before position 2 → d1 only
    assert(names(se.searchSpanFirst(Seq("alpha", "beta"), 2, 10)) == Set("d1"))
    assert(names(se.searchSpanFirst(Seq("alpha", "beta"), 1, 10)).isEmpty)
  }

  test("span gating never changes scores (same docs score as plain search)") {
    val (se, _) = buildTiny()
    val plain = se.search("alpha beta", 10).map(h => h.docId -> h.score).toMap
    for (h <- se.searchSpanNear(Seq("alpha", "beta"), 3, inOrder = false, 10))
      assert(h.score == plain(h.docId))
    val plainBeta = se.search("beta", 10).map(h => h.docId -> h.score).toMap
    for (h <- se.searchSpanFirst(Seq("beta"), 2, 10))
      assert(h.score == plainBeta(h.docId))
  }

  test("segmented span queries == single-index span queries") {
    val corpus = CorpusGen.generate(spark, 120, seed = 53, partitions = 4).toDF()
    val dir = Files.createTempDirectory("graft-span-seg").toString
    val seg = new SegmentedIndex(spark, s"$dir/seg", cfg, maxSegments = 4)
    seg.ingest(corpus.filter(xxhash64(col("repo"), col("path")) % 2 === 0))
    seg.ingest(corpus.filter(xxhash64(col("repo"), col("path")) % 2 =!= 0))
    assert(seg.manifest.get.segments.length == 2)
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/single", resume = false)
    val se = new Searcher(spark, s"$dir/single")
    val docs = spark.read.parquet(s"$dir/single/docs")
      .select("docId", "repo", "path", "commit").as[(Long, String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val ms = new MultiSearcher(spark, s"$dir/seg")

    val cases = Seq(
      () => (ms.searchSpanNear(Seq("merge", "index"), 4, inOrder = false, 10),
             se.searchSpanNear(Seq("merge", "index"), 4, inOrder = false, 10)),
      () => (ms.searchSpanNear(Seq("merge", "index"), 4, inOrder = true, 10),
             se.searchSpanNear(Seq("merge", "index"), 4, inOrder = true, 10)),
      () => (ms.searchSpanFirst(Seq("def"), 5, 10), se.searchSpanFirst(Seq("def"), 5, 10)))
    var anyHits = false
    for (c <- cases) {
      val (got0, want0) = c()
      val got = got0.map(h => (h.repo, h.path, h.commit, h.score)).toSeq
      val want = want0.map(h => { val (r, p2, c2) = docs(h.docId); (r, p2, c2, h.score) }).toSeq
      assert(got == want, "segmented/single span mismatch")
      anyHits ||= got.nonEmpty
    }
    assert(anyHits, "degenerate test: no span query produced hits")
  }
}
