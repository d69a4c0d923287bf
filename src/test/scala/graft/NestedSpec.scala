package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index.{FieldConfig, IndexBuilder, IndexConfig, IndexMaintenance, SegmentedIndex}
import graft.search.{MultiSearcher, Oracle, Searcher}

/** One nested element — the ES `nested` mapping's hidden child doc. */
case class Sym(name: String, kind: String, line: Long)
case class NDoc(repo: String, path: String, commit: String, lang: String,
    content: String, symbols: Seq[Sym])

/** ES `nested` field semantics (the reference's tarray(tstruct)→nested
  * mapping, `elasticsearch_utils.py:55-59`): same-element clause
  * conjunction — what distinguishes `nested` from a flat object mapping —
  * via the two-phase candidates→verify plan, single and segmented. */
class NestedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = IndexConfig(
    buildPartitions = 4, docsPerShard = 64L, blockSize = 16, buildBuckets = 2,
    fields = FieldConfig(keyword = Seq("lang", "repo"), nested = Seq("symbols")))

  // ---- handcrafted corpus: same-element semantics are decidable by eye
  private def tinyCorpus: DataFrame = Seq(
    NDoc("r/a", "f1", "c1", "scala", "hello world alpha",
      Seq(Sym("alpha", "fn", 1L), Sym("beta", "cls", 2L))),
    NDoc("r/a", "f2", "c2", "scala", "hello world beta",
      Seq(Sym("alpha", "cls", 3L), Sym("beta", "fn", 4L))),
    NDoc("r/a", "f3", "c3", "java", "hello world gamma",
      Seq(Sym("gamma", "fn", 5L))),
    NDoc("r/a", "f4", "c4", "java", "hello world delta", Seq.empty)
  ).toDF()

  private def buildTiny(): (Searcher, Map[Long, String]) = {
    val dir = Files.createTempDirectory("graft-nested").toString
    new IndexBuilder(spark, cfg).build(tinyCorpus, s"$dir/index", resume = false)
    val se = new Searcher(spark, s"$dir/index")
    val byId = spark.read.parquet(s"$dir/index/docs")
      .select("docId", "path").as[(Long, String)].collect().toMap
    (se, byId)
  }

  test("same-element conjunction: cross-element pairs must NOT match") {
    val (se, byId) = buildTiny()
    // both docs have SOME element name=alpha and SOME element kind=cls, but
    // only f2 has them in the SAME element — the block-join distinction
    val hits = se.searchNested("hello", "symbols", Seq("name" -> "alpha", "kind" -> "cls"), 10)
    assert(hits.map(h => byId(h.docId)).toSeq == Seq("f2"))
    val hits2 = se.searchNested("hello", "symbols", Seq("name" -> "alpha", "kind" -> "fn"), 10)
    assert(hits2.map(h => byId(h.docId)).toSeq == Seq("f1"))
    // single clause: plain per-element containment
    val hits3 = se.searchNested("hello", "symbols", Seq("name" -> "beta"), 10)
    assert(hits3.map(h => byId(h.docId)).toSet == Set("f1", "f2"))
    // integral sub-field, canonical string form
    val hits4 = se.searchNested("hello", "symbols", Seq("line" -> "3"), 10)
    assert(hits4.map(h => byId(h.docId)).toSeq == Seq("f2"))
    // same-element with an integral clause
    val hits5 = se.searchNested("hello", "symbols", Seq("name" -> "beta", "line" -> "2"), 10)
    assert(hits5.map(h => byId(h.docId)).toSeq == Seq("f1"))
    // value absent from every element → candidate term missing → empty
    assert(se.searchNested("hello", "symbols", Seq("name" -> "nosuch"), 10).isEmpty)
  }

  test("pure filter context: constant score 0, docId order; stats untouched") {
    val (se, byId) = buildTiny()
    val hits = se.searchNested("", "symbols", Seq("kind" -> "fn"), 10)
    assert(hits.forall(_.score == 0.0))
    assert(hits.map(h => byId(h.docId)).toSeq == Seq("f1", "f2", "f3"))
    // scored query: scores equal the UNFILTERED search's scores for the
    // same docs (the filter restricts candidates, never statistics)
    val all = se.search("hello alpha", 10).map(h => h.docId -> h.score).toMap
    val filtered = se.searchNested("hello alpha", "symbols", Seq("kind" -> "fn"), 10)
    filtered.foreach(h => assert(h.score == all(h.docId)))
  }

  test("nested facets bucket per ELEMENT (the hidden-child-doc unit)") {
    val (se, _) = buildTiny()
    val fc = se.nestedFacets("hello", "symbols", "kind", 10).toSeq
    assert(fc == Seq(("fn", 3L), ("cls", 2L)))
    // name buckets: alpha×2, beta×2, gamma×1
    val fn = se.nestedFacets("", "symbols", "name", 10).toSeq
    assert(fn == Seq(("alpha", 2L), ("beta", 2L), ("gamma", 1L)))
  }

  test("validation: unknown path / sub-field / float clause / patch guard") {
    val (se, _) = buildTiny()
    intercept[IllegalArgumentException] {
      se.searchNested("hello", "nope", Seq("a" -> "b"), 5)
    }
    intercept[IllegalArgumentException] {
      se.searchNested("hello", "symbols", Seq("nosub" -> "b"), 5)
    }
    // schema derive: array<struct> → nested, array<string> → keyword
    val derived = FieldConfig.derive(tinyCorpus.schema)
    assert(derived.nested == Seq("symbols"))
    assert(!derived.keyword.contains("symbols"))
  }

  test("updateDocFields refuses to patch a nested (indexed) column") {
    val dir = Files.createTempDirectory("graft-nested-up").toString
    new IndexBuilder(spark, cfg).build(tinyCorpus, s"$dir/index", resume = false)
    val upd = Seq(("r/a", "f1", "c1")).toDF("repo", "path", "commit")
      .withColumn("symbols", array(struct(lit("x").as("name"), lit("y").as("kind"),
        lit(9L).as("line"))))
    val e = intercept[IllegalArgumentException] {
      IndexMaintenance.updateDocFields(spark, s"$dir/index", upd)
    }
    assert(e.getMessage.contains("symbols"))
  }

  // ---- generated corpus: engine vs post-filtered oracle, single + segmented
  private def genCorpus(n: Int, seed: Long): DataFrame = {
    val tk = filter(split(lower(col("content")), "[^a-z0-9]+"), x => length(x) > 0)
    CorpusGen.generate(spark, n, seed = seed, partitions = 4).toDF()
      .withColumn("symbols", array(
        struct(element_at(tk, 1).as("name"), col("lang").as("kind"), lit(1L).as("line")),
        struct(element_at(tk, 3).as("name"),
          concat(lit("k_"), col("lang")).as("kind"), lit(2L).as("line"))))
  }

  test("engine == post-filtered oracle on a generated corpus") {
    val corpus = genCorpus(150, seed = 17)
    val dir = Files.createTempDirectory("graft-nested-gen").toString
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/index", resume = false)
    val se = new Searcher(spark, s"$dir/index")
    val docs = spark.read.parquet(s"$dir/index/docs")
      .select("docId", "repo", "path", "commit").as[(Long, String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // pick a clause pair straight from the data: element 2 of some doc
    val probe = corpus.select(element_at(col("symbols"), 2).getField("name"),
      element_at(col("symbols"), 2).getField("kind")).as[(String, String)].head()
    val clauses = Seq("name" -> probe._1, "kind" -> probe._2)
    var anyHits = false
    for (q <- Seq("merge index", "def query", "lang:scala merge")) {
      val got = se.searchNested(q, "symbols", clauses, 12)
        .map(h => (docs(h.docId), h.score)).toSeq
      // oracle: full unfiltered ranking, post-filtered by the same-element
      // predicate computed directly on the corpus (filters never touch
      // statistics, so post-filtering the full ranking is exact)
      val matching = corpus.filter(exists(col("symbols"), e =>
          e.getField("name") === lit(probe._1) && e.getField("kind") === lit(probe._2)))
        .select("repo", "path", "commit").as[(String, String, String)].collect().toSet
      val want = Oracle.bm25(corpus.drop("symbols"), q, 150,
          keywordFields = Some(cfg.fields.keyword.toSet))
        .collect().toSeq
        .map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getDouble(3)))
        .filter(p => matching.contains(p._1)).take(12)
      assert(got == want, s"nested engine/oracle mismatch for '$q'")
      anyHits ||= got.nonEmpty
    }
    assert(anyHits, "degenerate test: no query produced any nested-filtered hit")
  }

  test("segmented searchNested == single-index searchNested") {
    val corpus = genCorpus(120, seed = 23)
    val half1 = corpus.filter(xxhash64(col("repo"), col("path")) % 2 === 0)
    val half2 = corpus.filter(xxhash64(col("repo"), col("path")) % 2 =!= 0)
    val dir = Files.createTempDirectory("graft-nested-seg").toString
    val seg = new SegmentedIndex(spark, s"$dir/seg", cfg, maxSegments = 4)
    seg.ingest(half1)
    seg.ingest(half2)
    assert(seg.manifest.get.segments.length == 2)
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/single", resume = false)
    val se = new Searcher(spark, s"$dir/single")
    val docs = spark.read.parquet(s"$dir/single/docs")
      .select("docId", "repo", "path", "commit").as[(Long, String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val ms = new MultiSearcher(spark, s"$dir/seg")

    val probe = corpus.select(element_at(col("symbols"), 2).getField("name"),
      element_at(col("symbols"), 2).getField("kind")).as[(String, String)].head()
    val clauses = Seq("name" -> probe._1, "kind" -> probe._2)
    for (q <- Seq("merge index", "def query", "")) {
      val got = ms.searchNested(q, "symbols", clauses, 10)
        .map(h => (h.repo, h.path, h.commit, h.score)).toSeq
      val want = se.searchNested(q, "symbols", clauses, 10)
        .map(h => { val (r, p, c) = docs(h.docId); (r, p, c, h.score) }).toSeq
      assert(got == want, s"segmented/single nested mismatch for '$q'")
    }
    // minimum_should_match threads into the SCORED segmented path too: a
    // doc matching only one should clause must drop at msm=2 (regression —
    // the segmented kernel used to ignore msm on scored nested queries)
    for (msm <- Seq(1, 2)) {
      val gotM = ms.searchNested("merge index", "symbols", clauses, 10, minShouldMatch = msm)
        .map(h => (h.repo, h.path, h.commit, h.score)).toSeq
      val wantM = se.searchNested("merge index", "symbols", clauses, 10, minShouldMatch = msm)
        .map(h => { val (r, p, c) = docs(h.docId); (r, p, c, h.score) }).toSeq
      assert(gotM == wantM, s"segmented/single nested mismatch at msm=$msm")
    }
    assert(
      ms.searchNested("merge index", "symbols", clauses, 10, minShouldMatch = 2).length <=
        ms.searchNested("merge index", "symbols", clauses, 10).length)
    // at least one of the queries must have hits for the test to mean much
    assert(ms.searchNested("", "symbols", clauses, 10).nonEmpty)
  }
}
