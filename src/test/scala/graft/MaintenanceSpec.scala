package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Analyzer
import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig, IndexMaintenance, Reindex, SegmentedIndex}
import graft.search.{MultiSearcher, Oracle, Searcher}

/** Query-driven maintenance (update_by_query / delete_by_query / reindex)
  * and the round-3 query-API additions (mget, ids query, filters/composite
  * aggregations, multi-field sort, index stats) — each checked against an
  * independent brute-force formulation over the corpus. */
class MaintenanceSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val cfg = IndexConfig(
    buildPartitions = 8, docsPerShard = 64L, blockSize = 16, buildBuckets = 2)
  private val kw = Some(Set("lang", "repo"))

  private def freshCorpus(n: Int, seed: Long) =
    CorpusGen.generate(spark, n, seed = seed, partitions = 4).toDF()

  test("update_by_query patches exactly the match set, from stored fields") {
    val dir = Files.createTempDirectory("graft-ubq").toString
    val corpus = freshCorpus(200, seed = 21)
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/idx", resume = false)

    val n = IndexMaintenance.updateByQuery(spark, s"$dir/idx", "def lang:scala",
      Map("tag" -> concat(lit("t-"), col("lang")), "marked" -> lit(1L)))
    // independent match set: analyzer over the raw corpus
    val expect = Oracle.matchingDocs(corpus, "def lang:scala", kw)
      .select(col("repo"), col("path"), col("commit"),
        concat(lit("t-"), col("lang")).as("tag"), lit(1L).as("marked"))
      .collect().map(_.toSeq).toSet
    assert(n == expect.size && n > 0)
    val got = spark.read.parquet(s"$dir/idx/docs")
      .filter(col("tag").isNotNull || col("marked").isNotNull)
      .select("repo", "path", "commit", "tag", "marked")
      .collect().map(_.toSeq).toSet
    assert(got == expect)
    // idempotent: a second identical run patches the same rows to the same values
    assert(IndexMaintenance.updateByQuery(spark, s"$dir/idx", "def lang:scala",
      Map("tag" -> concat(lit("t-"), col("lang")), "marked" -> lit(1L))) == n)
    // assignments may read fields a previous update wrote
    val n2 = IndexMaintenance.updateByQuery(spark, s"$dir/idx", "marked:>=1",
      Map("marked" -> (col("marked") + 1L)))
    assert(n2 == n)
    assert(spark.read.parquet(s"$dir/idx/docs").filter(col("marked") === 2L).count() == n)
  }

  test("delete_by_query is logically identical to a fresh build over the survivors") {
    val dir = Files.createTempDirectory("graft-dbq").toString
    val corpus = freshCorpus(200, seed = 22)
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/idx", resume = false)

    val n = IndexMaintenance.deleteByQuery(spark, s"$dir/idx", "lang:go", cfg)
    assert(n == corpus.filter(col("lang") === "go").count() && n > 0)
    val survivors = corpus.filter(col("lang") =!= "go")
    val freshMeta = new IndexBuilder(spark, cfg).build(survivors, s"$dir/fresh", resume = false)
    val meta = graft.index.Json.read(s"$dir/idx/meta.json", classOf[graft.index.IndexMeta])
    assert(meta.copy(numBlocks = 0L, userMeta = Map.empty) ==
      freshMeta.copy(numBlocks = 0L, userMeta = Map.empty))
    val sd = new Searcher(spark, s"$dir/idx")
    val sf = new Searcher(spark, s"$dir/fresh")
    for (q <- Seq("def query", "lang:scala merge", "index")) {
      assert(sd.search(q, 20).toSeq == sf.search(q, 20).toSeq, s"mismatch for '$q'")
    }
    // deleted docs are gone from stored fields too
    assert(spark.read.parquet(s"$dir/idx/docs").filter(col("lang") === "go").count() == 0)
    // second run: nothing left to match — returns 0, index untouched
    assert(IndexMaintenance.deleteByQuery(spark, s"$dir/idx", "lang:go", cfg) == 0L)
  }

  test("reindex builds the query subset with recomputed stats and a lineage gate") {
    val dir = Files.createTempDirectory("graft-reidx").toString
    val corpus = freshCorpus(200, seed = 23)
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/src", resume = false)

    val n = Reindex.reindex(spark, s"$dir/src", corpus, s"$dir/dst", "lang:rs", cfg)
    val sub = corpus.filter(col("lang") === "rs")
    assert(n == sub.count() && n > 0)
    // bit-identical to a fresh build over the subset (same identity order →
    // same dense docIds → same postings, stats, scores)
    val freshMeta = new IndexBuilder(spark, cfg).build(sub, s"$dir/fresh", resume = false)
    val meta = graft.index.Json.read(s"$dir/dst/meta.json", classOf[graft.index.IndexMeta])
    assert(meta.copy(numBlocks = 0L, userMeta = Map.empty) ==
      freshMeta.copy(numBlocks = 0L, userMeta = Map.empty))
    val sd = new Searcher(spark, s"$dir/dst")
    val sf = new Searcher(spark, s"$dir/fresh")
    for (q <- Seq("def", "struct impl", "query index"))
      assert(sd.search(q, 15).toSeq == sf.search(q, 15).toSeq, s"mismatch for '$q'")

    // lineage gate: content drift between source-index build and reindex fails
    val drifted = corpus.withColumn("content",
      when(col("lang") === "rs", concat(col("content"), lit(" drifted")))
        .otherwise(col("content")))
    val e = intercept[IllegalArgumentException] {
      Reindex.reindex(spark, s"$dir/src", drifted, s"$dir/dst2", "lang:rs", cfg)
    }
    assert(e.getMessage.contains("lineage"))
  }

  test("mget returns exactly the requested stored rows; ids query restricts scoring") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-mget").toString
    val corpus = freshCorpus(150, seed = 24)
    // positions on: the ids restriction must also gate the phrase kernel
    new IndexBuilder(spark, cfg.copy(storePositions = true))
      .build(corpus, s"$dir/idx", resume = false)
    val sr = new Searcher(spark, s"$dir/idx").warm()

    val docs = spark.read.parquet(s"$dir/idx/docs")
    val keys = docs.orderBy("docId").limit(40)
      .select("repo", "path", "commit").as[(String, String, String)].collect().toSeq
    // mget: exactly the requested rows (plus one missing key, silently absent)
    val got = sr.mget(keys :+ (("nope", "nope", "nope")))
      .select("repo", "path", "commit", "lang", "dl").collect().map(_.toSeq).toSet
    val expect = docs.orderBy("docId").limit(40)
      .select("repo", "path", "commit", "lang", "dl").collect().map(_.toSeq).toSet
    assert(got == expect && got.size == 40)

    // ids query ≡ unrestricted search filtered to the id set (stats untouched)
    val keySet = keys.toSet
    val idOf = docs.select("docId", "repo", "path", "commit")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
      .toMap
    for (q <- Seq("def query", "\"def\" merge", "index lang:scala")) {
      val all = sr.search(q, 150)
      val expectHits = all.filter(sd => keySet.contains(idOf(sd.docId))).take(10).toSeq
      assert(sr.search(q, 10, withinIds = keys).toSeq == expectHits, s"mismatch for '$q'")
    }
    // pure ids query (no clauses): constant score, docId order
    val pure = sr.search("", 10, withinIds = keys)
    assert(pure.map(_.docId).toSeq == keys.indices.take(10).map(_.toLong) &&
      pure.forall(_.score == 0.0))
  }

  test("filters/composite aggregations and multi-field sort match brute force") {
    val dir = Files.createTempDirectory("graft-aggs").toString
    val corpus = freshCorpus(200, seed = 25)
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/idx", resume = false)
    val sr = new Searcher(spark, s"$dir/idx").warm()

    // filtersAgg: per-bucket counts == per-query brute-force counts; empty bucket present
    val buckets = Seq("b_def" -> "def", "b_go" -> "lang:go", "b_none" -> "zzzqqq")
    val got = sr.filtersAgg(buckets).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expect = buckets.map { case (nm, q) =>
      nm -> Oracle.matchingDocs(corpus, q, kw).count()
    }.toMap
    assert(got == expect && got("b_none") == 0L)

    // compositeAgg: key-ordered pages tile the whole facet set exactly
    val full = Oracle.matchingDocs(corpus, "def", kw)
      .groupBy(col("lang").cast("string").as("key")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var after: Option[String] = None
    val paged = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var done = false
    while (!done) {
      val page = sr.compositeAgg("def", "lang", 3, after).collect()
      page.foreach(r => paged += r.getString(0) -> r.getLong(1))
      assert(page.length <= 3)
      if (page.length < 3) done = true else after = Some(page.last.getString(0))
    }
    assert(paged.toMap == full)
    assert(paged.keys.toSeq == paged.keys.toSeq.sorted)

    // multi-field sort: (lang asc, dl desc, docId asc) over the match set
    val gotSort = sr.searchSortedByFields("def", Seq("lang" -> true, "dl" -> false), 25)
      .collect().map(_.toSeq).toSeq
    val matchIds = sr.scan("def", Seq("lang", "dl"))
      .orderBy(col("lang").asc_nulls_last, col("dl").desc_nulls_last, col("docId").asc)
      .limit(25).select("docId", "lang", "dl").collect().map(_.toSeq).toSeq
    assert(gotSort == matchIds)

    // indexStats: measured == corpus-derived
    val stats = sr.indexStats().collect().head
    assert(stats.getLong(0) == corpus.count())
    val contentTerms = corpus
      .select(explode(Analyzer.analyze(col("content"))).as("t")).distinct().count()
    val kwTerms = corpus.select(col("lang")).distinct().count() +
      corpus.select(col("repo")).distinct().count()
    assert(stats.getLong(1) == contentTerms + kwTerms)
  }

  test("segmented equivalents agree with the single-index answers") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-segm").toString
    val corpus = freshCorpus(180, seed = 26)
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/one", resume = false)
    val seg = new SegmentedIndex(spark, s"$dir/seg", cfg)
    (0 until 3).foreach { i =>
      seg.ingest(
        corpus.filter(pmod(xxhash64(col("repo"), col("path"), col("commit")), lit(3)) === i),
        batchId = i.toLong)
    }
    val one = new Searcher(spark, s"$dir/one").warm()
    val ms = new MultiSearcher(spark, s"$dir/seg").warm()

    val buckets = Seq("a" -> "def", "b" -> "lang:js", "c" -> "zzzqqq")
    assert(ms.filtersAgg(buckets).collect().map(_.toSeq).toSeq ==
      one.filtersAgg(buckets).collect().map(_.toSeq).toSeq)

    assert(ms.compositeAgg("def", "lang", 4, Some("java")).collect().map(_.toSeq).toSeq ==
      one.compositeAgg("def", "lang", 4, Some("java")).collect().map(_.toSeq).toSeq)

    val keys = corpus.limit(25).select("repo", "path", "commit")
      .as[(String, String, String)].collect().toSeq
    val gotM = ms.mget(keys).select("repo", "path", "commit", "lang", "dl")
      .collect().map(_.toSeq).toSet
    val gotO = one.mget(keys).select("repo", "path", "commit", "lang", "dl")
      .collect().map(_.toSeq).toSet
    assert(gotM == gotO && gotM.size == 25)

    // segmented multi-field sort returns identity rows; compare via identity
    val sSeg = ms.searchSortedByFields("def", Seq("lang" -> true, "dl" -> false), 20)
      .collect().map(_.toSeq).toSeq
    val sOne = one.searchSortedByFields("def", Seq("lang" -> true, "dl" -> false), 20)
    val oneIdent = spark.read.parquet(s"$dir/one/docs")
      .join(sOne.select("docId"), Seq("docId"))
      .select("docId", "repo", "path", "commit", "lang", "dl")
      .collect().map(r => (r.getString(1), r.getString(2), r.getString(3), r.getString(4), r.getLong(5)))
      .toSet
    assert(sSeg.map(s => (s(0), s(1), s(2), s(3), s(4))).toSet ==
      oneIdent.map(t => (t._1: Any, t._2: Any, t._3: Any, t._4: Any, t._5: Any)))
  }
}
