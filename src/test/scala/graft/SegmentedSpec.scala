package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index.{IndexConfig, Json, SegmentedIndex}
import graft.search.{MultiSearcher, Oracle, Searcher}

/** SegmentedIndex semantics: disjoint-identity segments, eager merge on
  * identity overlap (upsert — newest wins), tiered compaction, forceMerge,
  * batch replay guard, orphan cleanup — with multi-segment query results
  * bit-identical to the brute-force oracle over the union corpus. */
class SegmentedSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val cfg = IndexConfig(
    buildPartitions = 4, docsPerShard = 64L, blockSize = 16, buildBuckets = 2)

  private val Queries = Seq("merge index", "def", "freshly updated tokens",
    "lang:scala query", "query score",
    // negation (segment-local exclude ids) and prefix (expansion over the
    // UNION of segment dictionaries) must stay oracle-identical segmented
    "merge -index", "ind* query", "lang:scala query -def", "query -lang:scala",
    // wildcard/regexp: expansion over the UNION of segment dictionaries
    "m?rge query", "/ind(ex|exes)/ -def")

  private def assertMatchesOracle(ms: MultiSearcher, corpus: org.apache.spark.sql.DataFrame): Unit =
    for (q <- Queries) {
      val got = ms.search(q, 15).toSeq.map(h => (h.repo, h.path, h.commit, h.score))
      val want = Oracle.bm25(corpus, q, 15, keywordFields = Some(cfg.fields.keyword.toSet))
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      assert(got == want, s"multi-segment/oracle mismatch for '$q'")
    }

  test("overlap triggers eager merge; disjoint batches stay separate; oracle bit-identity") {
    val dir = Files.createTempDirectory("graft-seg").toString
    val idx = new SegmentedIndex(spark, s"$dir/index", cfg, maxSegments = 4)

    val a = CorpusGen.generate(spark, 200, seed = 7, partitions = 4).toDF()
    idx.ingest(a)
    assert(idx.manifest.get.segments.length == 1)

    // batch B: 40 new docs + 5 REPLACING existing A identities → overlap →
    // the one overlapped segment merges with the delta (upsert: B wins)
    val replaced = a.orderBy("repo", "path", "commit").limit(5)
      .withColumn("content", concat(col("content"), lit(" freshly updated tokens")))
    val b = CorpusGen.generate(spark, 40, seed = 99, partitions = 2).toDF()
      .unionByName(replaced)
    idx.ingest(b)
    assert(idx.manifest.get.segments.length == 1, "overlap must eager-merge")

    // batch C: disjoint → its own segment, no merge
    val c = CorpusGen.generate(spark, 60, seed = 131, partitions = 2).toDF()
    idx.ingest(c)
    assert(idx.manifest.get.segments.length == 2)

    val union = a
      .join(replaced.select("repo", "path", "commit"), Seq("repo", "path", "commit"), "left_anti")
      .unionByName(b).unionByName(c)
    val ms = new MultiSearcher(spark, s"$dir/index")
    assert(ms.numDocs == 300)
    assertMatchesOracle(ms, union)

    // updated docs are findable by their new content through the merge
    assert(ms.search("freshly updated tokens", 10).nonEmpty)

    // ---- tiered compaction: bound the segment count
    val d4 = CorpusGen.generate(spark, 30, seed = 201, partitions = 2).toDF()
    val d5 = CorpusGen.generate(spark, 30, seed = 211, partitions = 2).toDF()
    val tight = new SegmentedIndex(spark, s"$dir/index", cfg, maxSegments = 2)
    tight.ingest(d4)
    tight.ingest(d5)
    assert(tight.manifest.get.segments.length <= 2, "compaction must bound segments")
    val union2 = union.unionByName(d4).unionByName(d5)
    val ms2 = new MultiSearcher(spark, s"$dir/index")
    assert(ms2.numDocs == 360)
    assertMatchesOracle(ms2, union2)

    // ---- forceMerge → single segment, same results
    tight.forceMerge()
    assert(tight.manifest.get.segments.length == 1)
    assertMatchesOracle(new MultiSearcher(spark, s"$dir/index"), union2)
  }

  test("segmented range filters and facets: oracle-identical across segments") {
    val dir = Files.createTempDirectory("graft-segr").toString
    val rcfg = cfg.copy(fields = graft.index.FieldConfig(
      keyword = Seq("lang", "repo"), storedOnly = Seq("nbytes")))
    val idx = new SegmentedIndex(spark, s"$dir/index", rcfg)
    def withNb(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("nbytes", length(col("content")).cast("long"))
    val a = withNb(CorpusGen.generate(spark, 150, seed = 7, partitions = 2).toDF())
    val b = withNb(CorpusGen.generate(spark, 90, seed = 99, partitions = 2).toDF())
    idx.ingest(a)
    idx.ingest(b)
    val union = a.unionByName(b)
    val ms = new MultiSearcher(spark, s"$dir/index")
    assert(ms.manifest.segments.length == 2, "fixture must span segments")
    val kw = Some(rcfg.fields.keyword.toSet)
    val med = union.stat.approxQuantile("nbytes", Array(0.5), 0.0).head.toLong
    val rq = Seq(s"merge nbytes:>=$med", s"query nbytes:200..$med",
      s"def -nbytes:>=$med", s"lang:scala query nbytes:<$med", "merge nbytes:>=99999999")
    for (q <- rq) {
      val got = ms.search(q, 15).toSeq.map(h => (h.repo, h.path, h.commit, h.score))
      val want = Oracle.bm25(union, q, 15, keywordFields = kw).collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      assert(got == want, s"segmented range mismatch for '$q'")
    }
    // batch parity with ranged + unranged queries interleaved
    val qs = rq.map(_ -> 10) :+ ("merge index" -> 10)
    ms.searchMany(qs).zip(qs).foreach { case (got, (q, k)) =>
      assert(got.toSeq == ms.search(q, k).toSeq, s"segmented ranged batch mismatch for '$q'")
    }
    // facets: counts sum EXACTLY across disjoint segments
    for (q <- Seq("merge", "merge -index", s"query nbytes:>=$med", "ind* query"))
      assert(ms.facets(q, "lang", 10).toSeq == Oracle.facets(union, q, "lang", 10, kw).toSeq,
        s"segmented facet mismatch for '$q'")

    // ---- segmented match-set APIs: count / stats / histogram / sortBy —
    // exact across segments, every bool shape incl. filter-only, range-only,
    // must_not-only and match_all
    val msQs = Seq("merge index", "lang:scala", s"nbytes:>=$med", "-merge", "",
      "merge -index", "zzz_not_a_term")
    for (q <- msQs) {
      assert(ms.count(q) == Oracle.matchingDocs(union, q, kw).count(),
        s"segmented count mismatch for '$q'")
      val eng = ms.statsAgg(q, "nbytes").collect()(0)
      val m = Oracle.matchingDocs(union, q, kw).filter(col("nbytes").isNotNull)
      val ora = m.agg(count(lit(1)), min(col("nbytes").cast("double")),
        max(col("nbytes").cast("double")), sum(col("nbytes").cast("double"))).collect()(0)
      assert(eng.getAs[Long]("cnt") == ora.getLong(0), s"segmented stats cnt for '$q'")
      if (ora.getLong(0) > 0) {
        assert(eng.getAs[Double]("mn") == ora.getDouble(1), s"segmented stats mn for '$q'")
        assert(eng.getAs[Double]("mx") == ora.getDouble(2), s"segmented stats mx for '$q'")
        assert(eng.getAs[Double]("sm") == ora.getDouble(3), s"segmented stats sm for '$q'")
      }
      val engH = ms.histogram(q, "nbytes", 200.0).collect()
        .map(r => (r.getAs[Double]("bucket"), r.getAs[Long]("cnt"))).toSeq
      val oraH = m.groupBy((floor(col("nbytes").cast("double") / 200.0) * 200.0).as("b"))
        .agg(count(lit(1))).orderBy(asc("b")).collect()
        .map(r => (r.getAs[Double](0), r.getAs[Long](1))).toSeq
      assert(engH == oraH, s"segmented histogram mismatch for '$q'")
    }
    // sort-by-field: identity tie-break across segments
    for (asc0 <- Seq(true, false)) {
      val ord = if (asc0) col("nbytes").asc_nulls_last else col("nbytes").desc_nulls_last
      val eng = ms.searchSortedBy("merge index", "nbytes", ascending = asc0, 20)
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val ora = Oracle.matchingDocs(union, "merge index", kw)
        .orderBy(ord, col("repo").asc, col("path").asc, col("commit").asc)
        .limit(20).select("repo", "path", "commit", "nbytes")
        .collect().map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(eng == ora, s"segmented sortBy mismatch asc=$asc0")
    }
    // minimum_should_match over segments
    assert(ms.count("merge index query", minShouldMatch = 2) ==
      Oracle.matchingDocs(union, "merge index query", kw, minShouldMatch = 2).count())

    // significant_terms: fg sums and bg df sums exact across segments
    for (q <- Seq("merge index", "lang:scala")) {
      val eng = ms.significantTerms(q, 15, minDocCount = 2).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      val ora = Oracle.significantTerms(union, q, 15, minDocCount = 2, kw).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(eng == ora, s"segmented significant_terms mismatch for '$q'")
    }

    // highlight: identity-keyed snippets, same rank order as searchMany
    val contentByIdent = union.select("repo", "path", "commit", "content").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getString(3)).toMap
    val hlQ = "merge index"
    val hlHits = ms.search(hlQ, 12).toSeq
    val hlRows = ms.highlight(hlQ, 12, union, window = 3).collect()
    assert(hlRows.map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3))).toSeq
      == hlHits.map(h => (h.repo, h.path, h.commit, h.score)),
      "segmented highlight rank/scores differ from search")
    hlRows.foreach { r =>
      val ident = (r.getString(0), r.getString(1), r.getString(2))
      val exp = Oracle.snippet(contentByIdent(ident), Seq("merge", "index"), 3)
      assert(Option(r.getString(4)) == exp, s"segmented snippet mismatch for $ident")
    }

    // more_like_this: global-df term selection + BM25, source doc excluded
    val mltSrc = union.select("repo", "path", "commit", "content")
      .orderBy("repo", "path", "commit").head()
    val mltIdent = (mltSrc.getString(0), mltSrc.getString(1), mltSrc.getString(2))
    val mltEng = ms.moreLikeThis(mltSrc.getString(3), 10, maxQueryTerms = 8,
      minTermFreq = 2, minDocFreq = 3, excludeIdents = Set(mltIdent)).toSeq
      .map(h => (h.repo, h.path, h.commit, h.score))
    val mltSel = Oracle.mltSelect(union, mltSrc.getString(3), 8, 2, 3)
    val mltOra = Oracle.bm25(union, mltSel.mkString(" "), 11, keywordFields = kw)
      .collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      .filterNot(h => (h._1, h._2, h._3) == mltIdent)
      .take(10)
    assert(mltEng == mltOra, "segmented moreLikeThis differs from oracle")
    assert(mltEng.nonEmpty)

    // top_hits: exhaustive scored match set (global stats), bucketed by a
    // keyword field, per-bucket identity-ordered top-k, counts exact
    val thQ = "merge index"
    val thAll = Oracle.bm25(union, thQ, 100000, keywordFields = kw).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
    val langByIdent = union.select("repo", "path", "commit", "lang").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getString(3)).toMap
    val thScored = thAll.map { case (r0, p0, c0, s0) => (langByIdent((r0, p0, c0)), r0, p0, c0, s0) }
    val thCounts = thScored.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val thTop = thCounts.toSeq.sortBy { case (v, c) => (-c, v) }.take(3)
    val thExp = thTop.flatMap { case (v, c) =>
      thScored.filter(_._1 == v).sortBy(t => (-t._5, (t._2, t._3, t._4))).take(2).zipWithIndex
        .map { case ((_, r0, p0, c0, s0), i) => (v, c, i + 1, r0, p0, c0, s0) }
    }
    val thGot = ms.topHits(thQ, "lang", 3, 2).collect().toSeq
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getString(3), r.getString(4), r.getString(5), r.getDouble(6)))
    assert(thGot == thExp, s"segmented topHits mismatch\ngot=$thGot\nexp=$thExp")

    // collapse: best hit per lang (score desc, identity asc), global top-5
    // of the group heads — over the same exhaustive scored match set
    val clExp = thScored.groupBy(_._1).map { case (_, hs) =>
      hs.minBy(t => (-t._5, (t._2, t._3, t._4)))
    }.toSeq.sortBy(t => (-t._5, (t._2, t._3, t._4))).take(5)
    val clGot = ms.collapse(thQ, "lang", 5).collect().toSeq
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getDouble(4)))
    assert(clGot == clExp, s"segmented collapse mismatch\ngot=$clGot\nexp=$clExp")

    // percentiles: exact quantile over the cross-segment match set
    val pcVals = Oracle.matchingDocs(union, thQ, kw).filter(col("nbytes").isNotNull)
      .select("nbytes").collect().map(_.getLong(0).toDouble).sorted
    def qcont(pp: Double): Double = {
      val idx = pp * (pcVals.length - 1)
      val lo = math.floor(idx).toInt
      val hi = math.ceil(idx).toInt
      if (lo == hi) pcVals(lo) else pcVals(lo) + (idx - lo) * (pcVals(hi) - pcVals(lo))
    }
    val pcGot = ms.percentilesAgg(thQ, "nbytes", Seq(0.25, 0.5, 0.9), exact = true)
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    for (pp <- Seq(0.25, 0.5, 0.9))
      assert(math.abs(pcGot(pp) - qcont(pp)) < 1e-6, s"segmented percentile $pp mismatch")

    // suggest: global df = sum over segments; union-dictionary candidates
    val vocab = union
      .select(explode(array_distinct(graft.analysis.Analyzer.analyze(col("content")))).as("t"))
      .groupBy("t").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sgExp = vocab.keys.toSeq
      .filter(t => t != "mrege" && Searcher.editWithin("mrege", t, 2))
      .map(t => (t, vocab(t), if (Searcher.editWithin("mrege", t, 1)) 1 else 2))
      .sortBy { case (t, df, dd) => (dd, -df, t) }.take(3)
      .map { case (t, df, dd) => ("mrege", t, df, dd) }
    assert(ms.suggest("mrege", topN = 3, mode = "always") == sgExp,
      "segmented suggest differs from brute-force vocabulary ranking")
  }

  test("segmented searchMany batch results identical to per-query search") {
    val dir = Files.createTempDirectory("graft-segb").toString
    val idx = new SegmentedIndex(spark, s"$dir/index", cfg)
    idx.ingest(CorpusGen.generate(spark, 120, seed = 7, partitions = 2).toDF())
    idx.ingest(CorpusGen.generate(spark, 80, seed = 99, partitions = 2).toDF())
    val ms = new MultiSearcher(spark, s"$dir/index")
    val qs = Seq(("merge index", 10), ("def", 15), ("lang:scala query", 10),
      ("zzz_not_a_term", 5), ("query score", 10),
      ("merge -index", 10), ("ind* query", 10), ("query -zzz_not_a_term", 10),
      ("merge~1", 10), ("index^2 merge", 10), ("indxe~2 query^0.5 -def", 10))
    val batch = ms.searchMany(qs)
    qs.zip(batch).foreach { case ((q, k), got) =>
      val want = ms.search(q, k)
      assert(got.toSeq == want.toSeq, s"segmented batch mismatch for '$q'")
    }
    // warm serving shape (pinned unioned relations + driver dictionaries)
    // returns identical results with zero dictionary jobs
    val warm = new MultiSearcher(spark, s"$dir/index").warm()
    try {
      qs.zip(warm.searchMany(qs)).zip(batch).foreach { case (((q, _), got), cold) =>
        assert(got.toSeq == cold.toSeq, s"warm/cold segmented mismatch for '$q'")
      }
    } finally warm.cool()
  }

  test("multi-segment phrase queries match the oracle; reject positions-less segments") {
    val dir = Files.createTempDirectory("graft-segp").toString
    val pcfg = cfg.copy(storePositions = true)
    val idx = new SegmentedIndex(spark, s"$dir/index", pcfg)
    val a = CorpusGen.generate(spark, 120, seed = 7, partitions = 2).toDF()
    val b = CorpusGen.generate(spark, 80, seed = 99, partitions = 2).toDF()
    idx.ingest(a)
    idx.ingest(b)
    assert(idx.manifest.get.segments.length == 2)
    val ms = new MultiSearcher(spark, s"$dir/index")
    val union = a.unionByName(b)
    for (q <- Seq("\"if else\"", "\"index merge\"", "\"query\"", "lang:scala \"def value\"",
      "\"if else\" query", "\"index merge\" def score",
      // slop phrases (in-order span): segmented kernel + oracle parity
      "\"if else\"~1", "\"else if\"~2 query", "\"index merge\"~3 -def")) {
      val got = ms.search(q, 15).toSeq.map(h => (h.repo, h.path, h.commit, h.score))
      val want = Oracle.bm25(union, q, 15, keywordFields = Some(pcfg.fields.keyword.toSet))
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getDouble(3)))
      assert(got == want, s"segmented phrase/oracle mismatch for $q")
    }
    // one batch mixing term, phrase, mixed and filtered queries — each row
    // must equal its per-query result
    val mixedBatch = Seq(("merge index", 10), ("\"if else\"", 15),
      ("\"index merge\" def", 10), ("lang:scala \"def value\"", 10))
    ms.searchMany(mixedBatch).zip(mixedBatch).foreach { case (got, (q, k)) =>
      assert(got.toSeq == ms.search(q, k).toSeq, s"mixed batch mismatch for '$q'")
    }

    // a segmented index without positions rejects phrase queries loudly
    val noPos = new SegmentedIndex(spark, s"$dir/nopos", cfg)
    noPos.ingest(a)
    intercept[IllegalStateException] {
      new MultiSearcher(spark, s"$dir/nopos").search("\"if else\"", 5)
    }
  }

  test("segmented getDoc: identity point read finds the owning segment; miss is None") {
    val dir = Files.createTempDirectory("graft-segget").toString
    val a = CorpusGen.generate(spark, 50, seed = 7, partitions = 2).toDF()
    val b = CorpusGen.generate(spark, 40, seed = 99, partitions = 2).toDF()
    val idx = new SegmentedIndex(spark, s"$dir/index", cfg)
    idx.ingest(a)
    idx.ingest(b)
    val ms = new MultiSearcher(spark, s"$dir/index")
    // one key from each batch → both segments resolvable
    for (src <- Seq(a, b)) {
      val w = src.select("repo", "path", "commit", "lang").collect()(2)
      val got = ms.getDoc(w.getString(0), w.getString(1), w.getString(2))
      assert(got.isDefined)
      assert(got.get.getAs[String]("lang") == w.getString(3))
    }
    assert(ms.getDoc("no-such-repo", "nope", "0000").isEmpty)
  }

  test("segmented updateDocFields patches only owning segments, postings untouched") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-segu").toString
    val idx = new SegmentedIndex(spark, s"$dir/index", cfg)
    idx.ingest(CorpusGen.generate(spark, 100, seed = 7, partitions = 2).toDF())
    idx.ingest(CorpusGen.generate(spark, 60, seed = 99, partitions = 2).toDF())
    val ms = new MultiSearcher(spark, s"$dir/index")
    val before = ms.search("merge index", 10).toSeq

    // pick 3 identities from the SECOND segment only
    val segNames = idx.manifest.get.segments.map(_.name)
    val seg1Docs = spark.read.parquet(s"$dir/index/${segNames(1)}/docs")
    val targets = seg1Docs.select("repo", "path", "commit").limit(3)
    val seg0DocsBefore = spark.read.parquet(s"$dir/index/${segNames(0)}/docs").collect().toSet

    graft.index.IndexMaintenance.updateDocFieldsSegmented(spark, s"$dir/index",
      targets.withColumn("stars", lit(9)))

    val seg1After = spark.read.parquet(s"$dir/index/${segNames(1)}/docs")
    assert(seg1After.filter(col("stars") === 9).count() == 3)
    // the untouched segment keeps its exact docs content (no stars column)
    val seg0After = spark.read.parquet(s"$dir/index/${segNames(0)}/docs")
    assert(!seg0After.columns.contains("stars"))
    assert(seg0After.collect().toSet == seg0DocsBefore)
    // queries unaffected
    assert(new MultiSearcher(spark, s"$dir/index").search("merge index", 10).toSeq == before)
  }

  test("segmented delete: only containing segments rewritten; emptied segments dropped") {
    import java.nio.file.{Files => JFiles, Path, Paths}
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-segd").toString
    val idx = new SegmentedIndex(spark, s"$dir/index", cfg, maxSegments = 4)
    val a = CorpusGen.generate(spark, 120, seed = 7, partitions = 2).toDF()
    val b = CorpusGen.generate(spark, 80, seed = 99, partitions = 2).toDF()
    val c = CorpusGen.generate(spark, 60, seed = 123, partitions = 2).toDF()
    idx.ingest(a); idx.ingest(b); idx.ingest(c)
    val m0 = idx.manifest.get
    assert(m0.segments.length == 3)

    def fileSnapshot(segName: String): Map[String, (Long, Long)] = {
      val root = Paths.get(s"$dir/index/$segName")
      val out = scala.collection.mutable.Map[String, (Long, Long)]()
      JFiles.walk(root).filter(JFiles.isRegularFile(_)).forEach { (f: Path) =>
        out += f.toString -> ((JFiles.size(f), JFiles.getLastModifiedTime(f).toMillis))
      }
      out.toMap
    }
    // segments holding b and c (ingest order) must stay byte-untouched
    val untouched = Seq(m0.segments(1).name, m0.segments(2).name)
    val snapBefore = untouched.map(fileSnapshot)

    // delete ~1/4 of a's identities — they live only in segment 0
    val keyHash = pmod(xxhash64(col("repo"), col("path"), col("commit")), lit(4))
    val doomed = a.filter(keyHash === 0).select("repo", "path", "commit")
    assert(doomed.count() > 0)
    idx.delete(doomed)

    val m1 = idx.manifest.get
    assert(m1.segments.length == 3)
    assert(m1.segments.map(_.name).toSet.intersect(untouched.toSet) == untouched.toSet,
      "segments without deleted identities must keep their directories")
    assert(!m1.segments.map(_.name).contains(m0.segments(0).name),
      "the purged segment must be replaced under a new name")
    assert(untouched.map(fileSnapshot) == snapBefore, "untouched segments were rewritten")
    assert(m1.lastBatchId == m0.lastBatchId, "delete must not move the replay watermark")

    // results bit-identical to the oracle over the surviving union
    val survivors = a.join(doomed, Seq("repo", "path", "commit"), "left_anti")
      .unionByName(b).unionByName(c)
    assertMatchesOracle(new MultiSearcher(spark, s"$dir/index"), survivors)

    // deleting EVERY document of one segment drops it from the manifest
    idx.delete(b.select("repo", "path", "commit"))
    val m2 = idx.manifest.get
    assert(m2.segments.length == 2)
    assertMatchesOracle(new MultiSearcher(spark, s"$dir/index"),
      a.join(doomed, Seq("repo", "path", "commit"), "left_anti").unionByName(c))

    // a delete matching nothing is a no-op (manifest byte-identical)
    val manifestBytes = JFiles.readAllBytes(Paths.get(s"$dir/index/segments.json")).toSeq
    idx.delete(Seq(("no-such-repo", "x", "y")).toDF("repo", "path", "commit"))
    assert(JFiles.readAllBytes(Paths.get(s"$dir/index/segments.json")).toSeq == manifestBytes)
  }

  test("batch replay guard and orphan cleanup") {
    val dir = Files.createTempDirectory("graft-seg2").toString
    val idx = new SegmentedIndex(spark, s"$dir/index", cfg)
    val a = CorpusGen.generate(spark, 50, seed = 7, partitions = 2).toDF()
    val b = CorpusGen.generate(spark, 20, seed = 99, partitions = 2).toDF()
    idx.ingest(a, batchId = 0L)
    idx.ingest(b, batchId = 1L)
    assert(new MultiSearcher(spark, s"$dir/index").numDocs == 70)
    // replayed batch (crash between publish and stream-checkpoint commit)
    idx.ingest(b, batchId = 1L)
    assert(new MultiSearcher(spark, s"$dir/index").numDocs == 70, "replay must be skipped")

    // an orphan segment dir (crash before manifest swap) is collected and
    // never read
    val orphan = s"$dir/index/seg-999"
    Files.createDirectories(java.nio.file.Paths.get(orphan))
    Files.writeString(java.nio.file.Paths.get(s"$orphan/junk.txt"), "leftover")
    val c = CorpusGen.generate(spark, 10, seed = 131, partitions = 2).toDF()
    idx.ingest(c, batchId = 2L)
    assert(!Json.exists(orphan), "orphan segment dir must be cleaned up")
    assert(new MultiSearcher(spark, s"$dir/index").numDocs == 80)
  }
}
