package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Analyzer
import graft.corpus.CorpusGen
import graft.index.{FieldConfig, IndexBuilder, IndexConfig, IndexMerger}
import graft.search.{BM25, Bm25Params, Searcher}

/** Multi-field analyzed indexing (ES multi-field mapping) + `multi_match`
  * (best_fields / most_fields), checked against a driver-side brute-force
  * replica computed straight from the corpus; plus the expansion-namespace
  * guard (content patterns must never expand into `field:...` tagged
  * terms). */
class MultiMatchSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val cfg = IndexConfig(
    buildPartitions = 8, docsPerShard = 64L, blockSize = 16, buildBuckets = 2,
    fields = FieldConfig(keyword = Seq("lang", "repo"), analyzed = Seq("title")))

  /** corpus with an extra short analyzed field derived from the path —
    * realistic multi-field shape (title ≪ content). */
  private def corpusWithTitle(n: Int, seed: Long): DataFrame =
    CorpusGen.generate(spark, n, seed = seed, partitions = 4).toDF()
      .withColumn("title", regexp_replace(col("path"), "[/._]", " "))

  /** Brute-force multi_match over the raw corpus: per-field BM25 with the
    * field's own docCount/avgdl/df, per-field sums combined best_fields /
    * most_fields. Returns top-k (repo, path, commit, score) in the
    * engine's total order (score desc, identity asc — docIds are assigned
    * in identity sort order). */
  private def replica(
      corpus: DataFrame,
      fieldsWithBoost: Seq[(String, Double)],
      tokens: Seq[String],
      mode: String, // "most" | "best" | "cross"
      tb: Double,
      k: Int,
      langFilter: Option[String] = None,
      msm: Int = 1): Seq[((String, String, String), Double)] = {
    val p = Bm25Params(cfg.k1, cfg.b)
    val rows = corpus
      .select("repo", "path", "commit", "lang", "content", "title")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        Analyzer.tokenize(r.getString(4)), Analyzer.tokenize(r.getString(5))))
      .sortBy(t => (t._1, t._2, t._3)) // identity order == docId order
    def toksOf(fld: String, r: (String, String, String, String, Array[String], Array[String])) =
      if (fld == "content") r._5 else r._6
    // per-field stats (Lucene docCount / sumTotalTermFreq)
    val stats: Map[String, (Long, Double)] = fieldsWithBoost.map { case (f, _) =>
      val withField = rows.filter(r => toksOf(f, r).nonEmpty)
      val (n, ttf) =
        if (f == "content") (rows.length.toLong, rows.map(_._5.length.toLong).sum)
        else (withField.length.toLong, withField.map(r => toksOf(f, r).length.toLong).sum)
      f -> ((n, ttf.toDouble / n.toDouble))
    }.toMap
    val dfOf: Map[(String, String), Long] = (for {
      (f, _) <- fieldsWithBoost; t <- tokens
    } yield (f, t) -> rows.count(r => toksOf(f, r).contains(t)).toLong).toMap
    val dfBlend: Map[String, Long] =
      tokens.map(t => t -> fieldsWithBoost.map(fb => dfOf((fb._1, t))).max).toMap
    val scored = rows.zipWithIndex.flatMap { case (r, _) =>
      if (langFilter.exists(_ != r._4)) None
      else {
        val matchedToks = tokens.count(t => fieldsWithBoost.exists { case (f, _) =>
          toksOf(f, r).contains(t) })
        if (matchedToks < msm || matchedToks == 0) None
        else {
          // per (field, token) clause score
          def clause(f: String, fb: Double, t: String): Option[Double] = {
            val fToks = toksOf(f, r)
            if (!fToks.contains(t)) None
            else {
              val (nF, avgdlF) = stats(f)
              val idf =
                if (mode == "cross") BM25.idf(rows.length.toLong, dfBlend(t))
                else BM25.idf(nF, dfOf((f, t)))
              Some(idf * fb * BM25.tfNorm(
                fToks.count(_ == t).toLong, fToks.length.toLong, avgdlF, p))
            }
          }
          val combined = mode match {
            case "cross" =>
              tokens.map { t =>
                val cs = fieldsWithBoost.flatMap { case (f, fb) => clause(f, fb, t) }
                if (cs.isEmpty) 0.0 else cs.max + tb * (cs.sum - cs.max)
              }.sum
            case _ =>
              val perField = fieldsWithBoost.map { case (f, fb) =>
                tokens.flatMap(t => clause(f, fb, t)).sum
              }
              val s = perField.sum
              if (mode == "most") s else perField.max + tb * (s - perField.max)
          }
          Some(((r._1, r._2, r._3), combined))
        }
      }
    }
    scored.sortBy { case (id, s) => (-s, id._1, id._2, id._3) }.take(k).toSeq
  }

  private def hitsWithIdentity(dir: String, hits: Array[graft.search.ScoredDoc]) = {
    val byId = spark.read.parquet(s"$dir/docs")
      .select("docId", "repo", "path", "commit")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3))))
      .toMap
    hits.map(h => (byId(h.docId), h.score)).toSeq
  }

  private def assertSame(
      got: Seq[((String, String, String), Double)],
      want: Seq[((String, String, String), Double)]): Unit = {
    assert(got.map(_._1) == want.map(_._1), s"\n got=$got\nwant=$want")
    got.zip(want).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)), s"score $a vs $b")
    }
  }

  test("marker term carries per-field docCount and token total; content stats untouched") {
    val dir = Files.createTempDirectory("graft-mm").toString
    val corpus = corpusWithTitle(120, seed = 31)
    val meta = new IndexBuilder(spark, cfg).build(corpus, s"$dir/idx", resume = false)
    assert(meta.analyzed == Seq("title"))
    val marker = spark.read.parquet(s"$dir/idx/terms")
      .filter(col("term") === "title:").select("df", "cf").head()
    val exp = corpus.select(col("title")).collect()
      .map(r => Analyzer.tokenize(r.getString(0)).length.toLong).filter(_ > 0)
    assert(marker.getLong(0) == exp.length.toLong) // docCount
    assert(marker.getLong(1) == exp.sum) // sumTotalTermFreq
    // content-wide stats exclude every tagged/keyword/marker term
    val expContentDl = corpus.select(col("content")).collect()
      .map(r => Analyzer.tokenize(r.getString(0)).length.toLong).sum
    assert(meta.sumDl == expContentDl)
    // the analyzed column is also stored
    assert(spark.read.parquet(s"$dir/idx/docs").columns.contains("title"))
  }

  test("multi_match best_fields matches the brute-force replica") {
    val dir = Files.createTempDirectory("graft-mm").toString
    val corpus = corpusWithTitle(150, seed = 32)
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/idx", resume = false)
    val sr = new Searcher(spark, s"$dir/idx")
    val toks = Seq("scala", "merge") // 'scala' appears in titles (".scala" ext) and content
    val got = hitsWithIdentity(s"$dir/idx",
      sr.multiMatch("scala merge", Seq("content", "title^2"), 10, "best_fields", 0.3))
    assertSame(got, replica(corpus, Seq("content" -> 1.0, "title" -> 2.0), toks,
      mode = "best", tb = 0.3, k = 10))
    assert(got.nonEmpty)
  }

  test("multi_match most_fields + keyword filter + minimum_should_match") {
    val dir = Files.createTempDirectory("graft-mm").toString
    val corpus = corpusWithTitle(150, seed = 33)
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/idx", resume = false)
    val sr = new Searcher(spark, s"$dir/idx")
    val toks = Seq("src", "query")
    val got = hitsWithIdentity(s"$dir/idx",
      sr.multiMatch("src query lang:scala", Seq("content", "title"), 12, "most_fields"))
    assertSame(got, replica(corpus, Seq("content" -> 1.0, "title" -> 1.0), toks,
      mode = "most", tb = 0.0, k = 12, langFilter = Some("scala")))
    assert(got.nonEmpty)
    val msm2 = hitsWithIdentity(s"$dir/idx",
      sr.multiMatch("src query lang:scala", Seq("content", "title"), 12, "most_fields",
        minShouldMatch = 2))
    assertSame(msm2, replica(corpus, Seq("content" -> 1.0, "title" -> 1.0), toks,
      mode = "most", tb = 0.0, k = 12, langFilter = Some("scala"), msm = 2))
  }

  test("multi_match cross_fields: blended df, per-token dis_max, tokens summed") {
    val dir = Files.createTempDirectory("graft-mm").toString
    val corpus = corpusWithTitle(150, seed = 40)
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/idx", resume = false)
    val sr = new Searcher(spark, s"$dir/idx")
    val toks = Seq("scala", "merge")
    val got = hitsWithIdentity(s"$dir/idx",
      sr.multiMatch("scala merge", Seq("content", "title"), 10, "cross_fields", 0.2))
    assertSame(got, replica(corpus, Seq("content" -> 1.0, "title" -> 1.0), toks,
      mode = "cross", tb = 0.2, k = 10))
    assert(got.nonEmpty)
  }

  test("merge of analyzed-field segments preserves marker stats and multi_match results") {
    val dir = Files.createTempDirectory("graft-mm").toString
    val corpus = corpusWithTitle(140, seed = 34)
    val (a, b) = (corpus.filter(col("repo") < "org020"), corpus.filter(col("repo") >= "org020"))
    new IndexBuilder(spark, cfg).build(a, s"$dir/a", resume = false)
    new IndexBuilder(spark, cfg).build(b, s"$dir/b", resume = false)
    IndexMerger.merge(spark, s"$dir/a", s"$dir/b", s"$dir/merged", cfg)
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/fresh", resume = false)
    val m = spark.read.parquet(s"$dir/merged/terms").filter(col("term") === "title:")
      .select("df", "cf").head()
    val f = spark.read.parquet(s"$dir/fresh/terms").filter(col("term") === "title:")
      .select("df", "cf").head()
    assert(m.getLong(0) == f.getLong(0) && m.getLong(1) == f.getLong(1))
    val gm = hitsWithIdentity(s"$dir/merged",
      new Searcher(spark, s"$dir/merged").multiMatch("scala merge", Seq("content", "title^2"), 10))
    val gf = hitsWithIdentity(s"$dir/fresh",
      new Searcher(spark, s"$dir/fresh").multiMatch("scala merge", Seq("content", "title^2"), 10))
    assert(gm == gf)
  }

  test("segmented multi_match equals the single-index answer (global field stats)") {
    val dir = Files.createTempDirectory("graft-mm").toString
    val corpus = corpusWithTitle(160, seed = 36)
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/one", resume = false)
    val seg = new graft.index.SegmentedIndex(spark, s"$dir/seg", cfg)
    (0 until 3).foreach { i =>
      seg.ingest(
        corpus.filter(pmod(xxhash64(col("repo"), col("path"), col("commit")), lit(3)) === i),
        batchId = i.toLong)
    }
    val one = new Searcher(spark, s"$dir/one")
    val ms = new graft.search.MultiSearcher(spark, s"$dir/seg")
    for ((q, ty, tb) <- Seq(
        ("scala merge", "best_fields", 0.3),
        ("src query lang:scala", "most_fields", 0.0),
        ("scala merge", "cross_fields", 0.2))) {
      val single = hitsWithIdentity(s"$dir/one",
        one.multiMatch(q, Seq("content", "title^2"), 10, ty, tb))
      val segd = ms.multiMatch(q, Seq("content", "title^2"), 10, ty, tb)
        .collect().map(r => ((r.getString(0), r.getString(1), r.getString(2)), r.getDouble(3)))
        .toSeq
      assert(segd.map(_._1) == single.map(_._1), s"$q: \n seg=$segd\n one=$single")
      segd.zip(single).foreach { case ((_, a), (_, b)) =>
        assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)))
      }
    }
  }

  test("match_phrase_prefix equals per-variant searches max-merged") {
    val dir = Files.createTempDirectory("graft-mpp").toString
    val corpus = CorpusGen.generate(spark, 150, seed = 37, partitions = 4).toDF()
    val pcfg = IndexConfig(buildPartitions = 8, docsPerShard = 64L, blockSize = 16,
      buildBuckets = 2, storePositions = true)
    new IndexBuilder(spark, pcfg).build(corpus, s"$dir/idx", resume = false)
    val sr = new Searcher(spark, s"$dir/idx")
    val stem = "s"
    val expansions = sr.expandPrefixMap(Seq(stem), 50)(stem)
    assert(expansions.length > 1, "need a multi-variant stem for this test")
    val expected = expansions.toSeq
      .flatMap(e => sr.search(s""""def $e"""", 200).toSeq)
      .groupBy(_.docId).map { case (d, hs) => (d, hs.map(_.score).max) }
      .toSeq.sortBy { case (d, s) => (-s, d) }.take(10)
    val got = sr.matchPhrasePrefix("def s", 10, maxExpansions = 50)
      .map(h => (h.docId, h.score)).toSeq
    assert(got == expected)
    // single-token degenerates to the prefix query
    assert(sr.matchPhrasePrefix("s", 5).map(_.docId).toSeq ==
      sr.search("s*", 5).map(_.docId).toSeq)
  }

  test("match_phrase on an analyzed field: positions in the FIELD stream, field stats") {
    val dir = Files.createTempDirectory("graft-mpf").toString
    val corpus = corpusWithTitle(140, seed = 38)
    val pcfg = cfg.copy(storePositions = true)
    new IndexBuilder(spark, pcfg).build(corpus, s"$dir/idx", resume = false)
    val sr = new Searcher(spark, s"$dir/idx")
    val p = Bm25Params(cfg.k1, cfg.b)
    val rows = corpus.select("repo", "path", "commit", "title").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Analyzer.tokenize(r.getString(3))))
      .sortBy(t => (t._1, t._2, t._3))
    // pick an adjacent pair that actually occurs
    val (w1, w2) = rows.iterator.map(_._4).collectFirst {
      case tk if tk.length >= 2 => (tk(0), tk(1))
    }.get
    val withF = rows.filter(_._4.nonEmpty)
    val nF = withF.length.toLong
    val avgdlF = withF.map(_._4.length.toLong).sum.toDouble / nF
    def df(t: String) = withF.count(_._4.contains(t)).toLong
    val expect = rows.zipWithIndex.flatMap { case (r, i) =>
      val tk = r._4
      val adj = tk.indices.dropRight(1).exists(j => tk(j) == w1 && tk(j + 1) == w2)
      if (!adj) None
      else {
        val fdl = tk.length.toLong
        val s = Seq(w1, w2).distinct.map { t =>
          BM25.idf(nF, df(t)) * BM25.tfNorm(tk.count(_ == t).toLong, fdl, avgdlF, p)
        }.sum
        Some((i.toLong, s)) // docId = rank in identity order
      }
    }.sortBy { case (d, s) => (-s, d) }.take(10).toSeq
    val got = sr.matchPhraseField("title", s"$w1 $w2", 10).map(h => (h.docId, h.score)).toSeq
    assert(got.map(_._1) == expect.map(_._1), s"phrase '$w1 $w2':\n got=$got\nwant=$expect")
    got.zip(expect).foreach { case ((_, a), (_, b)) =>
      assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)))
    }
    assert(got.nonEmpty)
  }

  test("termvectors: one doc's (term, tf) + index-wide (df, cf), per field") {
    val dir = Files.createTempDirectory("graft-tv").toString
    val corpus = corpusWithTitle(80, seed = 39)
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/idx", resume = false)
    val sr = new Searcher(spark, s"$dir/idx")
    val rows = corpus.select("repo", "path", "commit", "content", "title").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        Analyzer.tokenize(r.getString(3)), Analyzer.tokenize(r.getString(4))))
    val target = rows.sortBy(t => (t._1, t._2, t._3)).apply(7)
    for ((field, toksOf) <- Seq(
        ("content", (t: (String, String, String, Array[String], Array[String])) => t._4),
        ("title", (t: (String, String, String, Array[String], Array[String])) => t._5))) {
      val mine = toksOf(target)
      val expect = mine.distinct.sorted.map { t =>
        Seq[Any](t, mine.count(_ == t).toLong,
          rows.count(r => toksOf(r).contains(t)).toLong,
          rows.map(r => toksOf(r).count(_ == t).toLong).sum)
      }.toSeq
      val got = sr.termVectors(target._1, target._2, target._3, field)
        .collect().map(_.toSeq).toSeq
      assert(got == expect, s"field $field")
    }
  }

  test("array keyword field: term filter is list containment; derive maps array<string>") {
    val dir = Files.createTempDirectory("graft-kwarr").toString
    val corpus = CorpusGen.generate(spark, 120, seed = 41, partitions = 4).toDF()
      .withColumn("tags", array(col("lang"), substring(col("commit"), 1, 1)))
    val kcfg = IndexConfig(buildPartitions = 8, docsPerShard = 64L, blockSize = 16,
      buildBuckets = 2, fields = FieldConfig(keyword = Seq("lang", "repo", "tags")))
    new IndexBuilder(spark, kcfg).build(corpus, s"$dir/idx", resume = false)
    val sr = new Searcher(spark, s"$dir/idx")
    val got = sr.scan("def tags:scala")
      .select("repo", "path", "commit").collect().map(_.toSeq).toSet
    val want = corpus
      .filter(array_contains(col("tags"), "scala") &&
        array_contains(graft.analysis.Analyzer.analyze(col("content")), "def"))
      .select("repo", "path", "commit").collect().map(_.toSeq).toSet
    assert(got == want && got.nonEmpty)
    // scores with the filter are identical to the unfiltered scores
    // (keyword filters never touch statistics)
    val scoresAll = sr.search("def", 500).map(h => h.docId -> h.score).toMap
    sr.search("def tags:scala", 500).foreach { h =>
      assert(scoresAll(h.docId) == h.score)
    }
    // schema-derived field plan treats array<string> as keyword
    val derived = FieldConfig.derive(corpus.schema)
    assert(derived.keyword.contains("tags"))
    // updateDocFields refuses to patch an indexed (keyword) column
    intercept[IllegalArgumentException] {
      graft.index.IndexMaintenance.updateDocFields(spark, s"$dir/idx",
        corpus.limit(1).select(col("repo"), col("path"), col("commit"),
          lit("x").as("lang")))
    }
  }

  test("content pattern expansion never leaks into the field: namespace") {
    val dir = Files.createTempDirectory("graft-mm").toString
    val corpus = corpusWithTitle(100, seed = 35)
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/idx", resume = false)
    val sr = new Searcher(spark, s"$dir/idx")
    // 'la*' would lexically match 'lang:scala' keyword terms; 'ti*' would
    // match 'title:' tagged terms — none may appear in an expansion
    val all = sr.expandPrefixMap(Seq("la", "ti", "s")).values.flatten ++
      sr.expandFuzzyMap(Seq(("lang", 2), ("title", 2))).values.flatten ++
      sr.expandWildcardMap(Seq("l*", "t?tle*")).values.flatten
    assert(all.forall(!_.contains(':')), s"leaked: ${all.filter(_.contains(':')).toSeq}")
    // cold path (no warmed dictionary map) takes the DataFrame branch
    val cold = new Searcher(spark, s"$dir/idx")
    assert(cold.expandPrefixMap(Seq("la")).values.flatten.forall(!_.contains(':')))
  }
}
