package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.Searcher

/** Sorted-dictionary range tier for pattern expansion: prefix (and
  * literal-prefixed wildcard/regexp) expansion binary-searches the warm
  * sorted term array and range-restricts the cold terms scan, instead of
  * scanning the whole dictionary. Results identical to the full scan. */
class DictRangeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = IndexConfig(
    buildPartitions = 4, docsPerShard = 64L, blockSize = 16, buildBuckets = 2)

  test("prefixSlice == filter(startsWith) on a sorted array") {
    val sorted = Array("alpha", "scala", "scan", "scanner", "scope", "sort", "zulu")
    assert(Searcher.prefixSlice(sorted, "sca").toSeq == Seq("scala", "scan", "scanner"))
    assert(Searcher.prefixSlice(sorted, "sc").toSeq == Seq("scala", "scan", "scanner", "scope"))
    assert(Searcher.prefixSlice(sorted, "zzz").isEmpty)
    assert(Searcher.prefixSlice(sorted, "a").toSeq == Seq("alpha"))
    assert(Searcher.prefixSlice(Array.empty[String], "x").isEmpty)
  }

  test("literal prefixes of regexes and globs") {
    assert(Searcher.literalPrefixOfRegex(Searcher.globToRegex("sc*n")) == "sc")
    assert(Searcher.literalPrefixOfRegex(Searcher.globToRegex("qu?ry")) == "qu")
    assert(Searcher.literalPrefixOfRegex("s(ort|can)") == "s")
    assert(Searcher.literalPrefixOfRegex("(a|b)c") == "")
    assert(Searcher.rangePredOf(Seq("sc", "qu")).isDefined)
    assert(Searcher.rangePredOf(Seq("sc", "")).isEmpty, "prefix-less pattern → full scan")
    // top-level alternation: the leading literal run is NOT mandatory
    // (/sort|scan/ matches "scan") → full-scan fallback
    assert(Searcher.literalPrefixOfRegex("sort|scan") == "")
    assert(Searcher.literalPrefixOfRegex("a|b") == "")
    // a quantifier after the run makes the run's LAST char optional
    assert(Searcher.literalPrefixOfRegex("ab?c") == "a")
    assert(Searcher.literalPrefixOfRegex("ab*") == "a")
    assert(Searcher.literalPrefixOfRegex("ab{0,2}c") == "a")
    assert(Searcher.literalPrefixOfRegex("b?c") == "")
    // '|' inside a character class or escaped is not alternation
    assert(Searcher.literalPrefixOfRegex("a[|]b") == "a")
    assert(Searcher.literalPrefixOfRegex("a\\|b") == "a")
    // '+' keeps the last char mandatory (ab+ requires at least one 'b')
    assert(Searcher.literalPrefixOfRegex("ab+c") == "ab")
  }

  test("fuzzyWalk == brute-force editWithin, with restricted DP row work") {
    // synthetic dictionary: enough prefix diversity that dead-prefix
    // skipping must engage (every 4-char combination over 6 letters)
    val letters = "abcdef"
    val dict = (for {
      a <- letters; b <- letters; c <- letters; d <- letters
    } yield s"$a$b$c$d").sorted.toArray.map(_.toString)
    val fullRows = dict.map(_.length.toLong).sum // DP rows a full scan computes
    for ((stem, bound) <- Seq(("abcd", 1), ("fade", 2), ("acebd", 2), ("xyz", 1))) {
      val (got, rowsComputed) = Searcher.fuzzyWalk(dict, stem, bound)
      val want = dict.filter(t => Searcher.editWithin(stem, t, bound))
      assert(got.toSeq == want.toSeq, s"stem=$stem bound=$bound")
      assert(rowsComputed < fullRows / 2,
        s"stem=$stem bound=$bound computed $rowsComputed of $fullRows full-scan rows " +
          "— the dead-prefix skip is not engaging")
    }
    // degenerate shapes
    assert(Searcher.fuzzyWalk(Array.empty[String], "abc", 1)._1.isEmpty)
    assert(Searcher.fuzzyWalk(dict, "abcd", 0)._1.toSeq == Seq("abcd"))
  }

  test("warm range tier and cold range scan agree with each other and the index") {
    val dir = Files.createTempDirectory("graft-dictrange").toString
    val corpus = CorpusGen.generate(spark, 150, seed = 59, partitions = 4).toDF()
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/index", resume = false)

    // the cold scan's range predicate reaches the parquet reader: the
    // pushed-filter list carries the term range, so row-group min/max
    // pruning applies (termIds are dense in term order). Checked BEFORE any
    // warm() pins the relation (a cached plan reports the same range as
    // in-memory batch filters instead of PushedFilters).
    val pred = Searcher.rangePredOf(Seq("sc")).get
    val plan = spark.read.parquet(s"$dir/index/terms").filter(pred)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(term,sc"),
      s"range predicate must push into the terms scan; plan was:\n$plan")

    // cold expansions (no warm()): range-restricted terms scan
    val cold = new Searcher(spark, s"$dir/index")
    val coldHits = Map(
      "prefix" -> cold.search("sc* merge", 20).toSeq,
      "wild" -> cold.search("s*n", 20).toSeq,
      "re" -> cold.search("/s(ort|can)/", 20).toSeq,
      "alt" -> cold.search("/split|stream/", 20).toSeq,
      "opt" -> cold.search("/streamx?/", 20).toSeq,
      "fz" -> cold.search("scorp~1 merge", 20).toSeq)
    // warm expansions: sorted-array binary search / DP trie walk
    val warm = new Searcher(spark, s"$dir/index").warm()
    assert(warm.search("sc* merge", 20).toSeq == coldHits("prefix"))
    assert(warm.search("s*n", 20).toSeq == coldHits("wild"))
    assert(warm.search("/s(ort|can)/", 20).toSeq == coldHits("re"))
    assert(warm.search("/split|stream/", 20).toSeq == coldHits("alt"))
    assert(warm.search("/streamx?/", 20).toSeq == coldHits("opt"))
    assert(warm.search("scorp~1 merge", 20).toSeq == coldHits("fz"))
    assert(coldHits.values.exists(_.nonEmpty), "degenerate: no pattern matched")

    // the top-level-alternation expansion must carry BOTH branches — the
    // pre-fix-tier regression: a "split" mandatory prefix silently dropped
    // every "stream" dictionary term from /split|stream/
    val allTerms = spark.read.parquet(s"$dir/index/terms")
      .filter(!col("term").contains(":")).select("term").as[String].collect()
    val rx = java.util.regex.Pattern.compile("split|stream")
    val wantAlt = allTerms.filter(t => rx.matcher(t).matches()).sorted.toSeq
    assert(warm.expandRegexpMap(Seq("split|stream"))("split|stream").toSeq == wantAlt)
    assert(cold.expandRegexpMap(Seq("split|stream"))("split|stream").toSeq == wantAlt)
    assert(wantAlt.size >= 2, s"corpus should carry both 'split' and 'stream' (got $wantAlt)")
    // quantifier regression: /streamx?/ must match "stream" (the last
    // literal is optional — the old prefix "streamx" range-missed it)
    assert(warm.expandRegexpMap(Seq("streamx?"))("streamx?").toSeq.contains("stream"))
  }
}
