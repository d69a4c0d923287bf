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
      "re" -> cold.search("/s(ort|can)/", 20).toSeq)
    // warm expansions: sorted-array binary search
    val warm = new Searcher(spark, s"$dir/index").warm()
    assert(warm.search("sc* merge", 20).toSeq == coldHits("prefix"))
    assert(warm.search("s*n", 20).toSeq == coldHits("wild"))
    assert(warm.search("/s(ort|can)/", 20).toSeq == coldHits("re"))
    assert(coldHits.values.exists(_.nonEmpty), "degenerate: no pattern matched")
  }
}
