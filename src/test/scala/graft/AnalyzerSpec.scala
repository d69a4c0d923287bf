package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analysis.Analyzer
import graft.corpus.CorpusGen

class AnalyzerSpec extends AnyFunSuite {

  test("golden tokens: camelCase, snake_case, acronyms, digits") {
    assert(Analyzer.tokenize("getFooBar").toSeq ==
      Seq("getfoobar", "get", "foo", "bar"))
    assert(Analyzer.tokenize("parse_json_config").toSeq ==
      Seq("parse_json_config", "parse", "json", "config"))
    assert(Analyzer.tokenize("HTTPServer2").toSeq ==
      Seq("httpserver2", "http", "server2"))
    assert(Analyzer.tokenize("plain simple").toSeq == Seq("plain", "simple"))
    assert(Analyzer.tokenize("x + y(z)").toSeq == Seq("x", "y", "z"))
    assert(Analyzer.tokenize("").isEmpty)
    assert(Analyzer.tokenize(null).isEmpty)
  }

  test("subtokens split points") {
    assert(Analyzer.subtokens("fooBarBaz").toSeq == Seq("foo", "bar", "baz"))
    assert(Analyzer.subtokens("XMLHttpRequest").toSeq == Seq("xml", "http", "request"))
    assert(Analyzer.subtokens("a_b__c").toSeq == Seq("a", "b", "c"))
  }

  test("queryTerms are distinct and sorted") {
    assert(Analyzer.queryTerms("fooBar fooBar baz").toSeq ==
      Seq("bar", "baz", "foo", "foobar").sorted)
  }

  test("Column analyze agrees with Scala tokenize on generated corpus") {
    val spark = TestSpark.spark
    import spark.implicits._
    val docs = CorpusGen.generate(spark, 60, seed = 11, partitions = 4)
    val viaColumn = docs
      .select($"path", Analyzer.analyze($"content").as("toks"))
      .as[(String, Seq[String])].collect().toMap
    val viaScala = docs.collect().map(f => f.path -> Analyzer.tokenize(f.content).toSeq).toMap
    assert(viaColumn.keySet == viaScala.keySet)
    for ((p, toks) <- viaScala) assert(viaColumn(p) == toks, s"mismatch for $p")
  }
}
