package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.search.{Oracle, Percolator, Searcher}

/** ES `percolate` (reverse search): registered queries matched against
  * incoming documents in one narrow pass, with the engine's bool-query
  * semantics — should terms + msm, phrases (doc-position verified),
  * keyword filters, negations, and pattern clauses expanded against the
  * document's own token set (the one-doc-index rule). */
class PercolatorSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tinyDocs = Seq(
    ("r/a", "f1", "c1", "scala", "merge the index fast"),
    ("r/a", "f2", "c2", "java", "index the merge"),
    ("r/a", "f3", "c3", "scala", "nothing relevant here"),
    ("r/a", "f4", "c4", "go", "fast indexing of merged data")
  ).toDF("repo", "path", "commit", "lang", "content")

  test("bool semantics: terms, phrases, filters, negations, patterns") {
    val perc = new Percolator(Seq(
      "q_term" -> "merge",
      "q_phrase" -> "\"merge the index\"",
      "q_filter" -> "merge lang:scala",
      "q_neg" -> "index -fast",
      "q_prefix" -> "index*",
      "q_filter_only" -> "lang:go"))
    val got = perc.percolate(tinyDocs)
      .select("path", "query_id").as[(String, String)].collect().toSet
    val want = Set(
      "f1" -> "q_term", "f2" -> "q_term", // f4's "merged" is a different token
      "f1" -> "q_phrase",                  // exact in-order adjacency only in f1
      "f1" -> "q_filter",                  // merge + lang:scala
      "f2" -> "q_neg",                     // index without fast
      "f1" -> "q_prefix", "f2" -> "q_prefix", "f4" -> "q_prefix", // index / indexing
      "f4" -> "q_filter_only")
    assert(got == want)
  }

  test("percolate agrees with the index-side match set on a generated corpus") {
    val corpus = CorpusGen.generate(spark, 150, seed = 83, partitions = 4).toDF()
    val queries = Seq(
      "p1" -> "merge index",
      "p2" -> "lang:scala def",
      "p3" -> "query -def",
      "p4" -> "ind* score")
    val perc = new Percolator(queries)
    val got = perc.percolate(corpus)
      .select("repo", "path", "commit", "query_id")
      .as[(String, String, String, String)].collect()
      .groupBy(_._4).map { case (q, rs) => q -> rs.map(r => (r._1, r._2, r._3)).toSet }

    // oracle: the brute-force FULL match set (uncapped bm25 ranking) of
    // each query over the same corpus — identical bool semantics
    for ((id, q) <- queries) {
      val want = Oracle.bm25(corpus, q, 100000).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
      assert(got.getOrElse(id, Set.empty) == want, s"percolate/oracle mismatch for '$q'")
    }
    assert(got.values.exists(_.nonEmpty), "degenerate: no query matched anything")
  }

  test("minShouldMatch counts pattern expansions per matching doc token (index rule)") {
    // doc tokens {index, indexing} satisfy msm=2 for 'ind* score' INDEX-side
    // (two dictionary expansions = two should clauses) — percolate must agree
    val docs = Seq(
      ("r/a", "g1", "c1", "scala", "index indexing"),
      ("r/a", "g2", "c2", "scala", "index score"),
      ("r/a", "g3", "c3", "scala", "index only here"),
      ("r/a", "g4", "c4", "scala", "score alone")
    ).toDF("repo", "path", "commit", "lang", "content")
    val perc = new Percolator(Seq("pq" -> "ind* score"))
    val got = perc.percolate(docs, minShouldMatch = 2)
      .select("path").as[String].collect().toSet
    assert(got == Set("g1", "g2"))
    // and on a generated corpus the msm=2 match set equals the index-side
    // oracle's (distinct contributing terms >= 2)
    val corpus = CorpusGen.generate(spark, 120, seed = 89, partitions = 4).toDF()
    val got2 = new Percolator(Seq("pq" -> "ind* score")).percolate(corpus, minShouldMatch = 2)
      .select("repo", "path", "commit").as[(String, String, String)].collect().toSet
    val want2 = Oracle.bm25(corpus, "ind* score", 100000, minShouldMatch = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(got2 == want2)
    assert(got2.nonEmpty, "degenerate: msm=2 matched nothing")
  }
}
