package graft

import org.scalatest.funsuite.AnyFunSuite

/** Harness-contract checks (the driver runs the full set via Verify +
  * DuckDB; here we keep a fast structural + smoke subset). */
class SparkEntrySpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle has a query; only engine-native ops may omit oracles") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert((q -- o).isEmpty, "every query has a DuckDB oracle")
  }

  test("smoke: representative queries return rows on sf0.001") {
    val names = Seq("q1_agg_pricing", "q11_join_star", "q15_interval_join",
      "td1_tokens", "td6_minhash", "td11_ann_topk", "fts1_bm25_brute", "fts2_term_dict")
    for (n <- names) {
      val c = SparkEntry.queries(n)(spark, sf).count()
      assert(c > 0, s"$n returned no rows")
    }
  }

  test("flatten util flattens nested structs to dotted leaf columns") {
    import spark.implicits._
    val df = Seq((1, ("x", (true, 2.0)))).toDF("a", "s")
      .selectExpr("a", "named_struct('name', s._1, 'inner', named_struct('f', s._2._1, 'g', s._2._2)) as s")
    val flat = graft.functions.Flatten(df)
    assert(flat.columns.toSeq == Seq("a", "s.name", "s.inner.f", "s.inner.g"))
    assert(flat.count() == 1)
  }
}
