package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.FieldPipeline
import graft.functions.FieldPipeline.FieldDef

/** Mirrors the reference's annotation-DAG scheduler tests
  * (`luigi_pipeline/tests/model/test_base_model.py:33-106`): dependency
  * rounds, at-most-once, overwrite, omit propagation, unsatisfiable error. */
class FieldPipelineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private def base = {
    import spark.implicits._
    Seq((1, 10), (2, 20)).toDF("id", "x")
  }

  test("fields compute in dependency rounds regardless of declaration order") {
    val out = FieldPipeline.annotateAll(base, Seq(
      FieldDef("c", Seq("b"), df => Some(col("b") * 2)),
      FieldDef("b", Seq("a"), df => Some(col("a") + 1)),
      FieldDef("a", Nil, df => Some(col("x") * 10))))
    val r = out.orderBy("id").collect().map(r => (r.getAs[Int]("id"),
      r.getAs[Int]("a"), r.getAs[Int]("b"), r.getAs[Int]("c")))
    assert(r.toSeq == Seq((1, 100, 101, 202), (2, 200, 201, 402)))
  }

  test("at-most-once: existing columns are not recomputed unless overwrite") {
    val withA = base.withColumn("a", lit(7))
    val out = FieldPipeline.annotateAll(withA, Seq(
      FieldDef("a", Nil, df => Some(lit(99))),
      FieldDef("b", Seq("a"), df => Some(col("a") + 1))))
    assert(out.select("a", "b").head() == org.apache.spark.sql.Row(7, 8))
    val over = FieldPipeline.annotateAll(withA, Seq(
      FieldDef("a", Nil, df => Some(lit(99)))), overwrite = true)
    assert(over.select("a").head().getInt(0) == 99)
  }

  test("omitted fields drop their dependents transitively") {
    val out = FieldPipeline.annotateAll(base, Seq(
      FieldDef("gone", Nil, df => None),
      FieldDef("child", Seq("gone"), df => Some(lit(1))),
      FieldDef("grandchild", Seq("child"), df => Some(lit(2))),
      FieldDef("kept", Nil, df => Some(lit(3)))))
    assert(out.columns.toSet == Set("id", "x", "kept"))
  }

  test("unsatisfiable dependencies raise, naming the offender") {
    val ex = intercept[FieldPipeline.UnsatisfiableDeps] {
      FieldPipeline.annotateAll(base, Seq(
        FieldDef("a", Seq("nope"), df => Some(lit(1)))))
    }
    assert(ex.getMessage.contains("a requires nope"))
    // cycles are unsatisfiable too
    intercept[FieldPipeline.UnsatisfiableDeps] {
      FieldPipeline.annotateAll(base, Seq(
        FieldDef("p", Seq("q"), df => Some(lit(1))),
        FieldDef("q", Seq("p"), df => Some(lit(2)))))
    }
  }
}
