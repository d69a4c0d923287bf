package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index.{FieldConfig, IndexBuilder, IndexConfig, IndexMeta, Json}
import graft.search.Searcher

/** Ingest quarantine (the reference's es-hadoop bulk error handler,
  * `hail_elasticsearch_client.py:118-121`): malformed rows are diverted to
  * a `rejected/` relation with reasons inside the same stage-0 pass; the
  * index builds green over the survivors and the lineage invariant holds
  * over them. */
class QuarantineSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = IndexConfig(
    buildPartitions = 4, docsPerShard = 64L, blockSize = 16, buildBuckets = 2,
    fields = FieldConfig(keyword = Seq("lang", "repo"), denseVector = Seq("emb")),
    quarantine = true, maxContentChars = 10000)

  private def goodCorpus = CorpusGen.generate(spark, 120, seed = 53, partitions = 4).toDF()
    .withColumn("emb", array(lit(1.0f), lit(2.0f)))

  private def badRows = Seq(
    (null.asInstanceOf[String], "bad1", "c1", "md", "some content", Array(1.0f, 2.0f)),
    ("r/bad", null.asInstanceOf[String], "c2", "md", "some content", Array(1.0f, 2.0f)),
    ("r/bad", "bad3", "c3", "md", null.asInstanceOf[String], Array(1.0f, 2.0f)),
    ("r/bad", "bad4", "c4", "md", "x " * 9000, Array(1.0f, 2.0f)), // 18000 chars
    ("r/bad", "bad5", "c5", "md", "vector is junk", Array(Float.NaN, 2.0f))
  ).toDF("repo", "path", "commit", "lang", "content", "emb")

  test("bad rows divert to rejected/ with reasons; survivors build an intact index") {
    val dir = Files.createTempDirectory("graft-quarantine").toString
    val corpus = goodCorpus.unionByName(badRows)
    val meta: IndexMeta =
      new IndexBuilder(spark, cfg).build(corpus, s"$dir/index", resume = false)

    assert(meta.numDocs == 120)
    assert(meta.rejectedDocs == 5)
    val rej = spark.read.parquet(s"$dir/index/rejected")
      .select("path", "reason").as[(String, String)].collect().toMap
    assert(rej.size == 5)
    assert(rej(null) == "null_identity")
    assert(rej("bad3") == "null_content")
    assert(rej("bad4") == "oversized_content")
    assert(rej("bad5") == "bad_vector:emb")
    assert(rej.values.count(_ == "null_identity") == 2)

    // lineage invariant over SURVIVORS: meta.lineage equals the xor
    // fingerprint of the clean corpus, and a clean build (no quarantine,
    // good rows only) serves identical identity-ranked results
    val cleanDir = Files.createTempDirectory("graft-quarantine-clean").toString
    val cleanMeta = new IndexBuilder(spark, cfg.copy(quarantine = false))
      .build(goodCorpus, s"$cleanDir/index", resume = false)
    assert(meta.lineage == cleanMeta.lineage, "survivor lineage must equal the clean corpus")
    assert(meta.sumDl == cleanMeta.sumDl)

    def ranked(d: String): Seq[(String, String, String, Double)] = {
      val se = new Searcher(spark, d)
      val ids = spark.read.parquet(s"$d/docs")
        .select("docId", "repo", "path", "commit").as[(Long, String, String, String)]
        .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
      se.search("merge index", 15).map { h =>
        val (r, p, c) = ids(h.docId); (r, p, c, h.score)
      }.toSeq
    }
    assert(ranked(s"$dir/index") == ranked(s"$cleanDir/index"),
      "quarantined build must rank+score like a clean build of the survivors")

    // no rejected row leaked into docs
    val docs = spark.read.parquet(s"$dir/index/docs")
    assert(docs.count() == 120)
    assert(!docs.columns.contains("_reason"))
    assert(docs.filter(col("path").isin("bad3", "bad4", "bad5")).count() == 0)

    // the searcher exposes the reject channel; a clean index reports empty
    assert(new Searcher(spark, s"$dir/index").rejected().count() == 5)
    assert(new Searcher(spark, s"$cleanDir/index").rejected().count() == 0)
  }

  test("quarantine off preserves all-or-nothing ingest; knob changes configHash") {
    assert(cfg.configHash != cfg.copy(quarantine = false).configHash)
    assert(cfg.configHash != cfg.copy(maxContentChars = 5).configHash)
    val dir = Files.createTempDirectory("graft-quarantine-off").toString
    intercept[Exception] {
      new IndexBuilder(spark, cfg.copy(quarantine = false))
        .build(goodCorpus.unionByName(badRows), s"$dir/index", resume = false)
    }
    assert(!Json.exists(s"$dir/index/meta.json"), "a failed build must not publish")
  }
}
