package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig, IndexMerger, PostingBlock}
import graft.search.Searcher

/** Segment merge ≡ fresh build over the merged corpus (upsert semantics:
  * the newer segment wins on identity collision). */
class MergerSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val cfg = IndexConfig(
    buildPartitions = 8, docsPerShard = 64L, blockSize = 16, buildBuckets = 2)

  test("merge(A, B) is logically identical to a fresh build of A⊎B, B winning collisions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-merge").toString

    val corpusA = CorpusGen.generate(spark, 250, seed = 7, partitions = 4).toDF()
    // B = 120 new docs + 5 docs that REPLACE existing A identities (new content)
    val replaced = corpusA.orderBy("repo", "path", "commit").limit(5)
      .withColumn("content", concat(col("content"), lit(" freshly updated tokens")))
    val corpusB = CorpusGen.generate(spark, 120, seed = 99, partitions = 4).toDF()
      .unionByName(replaced)

    new IndexBuilder(spark, cfg).build(corpusA, s"$dir/A", resume = false)
    new IndexBuilder(spark, cfg).build(corpusB, s"$dir/B", resume = false)
    val mergedMeta = IndexMerger.merge(spark, s"$dir/A", s"$dir/B", s"$dir/merged", cfg)

    val freshCorpus = corpusA
      .join(replaced.select("repo", "path", "commit"), Seq("repo", "path", "commit"), "left_anti")
      .unionByName(corpusB)
    val freshMeta = new IndexBuilder(spark, cfg).build(freshCorpus, s"$dir/fresh", resume = false)

    assert(mergedMeta.copy(numBlocks = 0L) == freshMeta.copy(numBlocks = 0L))

    def docsOf(d: String) = spark.read.parquet(s"$d/docs")
      .select("docId", "repo", "path", "commit", "lang", "sha256", "dl")
      .collect().map(_.toSeq).toSet
    assert(docsOf(s"$dir/merged") == docsOf(s"$dir/fresh"))

    def postings(d: String): Set[(Long, Long, Long)] =
      spark.read.parquet(s"$d/blocks")
        .select(graft.index.PostingBlock.columns.map(col): _*)
        .as[PostingBlock].collect()
        .flatMap { b =>
          val ids = b.docIds; val tfs = b.tfValues
          (0 until b.n).map(i => (b.termId, ids(i), tfs(i)))
        }.toSet
    assert(postings(s"$dir/merged") == postings(s"$dir/fresh"))

    // query results bit-identical, including on updated content
    val sm = new Searcher(spark, s"$dir/merged")
    val sf = new Searcher(spark, s"$dir/fresh")
    for (q <- Seq("merge index", "freshly updated tokens", "def", "lang:scala query")) {
      val (hm, hf) = (sm.search(q, 20).toSeq, sf.search(q, 20).toSeq)
      assert(hm == hf, s"merged/fresh mismatch for '$q'")
    }
    // the updated docs are findable by their new content
    assert(sm.search("freshly updated tokens", 20).nonEmpty)
  }

  test("deleteDocs purge is logically identical to a fresh build over the survivors") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-purge").toString

    val corpus = CorpusGen.generate(spark, 250, seed = 11, partitions = 4).toDF()
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/idx", resume = false)
    val keyHash = pmod(xxhash64(col("repo"), col("path"), col("commit")), lit(5))
    val doomed = corpus.filter(keyHash === 0).select("repo", "path", "commit")
    assert(doomed.count() > 0)

    assert(graft.index.IndexMaintenance.deleteDocs(spark, s"$dir/idx", doomed, cfg))

    val survivors = corpus.filter(keyHash =!= 0)
    val freshMeta = new IndexBuilder(spark, cfg).build(survivors, s"$dir/fresh", resume = false)
    val purgedMeta = graft.index.Json.read(s"$dir/idx/meta.json",
      classOf[graft.index.IndexMeta])
    assert(purgedMeta.copy(numBlocks = 0L) == freshMeta.copy(numBlocks = 0L))

    def docsOf(d: String) = spark.read.parquet(s"$d/docs")
      .select("docId", "repo", "path", "commit", "lang", "sha256", "dl")
      .collect().map(_.toSeq).toSet
    assert(docsOf(s"$dir/idx") == docsOf(s"$dir/fresh"))

    def postings(d: String): Set[(Long, Long, Long)] =
      spark.read.parquet(s"$d/blocks")
        .select(graft.index.PostingBlock.columns.map(col): _*)
        .as[PostingBlock].collect()
        .flatMap { b =>
          val ids = b.docIds; val tfs = b.tfValues
          (0 until b.n).map(i => (b.termId, ids(i), tfs(i)))
        }.toSet
    assert(postings(s"$dir/idx") == postings(s"$dir/fresh"))

    // query results bit-identical to the fresh build (stats fully
    // recomputed — no ES-style df/avgdl drift from masked deletes)
    val sp = new Searcher(spark, s"$dir/idx")
    val sf = new Searcher(spark, s"$dir/fresh")
    for (q <- Seq("merge index", "def", "lang:scala query", "query -def", "ind*")) {
      assert(sp.search(q, 20).toSeq == sf.search(q, 20).toSeq,
        s"purged/fresh mismatch for '$q'")
    }

    // deleting unknown identities is a no-op (returns false, index untouched)
    val metaBefore = graft.index.Json.read(s"$dir/idx/meta.json",
      classOf[graft.index.IndexMeta])
    val unknown = Seq(("no-such-repo", "no/such/path", "0000")).toDF("repo", "path", "commit")
    assert(!graft.index.IndexMaintenance.deleteDocs(spark, s"$dir/idx", unknown, cfg))
    assert(graft.index.Json.read(s"$dir/idx/meta.json",
      classOf[graft.index.IndexMeta]) == metaBefore)

    // deleting EVERY document is refused (drop the directory instead)
    intercept[IllegalStateException] {
      graft.index.IndexMaintenance.deleteDocs(
        spark, s"$dir/idx", survivors.select("repo", "path", "commit"), cfg)
    }
    // the refused delete must not have damaged the live index
    assert(sp.search("merge index", 5).toSeq ==
      new Searcher(spark, s"$dir/idx").search("merge index", 5).toSeq)
  }
}
