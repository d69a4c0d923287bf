package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig, PostingBlock}
import graft.search.Searcher
import graft.streaming.StreamingIndexer

/** Streaming ingest: two AvailableNow passes over a growing corpus
  * directory index exactly the new files each time (checkpointed), and the
  * final index is logically identical to a fresh batch build. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val cfg = IndexConfig(
    buildPartitions = 4, docsPerShard = 64L, blockSize = 16, buildBuckets = 2)

  test("incremental AvailableNow ingest ≡ fresh batch build") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-stream").toString
    val src = s"$dir/src"
    val ckpt = s"$dir/ckpt"
    val idx = s"$dir/index"

    val batch1 = CorpusGen.generate(spark, 150, seed = 7, partitions = 2).toDF()
    val batch2 = CorpusGen.generate(spark, 80, seed = 55, partitions = 2).toDF()

    val indexer = new StreamingIndexer(spark, idx, cfg)

    batch1.write.mode("append").parquet(src)
    val q1 = indexer.ingestAvailable(src, ckpt)
    q1.awaitTermination()
    assert(new Searcher(spark, idx).meta.numDocs == 150)

    batch2.write.mode("append").parquet(src)
    val q2 = indexer.ingestAvailable(src, ckpt)
    q2.awaitTermination()
    val meta = new Searcher(spark, idx).meta
    assert(meta.numDocs == 230)

    // logical identity with a fresh batch build over everything
    val freshDir = s"$dir/fresh"
    val freshMeta = new IndexBuilder(spark, cfg)
      .build(batch1.unionByName(batch2), freshDir, resume = false)
    assert(meta.copy(numBlocks = 0L) == freshMeta.copy(numBlocks = 0L))

    def postings(d: String): Set[(Long, Long, Long)] =
      spark.read.parquet(s"$d/blocks")
        .select("shard", "termId", "firstDoc", "lastDoc", "n", "docs", "tfs", "dls", "maxTfn")
        .as[PostingBlock].collect()
        .flatMap { b =>
          val ids = b.docIds; val tfs = b.tfValues
          (0 until b.n).map(i => (b.termId, ids(i), tfs(i)))
        }.toSet
    assert(postings(idx) == postings(freshDir))

    val (si, sf) = (new Searcher(spark, idx), new Searcher(spark, freshDir))
    for (q <- Seq("merge index query", "def", "lang:scala val"))
      assert(si.search(q, 15).toSeq == sf.search(q, 15).toSeq)
  }
}
