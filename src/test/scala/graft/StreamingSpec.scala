package graft

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig}
import graft.search.{MultiSearcher, Searcher}
import graft.streaming.StreamingIndexer

/** Streaming ingest over the segmented index: three AvailableNow passes
  * over a growing corpus directory index exactly the new files each time
  * (checkpointed), per-batch ingest work does NOT scale with index size
  * (the big first segment's posting files are byte-untouched by later
  * batches), and multi-segment query results are bit-identical to a fresh
  * batch build over everything. */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val cfg = IndexConfig(
    buildPartitions = 4, docsPerShard = 64L, blockSize = 16, buildBuckets = 2)

  private def blockFiles(segDir: String): Map[String, (Long, Long)] = {
    val root = Paths.get(s"$segDir/blocks")
    val out = scala.collection.mutable.Map[String, (Long, Long)]()
    if (Files.isDirectory(root)) {
      Files.walk(root).filter(Files.isRegularFile(_)).forEach { (f: Path) =>
        out += f.toString -> ((Files.size(f), Files.getLastModifiedTime(f).toMillis))
      }
    }
    out.toMap
  }

  test("3-batch AvailableNow ingest: O(batch) work, bit-identical to fresh build") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val src = s"$dir/src"
    val ckpt = s"$dir/ckpt"
    val idx = s"$dir/index"

    val batch1 = CorpusGen.generate(spark, 150, seed = 7, partitions = 2).toDF()
    val batch2 = CorpusGen.generate(spark, 80, seed = 55, partitions = 2).toDF()
    val batch3 = CorpusGen.generate(spark, 60, seed = 131, partitions = 2).toDF()

    val indexer = new StreamingIndexer(spark, idx, cfg)

    batch1.write.mode("append").parquet(src)
    indexer.ingestAvailable(src, ckpt).awaitTermination()
    val m1 = new MultiSearcher(spark, idx)
    assert(m1.numDocs == 150)
    assert(m1.manifest.segments.length == 1)
    val seg0 = s"$idx/${m1.manifest.segments.head.name}"
    val seg0Files = blockFiles(seg0)
    assert(seg0Files.nonEmpty)

    batch2.write.mode("append").parquet(src)
    indexer.ingestAvailable(src, ckpt).awaitTermination()
    // the first (big) segment's posting files are byte-identical — batch-2
    // ingest did not touch, let alone rewrite, the existing index
    assert(blockFiles(seg0) == seg0Files, "batch 2 must not rewrite segment 0's postings")
    assert(new MultiSearcher(spark, idx).numDocs == 230)

    batch3.write.mode("append").parquet(src)
    indexer.ingestAvailable(src, ckpt).awaitTermination()
    assert(blockFiles(seg0) == seg0Files, "batch 3 must not rewrite segment 0's postings")
    val m3 = new MultiSearcher(spark, idx)
    assert(m3.numDocs == 290)
    assert(m3.manifest.segments.length == 3)

    // bit-identical query results vs a fresh single build over everything
    val freshDir = s"$dir/fresh"
    new IndexBuilder(spark, cfg)
      .build(batch1.unionByName(batch2).unionByName(batch3), freshDir, resume = false)
    val fresh = new Searcher(spark, freshDir)
    val freshDocs = spark.read.parquet(s"$freshDir/docs")
      .select("docId", "repo", "path", "commit").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    for (q <- Seq("merge index query", "def", "lang:scala val", "stream batch", "query")) {
      val multi = m3.search(q, 15).toSeq
        .map(h => (h.repo, h.path, h.commit, h.score))
      val single = fresh.search(q, 15).toSeq
        .map(h => { val d = freshDocs(h.docId); (d._1, d._2, d._3, h.score) })
      assert(multi == single, s"multi/fresh mismatch for '$q'")
    }
  }
}
