package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index.{IndexBuilder, IndexConfig, IndexSnapshot, Json, SegmentedIndex}
import graft.search.{MultiSearcher, Searcher}

/** ES `_snapshot`/`_restore` semantics: immutable named snapshots, staged
  * restore with integrity re-verification from the restored bytes, atomic
  * publish that never destroys a live index on failure. */
class SnapshotSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  private val cfg = IndexConfig(
    buildPartitions = 4, docsPerShard = 64L, blockSize = 16, buildBuckets = 2)

  test("snapshot → restore round-trip preserves query results (single index)") {
    val dir = Files.createTempDirectory("graft-snap").toString
    val corpus = CorpusGen.generate(spark, 120, seed = 31, partitions = 4).toDF()
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/index", resume = false)
    val before = new Searcher(spark, s"$dir/index").search("merge index", 10).toSeq

    val info = IndexSnapshot.snapshot(s"$dir/index", s"$dir/repo", "snap-1")
    assert(!info.segmented && info.numDocs == 120 && info.numFiles > 0)
    assert(IndexSnapshot.list(s"$dir/repo").map(_.name) == Seq("snap-1"))
    // immutable: same name refused
    intercept[IllegalArgumentException] {
      IndexSnapshot.snapshot(s"$dir/index", s"$dir/repo", "snap-1")
    }

    // restore to a NEW location and over the ORIGINAL — identical results
    IndexSnapshot.restore(spark, s"$dir/repo", "snap-1", s"$dir/restored")
    assert(new Searcher(spark, s"$dir/restored").search("merge index", 10).toSeq == before)
    Json.deleteRecursively(s"$dir/index")
    IndexSnapshot.restore(spark, s"$dir/repo", "snap-1", s"$dir/index")
    assert(new Searcher(spark, s"$dir/index").search("merge index", 10).toSeq == before)
  }

  test("segmented snapshot; corrupt restore refuses and leaves live index intact") {
    val dir = Files.createTempDirectory("graft-snap-seg").toString
    val seg = new SegmentedIndex(spark, s"$dir/seg", cfg, maxSegments = 4)
    seg.ingest(CorpusGen.generate(spark, 80, seed = 41, partitions = 2).toDF())
    seg.ingest(CorpusGen.generate(spark, 50, seed = 43, partitions = 2).toDF())
    val before = new MultiSearcher(spark, s"$dir/seg").search("merge index", 10).toSeq

    val info = IndexSnapshot.snapshot(s"$dir/seg", s"$dir/repo", "seg-snap")
    assert(info.segmented && info.numDocs == 130)
    IndexSnapshot.restore(spark, s"$dir/repo", "seg-snap", s"$dir/seg2")
    assert(new MultiSearcher(spark, s"$dir/seg2").search("merge index", 10).toSeq == before)

    // corrupt one docs parquet inside the repository → restore must refuse
    // (lineage recomputed from restored bytes) and must NOT touch the live
    // target already sitting at the destination
    val repoData = Paths.get(s"$dir/repo/seg-snap/data")
    val victim = Files.walk(repoData).filter(p =>
      p.toString.contains("/docs/") && p.toString.endsWith(".parquet")).findFirst().get()
    Files.write(victim, Array.fill[Byte](64)(0))
    val e = intercept[Exception] {
      IndexSnapshot.restore(spark, s"$dir/repo", "seg-snap", s"$dir/seg2")
    }
    assert(new MultiSearcher(spark, s"$dir/seg2").search("merge index", 10).toSeq == before,
      s"live index must survive a failed restore (error was: ${e.getMessage})")
    assert(!Files.exists(Paths.get(s"$dir/seg2.restore-staging")),
      "failed restore must not leave an orphaned staging tree")
  }

  test("metadata-mismatch restore refuses AND removes its staging tree") {
    val dir = Files.createTempDirectory("graft-snap-meta").toString
    val corpus = CorpusGen.generate(spark, 60, seed = 47, partitions = 2).toDF()
    new IndexBuilder(spark, cfg).build(corpus, s"$dir/index", resume = false)
    IndexSnapshot.snapshot(s"$dir/index", s"$dir/repo", "m-snap")
    // tamper the SNAPSHOT MANIFEST's configHash: identity(staging) then
    // disagrees with the manifest — the metadata `require` path, which used
    // to leave '<target>.restore-staging' behind
    val manifest = Paths.get(s"$dir/repo/m-snap/snapshot.json")
    val doctored = new String(Files.readAllBytes(manifest), "UTF-8")
      .replaceFirst("\"configHash\"\\s*:\\s*\"[^\"]*\"", "\"configHash\":\"deadbeef\"")
    Files.write(manifest, doctored.getBytes("UTF-8"))
    intercept[Exception] {
      IndexSnapshot.restore(spark, s"$dir/repo", "m-snap", s"$dir/restored")
    }
    assert(!Files.exists(Paths.get(s"$dir/restored")), "no partial restore may publish")
    assert(!Files.exists(Paths.get(s"$dir/restored.restore-staging")),
      "metadata-mismatch restore must remove its staging tree")
  }
}
