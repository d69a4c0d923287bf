package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index._
import graft.search.Searcher

/** The TableIO seam: the engine must produce identical indexes and query
  * results whether its relations are Parquet directories (sandbox default)
  * or catalog tables with a metadata-operation publish (the Iceberg-shaped
  * production path — no filesystem rename of data anywhere). */
class TableIOSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private val baseCfg = IndexConfig(
    buildPartitions = 4, docsPerShard = 64L, blockSize = 16, buildBuckets = 2)

  private val Queries = Seq("merge index", "def", "lang:scala query", "query score", "val")

  test("catalog-table build + search is identical to the parquet-dir build") {
    val work = Files.createTempDirectory("graft-tio").toString
    val corpus = CorpusGen.generate(spark, 150, seed = 21, partitions = 3).toDF()

    val pqCfg = baseCfg
    new IndexBuilder(spark, pqCfg).build(corpus, s"$work/pq", resume = false)
    val pqSearch = new Searcher(spark, s"$work/pq")

    val catIo = new CatalogTableIO("tiospec")
    val catCfg = baseCfg.copy(io = catIo)
    // same configHash: storage format must not affect index identity
    assert(catCfg.configHash == pqCfg.configHash)
    val meta = new IndexBuilder(spark, catCfg).build(corpus, s"$work/cat", resume = false)
    val catSearch = new Searcher(spark, s"$work/cat", catIo)

    assert(meta.numDocs == pqSearch.meta.numDocs)
    assert(meta.numPostings == pqSearch.meta.numPostings)
    assert(meta.lineage == pqSearch.meta.lineage)

    // the data relations are catalog tables, not parquet dirs: only JSON
    // sidecars may exist under the index root
    val dataDirs = java.nio.file.Paths.get(s"$work/cat")
    assert(Files.walk(dataDirs).filter(p => p.toString.endsWith(".parquet")).count() == 0,
      "catalog-mode index root must hold no data files")

    for (q <- Queries) {
      val a = pqSearch.search(q, 15).toSeq
      val b = catSearch.search(q, 15).toSeq
      assert(a == b, s"parquet/catalog result mismatch for '$q'")
    }
  }

  test("catalog-mode rebuild republishes via catalog swap; updateDocFields patches through the seam") {
    import spark.implicits._
    val work = Files.createTempDirectory("graft-tio2").toString
    val catIo = new CatalogTableIO("tiospec2")
    val catCfg = baseCfg.copy(io = catIo)
    val a = CorpusGen.generate(spark, 80, seed = 4, partitions = 2).toDF()
    val b = CorpusGen.generate(spark, 60, seed = 9, partitions = 2).toDF()

    val dir = s"$work/idx"
    new IndexBuilder(spark, catCfg).build(a, dir, resume = false)
    val n1 = new Searcher(spark, dir, catIo).meta.numDocs
    assert(n1 == 80)
    // rebuild over a different corpus: publish replaces the catalog tables
    new IndexBuilder(spark, catCfg).build(b, dir, resume = false)
    val s2 = new Searcher(spark, dir, catIo)
    assert(s2.meta.numDocs == 60)
    assert(s2.search("def", 5).nonEmpty)

    // stored-field patch through the seam (catalog replace, no dir rename)
    val docs = catIo.read(spark, s"$dir/docs")
    val someDoc = docs.select("repo", "path", "commit").head()
    val upd = Seq((someDoc.getString(0), someDoc.getString(1), someDoc.getString(2), "starred"))
      .toDF("repo", "path", "commit", "tag")
    IndexMaintenance.updateDocFields(spark, dir, upd, catIo)
    val tagged = catIo.read(spark, s"$dir/docs").filter(col("tag") === "starred").count()
    assert(tagged == 1L)
    // postings untouched: same hits as before the patch
    assert(new Searcher(spark, dir, catIo).search("def", 5).toSeq == s2.search("def", 5).toSeq)
  }
}
