package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.corpus.CorpusGen
import graft.index.{FieldConfig, IndexBuilder, IndexConfig, IndexMerger, SegmentedIndex}
import graft.search.{Ann, MultiSearcher, Searcher}

/** ES 8 `knn` over stored dense_vector columns: exact cosine top-k with
  * pre-filter semantics, and the IVF-quantized pruning path (cells trained
  * at build, `_ivf_*` stored column, probed-cell isin pushdown) — single,
  * merged and segmented. */
class KnnSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val cfg = IndexConfig(
    buildPartitions = 4, docsPerShard = 64L, blockSize = 16, buildBuckets = 2,
    fields = FieldConfig(keyword = Seq("lang", "repo"), denseVector = Seq("emb")),
    ivfCells = 4)

  // deterministic clustered vectors: a scaled one-hot on the lang index
  // plus small hash noise — nprobe=1 should recover a lang's cluster
  private val embUdf = udf((lang: String, path: String) => {
    val li = CorpusGen.Langs.indexOf(lang) % 4
    Array.tabulate(8) { i =>
      val noise = (((path.hashCode * (i + 31)) & 0xffff) / 65536.0f - 0.5f) * 0.2f
      (if (i == li) 10.0f else 0.0f) + noise
    }
  })

  private def corpus(n: Int, seed: Long): DataFrame =
    CorpusGen.generate(spark, n, seed = seed, partitions = 4).toDF()
      .withColumn("emb", embUdf(col("lang"), col("path")))

  private def exactExpected(c: DataFrame, q: Array[Float], k: Int,
      langFilter: Option[String] = None): Seq[((String, String, String), Double)] = {
    val rows = c.select("repo", "path", "commit", "lang", "emb")
      .as[(String, String, String, String, Array[Float])].collect()
    rows.toSeq
      .filter(r => langFilter.forall(_ == r._4))
      .map(r => ((r._1, r._2, r._3), Ann.cosine(r._5, q)))
      .sortBy { case (id, cos) => (-cos, id) }
      .take(k)
  }

  private def qvec(li: Int): Array[Float] =
    Array.tabulate(8)(i => if (i == li) 1.0f else 0.0f)

  test("exact knn == brute force; pre-filter restricts candidates not k") {
    val c = corpus(150, 61)
    val dir = Files.createTempDirectory("graft-knn").toString
    new IndexBuilder(spark, cfg).build(c, s"$dir/index", resume = false)
    val se = new Searcher(spark, s"$dir/index")
    val docs = spark.read.parquet(s"$dir/index/docs")
      .select("docId", "repo", "path", "commit").as[(Long, String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val q = qvec(1)

    val got = se.knn("emb", q, 12).map(h => (docs(h.docId), h.score)).toSeq
    assert(got == exactExpected(c, q, 12))

    // ES pre-filter: the k nearest AMONG matching docs
    val gotF = se.knn("emb", q, 12, filter = "lang:scala")
      .map(h => (docs(h.docId), h.score)).toSeq
    assert(gotF == exactExpected(c, q, 12, langFilter = Some("scala")))
    assert(gotF.size == 12, "pre-filter must not underfill k")
  }

  test("IVF: probing all cells is exact; nprobe=1 recovers the cluster") {
    val c = corpus(150, 67)
    val dir = Files.createTempDirectory("graft-knn-ivf").toString
    new IndexBuilder(spark, cfg).build(c, s"$dir/index", resume = false)
    val se = new Searcher(spark, s"$dir/index")
    // stored cell column + centroid relation exist
    assert(spark.read.parquet(s"$dir/index/docs").columns.contains("_ivf_emb"))
    assert(spark.read.parquet(s"$dir/index/ivf_emb").count() == 4)

    val q = qvec(2)
    val exact = se.knn("emb", q, 10).toSeq
    assert(se.knn("emb", q, 10, nprobe = 4).toSeq == exact,
      "probing every cell must equal the exact path")
    // one probed cell: every hit's score is its true cosine, and the
    // clustered geometry makes recall high
    val pruned = se.knn("emb", q, 10, nprobe = 1).toSeq
    val exactScores = exact.map(h => h.docId -> h.score).toMap
    val allScores = se.knn("emb", q, 200).map(h => h.docId -> h.score).toMap
    pruned.foreach(h => assert(h.score == allScores(h.docId),
      "pruned hits must carry exact cosines"))
    val recall = pruned.count(h => exactScores.contains(h.docId)).toDouble /
      math.max(1, exact.size)
    assert(recall >= 0.5, s"nprobe=1 recall too low on clustered data: $recall")
  }

  test("merge retrains the quantizer; all-cell probe stays exact") {
    val cA = corpus(90, 71)
    val cB = corpus(70, 73)
    val dir = Files.createTempDirectory("graft-knn-merge").toString
    new IndexBuilder(spark, cfg).build(cA, s"$dir/a", resume = false)
    new IndexBuilder(spark, cfg).build(cB, s"$dir/b", resume = false)
    IndexMerger.merge(spark, s"$dir/a", s"$dir/b", s"$dir/merged", cfg)
    val se = new Searcher(spark, s"$dir/merged")
    assert(spark.read.parquet(s"$dir/merged/ivf_emb").count() == 4)
    val q = qvec(0)
    val union = cB.unionByName(
      cA.join(cB.select("repo", "path", "commit"), Seq("repo", "path", "commit"), "left_anti"))
    val docs = spark.read.parquet(s"$dir/merged/docs")
      .select("docId", "repo", "path", "commit").as[(Long, String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val got = se.knn("emb", q, 10, nprobe = 4).map(h => (docs(h.docId), h.score)).toSeq
    assert(got == exactExpected(union, q, 10))
  }

  test("hybrid RRF fuses the two branch rankings by rank; segmented == single") {
    val c = corpus(120, 101)
    val dir = Files.createTempDirectory("graft-hybrid").toString
    new IndexBuilder(spark, cfg).build(c, s"$dir/single", resume = false)
    val seg = new SegmentedIndex(spark, s"$dir/seg", cfg, maxSegments = 4)
    seg.ingest(c.filter(xxhash64(col("repo"), col("path")) % 2 === 0))
    seg.ingest(c.filter(xxhash64(col("repo"), col("path")) % 2 =!= 0))
    val se = new Searcher(spark, s"$dir/single")
    val docs = spark.read.parquet(s"$dir/single/docs")
      .select("docId", "repo", "path", "commit").as[(Long, String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val q = qvec(1)

    // fusion arithmetic vs an independent driver-side recomputation
    val got = se.hybridRrf("merge index", "emb", q, 10, windowSize = 30).toSeq
    val tr = se.search("merge index", 30).map(_.docId).zipWithIndex.toMap
    val vr = se.knn("emb", q, 30).map(_.docId).zipWithIndex.toMap
    val want = (tr.keySet ++ vr.keySet).toSeq
      .map { id =>
        val s = tr.get(id).map(r => 1.0 / (60 + r + 1)).getOrElse(0.0) +
          vr.get(id).map(r => 1.0 / (60 + r + 1)).getOrElse(0.0)
        graft.search.ScoredDoc(id, s)
      }
      .sortBy(sd => (-sd.score, sd.docId)).take(10)
    assert(got == want)
    assert(got.nonEmpty)

    // segmented fusion is identity-keyed and matches the single index
    val ms = new MultiSearcher(spark, s"$dir/seg")
    val gotSeg = ms.hybridRrf("merge index", "emb", q, 10, windowSize = 30)
      .map(h => (h.repo, h.path, h.commit, h.score)).toSeq
    val wantSeg = got.map(sd => { val (r, p, cm) = docs(sd.docId); (r, p, cm, sd.score) })
    assert(gotSeg == wantSeg)
  }

  test("hybrid RRF pre-filter is FILTER CONTEXT: score-neutral on the text branch") {
    val c = corpus(120, 103)
    val dir = Files.createTempDirectory("graft-hybrid-f").toString
    new IndexBuilder(spark, cfg).build(c, s"$dir/single", resume = false)
    val se = new Searcher(spark, s"$dir/single")
    val docs = spark.read.parquet(s"$dir/single/docs")
      .select("docId", "repo", "path", "commit").as[(Long, String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val q = qvec(2)
    // the filter carries a BARE TERM ('merge') — under filter-context
    // semantics it restricts candidates but must NOT become a scored clause
    val filter = "lang:scala merge"
    // accept set computed independently: lang=scala AND contains token merge
    // (content is not a stored docs column — resolve docIds via identity)
    val identToId: Map[(String, String, String), Long] =
      docs.map { case (id, ident) => ident -> id }
    val accept: Set[Long] = c.select("repo", "path", "commit", "lang", "content")
      .as[(String, String, String, String, String)].collect()
      .filter { case (_, _, _, lang, content) =>
        lang == "scala" && graft.analysis.Analyzer.tokenize(content).contains("merge") }
      .map(t => identToId((t._1, t._2, t._3))).toSet
    assert(accept.nonEmpty, "degenerate: filter matches nothing")
    // expected text branch: the UNFILTERED full ranking (scores untouched by
    // the filter) restricted to the accept set — exact because k=500 covers
    // every match in this 120-doc corpus
    val textExpected = se.search("merge index", 500)
      .filter(sd => accept.contains(sd.docId)).take(30)
    val knnRank = se.knn("emb", q, 30, filter)
    val fused = new scala.collection.mutable.HashMap[Long, Double]()
    textExpected.zipWithIndex.foreach { case (sd, r) =>
      fused(sd.docId) = fused.getOrElse(sd.docId, 0.0) + 1.0 / (60 + r + 1) }
    knnRank.zipWithIndex.foreach { case (sd, r) =>
      fused(sd.docId) = fused.getOrElse(sd.docId, 0.0) + 1.0 / (60 + r + 1) }
    val want = fused.toSeq.map { case (id, s) => graft.search.ScoredDoc(id, s) }
      .sortBy(sd => (-sd.score, sd.docId)).take(10)
    val got = se.hybridRrf("merge index", "emb", q, 10, windowSize = 30, filter = filter).toSeq
    assert(got == want)
    got.foreach(sd => assert(accept.contains(sd.docId), "filter must gate both branches"))

    // segmented == single under the same filtered fusion
    val seg = new SegmentedIndex(spark, s"$dir/seg", cfg, maxSegments = 4)
    seg.ingest(c.filter(xxhash64(col("repo"), col("path")) % 2 === 0))
    seg.ingest(c.filter(xxhash64(col("repo"), col("path")) % 2 =!= 0))
    val ms = new MultiSearcher(spark, s"$dir/seg")
    val gotSeg = ms.hybridRrf("merge index", "emb", q, 10, windowSize = 30, filter = filter)
      .map(h => (h.repo, h.path, h.commit, h.score)).toSeq
    val wantSeg = got.map(sd => { val (r, p, cm) = docs(sd.docId); (r, p, cm, sd.score) })
    assert(gotSeg == wantSeg)
  }

  test("HNSW: exact cosines, high-ef agreement with exact knn, filter, merge, segmented") {
    val cfgH = cfg.copy(hnswM = 8, hnswEfConstruction = 60)
    val c = corpus(150, 113)
    val dir = Files.createTempDirectory("graft-hnsw").toString
    new IndexBuilder(spark, cfgH).build(c, s"$dir/single", resume = false)
    assert(spark.read.parquet(s"$dir/single/hnsw_emb").count() > 0)
    val se = new Searcher(spark, s"$dir/single")
    val q = qvec(1)
    // ef ≥ corpus size: the beam reaches everything reachable — on this
    // tiny graph that is the whole shard, so results equal exact knn
    val exact = se.knn("emb", q, 10).toSeq
    assert(se.knnHnsw("emb", q, 10, ef = 200).toSeq == exact)
    // pruned hits always carry their EXACT cosine
    val allScores = se.knn("emb", q, 200).map(h => h.docId -> h.score).toMap
    se.knnHnsw("emb", q, 10, ef = 20).foreach(h => assert(h.score == allScores(h.docId)))
    // pre-filter gates candidates
    val exactF = se.knn("emb", q, 10, filter = "lang:scala").toSeq
    assert(se.knnHnsw("emb", q, 10, ef = 200, filter = "lang:scala").toSeq == exactF)

    // merge rebuilds the graphs over the merged docIds
    val c2 = corpus(60, 127)
    new IndexBuilder(spark, cfgH).build(c2, s"$dir/b", resume = false)
    IndexMerger.merge(spark, s"$dir/single", s"$dir/b", s"$dir/merged", cfgH)
    val sem = new Searcher(spark, s"$dir/merged")
    assert(spark.read.parquet(s"$dir/merged/hnsw_emb").count() > 0)
    assert(sem.knnHnsw("emb", q, 10, ef = 300).toSeq == sem.knn("emb", q, 10).toSeq)

    // segmented: per-segment graphs, identity-keyed global merge
    val seg = new SegmentedIndex(spark, s"$dir/seg", cfgH, maxSegments = 4)
    seg.ingest(c.filter(xxhash64(col("repo"), col("path")) % 2 === 0))
    seg.ingest(c.filter(xxhash64(col("repo"), col("path")) % 2 =!= 0))
    val ms = new MultiSearcher(spark, s"$dir/seg")
    val docs = spark.read.parquet(s"$dir/single/docs")
      .select("docId", "repo", "path", "commit").as[(Long, String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val want = se.knnHnsw("emb", q, 10, ef = 200)
      .map(h => { val (r, p, cm) = docs(h.docId); (r, p, cm, h.score) }).toSeq
    val got = ms.knnHnsw("emb", q, 10, ef = 200)
      .map(h => (h.repo, h.path, h.commit, h.score)).toSeq
    assert(got == want)

    // hybrid RRF with the vector branch on the HNSW path (the real ES 8
    // rrf retriever shape): exhaustive ef equals the exact-branch fusion
    assert(
      se.hybridRrf("merge index", "emb", q, 10, windowSize = 30, hnswEf = 400).toSeq ==
        se.hybridRrf("merge index", "emb", q, 10, windowSize = 30).toSeq)
    assert(
      ms.hybridRrf("merge index", "emb", q, 10, windowSize = 30, hnswEf = 400)
        .map(h => (h.repo, h.path, h.commit, h.score)).toSeq ==
        ms.hybridRrf("merge index", "emb", q, 10, windowSize = 30)
          .map(h => (h.repo, h.path, h.commit, h.score)).toSeq)
  }

  test("HNSW filtered traversal + warm driver tier: filtered == exact-among-accepted, warm == cold") {
    val cfgH = cfg.copy(hnswM = 8, hnswEfConstruction = 60)
    val c = corpus(200, 131)
    val dir = Files.createTempDirectory("graft-hnsw-warm").toString
    new IndexBuilder(spark, cfgH).build(c, s"$dir/index", resume = false)
    val cold = new Searcher(spark, s"$dir/index")
    val q = qvec(2)

    // a selective pre-filter (|accepted| ≤ 2·ef) must return exactly
    // min(k, |accepted|) hits equal to exact knn among the accepted docs
    // (the auto-fallback — the round-4 post-beam filter could underfill)
    val matched = cold.knn("emb", q, 1000, filter = "lang:go").length
    assert(matched > 0 && matched <= 2 * 100,
      s"want a filter selective under the ef=100 fallback threshold (matched $matched)")
    val exactF = cold.knn("emb", q, 10, filter = "lang:go").toSeq
    val got = cold.knnHnsw("emb", q, 10, ef = 100, filter = "lang:go").toSeq
    assert(got == exactF)
    assert(got.length == math.min(10, matched))

    // a BROADER accept set than 2·ef engages the filter-aware traversal:
    // exactly k hits, every hit accepted, every score the exact cosine
    val allMatched = cold.knn("emb", q, 1000).map(h => h.docId -> h.score).toMap
    val broad = cold.knn("emb", q, 1000, filter = "lang:scala")
    assert(broad.length > 2 * 3,
      s"broad filter must exceed the 2·ef=6 fallback threshold (matched ${broad.length})")
    val acceptIds = broad.map(_.docId).toSet
    val trav = cold.knnHnsw("emb", q, 3, ef = 3, filter = "lang:scala")
    assert(trav.length == 3)
    trav.foreach { h =>
      assert(acceptIds.contains(h.docId), "hit outside the accept set")
      assert(h.score == allMatched(h.docId), "score must be the exact cosine")
    }

    // warm driver tier: identical results to the cold cogroup path on the
    // same queries (same graphs, same searchFiltered policy, same merge) —
    // and the graphs are cached (second warm call is a no-op returning true)
    val coldNoF = cold.knnHnsw("emb", q, 10, ef = 50).toSeq
    val coldSel = cold.knnHnsw("emb", q, 10, ef = 100, filter = "lang:go").toSeq
    val coldBroad = cold.knnHnsw("emb", q, 3, ef = 3, filter = "lang:scala").toSeq
    val warm = new Searcher(spark, s"$dir/index")
    assert(warm.warmKnn("emb"))
    assert(warm.warmKnn("emb"), "idempotent re-warm")
    assert(warm.knnHnsw("emb", q, 10, ef = 50).toSeq == coldNoF)
    assert(warm.knnHnsw("emb", q, 10, ef = 100, filter = "lang:go").toSeq == coldSel)
    assert(warm.knnHnsw("emb", q, 3, ef = 3, filter = "lang:scala").toSeq == coldBroad)
    // over the bound → tier declines, cold path still serves
    val tiny = new Searcher(spark, s"$dir/index")
    assert(!tiny.warmKnn("emb", maxDriverVectors = 10))
    assert(tiny.knnHnsw("emb", q, 10, ef = 50).toSeq == coldNoF)

    // segmented warm tier: identical to the segmented cold path on the
    // same queries (and over-bound decline)
    val seg = new SegmentedIndex(spark, s"$dir/seg", cfgH, maxSegments = 4)
    seg.ingest(c.filter(xxhash64(col("repo"), col("path")) % 2 === 0))
    seg.ingest(c.filter(xxhash64(col("repo"), col("path")) % 2 =!= 0))
    val msCold = new MultiSearcher(spark, s"$dir/seg")
    val segNoF = msCold.knnHnsw("emb", q, 10, ef = 50)
      .map(h => (h.repo, h.path, h.commit, h.score)).toSeq
    val segSel = msCold.knnHnsw("emb", q, 10, ef = 100, filter = "lang:go")
      .map(h => (h.repo, h.path, h.commit, h.score)).toSeq
    val msWarm = new MultiSearcher(spark, s"$dir/seg")
    assert(msWarm.warmKnn("emb"))
    assert(msWarm.knnHnsw("emb", q, 10, ef = 50)
      .map(h => (h.repo, h.path, h.commit, h.score)).toSeq == segNoF)
    assert(msWarm.knnHnsw("emb", q, 10, ef = 100, filter = "lang:go")
      .map(h => (h.repo, h.path, h.commit, h.score)).toSeq == segSel)
    assert(!new MultiSearcher(spark, s"$dir/seg").warmKnn("emb", maxDriverVectors = 10))
  }

  test("HNSW recall@10 >= 0.95 vs exact on a 100k-vector corpus (per-shard graphs)") {
    // clustered embedding geometry (200 centers + noise), 2 shards of 50k —
    // the engine's shape: one graph per shard, candidates unioned, exact
    // re-rank. Module-level so the assertion isolates graph quality.
    val n = 100000
    val dim = 16
    val nShards = 2
    val rnd = new java.util.Random(4242L)
    val centers = Array.fill(200)(Array.fill(dim)(rnd.nextFloat() * 2f - 1f))
    val vecs: Array[(Long, Array[Float])] = Array.tabulate(n) { i =>
      val ctr = centers(i % 200)
      (i.toLong, Array.tabulate(dim)(d => ctr(d) + (rnd.nextFloat() - 0.5f) * 0.2f))
    }
    val perShard = n / nShards
    val graphs = (0 until nShards).map { s =>
      graft.search.Hnsw.build(
        vecs.slice(s * perShard, (s + 1) * perShard), m = 16, efConstruction = 100,
        seed = 0x9E3779B9L ^ s)
    }
    val qrnd = new java.util.Random(7L)
    val recalls = (1 to 20).map { _ =>
      val ctr = centers(qrnd.nextInt(200))
      val q = Array.tabulate(dim)(d => ctr(d) + (qrnd.nextFloat() - 0.5f) * 0.2f)
      val exact = vecs.map { case (id, v) => (id, graft.search.Ann.cosine(v, q)) }
        .sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
      val got = graphs.flatMap(g => graft.search.Hnsw.search(g, q, 10, ef = 100))
        .sortBy(sd => (-sd.score, sd.docId)).take(10).map(_.docId).toSet
      (exact & got).size.toDouble / exact.size
    }
    val avg = recalls.sum / recalls.length
    assert(avg >= 0.95, s"HNSW recall@10 too low: $avg (per-query: $recalls)")
  }

  test("_field_caps exposes mapped types, hides internal columns") {
    val c = corpus(60, 97)
    val dir = Files.createTempDirectory("graft-caps").toString
    new IndexBuilder(spark, cfg).build(c, s"$dir/index", resume = false)
    val caps = new Searcher(spark, s"$dir/index").fieldCaps()
      .as[(String, String, Boolean, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(caps("content") == (("text", true, false)))
    assert(caps("lang") == (("keyword", true, true)))
    assert(caps("emb") == (("dense_vector", true, false)))
    assert(!caps.contains("_ivf_emb") && !caps.contains("sha256") && !caps.contains("docId"))
  }

  test("segmented knn == single-index knn (exact and all-cell probe)") {
    val c = corpus(120, 79)
    val dir = Files.createTempDirectory("graft-knn-seg").toString
    val seg = new SegmentedIndex(spark, s"$dir/seg", cfg, maxSegments = 4)
    seg.ingest(c.filter(xxhash64(col("repo"), col("path")) % 2 === 0))
    seg.ingest(c.filter(xxhash64(col("repo"), col("path")) % 2 =!= 0))
    assert(seg.manifest.get.segments.length == 2)
    new IndexBuilder(spark, cfg).build(c, s"$dir/single", resume = false)
    val se = new Searcher(spark, s"$dir/single")
    val docs = spark.read.parquet(s"$dir/single/docs")
      .select("docId", "repo", "path", "commit").as[(Long, String, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val ms = new MultiSearcher(spark, s"$dir/seg")
    val q = qvec(3)
    for ((filter, nprobe) <- Seq(("", 0), ("lang:scala", 0), ("", 4))) {
      val got = ms.knn("emb", q, 10, filter, nprobe)
        .map(h => (h.repo, h.path, h.commit, h.score)).toSeq
      val want = se.knn("emb", q, 10, filter, nprobe)
        .map(h => { val (r, p, cm) = docs(h.docId); (r, p, cm, h.score) }).toSeq
      assert(got == want, s"segmented/single knn mismatch (filter='$filter', nprobe=$nprobe)")
      assert(got.nonEmpty)
    }
  }
}
