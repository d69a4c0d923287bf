package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Segment merge: combine two published indexes into one WITHOUT touching
  * `content` — no re-tokenization, the expensive pass at 100 TB.
  *
  * This is the engine analogue of the reference's incremental reference-data
  * update (drop one dataset's struct, outer-join its fresh version —
  * `hail_scripts/reference_data/combine.py:141-154`) combined with its
  * post-load `forcemerge` compaction
  * (`hail_elasticsearch_client.py:213`): the intended workflow for a corpus
  * delta is "build a small index over the changed/new files, then merge it
  * onto the big index".
  *
  * Semantics: document identity is `(repo, path, commit)`; where both
  * segments contain the same identity, the NEWER segment (`dirB`) wins — ES
  * upsert semantics (`es.write.operation=upsert`,
  * `hail_elasticsearch_client.py:98-116`). The merged index is logically
  * identical to a fresh build over the merged corpus (tested): same dense
  * docIds (global identity sort), same dictionary, same postings, and
  * bit-identical BM25 scores (N/avgdl/df are recomputed for the union).
  *
  * Plan shape (all narrow or minimally-projected wide ops):
  *  1. docs_B ∪ (docs_A anti docs_B) → dense re-id by identity sort;
  *  2. each side's blocks → decode → (term via that side's dictionary,
  *     newDocId via the id mapping) — flat postings, no content;
  *  3. the existing builder's dictionary/pack stages run unchanged on the
  *     synthesized checkpoint layout (stages 0-2 are marked complete).
  */
object IndexMerger {

  private val KeyCols = Seq("repo", "path", "commit")

  def merge(
      spark: SparkSession,
      dirA: String,
      dirB: String,
      outDir: String,
      cfg: IndexConfig = IndexConfig()): IndexMeta = {
    import spark.implicits._

    // refuse to mix incompatible segments: different analyzer versions,
    // BM25 constants, block sizes or shard widths would silently corrupt
    // the merged postings (ADVICE: fail fast on configHash mismatch)
    val sideMetas = Seq(dirA, dirB).map { d =>
      val m = Json.read(s"$d/meta.json", classOf[IndexMeta])
      require(m.configHash == cfg.configHash,
        s"segment $d was built with configHash ${m.configHash}, merge cfg is ${cfg.configHash}")
      require(m.analyzer == graft.analysis.Analyzer.Version,
        s"segment $d was built with analyzer ${m.analyzer}, current is ${graft.analysis.Analyzer.Version}")
      m
    }
    // user metadata (the reference's `_meta` export): caller's wins, else
    // the newer segment's (create_or_update_mapping semantics), else A's
    val mergedUserMeta =
      if (cfg.userMeta.nonEmpty) cfg.userMeta
      else if (sideMetas(1).meta.nonEmpty) sideMetas(1).meta
      else sideMetas(0).meta

    val staging = outDir + ".staging"
    cfg.io.dropTree(spark, staging)

    val docsA = cfg.io.read(spark, s"$dirA/docs")
    val docsB = cfg.io.read(spark, s"$dirB/docs")

    // ---- merged docs with fresh dense ids (identity-sorted, B wins).
    // Stored columns are carried generically (schema-derived extras /
    // updateDocFields patches); a column present on one side only is null
    // on the other.
    val docCols: Seq[String] =
      (docsA.columns ++ docsB.columns.filterNot(docsA.columns.contains)).toSeq
    val keep = docsB.withColumn("src", lit("B"))
      .unionByName(
        docsA.join(docsB.select(KeyCols.map(col): _*), KeyCols, "left_anti")
          .withColumn("src", lit("A")),
        allowMissingColumns = true)
      .withColumnRenamed("docId", "oldDocId")
    val ided = DenseIds.assign(keep, KeyCols, "docId", cfg.buildPartitions)
    val docsDir = s"$staging/docs"
    // IVF quantizer: retrained on the MERGED vector set and every doc's
    // cell reassigned (Lucene rebuilds its per-segment vector structures on
    // merge the same way) — the sides' stale `_ivf_*` columns and centroid
    // relations are replaced wholesale. All exact query surfaces stay
    // bit-identical to a fresh build; the approximate IVF pruning is
    // defined by THIS index's own centroids, as on any segment.
    val docsReady =
      if (cfg.ivfCells <= 0 || cfg.fields.denseVector.isEmpty) ided.df
      else cfg.fields.denseVector.foldLeft(ided.df) { (df, f) =>
        val vecs = df
          .select(xxhash64(col("repo"), col("path"), col("commit")).as("id"),
            col(f).cast("array<float>").as("v"))
          .filter(col("v").isNotNull)
          .as[(Long, Array[Float])]
          .map { case (id, v) => graft.search.Ann.Vec(id, v) }
        val cents = graft.search.Ann.kmeans(vecs, cfg.ivfCells, iters = 3, seed = 42L)
        cfg.io.write(
          cents.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }.toDF("cell", "centroid"),
          s"$staging/ivf_$f")
        val assign = udf((v: Seq[Float]) =>
          if (v == null) null
          else {
            var best = 0; var bestCos = Double.NegativeInfinity
            var c = 0
            while (c < cents.length) {
              val s = graft.search.Ann.cosine(v.toArray, cents(c))
              if (s > bestCos) { bestCos = s; best = c }
              c += 1
            }
            Int.box(best)
          }: Integer)
        df.withColumn(s"_ivf_$f", assign(col(f).cast("array<float>")))
      }
    // manifest stats ride the write as observed metrics — no read-back job
    val docsObs = org.apache.spark.sql.Observation()
    cfg.io.write(
      docsReady
        .select(docCols.map(col): _*)
        .observe(docsObs, count(lit(1)).as("n"), sum("dl").as("sumDl"),
          expr("bit_xor(xxhash64(sha256))").as("lineage")),
      docsDir)
    val mapping = ided.df.select("src", "oldDocId", "docId")
    cfg.io.write(mapping, s"$staging/_idmap")
    ided.release()
    val row = docsObs.get
    val lineage = row("lineage").asInstanceOf[Long]
    Json.write(s"$docsDir/_manifest.json",
      StageManifest("docs", row("n").asInstanceOf[Long], 0L,
        row("sumDl").asInstanceOf[Long], lineage, cfg.configHash))

    // ---- flat postings from both segments, re-keyed to the new docIds
    val idmap = cfg.io.read(spark, s"$staging/_idmap")
    def sidePostings(dir: String, src: String): DataFrame = {
      val withPos = cfg.storePositions
      val blocks = cfg.io.read(spark, s"$dir/blocks")
        .select(PostingBlock.columns.map(col): _*)
        .as[PostingBlock]
      // dl is the PER-POSTING value stored in the block (the owning
      // FIELD's length for tagged `field:token` terms, 1 for keyword
      // terms, the doc dl for content terms) — never the doc-level dl
      // from the idmap, which would silently break per-field BM25
      val flat = blocks.flatMap { b =>
        val ids = b.docIds; val tfs = b.tfValues; val dls = b.dlValues
        val poss = if (withPos) b.positions else null
        (0 until b.n).iterator.map(i =>
          (b.termId, ids(i), tfs(i), dls(i), if (withPos) poss(i) else Array.emptyLongArray))
      }.toDF("termId", "oldDocId", "tf", "dl", "pos")
      val dict = cfg.io.read(spark, s"$dir/terms").select("termId", "term")
      flat
        .join(dict, Seq("termId"))
        .join(idmap.filter(col("src") === src), Seq("oldDocId"))
        .select("term", "docId", "tf", "dl", "pos")
    }
    val tfDir = s"$staging/_tf"
    val tfObs = org.apache.spark.sql.Observation()
    cfg.io.write(
      sidePostings(dirA, "A").unionByName(sidePostings(dirB, "B"))
        .observe(tfObs, count(lit(1)).as("n")),
      tfDir)
    val tfN = tfObs.get("n").asInstanceOf[Long]
    Json.write(s"$tfDir/_manifest.json",
      StageManifest("tf", tfN, 0L, tfN, lineage, cfg.configHash))

    // mark stage 0 complete (there is no doctf — stages 1-2 are prebuilt)
    Json.write(s"$staging/_doctf/_manifest.json",
      StageManifest("doctf", 0L, 0L, 0L, 0L, cfg.configHash))
    cfg.io.dropTree(spark, s"$staging/_idmap")

    // ---- dictionary + pack + publish via the normal builder (resume path)
    val emptyCorpus = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.sources.CorpusIO.CorpusSchema)
    new IndexBuilder(spark, cfg.copy(userMeta = mergedUserMeta))
      .build(emptyCorpus, outDir, resume = true)
  }

  /** Delete-by-identity via PHYSICAL purge: rebuild the index from its own
    * postings WITHOUT the deleted documents and WITHOUT touching `content`
    * (no re-tokenization — the same no-content contract as [[merge]]).
    *
    * This is the engine analogue of ES `delete_by_query`/`delete`
    * (`hail_elasticsearch_client.py` routes deletes through index replace;
    * Lucene masks deleted docs with tombstones and defers the physical drop
    * to segment merge, accepting df/avgdl drift until then). The correctness
    * gate here is bit-identity, so a delete pays the segment rewrite up
    * front and the result is logically identical to a fresh build over the
    * surviving corpus: fresh dense docIds (identity sort), recomputed
    * dictionary/df/N/avgdl, tight block-max bounds — no stat drift, ever.
    *
    * Returns None when no document survives (the caller drops the segment);
    * staging is cleaned up in that case. */
  def purge(
      spark: SparkSession,
      dir: String,
      deleteKeys: DataFrame,
      outDir: String,
      cfg: IndexConfig = IndexConfig()): Option[IndexMeta] = {
    import spark.implicits._

    val m = Json.read(s"$dir/meta.json", classOf[IndexMeta])
    require(m.configHash == cfg.configHash,
      s"index $dir was built with configHash ${m.configHash}, purge cfg is ${cfg.configHash}")
    require(m.analyzer == graft.analysis.Analyzer.Version,
      s"index $dir was built with analyzer ${m.analyzer}, current is ${graft.analysis.Analyzer.Version}")

    val staging = outDir + ".staging"
    cfg.io.dropTree(spark, staging)

    val docs = cfg.io.read(spark, s"$dir/docs")
    val keys = deleteKeys.select(KeyCols.map(col): _*).distinct()
    val keep = docs
      .join(broadcast(keys), KeyCols, "left_anti")
      .withColumnRenamed("docId", "oldDocId")
    val ided = DenseIds.assign(keep, KeyCols, "docId", cfg.buildPartitions)
    if (ided.total == 0L) { // every document deleted — nothing to rebuild
      ided.release()
      cfg.io.dropTree(spark, staging)
      return None
    }
    val docCols = docs.columns.toSeq
    val docsDir = s"$staging/docs"
    val docsObs = org.apache.spark.sql.Observation()
    cfg.io.write(
      ided.df
        .select(docCols.map(col): _*)
        .observe(docsObs, count(lit(1)).as("n"), sum("dl").as("sumDl"),
          expr("bit_xor(xxhash64(sha256))").as("lineage")),
      docsDir)
    cfg.io.write(ided.df.select("oldDocId", "docId"), s"$staging/_idmap")
    ided.release()
    // carry the IVF centroid relations through: a delete moves no centroid,
    // so surviving docs' stored cells stay valid (Lucene likewise keeps its
    // vector structures through deletes and rebuilds only on merge)
    if (cfg.ivfCells > 0) cfg.fields.denseVector.foreach { f =>
      cfg.io.write(cfg.io.read(spark, s"$dir/ivf_$f"), s"$staging/ivf_$f")
    }
    val row = docsObs.get
    val lineage = row("lineage").asInstanceOf[Long]
    Json.write(s"$docsDir/_manifest.json",
      StageManifest("docs", row("n").asInstanceOf[Long], 0L,
        row("sumDl").asInstanceOf[Long], lineage, cfg.configHash))

    // ---- surviving flat postings: decode blocks → drop deleted docIds via
    // the idmap inner join → re-key to the fresh dense ids
    val idmap = cfg.io.read(spark, s"$staging/_idmap")
    val withPos = cfg.storePositions
    val blocks = cfg.io.read(spark, s"$dir/blocks")
      .select(PostingBlock.columns.map(col): _*)
      .as[PostingBlock]
    // per-posting dl from the block, as in merge — see the note there
    val flat = blocks.flatMap { b =>
      val ids = b.docIds; val tfs = b.tfValues; val dls = b.dlValues
      val poss = if (withPos) b.positions else null
      (0 until b.n).iterator.map(i =>
        (b.termId, ids(i), tfs(i), dls(i), if (withPos) poss(i) else Array.emptyLongArray))
    }.toDF("termId", "oldDocId", "tf", "dl", "pos")
    val dict = cfg.io.read(spark, s"$dir/terms").select("termId", "term")
    val tfDir = s"$staging/_tf"
    val tfObs = org.apache.spark.sql.Observation()
    cfg.io.write(
      flat
        .join(dict, Seq("termId"))
        .join(idmap, Seq("oldDocId"))
        .select("term", "docId", "tf", "dl", "pos")
        .observe(tfObs, count(lit(1)).as("n")),
      tfDir)
    val tfN = tfObs.get("n").asInstanceOf[Long]
    Json.write(s"$tfDir/_manifest.json",
      StageManifest("tf", tfN, 0L, tfN, lineage, cfg.configHash))

    Json.write(s"$staging/_doctf/_manifest.json",
      StageManifest("doctf", 0L, 0L, 0L, 0L, cfg.configHash))
    cfg.io.dropTree(spark, s"$staging/_idmap")

    val emptyCorpus = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      graft.sources.CorpusIO.CorpusSchema)
    // user metadata survives the purge (caller's wins when supplied)
    val keptUserMeta = if (cfg.userMeta.nonEmpty) cfg.userMeta else m.meta
    Some(new IndexBuilder(spark, cfg.copy(userMeta = keptUserMeta))
      .build(emptyCorpus, outDir, resume = true))
  }
}
