package graft.index

import scala.util.chaining._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.analysis.Analyzer
import graft.search.{BM25, Bm25Params}

/** Flat posting row between tokenize and block packing. `pos` holds the
  * term's ascending token-stream positions (empty unless the config stores
  * positions). */
final case class Posting(termId: Long, docId: Long, tf: Long, dl: Long, pos: Array[Long])

/** Staged, resumable inverted-index build.
  *
  * This is the engine-side re-expression of the reference's whole load path
  * (`SeqrVCFToMTTask` → `SeqrMTToESTask`, `luigi_pipeline/seqr_loading.py:114-148,249-313`):
  * scan corpus → analyze → stats → dictionary-encode terms → shuffle once on
  * the minimal `(termId, docId, tf, dl)` projection → pack sorted
  * delta+varint blocks → publish atomically. Stage boundaries are
  * materialized with checkpoint manifests (the Luigi `_SUCCESS` /
  * `_EXPORTED_TO_ES` marker pattern, `luigi_pipeline/lib/hail_tasks.py:70-74`),
  * so a killed build resumes, skipping completed stages/buckets, and
  * produces a logically identical index (tested): same docs, dictionary,
  * postings, stats and bit-identical query results. Physical block cut
  * points may differ run-to-run (they follow read-split geometry), which is
  * invisible to queries — cursors order blocks by firstDoc.
  *
  * Scale design (100 TB / 10^12 files):
  *  - `content` is scanned and tokenized exactly ONCE (stage 0); everything
  *    after operates on the much smaller (identity, term, tf) projection.
  *    No shuffle ever moves `content`;
  *  - at most four wide operations touch the full posting volume, each
  *    ONCE: the stage-0 docId range-sort (tokenized rows — the one
  *    content-scale shuffle, traded for eliminating any identity join),
  *    the term groupBy, the tf↔dictionary termId-encode join, and the
  *    (termId, shard) pack shuffle. With a broadcastable dictionary (the
  *    normal case) the encode join is NARROW and fused into the per-bucket
  *    pack — three wide ops and no encoded-postings materialization; past
  *    `broadcastDictMaxTerms` it runs once as its own stage, written
  *    bucket-partitioned so the per-bucket pack reads only its own slice.
  *    docs and tf are pure column-pruned projections of stage 0;
  *  - stop-term skew cannot overload a task: the pack shuffle hashes on
  *    `(termId, shard)`, so a stop term present in EVERY document still
  *    contributes at most docsPerShard postings per task, spread over as
  *    many tasks as there are shards — the bound holds by construction,
  *    no sampling or salting heuristics (the reference needed
  *    `use_new_shuffle` for the same class of problem:
  *    `luigi_pipeline/seqr_loading.py:115`);
  *  - blocks never span a shard (shard = docId / docsPerShard), so
  *    query-time WAND parallelizes per shard like ES shards
  *    (`luigi_pipeline/lib/hail_tasks.py:274-278`);
  *  - `buildBuckets` termId-range buckets give per-partition resume
  *    granularity with lineage + term/posting counts in each manifest.
  */
class IndexBuilder(spark: SparkSession, cfg: IndexConfig = IndexConfig()) {
  import spark.implicits._

  private val p = Bm25Params(cfg.k1, cfg.b)

  private def manifestPath(dir: String) = s"$dir/_manifest.json"
  private def schemaPath(dir: String) = s"$dir/_schema.json"

  /** Stage write + schema sidecar: the read-back side then passes the
    * KNOWN schema to the reader instead of inferring it (a driver-serial
    * parquet-footer job per read-back — at 6+ intra-build read-backs the
    * inference jobs and their planning gaps are a fixed serial cost the
    * scaling pair's 4× core budget cannot amortize). Written BEFORE the
    * stage manifest, so a resumable stage always has its sidecar. */
  private def writeStage(df: org.apache.spark.sql.DataFrame, dir: String): Unit = {
    cfg.io.write(df, dir)
    Json.writeString(schemaPath(dir), df.schema.json)
  }

  /** Stage read-back: schema from the sidecar when present (fresh build or
    * same-version resume), inference otherwise (older staging trees). */
  private def readStage(dir: String): org.apache.spark.sql.DataFrame =
    if (Json.exists(schemaPath(dir)))
      cfg.io.read(spark, dir,
        org.apache.spark.sql.types.DataType.fromJson(Json.readString(schemaPath(dir)))
          .asInstanceOf[org.apache.spark.sql.types.StructType])
    else cfg.io.read(spark, dir)

  /** opt-in stage timing (GRAFT_BUILD_TIMING=1) → stderr */
  private val timing = sys.env.contains("GRAFT_BUILD_TIMING")
  private def stage[T](name: String)(f: => T): T = {
    val t0 = System.nanoTime()
    val r = f
    if (timing) System.err.println(f"[build-timing] $name%-12s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    r
  }

  /** `bucketWidth != 0` marks a termId-bucketed stage: its on-disk layout
    * depends on the bucket width, so a manifest recording a different width
    * (including 0 = pre-width manifests) is NOT resumable even under the
    * same configHash — reading buckets 0..newBuckets-1 of an old layout
    * would silently drop postings. */
  private def loadIfDone(
      dir: String, lineage: Long, bucketWidth: Long = 0L): Option[StageManifest] =
    if (!Json.exists(manifestPath(dir))) None
    else {
      val m = Json.read(manifestPath(dir), classOf[StageManifest])
      if (m.configHash == cfg.configHash && (lineage == 0L || m.lineage == lineage) &&
        (bucketWidth == 0L || m.bucketWidth == bucketWidth)) Some(m)
      else None
    }

  /** Build (or resume) the index for `corpus` into `indexDir`.
    * `corpus` must have columns (repo, path, commit, lang, content).
    *
    * `killAfterStage` simulates a mid-build crash for the resume-equivalence
    * test (SURVEY.md §5 mode 2): the build throws [[BuildKilled]] right
    * after completing stage N (0=doctf, 1=docs, 2=tf, 3=terms, 4=tfenc,
    * 5+b = block bucket b). A subsequent `build(resume = true)` must produce
    * an index logically identical to an uninterrupted fresh build. */
  def build(
      corpus: DataFrame,
      indexDir: String,
      resume: Boolean = true,
      killAfterStage: Int = Int.MaxValue): IndexMeta = {
    val buildT0 = System.nanoTime()
    def kill(n: Int): Unit =
      if (n >= killAfterStage) throw new IndexBuilder.BuildKilled(n)
    cfg.io.recover(spark, indexDir) // heal a previous publish that died mid-swap
    val staging = indexDir + ".staging"
    if (!resume) cfg.io.dropTree(spark, staging)
    // the published index (if any) stays live until the atomic publish at
    // the end replaces it — a failed rebuild must never destroy the old
    // index (the reference's build-then-publish contract, staged loading
    // at `elasticsearch_client_v7.py:107-147`)

    // cheap input fingerprint for resume-staleness: hash of the corpus file
    // listing. Catches files added/removed between a killed run and its
    // resume (immutable-file sources — the normal object-store layout);
    // empty (0 = unchecked) for non-file inputs, where resume is only valid
    // over an unchanged corpus.
    val inputFp: Long = {
      val files = corpus.inputFiles
      if (files.isEmpty) 0L
      else files.sorted.foldLeft(1125899906842597L)((h, f) => 31 * h + f.hashCode)
    }

    // field plan (schema-derived — the elasticsearch_schema_for_table
    // analogue): keyword columns become `field:value` filter terms,
    // storedOnly columns ride along into docs with NO postings
    // (disable_index), analyzed columns become tagged `field:token`
    // per-field full-text postings (the ES multi-field mapping) and are
    // stored too. All sets may extend past the standard five columns.
    val baseCols = Seq("repo", "path", "commit", "lang", "content")
    val extraCols =
      (cfg.fields.keyword ++ cfg.fields.storedOnly ++ cfg.fields.analyzed ++
        cfg.fields.nested ++ cfg.fields.denseVector)
        .distinct.filterNot(baseCols.contains)
    val selCols = baseCols ++ extraCols
    // IVF cell columns (stored next to their dense_vector fields when a
    // quantizer is configured) — part of the docs schema from stage 0 on
    val ivfCols: Seq[String] =
      if (cfg.ivfCells > 0) cfg.fields.denseVector.map(f => s"_ivf_$f") else Nil

    // ---- stage 0: single tokenize pass over content → columnar doc/tf rows
    // with dense docIds assigned in the same shuffle. Downstream stages are
    // pure projections of this table (Parquet column pruning: docs never
    // reads `terms`, tf never reads `sha256`) — no identity join anywhere.
    // (Field-plan requires live inside the stage: a resume/merge path with
    // prebuilt stages never reads the corpus at all.)
    val doctfDir = s"$staging/_doctf"
    val doctfManifest: StageManifest = loadIfDone(doctfDir, inputFp).getOrElse(stage("doctf") {
      import org.apache.spark.sql.types._
      for (c <- cfg.fields.keyword ++ cfg.fields.storedOnly ++ cfg.fields.analyzed ++
        cfg.fields.nested)
        require(corpus.columns.contains(c), s"field-config column '$c' not in corpus schema")
      for (c <- cfg.fields.nested) {
        val dt = corpus.schema(c).dataType
        require(dt.isInstanceOf[ArrayType] &&
          dt.asInstanceOf[ArrayType].elementType.isInstanceOf[StructType],
          s"nested field '$c' must be an array<struct> column " +
            s"(tarray(tstruct)→nested rule); got ${dt.simpleString}")
        require(!cfg.fields.keyword.contains(c) && !cfg.fields.storedOnly.contains(c) &&
          !cfg.fields.analyzed.contains(c),
          s"field '$c' cannot be both nested and keyword/storedOnly/analyzed")
      }
      for (c <- cfg.fields.denseVector) {
        val dt = corpus.schema(c).dataType
        val ok = dt.isInstanceOf[ArrayType] && {
          val et = dt.asInstanceOf[ArrayType].elementType
          et == FloatType || et == DoubleType
        }
        require(ok, s"dense_vector field '$c' must be array<float>/array<double>; " +
          s"got ${dt.simpleString}")
        require(!cfg.fields.keyword.contains(c) && !cfg.fields.analyzed.contains(c) &&
          !cfg.fields.nested.contains(c),
          s"field '$c' cannot be both dense_vector and keyword/analyzed/nested")
      }
      for (c <- cfg.fields.keyword)
        require(corpus.schema(c).dataType == StringType ||
          corpus.schema(c).dataType.isInstanceOf[ArrayType] &&
            corpus.schema(c).dataType.asInstanceOf[ArrayType].elementType == StringType,
          s"keyword field '$c' must be a string or array<string> column " +
            s"(tstr/tarray(tstr)→keyword rule)")
      for (c <- cfg.fields.analyzed) {
        require(c != "content", "'content' is always analyzed; list only EXTRA fields")
        require(corpus.schema(c).dataType == StringType,
          s"analyzed field '$c' must be a string column")
        require(!cfg.fields.keyword.contains(c) && !cfg.fields.storedOnly.contains(c),
          s"field '$c' cannot be both analyzed and keyword/storedOnly")
      }
      for (f <- cfg.fields.analyzers.keys)
        require(f == "content" || cfg.fields.analyzed.contains(f),
          s"analyzer override for '$f' but it is not an analyzed extra field " +
            "(or 'content' — the primary field's analyzer is overridable too)")
      // ---- IVF coarse quantizer (ES 8 dense_vector + index-time ANN
      // structure; Lucene builds its vector structures per segment the same
      // way): deterministic seeded k-means per field over the column-pruned
      // vector projection, centroids published as a tiny relation, per-doc
      // cell assigned in the same tokenize pass below (one extra broadcast,
      // no extra content-scale pass).
      val ivfCents: Array[(String, Array[Array[Float]])] =
        if (cfg.ivfCells <= 0) Array.empty
        else cfg.fields.denseVector.map { f =>
          import spark.implicits._
          val vecs = corpus
            .select(xxhash64(col("repo"), col("path"), col("commit")).as("id"),
              col(f).cast("array<float>").as("v"))
            .filter(col("v").isNotNull)
            .as[(Long, Array[Float])]
            // Rows the quarantine will reject as bad_vector (non-finite
            // elements) must not train the quantizer either — one NaN/Inf
            // propagates into a published centroid and poisons query-time
            // cell-probe ordering. Same finite-value rule as reasonOf.
            .filter(t => t._2.forall(f => java.lang.Float.isFinite(f)))
            .map { case (id, v) => graft.search.Ann.Vec(id, v) }
          val cents = graft.search.Ann.kmeans(vecs, cfg.ivfCells, iters = 3, seed = 42L)
          cfg.io.write(
            cents.zipWithIndex.toSeq.map { case (c, i) => (i, c.toSeq) }.toDF("cell", "centroid"),
            s"$staging/ivf_$f")
          (f, cents)
        }.toArray
      val inDf = corpus.select(selCols.map(col): _*)
      val inSchema = inDf.schema
      val keywordIdx: Array[(String, Int)] =
        cfg.fields.keyword.map(k => k -> inSchema.fieldIndex(k)).toArray
      val analyzedIdx: Array[(String, Int, graft.analysis.AnalyzerSpec)] =
        cfg.fields.analyzed.map(k => (k, inSchema.fieldIndex(k), cfg.fields.analyzerOf(k)))
          .toArray
      // nested plan: (column name, column index, [(subField name, subField
      // ordinal)]) — term-emitting sub-fields only (string / integral /
      // boolean; float leaves stay stored-and-verifiable but emit no terms,
      // ES-style numeric filters on them belong to range queries)
      val nestedIdx: Array[(String, Int, Array[(String, Int)])] =
        cfg.fields.nested.map { c =>
          val i = inSchema.fieldIndex(c)
          val st = inSchema(i).dataType.asInstanceOf[ArrayType]
            .elementType.asInstanceOf[StructType]
          val subs = st.fields.zipWithIndex.collect {
            case (f, j) if f.dataType == StringType || f.dataType == BooleanType ||
              f.dataType == IntegerType || f.dataType == LongType ||
              f.dataType == ShortType || f.dataType == ByteType => (f.name, j)
          }
          (c, i, subs)
        }.toArray
      val storedExtra: Array[(String, Int)] =
        extraCols.map(c => c -> inSchema.fieldIndex(c)).toArray
      val contentIdx = inSchema.fieldIndex("content")
      // content analyzer (overridable like any analyzed field — default:
      // the code analyzer, on whose exact stream the frozen oracles
      // depend). Fast path for the default avoids the per-doc positions
      // array allocation; a non-default spec routes through tokenizeIndexed
      // (kind + index-time stopword gaps + synonym injections), its
      // positions and survivor dl replacing the stream index and length.
      val contentSpecV = cfg.fields.analyzerOf("content")
      val contentIsCode = contentSpecV.isCode
      // quarantine plan: dense_vector column ordinals for the finite-value
      // check (independent of the IVF quantizer), plus the size bound
      val dvIdxQ: Array[(String, Int)] =
        if (!cfg.quarantine) Array.empty
        else cfg.fields.denseVector.map(f => f -> inSchema.fieldIndex(f)).toArray
      val quarantineOn = cfg.quarantine
      val maxChars = cfg.maxContentChars
      val ivfAssign: Array[(Int, Array[Array[Float]])] =
        ivfCents.map { case (f, cents) => (inSchema.fieldIndex(f), cents) }
      val outSchema = StructType(
        Seq(
          StructField("repo", StringType), StructField("path", StringType),
          StructField("commit", StringType), StructField("lang", StringType),
          StructField("sha256", StringType), StructField("dl", LongType, nullable = false),
          StructField("terms", ArrayType(StructType(Seq(
            StructField("term", StringType), StructField("tf", LongType, nullable = false),
            StructField("pos", ArrayType(LongType, containsNull = false)),
            // the owning FIELD's token count — the dl BM25 normalizes this
            // term's tf with (content terms: the doc dl; keyword filter
            // terms: 1; `field:token` tagged terms and `field:` markers:
            // that field's length)
            StructField("fdl", LongType, nullable = false)))))) ++
        storedExtra.map { case (c, i) => StructField(c, inSchema(i).dataType) } ++
        ivfCols.map(c => StructField(c, IntegerType)) ++
        // quarantine: rejection reason rides the same stage-0 rows (null =
        // survivor); the column only exists when quarantine is on, which
        // also changes configHash — no resume across the two layouts
        (if (cfg.quarantine) Seq(StructField("_reason", StringType)) else Nil))
      val withPositions = cfg.storePositions
      // dense-docId range plan from the CHEAP identity projection (a
      // column-pruned scan that never touches `content`): boundaries, exact
      // per-range counts and id offsets all land on the driver BEFORE the
      // content pass, so the tokenize→shuffle→assign→write below is ONE
      // content-scale pass with no executor cache of tokenized rows (at
      // 100 TB the former MEMORY_AND_DISK persist here was a content-scale
      // cache). 4× finer ranges than partitions smooth the hash placement
      // of ranges onto physical partitions (worst-case task ≈ 2× average).
      // quarantine must place null-identity rows deterministically: both the
      // planning pass and the executor-side rangeOf see nulls as "" (the
      // plan's per-range counts then match exactly; the rejected rows'
      // ordinals inside a range don't matter — they never become docs rows)
      val idProjection =
        if (!cfg.quarantine) corpus.select("repo", "path", "commit")
        else corpus.select(
          coalesce(col("repo"), lit("")).as("repo"),
          coalesce(col("path"), lit("")).as("path"),
          coalesce(col("commit"), lit("")).as("commit"))
      val idPlan = DenseIds.plan(
        idProjection, Seq("repo", "path", "commit"), 4 * cfg.buildPartitions)
      val bcPlan = spark.sparkContext.broadcast(idPlan)
      val outSchemaPid = outSchema.add("_pid", IntegerType, nullable = false)
      val doctf = inDf.mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("SHA-256")
        val hex = "0123456789abcdef".toCharArray
        val emptyPos: Seq[Long] = Seq.empty
        val plan = bcPlan.value
        val keyBuf = new Array[String](3)
        /** quarantine rejection reason of a corpus row, null = survivor —
          * the es-hadoop bulk-error-handler analogue, evaluated inside the
          * one content-scale pass (no extra scan). */
        def reasonOf(r: org.apache.spark.sql.Row): String = {
          if (r.isNullAt(0) || r.isNullAt(1) || r.isNullAt(2)) return "null_identity"
          if (r.isNullAt(contentIdx)) return "null_content"
          if (maxChars > 0 && r.getString(contentIdx).length > maxChars)
            return "oversized_content"
          var i = 0
          while (i < dvIdxQ.length) {
            val (name, idx) = dvIdxQ(i)
            if (!r.isNullAt(idx)) {
              val it2 = r.getSeq[Any](idx).iterator
              while (it2.hasNext) {
                val finite = it2.next() match {
                  case f: java.lang.Float => !f.isNaN && !f.isInfinite
                  case d: java.lang.Double => !d.isNaN && !d.isInfinite
                  case _ => false
                }
                if (!finite) return s"bad_vector:$name"
              }
            }
            i += 1
          }
          null
        }
        /** rejected row: identity as-is, no lineage hash, no tokens — the
          * docs projection filters it out; only the rejected/ relation and
          * the reject counter ever see it. */
        def rejectRow(r: org.apache.spark.sql.Row, reason: String): org.apache.spark.sql.Row = {
          keyBuf(0) = if (r.isNullAt(0)) "" else r.getString(0)
          keyBuf(1) = if (r.isNullAt(1)) "" else r.getString(1)
          keyBuf(2) = if (r.isNullAt(2)) "" else r.getString(2)
          org.apache.spark.sql.Row.fromSeq(
            Seq(r.get(0), r.get(1), r.get(2), r.get(3),
              null, 0L, Seq.empty[org.apache.spark.sql.Row]) ++
            storedExtra.map { case (_, idx) => r.get(idx) } ++
            ivfAssign.map(_ => null) :+ reason :+ plan.rangeOf(keyBuf))
        }
        it.map { r =>
          val qReason = if (quarantineOn) reasonOf(r) else null
          if (qReason != null) rejectRow(r, qReason) else {
          val content = r.getString(contentIdx)
          val (toks, tposs, contentDl): (Array[String], Array[Long], Long) =
            if (contentIsCode) {
              val t = Analyzer.tokenize(content)
              (t, null, t.length.toLong)
            } else graft.analysis.AnalyzerSpec.tokenizeIndexed(contentSpecV, content)
          // per-term tf and (when configured) ascending token-stream
          // positions — for the code default, position i is the index in
          // the analyzer's emitted stream (the same stream dl counts); a
          // configured analyzer supplies its own positions (stopword gaps,
          // synonym-injection sharing) and survivor dl
          val tfMap = new java.util.HashMap[String, Long]()
          val posMap: java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Long]] =
            if (withPositions) new java.util.HashMap() else null
          var i = 0
          while (i < toks.length) {
            tfMap.merge(toks(i), 1L, (a, b) => a + b)
            if (withPositions) {
              var buf = posMap.get(toks(i))
              if (buf == null) { buf = new scala.collection.mutable.ArrayBuffer[Long](4); posMap.put(toks(i), buf) }
              buf += (if (tposs == null) i.toLong else tposs(i))
            }
            i += 1
          }
          val termsBuf = new scala.collection.mutable.ArrayBuffer[org.apache.spark.sql.Row](
            tfMap.size + 8)
          val eit = tfMap.entrySet().iterator()
          while (eit.hasNext) {
            val e = eit.next()
            val pos: Seq[Long] = if (withPositions) posMap.get(e.getKey).toSeq else emptyPos
            termsBuf += org.apache.spark.sql.Row(e.getKey, e.getValue, pos, contentDl)
          }
          // keyword-field filter terms (the ES `keyword` mapping analogue,
          // reference `elasticsearch_utils.py:39-48`): posting-listed like
          // content terms but never scored, and excluded from dl. The
          // tokenizer strips ':' so these can't collide with content terms.
          // An array<string> keyword column (the tarray(tstr)→keyword-array
          // mapping — per-sample/tag lists) emits one filter term per
          // DISTINCT element: `f:v` matches documents whose list contains v.
          val kwPos: Seq[Long] = if (withPositions) Seq(0L) else emptyPos
          keywordIdx.foreach { case (name, idx) =>
            if (!r.isNullAt(idx)) r.get(idx) match {
              case v: String =>
                termsBuf += org.apache.spark.sql.Row(s"$name:$v", 1L, kwPos, 1L)
              case vs: scala.collection.Seq[_] =>
                vs.iterator.collect { case e: String => e }.toSet[String].foreach { e =>
                  termsBuf += org.apache.spark.sql.Row(s"$name:$e", 1L, kwPos, 1L)
                }
              case other => throw new IllegalStateException(
                s"keyword field '$name' has unsupported value type ${other.getClass}")
            }
          }
          // nested-field candidate terms (the ES `nested` mapping analogue,
          // reference `elasticsearch_utils.py:55-59`): one `field.sub:value`
          // filter term per DISTINCT (sub-field, value) across the array's
          // elements. These prune candidates only — same-element
          // co-occurrence is verified at query time against the STORED
          // column (the block-join result as a two-phase plan).
          nestedIdx.foreach { case (name, idx, subs) =>
            if (!r.isNullAt(idx)) {
              val seen = new java.util.HashSet[String]()
              r.getSeq[org.apache.spark.sql.Row](idx).foreach { e =>
                if (e != null) subs.foreach { case (sub, j) =>
                  if (!e.isNullAt(j)) {
                    val term = s"$name.$sub:${String.valueOf(e.get(j))}"
                    if (seen.add(term)) termsBuf += org.apache.spark.sql.Row(term, 1L, kwPos, 1L)
                  }
                }
              }
            }
          }
          // extra analyzed fields (ES multi-field mapping): the field's
          // token stream — analyzed with THE FIELD'S configured analyzer
          // (kind + index-time stopwords/synonyms; default code) — as
          // `field:token` tagged terms carrying the FIELD's length as fdl
          // (exact per-field BM25; stop-filtered tokens leave position gaps
          // and don't count toward fdl, synonym injections share their
          // trigger's position and don't count either — Lucene
          // discountOverlaps), plus one `field:` marker whose tf is the
          // field length — so the marker's dictionary row accumulates
          // df = field docCount and cf = field token total, the per-field
          // statistics multi_match needs, maintained by the same machinery
          // as any other term (merge, delete, segments).
          analyzedIdx.foreach { case (name, idx, spec) =>
            if (!r.isNullAt(idx)) {
              val (ftoks, fposArr, fdl) =
                graft.analysis.AnalyzerSpec.tokenizeIndexed(spec, r.getString(idx))
              if (fdl > 0) {
                val ftf = new java.util.HashMap[String, Long]()
                val fpos: java.util.HashMap[String, scala.collection.mutable.ArrayBuffer[Long]] =
                  if (withPositions) new java.util.HashMap() else null
                var fi = 0
                while (fi < ftoks.length) {
                  val tagged = s"$name:${ftoks(fi)}"
                  ftf.merge(tagged, 1L, (a, b) => a + b)
                  if (withPositions) {
                    var buf = fpos.get(tagged)
                    if (buf == null) {
                      buf = new scala.collection.mutable.ArrayBuffer[Long](4)
                      fpos.put(tagged, buf)
                    }
                    buf += fposArr(fi)
                  }
                  fi += 1
                }
                val fit = ftf.entrySet().iterator()
                while (fit.hasNext) {
                  val e = fit.next()
                  val pos: Seq[Long] = if (withPositions) fpos.get(e.getKey).toSeq else emptyPos
                  termsBuf += org.apache.spark.sql.Row(e.getKey, e.getValue, pos, fdl)
                }
                termsBuf += org.apache.spark.sql.Row(s"$name:", fdl, kwPos, fdl)
              }
            }
          }
          val terms = termsBuf.toArray
          md.reset()
          val dig = md.digest(content.getBytes("UTF-8"))
          val shaChars = new Array[Char](64)
          var h = 0
          while (h < 32) {
            shaChars(2 * h) = hex((dig(h) >> 4) & 0xf)
            shaChars(2 * h + 1) = hex(dig(h) & 0xf)
            h += 1
          }
          keyBuf(0) = r.getString(0); keyBuf(1) = r.getString(1); keyBuf(2) = r.getString(2)
          // IVF cell per dense_vector field: argmax-cosine against the
          // broadcast centroids (null vector → null cell)
          val ivfVals: Seq[Any] = ivfAssign.toSeq.map { case (idx, cents) =>
            if (r.isNullAt(idx)) null
            else {
              val raw = r.getSeq[Any](idx)
              val v = new Array[Double](raw.length)
              var vi = 0
              while (vi < raw.length) {
                v(vi) = raw(vi) match {
                  case f: java.lang.Float => f.toDouble
                  case d: java.lang.Double => d.doubleValue()
                  case other => throw new IllegalStateException(
                    s"dense_vector element of type ${other.getClass}")
                }
                vi += 1
              }
              var best = 0; var bestCos = Double.NegativeInfinity
              var c = 0
              while (c < cents.length) {
                val cv = cents(c)
                var dot = 0.0; var na = 0.0; var nb = 0.0
                var j = 0
                while (j < v.length) {
                  dot += v(j) * cv(j); na += v(j) * v(j); nb += cv(j).toDouble * cv(j)
                  j += 1
                }
                val cos = dot / math.sqrt(na * nb)
                if (cos > bestCos) { bestCos = cos; best = c }
                c += 1
              }
              Int.box(best)
            }
          }
          org.apache.spark.sql.Row.fromSeq(
            Seq(r.getString(0), r.getString(1), r.getString(2), r.getString(3),
              new String(shaChars), toks.length.toLong, terms.toSeq) ++
            storedExtra.map { case (_, idx) => r.get(idx) } ++ ivfVals ++
            (if (quarantineOn) Seq(null) else Nil) :+
            plan.rangeOf(keyBuf))
          }
        }
      }(org.apache.spark.sql.Encoders.row(outSchemaPid))
      // one wide op: partition by the plan's range id, sort each range by
      // identity, add offset + local ordinal → globally dense docId in key
      // order (the same invariant DenseIds.assign gives, without its two
      // extra jobs or its persist)
      val pidIdx = outSchemaPid.fieldIndex("_pid")
      val finalSchema = outSchema.add("docId", LongType, nullable = false)
      val assigned = doctf
        .repartition(cfg.buildPartitions, col("_pid"))
        .sortWithinPartitions(col("_pid"), col("repo"), col("path"), col("commit"))
        .mapPartitions { it =>
          val off = bcPlan.value.offsets
          var curPid = -1
          var i = 0L
          it.map { r =>
            val pid = r.getInt(pidIdx)
            if (pid != curPid) { curPid = pid; i = 0L }
            val id = off(pid) + i
            i += 1
            org.apache.spark.sql.Row.fromSeq(r.toSeq.patch(pidIdx, Nil, 1) :+ id)
          }
        }(org.apache.spark.sql.Encoders.row(finalSchema))
      // corpus stats ride the one content-scale write: with sumDl and the
      // sha256 lineage known here, no later stage waits on the docs
      // projection (it drops off the critical path entirely)
      val obs = org.apache.spark.sql.Observation()
      // corpus stats over SURVIVORS only (quarantine off ⇒ every row is a
      // survivor): numDocs/sumDl/lineage must describe the indexed docs —
      // the lineage invariant holds over them; rejects have null sha256 and
      // the conditional hash keeps them out of the xor (a raw
      // xxhash64(NULL) is NOT null — it would poison the fingerprint)
      val survivorPred =
        if (cfg.quarantine) col("_reason").isNull else lit(true)
      assigned
        .select((Seq("docId", "repo", "path", "commit", "lang", "sha256", "dl", "terms") ++
          storedExtra.map(_._1) ++ ivfCols ++
          (if (cfg.quarantine) Seq("_reason") else Nil)).map(col): _*)
        .observe(obs, count(lit(1)).as("n"),
          count(when(survivorPred, lit(1))).as("nSurv"),
          sum(when(survivorPred, col("dl"))).as("sumDl"),
          (if (cfg.quarantine)
            expr("coalesce(bit_xor(CASE WHEN _reason IS NULL THEN xxhash64(sha256) END)," +
              " CAST(0 AS BIGINT))")
          else expr("bit_xor(xxhash64(sha256))")).as("lineage"))
        .pipe(df => writeStage(df, doctfDir))
      // the plan's offsets are exact only if the content pass saw the same
      // row multiset the planning pass did (deterministic source — file
      // listing changes are already caught by inputFp); verify before any
      // downstream stage can consume a mis-assigned id
      val row = obs.get
      val seen = row("n").asInstanceOf[Long]
      require(seen == idPlan.total,
        s"corpus changed between id planning (${idPlan.total} rows) and the " +
          s"tokenize pass ($seen rows); rebuild with resume = false")
      bcPlan.destroy()
      val survivors = row("nSurv").asInstanceOf[Long]
      val m = StageManifest("doctf", survivors, 0L, 0L, inputFp, cfg.configHash,
        sumDl = row("sumDl").asInstanceOf[Long],
        contentLineage = row("lineage").asInstanceOf[Long],
        rejected = seen - survivors)
      Json.write(manifestPath(doctfDir), m)
      m
    })
    kill(0)

    // ---- stage 1: docs (identity, sha256 lineage, doc length, dense docId,
    // stored metadata columns) — a narrow projection of stage 0 (the
    // `terms` column is pruned away)
    val docsDir = s"$staging/docs"
    def docsStage(): StageManifest = loadIfDone(docsDir, 0L).getOrElse(stage("docs") {
      // manifest stats ride the write job as observed metrics — no
      // second read-back pass (sequential-job count is the build's main
      // fixed overhead at small corpora, and a barrier at any size)
      val obs = org.apache.spark.sql.Observation()
      readStage(doctfDir)
        // quarantine: rejects never become docs rows (the rejected/
        // relation is their only downstream)
        .pipe(df => if (cfg.quarantine) df.filter(col("_reason").isNull) else df)
        .select((Seq("docId", "repo", "path", "commit", "lang", "sha256", "dl") ++
          extraCols ++ ivfCols).map(col): _*)
        .observe(obs, count(lit(1)).as("n"), sum("dl").as("sumDl"),
          expr("bit_xor(xxhash64(sha256))").as("lineage"))
        .pipe(df => writeStage(df, docsDir))
      val row = obs.get
      val m = StageManifest("docs", row("n").asInstanceOf[Long], 0L,
        row("sumDl").asInstanceOf[Long], row("lineage").asInstanceOf[Long], cfg.configHash)
      Json.write(manifestPath(docsDir), m)
      m
    })
    // ---- quarantine channel: the rejects' identity + reason as their own
    // small relation next to the index (the es-hadoop error-handler output;
    // one column-pruned scan of stage 0, no content). Skipped when nothing
    // was rejected — also covers merge/purge resume, whose synthetic doctf
    // manifest has no backing data to scan.
    val rejectedDir = s"$staging/rejected"
    if (cfg.quarantine && doctfManifest.rejected > 0 &&
      loadIfDone(rejectedDir, inputFp).isEmpty) stage("rejected") {
      cfg.io.write(
        readStage(doctfDir)
          .filter(col("_reason").isNotNull)
          .select(col("repo"), col("path"), col("commit"), col("lang"),
            col("_reason").as("reason")),
        rejectedDir)
      val m = StageManifest("rejected", doctfManifest.rejected, 0L, 0L, inputFp,
        cfg.configHash)
      Json.write(manifestPath(rejectedDir), m)
      m
    }
    // With corpus stats on the stage-0 manifest, the docs projection feeds
    // NOTHING downstream — run it concurrently with the tf→terms→tfenc→
    // blocks chain (its job interleaves into otherwise-idle cores; joined
    // before publish). A doctf manifest from a pre-stats build
    // (contentLineage == 0) or the kill-switch test path keeps the
    // sequential order, with stats read from the docs manifest as before.
    val docsTask: Either[StageManifest, java.util.concurrent.Future[StageManifest]] =
      if (doctfManifest.contentLineage != 0L && killAfterStage == Int.MaxValue) {
        val ex = java.util.concurrent.Executors.newSingleThreadExecutor()
        try Right(ex.submit(() => docsStage())) finally ex.shutdown()
      } else Left(docsStage())
    kill(1)
    val (numDocs, sumDl, lineage) =
      if (doctfManifest.contentLineage != 0L)
        (doctfManifest.rows, doctfManifest.sumDl, doctfManifest.contentLineage)
      else docsTask match {
        // sumDl is carried in the docs manifest's `postings` slot
        case Left(dm) => (dm.rows, dm.postings, dm.lineage)
        case Right(f) => { val dm = f.get(); (dm.rows, dm.postings, dm.lineage) }
      }
    val avgdl = sumDl.toDouble / numDocs.toDouble

    // ---- stage 2: term frequencies (term, docId, tf, dl) — a flat explode
    // of stage 0's pruned (docId, dl, terms) columns; no join, no shuffle
    val tfDir = s"$staging/_tf"
    val tfManifest = loadIfDone(tfDir, lineage).getOrElse(stage("tf") {
      val obs = org.apache.spark.sql.Observation()
      // the posting's dl is the term's OWNING FIELD's length (t.fdl):
      // content terms carry the doc dl, tagged `field:token` terms their
      // field's dl — per-field BM25 tf-normalization is exact by storage
      readStage(doctfDir)
        .select(col("docId"), explode(col("terms")).as("t"))
        .select(col("t.term").as("term"), col("docId"), col("t.tf").as("tf"),
          col("t.fdl").as("dl"), col("t.pos").as("pos"))
        .observe(obs, count(lit(1)).as("n"))
        .pipe(df => writeStage(df, tfDir))
      val n = obs.get("n").asInstanceOf[Long]
      val m = StageManifest("tf", n, 0L, n, lineage, cfg.configHash)
      Json.write(manifestPath(tfDir), m)
      m
    })
    kill(2)
    val numPostings = tfManifest.postings

    // ---- stage 3: term dictionary with dense termId (ascending term order)
    val termsDir = s"$staging/terms"
    // captured when the stage runs fresh AND the dictionary is broadcastable:
    // the fused-encode dict collect then reads the stage's own persisted
    // cache instead of re-listing + re-scanning the parquet it just wrote (a
    // constant-time driver job that Amdahl charges against the core budget)
    var freshDict: Array[org.apache.spark.sql.Row] = null
    val termsManifest = loadIfDone(termsDir, lineage).getOrElse(stage("terms") {
      // persist the dictionary-scale stats so DenseIds' range-sampling pass
      // reads the cache instead of re-running the posting-scale groupBy
      val stats = readStage(tfDir)
        .groupBy("term")
        .agg(count(lit(1)).as("df"), sum("tf").as("cf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // planned assignment: the plan pass materializes `stats` into the
      // cache and collects range bounds in one job; the write below is then
      // the only other pass (two jobs for the whole stage, one persist)
      val ided = DenseIds.assignPlanned(stats, Seq("term"), "termId", cfg.buildPartitions)
      writeStage(ided.df.select("termId", "term", "df", "cf"), termsDir)
      if (ided.total <= cfg.broadcastDictMaxTerms)
        freshDict = ided.df.select("term", "termId", "df").collect()
      ided.release()
      stats.unpersist()
      // the term count is already on the driver from DenseIds' offsets pass —
      // no read-back count() job
      val n = ided.total
      val m = StageManifest("terms", n, n, 0L, lineage, cfg.configHash)
      Json.write(manifestPath(termsDir), m)
      m
    })
    kill(3)
    val numTerms = termsManifest.terms

    // ---- stage 4: termId-encode the flat postings, written partitioned by
    // termId-range bucket — MATERIALIZED ONLY for web-scale dictionaries
    // past the broadcast threshold. There the tf↔dictionary join is a
    // term-string shuffle that must run exactly once regardless of
    // buildBuckets (filtering tf per bucket cannot prune the tf side:
    // termId exists only after the join; the old fused per-bucket join
    // re-shuffled the FULL tf table buildBuckets times), so the encoded
    // result is written once and each pack bucket reads only its own
    // `bucket=` partition directory.
    //
    // With a broadcastable dictionary (the normal case — code corpora fit
    // millions of terms) the join is a NARROW map, so running it inside
    // each pack bucket costs only an extra tf scan per bucket while
    // removing a full posting-volume write+read from the critical path:
    // each bucket broadcasts its own termId-range dictionary SLICE, and the
    // inner join doubles as the bucket filter.
    val bucketWidth = math.max(1L, (numTerms + cfg.buildBuckets - 1) / cfg.buildBuckets)
    val fusedEncode = numTerms <= cfg.broadcastDictMaxTerms
    val tfencDir = s"$staging/_tfenc"
    if (!fusedEncode && loadIfDone(tfencDir, lineage, bucketWidth).isEmpty) stage("tfenc") {
      val termDict = readStage(termsDir).select("term", "termId")
      // shuffle-hash, not sort-merge: the dictionary slice per partition is
      // small enough to hash, and neither side pays a sort
      readStage(tfDir)
        .join(termDict.hint("shuffle_hash"), Seq("term"))
        .select(col("termId"), col("docId"), col("tf"), col("dl"), col("pos"),
          expr(s"cast(termId div $bucketWidth as int)").as("bucket"))
        .pipe(df => cfg.io.writePartitioned(df, tfencDir, "bucket"))
      Json.write(manifestPath(tfencDir),
        StageManifest("tfenc", numPostings, 0L, numPostings, lineage, cfg.configHash, bucketWidth))
    }
    kill(4)

    // ---- stage 5: range-shuffle→sort→pack per bucket; each bucket
    // shuffles only its own termId slice, so total pack-shuffle volume is
    // one full pass. Buckets remain the resume unit. Bucket jobs run
    // CONCURRENTLY (bounded pool) so one bucket's shuffle-read tail overlaps
    // the next bucket's map side — the scheduler packs otherwise-idle cores;
    // the kill-switch test mode keeps them sequential so stage boundaries
    // stay deterministic.
    val blocksDir = s"$staging/blocks"
    // fused mode: ONE driver-side dictionary collect shared by every bucket.
    // Each bucket's broadcast then materializes from a LocalRelation — no
    // per-bucket collect job sits on the (serial, cluster-size-independent)
    // critical path. Size is bounded by broadcastDictMaxTerms, the same
    // bound the broadcast itself implies.
    val fusedDict: Array[org.apache.spark.sql.Row] =
      if (!fusedEncode) null
      else if (freshDict != null) freshDict // collected from the terms stage's cache
      else stage("dict") { // resume path: the terms stage was skipped
        readStage(termsDir).select("term", "termId", "df").collect()
      }
    // ONE broadcast shared by every bucket, as flat parallel arrays with
    // an EXECUTOR-side lazily-built hash map ([[IndexBuilder.FusedDict]]):
    // per-bucket slice maps re-scanned the whole dictionary and re-paid
    // broadcast value serialization per bucket — driver-serial work that
    // grows with dictionary size (measured: ~1.4 s of inter-job gap per
    // build at a 72k-file corpus; a driver-built whole-dict HashMap
    // broadcast still paid ~0.8 s serializing the map). Arrays serialize
    // in bulk; the map is built once per executor JVM inside the first
    // task that needs it — task-parallel work, off the driver-serial
    // critical path. Each bucket's range test moves to the termId the
    // lookup returns, which is the same filter the slice encoded.
    val fusedDictBc: org.apache.spark.broadcast.Broadcast[IndexBuilder.FusedDict] =
      if (!fusedEncode) null
      else {
        val ts = new Array[String](fusedDict.length)
        val ids = new Array[Long](fusedDict.length)
        var i = 0
        while (i < fusedDict.length) {
          ts(i) = fusedDict(i).getString(0); ids(i) = fusedDict(i).getLong(1); i += 1
        }
        spark.sparkContext.broadcast(new IndexBuilder.FusedDict(ts, ids))
      }
    // Bucket CUT POINTS — contiguous termId ranges either way (disjoint
    // ranges keep blocks termId-local, so query-time parquet row-group
    // pruning is unaffected by which bucket owns a term):
    //  - fused mode: df-BALANCED cuts (equal POSTING-ROW volume per
    //    bucket — rows = Σ df, the unit the shuffle/sort/pack actually
    //    moves). Equal-width term-count cuts can put most of the posting
    //    volume in one bucket; a shared local pool absorbs that (idle
    //    slots backfill across the concurrent jobs — measured: phase span
    //    ≈ Σ task time / cores either way), but on a real cluster the
    //    bucket jobs are independent resume/retry units whose cost should
    //    be even. Deterministic from the terms stage's output, so a
    //    resumed build recomputes identical cuts;
    //  - materialized (non-fused) mode: equal-width cuts, matching tfenc's
    //    `termId div width` partition directories exactly.
    // The manifest token is a fingerprint of the cut vector (replacing the
    // raw width): a manifest written under ANY other layout — different
    // cuts, widths or bucket count — can never be resumed against this one.
    val bucketCuts: Array[Long] = {
      val cuts = new Array[Long](cfg.buildBuckets + 1)
      cuts(cfg.buildBuckets) = numTerms
      if (!fusedEncode) {
        var b = 1
        while (b < cfg.buildBuckets) { cuts(b) = math.min(b * bucketWidth, numTerms); b += 1 }
      } else {
        val byId = fusedDict.sortBy(_.getLong(1))
        val totalDf = byId.iterator.map(_.getLong(2)).sum
        var b = 1
        var i = 0
        var cum = 0L
        while (b < cfg.buildBuckets) {
          val target = math.round(totalDf.toDouble * b / cfg.buildBuckets)
          while (i < byId.length && cum < target) { cum += byId(i).getLong(2); i += 1 }
          cuts(b) = i.toLong // termIds are dense in sort order: index == termId
          b += 1
        }
      }
      cuts
    }
    val bucketToken: Long = {
      val h = bucketCuts.foldLeft(1125899906842597L)((acc, c) => 31 * acc + c)
      if (h == 0L) 1L else h // 0 means "unbucketed" to loadIfDone
    }
    def packBucket(b: Int): StageManifest = {
      val bDir = f"$blocksDir/bucket=$b%04d"
      loadIfDone(bDir, lineage, bucketToken).getOrElse(stage(s"blocks/$b") {
        // hash-partition on (termId, shard): no range-sampling pre-pass, and
        // skew is BOUNDED BY CONSTRUCTION — a stop term present in every doc
        // still contributes at most docsPerShard postings per group, spread
        // across as many groups as there are shards. Blocks never span a
        // shard, so a (termId, shard) group is exactly the packer's unit.
        // a bucket past the term range (numTerms < buildBuckets) has no
        // dictionary slice / partition directory — pack an empty slice
        val slice =
          if (bucketCuts(b) >= bucketCuts(b + 1)) spark.emptyDataset[Posting].toDF()
          else if (fusedEncode) {
            // fused termId-encode: the SHARED whole-dictionary broadcast
            // (built once above) + a lookup udf whose returned termId is
            // range-tested as the bucket filter. A broadcast-JOIN here
            // would be driver-serial three times over (Row→InternalRow
            // LocalRelation conversion, a BroadcastExchange job, a
            // driver-built HashedRelation — ~1.5 s of inter-job gap per
            // build, measured); the map broadcast ships the same bytes
            // with none of those, and the lookup is the same narrow map
            // the join's probe side would be.
            val lo = bucketCuts(b)
            val hi = bucketCuts(b + 1)
            val bcDict = fusedDictBc
            val enc = udf { (t: String) =>
              val v = bcDict.value.map.get(t)
              if (v eq null) -1L else v.longValue
            }
            readStage(tfDir)
              .withColumn("termId", enc(col("term")))
              .filter(col("termId") >= lo && col("termId") < hi)
              .select("termId", "docId", "tf", "dl", "pos")
          } else cfg.io.readBucket(spark, tfencDir, b)
            .map(_.select("termId", "docId", "tf", "dl", "pos"))
            .getOrElse(spark.emptyDataset[Posting].toDF())
        val part = slice
          .repartition(cfg.buildPartitions, col("termId"), expr(s"docId div ${cfg.docsPerShard}"))
          .sortWithinPartitions("termId", "docId")
          .as[Posting]
        // bind to locals so the closure captures serializable values, not `this`
        val (bs, dps, params, wPos) = (cfg.blockSize, cfg.docsPerShard, p, cfg.storePositions)
        val packFn: Iterator[Posting] => Iterator[PostingBlock] =
          IndexBuilder.packBlocks(bs, dps, params, avgdl, wPos)
        val blocks = part.mapPartitions(packFn)
        // stats ride the write (observed metrics can't do countDistinct —
        // the per-bucket term count is informational only, recorded as 0)
        val obs = org.apache.spark.sql.Observation()
        blocks
          .observe(obs, count(lit(1)).as("blocks"),
            coalesce(sum("n"), lit(0L)).as("postings"))
          .pipe(ds => cfg.io.writeBucket(ds.toDF(), blocksDir, b))
        val row = obs.get
        val mm = StageManifest(s"blocks/$b", row("blocks").asInstanceOf[Long],
          0L, row("postings").asInstanceOf[Long], lineage, cfg.configHash, bucketToken)
        Json.write(manifestPath(bDir), mm)
        mm
      })
    }
    val bucketManifests: Seq[StageManifest] =
      if (killAfterStage == Int.MaxValue && cfg.buildBuckets > 1) {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(4, cfg.buildBuckets))
        try {
          implicit val ec: scala.concurrent.ExecutionContext =
            scala.concurrent.ExecutionContext.fromExecutor(pool)
          val futs = (0 until cfg.buildBuckets).map(b =>
            scala.concurrent.Future(packBucket(b)))
          scala.concurrent.Await.result(
            scala.concurrent.Future.sequence(futs), scala.concurrent.duration.Duration.Inf)
        } finally pool.shutdown()
      } else
        (0 until cfg.buildBuckets).map { b =>
          val m = packBucket(b)
          kill(5 + b)
          m
        }
    val numBlocks = bucketManifests.map(_.rows).sum
    val packedPostings = bucketManifests.map(_.postings).sum
    // every posting must be accounted for across the bucket manifests — a
    // partial/mismatched bucket layout can never publish
    require(packedPostings == numPostings,
      s"packed postings ($packedPostings) != stage-2 postings ($numPostings); " +
        "bucket layout is inconsistent — rebuild with resume = false")

    // ---- stage 6: metadata + atomic publish (build-then-publish, the
    // reference's refresh_interval=-1 → forcemerge → route-off pattern).
    // Join the concurrent docs projection first: a publish must never land
    // without its docs table (f.get() also rethrows a docs-stage failure).
    docsTask.foreach(_.get())
    // ---- HNSW graphs (ES 8 dense_vector ANN, the Lucene per-segment
    // structure): one graph PER SHARD per field, built in its own task from
    // the column-pruned (docId, vector) projection of the published docs —
    // memory bounded by docsPerShard vectors + adjacency, deterministic
    // (seeded by shard, docId insert order), resumable like any stage.
    if (cfg.hnswM > 0) {
      import spark.implicits._
      val (m, efC, dps) = (cfg.hnswM, cfg.hnswEfConstruction, cfg.docsPerShard)
      for (f <- cfg.fields.denseVector) {
        val hDir = s"$staging/hnsw_$f"
        if (loadIfDone(hDir, lineage).isEmpty) stage(s"hnsw_$f") {
          val edges = readStage(docsDir)
            .select(col("docId"), col(f).cast("array<float>").as("v"))
            .filter(col("v").isNotNull)
            .as[(Long, Array[Float])]
            .groupByKey(_._1 / dps)
            .flatMapGroups { (shard, it) =>
              val items = it.toArray.sortBy(_._1)
              graft.search.Hnsw.toEdges(shard,
                graft.search.Hnsw.build(items, m, efC, seed = 0x9E3779B9L ^ shard))
            }
          cfg.io.write(edges.toDF(), hDir)
          val hm = StageManifest(s"hnsw_$f", 0L, 0L, 0L, lineage, cfg.configHash)
          Json.write(manifestPath(hDir), hm)
          hm
        }
      }
    }
    val meta = IndexMeta(numDocs, sumDl, numTerms, numPostings, numBlocks,
      Analyzer.Version, cfg.k1, cfg.b, cfg.blockSize, cfg.docsPerShard, lineage, cfg.configHash,
      keywordFields = cfg.fields.keyword, hasPositions = cfg.storePositions,
      analyzedExtra = cfg.fields.analyzed, nestedFields = cfg.fields.nested,
      denseVectorFields = cfg.fields.denseVector, ivfQuantCells = cfg.ivfCells,
      hnswM = cfg.hnswM,
      userMeta = cfg.userMeta,
      fieldAnalyzers = cfg.fields.analyzers.map { case (f, sp) => f -> sp.encode },
      rejectedDocs = doctfManifest.rejected)
    Json.write(s"$staging/meta.json", meta)
    cfg.io.dropTree(spark, doctfDir)
    cfg.io.dropTree(spark, tfDir)
    cfg.io.dropTree(spark, tfencDir)
    cfg.io.publishIndex(spark, staging, indexDir)
    if (timing) System.err.println(
      f"[build-timing] TOTAL        ${(System.nanoTime() - buildT0) / 1e9}%.2fs")
    meta
  }

}

object IndexBuilder {
  /** Thrown by the test-only kill switch in [[IndexBuilder.build]]. */
  final class BuildKilled(stage: Int) extends RuntimeException(s"killed after stage $stage")

  /** Broadcast form of the fused-encode dictionary: flat parallel arrays
    * (bulk-serializable — a HashMap pays per-entry object serialization on
    * the driver-serial broadcast path) with the lookup map built ONCE per
    * executor JVM on first use (`lazy val` is synchronized; task-parallel
    * work instead of driver-serial time). */
  final class FusedDict(terms: Array[String], ids: Array[Long]) extends Serializable {
    @transient lazy val map: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](terms.length * 2)
      var i = 0
      while (i < terms.length) { m.put(terms(i), ids(i)); i += 1 }
      m
    }
  }

  /** Streaming block packer: consecutive rows that share (termId, shard) are
    * cut into blocks of ≤ blockSize; O(blockSize) memory regardless of how
    * long a hot term's run is. Input partitions hold disjoint
    * (termId, docId) ranges, so emitted blocks never overlap. */
  def packBlocks(blockSize: Int, docsPerShard: Long, p: Bm25Params, avgdl: Double,
      storePositions: Boolean = false)(it: Iterator[Posting]): Iterator[PostingBlock] =
    new Iterator[PostingBlock] {
      private val docBuf = new Array[Long](blockSize)
      private val tfBuf = new Array[Long](blockSize)
      private val dlBuf = new Array[Long](blockSize)
      private val posBuf = new Array[Array[Long]](blockSize)
      private val emptyBytes = Array.emptyByteArray
      private var n = 0
      private var curTerm = -1L
      private var curShard = -1L
      private var pending: PostingBlock = _

      private def flush(): PostingBlock = {
        var maxTfnD = 0.0
        var maxTf = 0L
        var minDl = Long.MaxValue
        var i = 0
        while (i < n) {
          val t = BM25.tfNorm(tfBuf(i), dlBuf(i), avgdl, p)
          if (t > maxTfnD) maxTfnD = t
          if (tfBuf(i) > maxTf) maxTf = tfBuf(i)
          if (dlBuf(i) < minDl) minDl = dlBuf(i)
          i += 1
        }
        val poss =
          if (!storePositions) emptyBytes
          else {
            val buf = new scala.collection.mutable.ArrayBuffer[Byte](n * 4)
            var j = 0
            while (j < n) { Codec.appendDeltas(buf, posBuf(j)); j += 1 }
            buf.toArray
          }
        val blk = PostingBlock(curShard, curTerm, docBuf(0), docBuf(n - 1), n,
          Codec.encodeDeltas(java.util.Arrays.copyOf(docBuf, n)),
          Codec.encode(java.util.Arrays.copyOf(tfBuf, n)),
          Codec.encode(java.util.Arrays.copyOf(dlBuf, n)),
          BM25.upperBoundFloat(maxTfnD), maxTf, minDl, poss)
        n = 0
        blk
      }

      private def advance(): Unit = {
        while (pending == null && it.hasNext) {
          val r = it.next()
          val shard = r.docId / docsPerShard
          if (n > 0 && (r.termId != curTerm || shard != curShard || n == blockSize)) {
            pending = flush()
          }
          curTerm = r.termId
          curShard = shard
          docBuf(n) = r.docId; tfBuf(n) = r.tf; dlBuf(n) = r.dl
          if (storePositions) posBuf(n) = r.pos
          n += 1
        }
        if (pending == null && n > 0 && !it.hasNext) pending = flush()
      }

      override def hasNext: Boolean = { advance(); pending != null }
      override def next(): PostingBlock = {
        advance()
        val r = pending; pending = null; r
      }
    }
}
