package graft

import org.apache.spark.sql.SparkSession

import graft.index.{FieldConfig, IndexBuilder, IndexConfig, IndexMerger, SegmentedIndex, Sizing}
import graft.search.{MultiSearcher, Searcher}
import graft.sources.CorpusIO
import graft.streaming.StreamingIndexer

/** spark-submit entry point — the deployment surface of the north rule
  * (`spark-submit --class graft.Main <jar> <command> ...` on a real
  * cluster; the session builder inherits master/executors from submit).
  *
  * Commands:
  *   build  <corpusPath> <indexDir> [--format parquet|iceberg] [--positions]
  *          [--partitions N] [--docs-per-shard N] [--auto-shards] [--no-resume]
  *   search <indexDir> <k> <query...>          (single index or segmented)
  *   ingest <corpusPath> <indexDir> <checkpointDir> [--format ...]
  *          (AvailableNow streaming pass over new files → segmented index)
  *   merge  <dirA> <dirB> <outDir>
  *   delete <indexDir> <keysPath>   (parquet/csv of repo,path,commit —
  *          physical purge; segmented indexes rewrite only owning segments)
  *   alias  <baseDir> set <name> <indexDir> | get <name> | rm <name> | ls
  *          (atomically-swappable serving pointer — build a fresh index,
  *          then `alias set` flips readers to it; ES alias publish flow)
  *   gen    <outPath> <files> [--seed N] [--partitions N]
  *          (deterministic synthetic corpus — bench/demo input)
  *
  * The reference's CLI analogue is the Luigi task surface
  * (`luigi_pipeline/seqr_loading.py:318-321`).
  */
object Main {

  private def flag(args: Seq[String], name: String): Boolean = args.contains(name)
  private def opt(args: Seq[String], name: String): Option[String] = {
    val i = args.indexOf(name)
    if (i >= 0 && i + 1 < args.length) Some(args(i + 1)) else None
  }

  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: build|search|ingest|merge|delete|alias ..."); sys.exit(2)
    }
    val builder = SparkSession.builder()
      .appName(s"graft-${args(0)}")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
    // under spark-submit the master comes from the submit conf; running the
    // class directly (sbt runMain) falls back to local
    val spark = (if (sys.props.contains("spark.master")) builder
      else builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.datasources.DataSource",
      org.apache.logging.log4j.Level.ERROR)
    try run(spark, args.toIndexedSeq) finally spark.stop()
  }

  private def cfgFrom(rest: Seq[String]): IndexConfig = IndexConfig(
    buildPartitions = opt(rest, "--partitions").map(_.toInt).getOrElse(32),
    docsPerShard = opt(rest, "--docs-per-shard").map(_.toLong).getOrElse(1L << 16),
    storePositions = flag(rest, "--positions"),
    // `--meta k=v,k2=v2` — stamped into IndexMeta.userMeta (the reference's
    // `_meta` globals export, e.g. dataset provenance / genome version)
    userMeta = opt(rest, "--meta").map(_.split(",").map { kv =>
      val Array(k, v) = kv.split("=", 2); k -> v
    }.toMap).getOrElse(Map.empty))

  private def run(spark: SparkSession, args: Seq[String]): Unit = args(0) match {
    case "gen" =>
      val Seq(outPath, nS) = args.slice(1, 3)
      val rest = args.drop(3)
      graft.corpus.CorpusGen.generate(spark, nS.toLong,
        seed = opt(rest, "--seed").map(_.toLong).getOrElse(42L),
        partitions = opt(rest, "--partitions").map(_.toInt).getOrElse(32),
        tokensScale = 2)
        .toDF().write.mode("overwrite").parquet(outPath)
      println(s"generated $nS files at $outPath")

    case "build" =>
      val Seq(corpusPath, indexDir) = args.slice(1, 3)
      val rest = args.drop(3)
      val format = opt(rest, "--format").getOrElse("parquet")
      val corpus = CorpusIO.readCorpus(spark, corpusPath, format)
      var cfg = cfgFrom(rest).copy(fields = FieldConfig.derive(corpus.schema))
      if (flag(rest, "--auto-shards")) {
        // one cheap pass over (content length) to size shards like the
        // reference's rows*cols rule — avgTokens ≈ chars/6 heuristic
        import org.apache.spark.sql.functions._
        val row = corpus.agg(count(lit(1)).as("n"), avg(length(col("content"))).as("ac")).head()
        cfg = Sizing.configFor(row.getAs[Long]("n"), row.getAs[Double]("ac") / 6.0, cfg)
      }
      val meta = new IndexBuilder(spark, cfg)
        .build(corpus, indexDir, resume = !flag(rest, "--no-resume"))
      println(s"built $indexDir: docs=${meta.numDocs} terms=${meta.numTerms} " +
        s"postings=${meta.numPostings} lineage=${java.lang.Long.toHexString(meta.lineage)}")

    case "search" =>
      val indexDir = args(1)
      val k = args(2).toInt
      val query = args.drop(3).mkString(" ")
      if (graft.index.Json.exists(s"$indexDir/segments.json")) {
        new MultiSearcher(spark, indexDir).search(query, k)
          .foreach(h => println(f"${h.score}%.6f  ${h.repo}/${h.path}@${h.commit.take(8)}"))
      } else {
        val s = new Searcher(spark, indexDir)
        val docs = spark.read.parquet(s"$indexDir/docs")
        import org.apache.spark.sql.functions._
        val hits = s.search(query, k)
        val byId = docs.filter(col("docId").isin(hits.map(h => Long.box(h.docId)).toSeq: _*))
          .select("docId", "repo", "path", "commit").collect()
          .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2), r.getString(3)))).toMap
        hits.foreach { h =>
          val (r, p, c) = byId(h.docId)
          println(f"${h.score}%.6f  $r/$p@${c.take(8)}")
        }
      }

    case "ingest" =>
      val Seq(corpusPath, indexDir, ckpt) = args.slice(1, 4)
      val cfg = cfgFrom(args.drop(4))
      new StreamingIndexer(spark, indexDir, cfg).ingestAvailable(corpusPath, ckpt)
        .awaitTermination()
      val m = new SegmentedIndex(spark, indexDir, cfg).manifest.get
      println(s"ingested → ${m.segments.length} segments, " +
        s"${m.segments.map(_.numDocs).sum} docs (lastBatchId=${m.lastBatchId})")

    case "merge" =>
      val Seq(a, b, out) = args.slice(1, 4)
      val meta = IndexMerger.merge(spark, a, b, out, cfgFrom(args.drop(4)))
      println(s"merged → $out: docs=${meta.numDocs} postings=${meta.numPostings}")

    case "delete" =>
      val Seq(indexDir, keysPath) = args.slice(1, 3)
      val cfg = cfgFrom(args.drop(3))
      val keys = (if (keysPath.endsWith(".csv"))
        spark.read.option("header", "true").csv(keysPath)
      else spark.read.parquet(keysPath))
        .select("repo", "path", "commit")
      if (graft.index.Json.exists(s"$indexDir/segments.json")) {
        new SegmentedIndex(spark, indexDir, cfg).delete(keys)
        val m = new SegmentedIndex(spark, indexDir, cfg).manifest.get
        println(s"deleted → ${m.segments.length} segments, " +
          s"${m.segments.map(_.numDocs).sum} docs remain")
      } else {
        val changed = graft.index.IndexMaintenance.deleteDocs(spark, indexDir, keys, cfg)
        val m = graft.index.Json.read(s"$indexDir/meta.json", classOf[graft.index.IndexMeta])
        println(s"deleted (changed=$changed) → docs=${m.numDocs} postings=${m.numPostings}")
      }

    case "alias" =>
      val base = args(1)
      args(2) match {
        case "set" =>
          graft.index.Aliases.set(base, args(3), args(4))
          println(s"${args(3)} -> ${args(4)}")
        case "get" => println(graft.index.Aliases.resolveOrFail(base, args(3)))
        case "rm" =>
          graft.index.Aliases.remove(base, args(3)); println(s"removed ${args(3)}")
        case "ls" =>
          graft.index.Aliases.all(base).toSeq.sortBy(_._1)
            .foreach { case (a, d) => println(s"$a -> $d") }
        case sub =>
          System.err.println(s"unknown alias subcommand: $sub (set|get|rm|ls)"); sys.exit(2)
      }

    case other =>
      System.err.println(s"unknown command: $other"); sys.exit(2)
  }
}
