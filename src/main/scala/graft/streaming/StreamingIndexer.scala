package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.index.{IndexBuilder, IndexConfig, IndexMerger, Json}
import graft.sources.CorpusIO

/** Incremental index ingest via Structured Streaming.
  *
  * The reference is a batch Luigi DAG with no streaming operators
  * (SURVEY.md §2.8); its incremental behaviors are marker-gated idempotent
  * re-runs and docId-keyed upserts. This is the Spark-native composition of
  * those semantics: a file-source stream over the corpus directory,
  * `Trigger.AvailableNow` (process everything present, then stop — the
  * Luigi-task-per-invocation analogue), and `foreachBatch` building a DELTA
  * index per micro-batch and merging it onto the published index through
  * [[IndexMerger]] (upsert semantics — newer batch wins a document
  * identity). The stream checkpoint gives exactly-once file processing
  * across invocations: re-running after new files arrive indexes only the
  * new files, and the result is logically identical to a fresh build over
  * everything (tested).
  */
class StreamingIndexer(
    spark: SparkSession,
    indexDir: String,
    cfg: IndexConfig = IndexConfig()) {

  /** One ingest pass: index all unprocessed files under `sourceDir`, then
    * stop. Call again after more files land — the checkpoint skips
    * everything already indexed. */
  def ingestAvailable(sourceDir: String, checkpointDir: String): StreamingQuery = {
    val stream = spark.readStream
      .schema(CorpusIO.CorpusSchema)
      .parquet(sourceDir)

    stream.writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        ingestBatch(batch, batchId)
      }
      .start()
  }

  /** Build a delta segment from `batch` and publish: first batch becomes
    * the index; later batches merge onto it (build-then-publish — readers
    * only ever see a complete index). */
  private[streaming] def ingestBatch(batch: DataFrame, batchId: Long): Unit = {
    if (batch.isEmpty) return
    val builder = new IndexBuilder(spark, cfg)
    if (!Json.exists(s"$indexDir/meta.json")) {
      builder.build(batch, indexDir, resume = false)
    } else {
      val deltaDir = s"$indexDir.delta-$batchId"
      builder.build(batch, deltaDir, resume = false)
      val nextDir = s"$indexDir.next-$batchId"
      IndexMerger.merge(spark, indexDir, deltaDir, nextDir, cfg)
      Json.deleteRecursively(indexDir)
      Json.atomicMove(nextDir, indexDir)
      Json.deleteRecursively(deltaDir)
    }
  }
}
