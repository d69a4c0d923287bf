package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Format-pluggable corpus IO (the `TableIO` seam promised in SURVEY.md §7:
  * Iceberg in production per the north rule, Parquet with the same layout in
  * this sandbox — no Iceberg runtime jar is installed here).
  *
  * Source-operator parity with the reference:
  *  - S1 (VCF import ≈ the corpus scan): [[readCorpus]]
  *  - S2 (typed TSV import, `hail_utils.py:9-32`): [[readTsv]]
  *  - S7 (native write + marker): the index builder's checkpointed writes
  *  - S12 (TSV export, `hail_tasks.py:130`): [[writeTsv]]
  */
object CorpusIO {

  /** The engine's input-table schema (BASELINE input_hint). */
  val CorpusSchema: StructType = StructType(Seq(
    StructField("repo", StringType, nullable = true),
    StructField("path", StringType, nullable = true),
    StructField("commit", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("content", StringType, nullable = true)))

  /** Read the corpus table. `format` = "iceberg" uses the Iceberg source
    * when its runtime is on the classpath (production); "parquet" is the
    * sandbox-identical layout. The returned plan is a plain scan — filters
    * and column pruning push down in both formats. */
  def readCorpus(spark: SparkSession, location: String, format: String = "parquet"): DataFrame =
    format match {
      case "parquet" => spark.read.schema(CorpusSchema).parquet(location)
      case "iceberg" => spark.read.format("iceberg").load(location)
      case other => throw new IllegalArgumentException(s"unsupported corpus format: $other")
    }

  /** Typed TSV import (reference S2: explicit types, no inference, header
    * handling — `hl.import_table(types=FIELD_TYPES)`). */
  def readTsv(
      spark: SparkSession,
      path: String,
      schema: StructType,
      header: Boolean = true,
      comment: String = "#"): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", header.toString)
      .option("comment", comment)
      .schema(schema)
      .csv(path)

  /** TSV export with header (reference S12). */
  def writeTsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("sep", "\t")
      .option("header", "true")
      .csv(path)

  /** Driver-side parse of a small keyed TSV into a Map for broadcasting —
    * the reference's S5 pattern (GTF → gene_name→gene_id dict, pickled and
    * shipped as a literal: `hail_scripts/utils/mapping_gene_ids.py:48-99`,
    * consumed via `hl.literal` at `seqr_sv_loading.py:48-51`). Pair with
    * `BroadcastAnnotate.byMap` / `sparkContext.broadcast` on the consumer
    * side. Collects — only for side tables that fit on the driver. */
  def readKeyValueMap(
      spark: SparkSession,
      path: String,
      keyCol: String,
      valueCol: String,
      header: Boolean = true): Map[String, String] = {
    val schema = StructType(Seq(
      StructField(keyCol, StringType), StructField(valueCol, StringType)))
    readTsv(spark, path, schema, header)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }
}
