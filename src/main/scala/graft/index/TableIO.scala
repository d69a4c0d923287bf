package graft.index

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Format-pluggable storage layer for every index relation (docs, terms,
  * posting blocks and the build intermediates) — the `TableIO` seam
  * promised in SURVEY.md §7, now covering the index side, not just the
  * corpus source ([[graft.sources.CorpusIO]]).
  *
  * An "address" is the index's logical path for a relation
  * (`<root>/docs`, `<root>/blocks`, …). How an address maps to storage is
  * the implementation's business:
  *
  *  - [[ParquetDirIO]] (sandbox default): address = directory of Parquet
  *    files; atomic publish = the rename-aside directory swap
  *    ([[Json.atomicMove]]). Byte-identical to the pre-seam layout.
  *  - [[CatalogTableIO]]: address = managed catalog table (Spark session
  *    catalog here; an Iceberg/Hive catalog in production). Publish is a
  *    CATALOG metadata operation (drop-and-rename ≈ Iceberg's
  *    `writeTo(...).createOrReplace()` snapshot commit) — no filesystem
  *    `rename` of data anywhere, which is the property an object store
  *    (S3/GCS) needs at 100 TB: the reference's staged-load-then-publish
  *    contract (`elasticsearch_client_v7.py:107-147`) without relying on
  *    directory-rename atomicity.
  *
  * JSON sidecars (stage manifests, `meta.json`, `segments.json`) remain
  * small files under the index root in both modes; an Iceberg production
  * deployment would fold them into table properties / snapshot metadata —
  * they are kilobyte-scale metadata, not data.
  */
trait TableIO extends Serializable {

  /** Overwrite the relation at `addr`. */
  def write(df: DataFrame, addr: String): Unit

  /** Overwrite the relation at `addr`, laid out partitioned by `partCol`
    * so [[readBucket]] prunes to one partition. */
  def writePartitioned(df: DataFrame, addr: String, partCol: String): Unit

  /** Overwrite ONE bucket slice of a bucketed relation (the per-bucket
    * resume unit of the block-pack stage). `df` carries no bucket column. */
  def writeBucket(df: DataFrame, addr: String, bucket: Int): Unit

  /** Read a relation (for a bucketed relation: all buckets). */
  def read(spark: SparkSession, addr: String): DataFrame

  /** Read a relation whose schema the caller already KNOWS (the builder
    * reading back its own stage outputs): implementations that must
    * otherwise infer the schema (parquet footer read — a driver-serial job
    * per read-back that Amdahl charges against the core budget) skip the
    * inference. Default: ignore the hint. */
  def read(spark: SparkSession, addr: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame = read(spark, addr)

  /** Read one bucket slice of a relation written with [[writePartitioned]];
    * None when that bucket has no data. The returned frame excludes the
    * partition column. */
  def readBucket(spark: SparkSession, addr: String, bucket: Int): Option[DataFrame]

  /** Atomically replace the relation at `toAddr` with the one at
    * `fromAddr` (single-relation publish, e.g. a docs-table patch). */
  def replace(spark: SparkSession, fromAddr: String, toAddr: String): Unit

  /** Drop every relation under `rootAddr` (and its on-disk sidecar files). */
  def dropTree(spark: SparkSession, rootAddr: String): Unit

  /** Publish a fully-staged index: move/rename every data relation under
    * `stagingRoot` to `finalRoot`, then swap the metadata tree. */
  def publishIndex(spark: SparkSession, stagingRoot: String, finalRoot: String): Unit

  /** Heal an interrupted [[publishIndex]]/[[replace]] at `finalRoot`. */
  def recover(spark: SparkSession, finalRoot: String): Unit
}

/** Parquet-directory storage: the sandbox/default implementation, identical
  * to the engine's original on-disk layout. */
object ParquetDirIO extends TableIO {

  def write(df: DataFrame, addr: String): Unit =
    df.write.mode("overwrite").parquet(addr)

  def writePartitioned(df: DataFrame, addr: String, partCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partCol).parquet(addr)

  def writeBucket(df: DataFrame, addr: String, bucket: Int): Unit =
    df.write.mode("overwrite").parquet(f"$addr/bucket=$bucket%04d")

  def read(spark: SparkSession, addr: String): DataFrame =
    spark.read.parquet(addr)

  override def read(spark: SparkSession, addr: String,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).parquet(addr)

  def readBucket(spark: SparkSession, addr: String, bucket: Int): Option[DataFrame] =
    if (Json.exists(s"$addr/bucket=$bucket")) Some(spark.read.parquet(s"$addr/bucket=$bucket"))
    else None

  def replace(spark: SparkSession, fromAddr: String, toAddr: String): Unit =
    Json.atomicMove(fromAddr, toAddr)

  def dropTree(spark: SparkSession, rootAddr: String): Unit =
    Json.deleteRecursively(rootAddr)

  def publishIndex(spark: SparkSession, stagingRoot: String, finalRoot: String): Unit =
    Json.atomicMove(stagingRoot, finalRoot) // data + sidecars share one tree

  def recover(spark: SparkSession, finalRoot: String): Unit =
    Json.recoverSwap(finalRoot)
}

/** Catalog-table storage: every address is a managed table in the session
  * catalog, named by sanitizing the address (so address-prefix operations
  * map to table-name-prefix operations). Publish/replace are catalog
  * metadata operations — no data files are renamed. With an Iceberg
  * catalog configured, the same calls land on Iceberg tables and the
  * replace becomes a snapshot swap; nothing in the engine changes. */
final class CatalogTableIO(prefix: String = "graft") extends TableIO {

  private def name(addr: String): String =
    prefix + "_" + addr.toLowerCase.replaceAll("[^a-z0-9]+", "_").dropWhile(_ == '_')

  private def bucketName(addr: String, bucket: Int): String = f"${name(addr)}__b$bucket%04d"

  private def tablesWithPrefix(spark: SparkSession, p: String): Seq[String] =
    spark.catalog.listTables().collect().map(_.name).filter(_.startsWith(p)).toSeq

  def write(df: DataFrame, addr: String): Unit =
    df.write.mode("overwrite").format("parquet").saveAsTable(name(addr))

  def writePartitioned(df: DataFrame, addr: String, partCol: String): Unit =
    df.write.mode("overwrite").format("parquet").partitionBy(partCol).saveAsTable(name(addr))

  def writeBucket(df: DataFrame, addr: String, bucket: Int): Unit =
    df.write.mode("overwrite").format("parquet").saveAsTable(bucketName(addr, bucket))

  def read(spark: SparkSession, addr: String): DataFrame =
    if (spark.catalog.tableExists(name(addr))) spark.table(name(addr))
    else {
      // bucketed relation written via writeBucket: union the bucket tables
      val buckets = tablesWithPrefix(spark, name(addr) + "__b").sorted
      require(buckets.nonEmpty, s"no catalog table(s) for $addr (${name(addr)})")
      buckets.map(spark.table).reduce(_ unionByName _)
    }

  def readBucket(spark: SparkSession, addr: String, bucket: Int): Option[DataFrame] =
    if (spark.catalog.tableExists(name(addr)))
      // partition-pruned slice of a partitioned table; the engine's bucket
      // columns are named `bucket` by convention
      Some(spark.table(name(addr)).filter(col("bucket") === bucket).drop("bucket"))
    else if (spark.catalog.tableExists(bucketName(addr, bucket)))
      Some(spark.table(bucketName(addr, bucket)))
    else None

  def replace(spark: SparkSession, fromAddr: String, toAddr: String): Unit = {
    // catalog-level swap (≈ Iceberg createOrReplace): drop the target
    // names, rename staged tables into place
    val (from, to) = (name(fromAddr), name(toAddr))
    def swap(f: String, t: String): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"ALTER TABLE $f RENAME TO $t")
    }
    tablesWithPrefix(spark, to + "__b").foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    if (spark.catalog.tableExists(from)) swap(from, to)
    tablesWithPrefix(spark, from + "__b")
      .foreach(f => swap(f, to + f.substring(from.length)))
  }

  def dropTree(spark: SparkSession, rootAddr: String): Unit = {
    // "_"-boundary keeps a sibling root like <root>2 out of the sweep;
    // relation names under a root are always name(root) + "_..."
    (tablesWithPrefix(spark, name(rootAddr) + "_") ++
      (if (spark.catalog.tableExists(name(rootAddr))) Seq(name(rootAddr)) else Nil))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    Json.deleteRecursively(rootAddr) // sidecar manifests live on disk
  }

  def publishIndex(spark: SparkSession, stagingRoot: String, finalRoot: String): Unit = {
    // per-relation catalog swaps for the data, then the (json-only) manifest
    // tree moves; data is never renamed on the filesystem
    val stagedPrefix = name(stagingRoot) + "_"
    val staged = tablesWithPrefix(spark, stagedPrefix)
    val finalPrefix = name(finalRoot) + "_"
    // drop stale target tables before renaming the staged set into place
    // (the staging prefix extends the final prefix — keep staged tables out)
    tablesWithPrefix(spark, finalPrefix)
      .filterNot(_.startsWith(stagedPrefix))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    staged.foreach { f =>
      val t = finalPrefix + f.substring(stagedPrefix.length)
      spark.sql(s"ALTER TABLE $f RENAME TO $t")
    }
    Json.atomicMove(stagingRoot, finalRoot)
  }

  def recover(spark: SparkSession, finalRoot: String): Unit =
    Json.recoverSwap(finalRoot)
}
