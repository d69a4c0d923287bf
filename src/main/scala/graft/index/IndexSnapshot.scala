package graft.index

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ES `_snapshot` / `_restore` analogue: copy a published index (single or
  * segmented) into a filesystem repository and bring it back with an
  * integrity re-verification before publish.
  *
  * This is the ES "fs"-repository form (the reference provisions its
  * loading cluster with disk snapshots —
  * `gcloud_dataproc/create_es_loading_nodes.py:113`); with an Iceberg
  * [[TableIO]] in production the snapshot is instead a catalog operation
  * (pin the table snapshot ids in the manifest — no file copying at all),
  * which is why the repository manifest records logical identity
  * (configHash + lineage + counts), not file inventories.
  *
  * Restore is staged: copy into `target + ".restore-staging"`, re-verify
  * the restored docs relations against the manifest (row count + the
  * order-independent sha256-xor lineage — the same invariant the builder
  * enforces against the source corpus), then [[Json.atomicMove]] into
  * place — a failed or corrupt restore never destroys a live index. */
object IndexSnapshot {

  /** Repository manifest of one snapshot (`<repo>/<name>/snapshot.json`). */
  final case class SnapshotInfo(
      name: String,
      segmented: Boolean,
      configHash: String,
      numDocs: Long,
      lineage: Long,
      numFiles: Long,
      numBytes: Long)

  private def copyTree(from: Path, to: Path): (Long, Long) = {
    var files = 0L
    var bytes = 0L
    val stream = Files.walk(from)
    try {
      stream.forEach { p =>
        val rel = from.relativize(p)
        val dst = to.resolve(rel)
        if (Files.isDirectory(p)) Files.createDirectories(dst)
        else {
          Files.createDirectories(dst.getParent)
          Files.copy(p, dst)
          files += 1
          bytes += Files.size(p)
        }
      }
    } finally stream.close()
    (files, bytes)
  }

  /** (segmented?, configHash, numDocs, lineage) of a live index tree. */
  private def identity(dir: String): (Boolean, String, Long, Long) =
    if (Json.exists(s"$dir/segments.json")) {
      val m = Json.read(s"$dir/segments.json", classOf[SegmentsManifest])
      val metas = m.segments.map(e =>
        Json.read(s"$dir/${e.name}/meta.json", classOf[IndexMeta]))
      (true, m.configHash, metas.map(_.numDocs).sum,
        metas.map(_.lineage).foldLeft(0L)(_ ^ _))
    } else {
      val m = Json.read(s"$dir/meta.json", classOf[IndexMeta])
      (false, m.configHash, m.numDocs, m.lineage)
    }

  /** Copy the published index at `indexDir` into `repoDir/name`. Fails if
    * the snapshot name already exists (snapshots are immutable — ES rule).
    * The tree is copied FILE-BY-FILE from the published (immutable) layout;
    * the manifest is written LAST, so a half-taken snapshot is never
    * listable and [[restore]] refuses it. */
  def snapshot(indexDir: String, repoDir: String, name: String): SnapshotInfo = {
    require(name.nonEmpty && !name.contains('/'), s"bad snapshot name '$name'")
    val dst = Paths.get(repoDir, name)
    require(!Files.exists(dst), s"snapshot '$name' already exists in $repoDir (immutable)")
    val (segmented, cfgHash, numDocs, lineage) = identity(indexDir)
    val (files, bytes) = copyTree(Paths.get(indexDir), dst.resolve("data"))
    val info = SnapshotInfo(name, segmented, cfgHash, numDocs, lineage, files, bytes)
    Json.write(dst.resolve("snapshot.json").toString, info)
    info
  }

  /** All completed snapshots in the repository (ES `GET _snapshot/repo/_all`). */
  def list(repoDir: String): Seq[SnapshotInfo] = {
    val p = Paths.get(repoDir)
    if (!Files.isDirectory(p)) return Nil
    val stream = Files.list(p)
    try {
      val names = new scala.collection.mutable.ArrayBuffer[String]
      stream.forEach(d => if (Files.exists(d.resolve("snapshot.json")))
        names += d.getFileName.toString)
      names.sorted.toSeq.map(n => Json.read(s"$repoDir/$n/snapshot.json", classOf[SnapshotInfo]))
    } finally stream.close()
  }

  /** Restore `repoDir/name` at `targetDir`: staged copy → integrity
    * re-verification (docs row count and sha256-xor lineage recomputed FROM
    * THE RESTORED FILES must equal the manifest) → atomic publish over
    * whatever lives at `targetDir`. Throws and leaves the live target
    * untouched on any mismatch. */
  def restore(spark: SparkSession, repoDir: String, name: String,
      targetDir: String): SnapshotInfo = {
    val src = Paths.get(repoDir, name)
    require(Files.exists(src.resolve("snapshot.json")),
      s"no completed snapshot '$name' in $repoDir")
    val info = Json.read(src.resolve("snapshot.json").toString, classOf[SnapshotInfo])
    val staging = targetDir + ".restore-staging"
    Json.deleteRecursively(staging)
    copyTree(src.resolve("data"), Paths.get(staging))
    // verify the restored bytes, not the repository's word for them; ANY
    // verification failure (metadata mismatch, lineage mismatch, unreadable
    // parquet) removes the staging tree before rethrowing — a failed restore
    // leaves neither the live target touched nor an orphaned staging dir
    try {
      val (seg, cfgHash, numDocs, lineage) = identity(staging)
      require(seg == info.segmented && cfgHash == info.configHash,
        s"restored metadata differs from snapshot manifest ($name)")
      val docDirs =
        if (seg) Json.read(s"$staging/segments.json", classOf[SegmentsManifest])
          .segments.map(e => s"$staging/${e.name}/docs")
        else Seq(s"$staging/docs")
      val (gotDocs, gotLineage) = docDirs.map { d =>
        val r = spark.read.parquet(d)
          .agg(count(lit(1)), coalesce(expr("bit_xor(xxhash64(sha256))"), lit(0L)))
          .head()
        (r.getLong(0), r.getLong(1))
      }.foldLeft((0L, 0L)) { case ((n, l), (n2, l2)) => (n + n2, l ^ l2) }
      if (gotDocs != info.numDocs || gotLineage != info.lineage)
        throw new IllegalStateException(
          s"snapshot '$name' failed verification: docs $gotDocs/${info.numDocs}, " +
            s"lineage ${gotLineage.toHexString}/${info.lineage.toHexString}")
      require(numDocs == info.numDocs && lineage == info.lineage,
        s"snapshot '$name' manifest/meta mismatch")
    } catch {
      case e: Throwable => Json.deleteRecursively(staging); throw e
    }
    Json.atomicMove(staging, targetDir)
    info
  }
}
