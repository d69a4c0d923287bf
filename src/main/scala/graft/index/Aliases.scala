package graft.index

/** ES index aliases: a named, atomically-swappable pointer from a stable
  * serving name to a concrete index directory.
  *
  * This is the serving half of the reference's build-then-publish contract:
  * every load writes to a FRESH index name and the readers' stable name is
  * re-pointed only once the load is complete and validated
  * (`hail_scripts/elasticsearch/elasticsearch_client_v7.py:107-147` —
  * `route_index_to_temp_es_cluster` / `route_index_off_temp_es_cluster` flip
  * routing the same way, and seqr itself reads each dataset through an alias
  * so a reload never breaks a live dashboard).
  *
  * The alias store is ONE JSON file updated write-then-rename ([[Json.write]]),
  * so a concurrent reader observes either the old or the new mapping, never a
  * torn one; a crash mid-update leaves the old file intact. On an object
  * store the same contract is a conditional-put of the pointer object (or an
  * Iceberg catalog `replaceTable` swap); the local file is the sandbox
  * stand-in, exactly like the index manifests. Single writer assumed (the
  * publishing driver), as with every other manifest in this engine.
  */
object Aliases {

  /** Jackson-friendly wrapper (a bare Map round-trips fine, but a named
    * shape keeps the file self-describing next to the other manifests). */
  private[index] case class AliasStore(aliases: Map[String, String])

  private def storePath(baseDir: String) = s"$baseDir/aliases.json"

  /** All aliases under `baseDir` (empty if the store doesn't exist yet). */
  def all(baseDir: String): Map[String, String] =
    if (!Json.exists(storePath(baseDir))) Map.empty
    else Json.read(storePath(baseDir), classOf[AliasStore]).aliases

  /** The index directory `alias` points at, if defined. */
  def resolve(baseDir: String, alias: String): Option[String] =
    all(baseDir).get(alias)

  /** Point `alias` at `indexDir` — creating or atomically re-pointing it.
    * The target must be a COMPLETE published index (meta.json present):
    * an alias can never dangle into a half-built staging dir. This is the
    * publish flip: build into a fresh dir, then `set` — readers that
    * re-resolve see the new index, the old one stays intact for rollback
    * until explicitly deleted. */
  def set(baseDir: String, alias: String, indexDir: String): Unit = {
    require(alias.nonEmpty && !alias.contains("/"), s"bad alias name '$alias'")
    require(Json.exists(s"$indexDir/meta.json") || Json.exists(s"$indexDir/segments.json"),
      s"'$indexDir' is not a published index (no meta.json/segments.json) — " +
        "aliases may only point at complete indexes")
    Json.write(storePath(baseDir), AliasStore(all(baseDir) + (alias -> indexDir)))
  }

  /** Drop `alias` (the index itself is untouched). No-op if absent. */
  def remove(baseDir: String, alias: String): Unit = {
    val cur = all(baseDir)
    if (cur.contains(alias))
      Json.write(storePath(baseDir), AliasStore(cur - alias))
  }

  /** Resolve `alias` and fail loudly if undefined — the read-path helper
    * (`new Searcher(spark, Aliases.resolveOrFail(dir, "prod"))`). */
  def resolveOrFail(baseDir: String, alias: String): String =
    resolve(baseDir, alias).getOrElse(throw new IllegalArgumentException(
      s"alias '$alias' is not defined under $baseDir " +
        s"(have: ${all(baseDir).keys.toSeq.sorted.mkString(", ")})"))
}
