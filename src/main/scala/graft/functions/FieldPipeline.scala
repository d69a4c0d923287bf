package graft.functions

import org.apache.spark.sql.{Column, DataFrame}

/** Dependency-resolved derived-field pipeline — the Spark re-expression of
  * the reference's `@row_annotation` scheduler
  * (`luigi_pipeline/lib/model/base_mt_schema.py:17-78` decorator,
  * `:137-200` round scheduler; semantics tested by the reference at
  * `luigi_pipeline/tests/model/test_base_model.py:33-106`):
  *
  *  - each field declares the fields it requires (`fn_require` analogue);
  *  - fields are computed in topological ROUNDS — all fields whose deps are
  *    satisfied compute in one `withColumns` projection per round (the
  *    reference folds one `annotate_rows` per round);
  *  - at-most-once: a field already present on the input is skipped unless
  *    `overwrite` is set;
  *  - a field may OMIT itself (return None — the `RowAnnotationOmit`
  *    analogue); dependents of an omitted field are omitted transitively;
  *  - unsatisfiable dependencies (missing or cyclic) raise, naming the
  *    offenders — matching the reference's hard error.
  */
object FieldPipeline {

  /** `fn` sees the DataFrame with all dependency columns present; returning
    * None omits the field (and transitively its dependents). */
  final case class FieldDef(
      name: String,
      deps: Seq[String] = Nil,
      fn: DataFrame => Option[Column])

  final class UnsatisfiableDeps(missing: Map[String, Seq[String]])
    extends IllegalArgumentException(
      s"unsatisfiable field dependencies: " +
        missing.map { case (f, d) => s"$f requires ${d.mkString(",")}" }.mkString("; "))

  /** Apply `fields` to `df` in dependency rounds. Returns the annotated
    * DataFrame. */
  def annotateAll(df: DataFrame, fields: Seq[FieldDef], overwrite: Boolean = false): DataFrame = {
    val existing = scala.collection.mutable.Set[String](df.columns.toSeq: _*)
    val omitted = scala.collection.mutable.Set[String]()
    // at-most-once: fields already present are satisfied, not recomputed
    var pending = fields.filter(f => overwrite || !existing.contains(f.name))
    var out = df

    while (pending.nonEmpty) {
      val (ready, blocked) = pending.partition(_.deps.forall(existing.contains))
      // dependents of omitted fields can never run — drop them as omitted
      val (dead, stillBlocked) =
        blocked.partition(f => f.deps.exists(omitted.contains))
      dead.foreach(f => omitted += f.name)
      if (ready.isEmpty && dead.isEmpty)
        throw new UnsatisfiableDeps(
          stillBlocked.map(f => f.name -> f.deps.filterNot(existing.contains)).toMap)
      val computed: Seq[(String, Column)] = ready.flatMap { f =>
        f.fn(out) match {
          case Some(c) => Some(f.name -> c)
          case None => omitted += f.name; None
        }
      }
      if (computed.nonEmpty) {
        out = out.withColumns(computed.toMap)
        computed.foreach { case (n, _) => existing += n }
      }
      pending = stillBlocked
    }
    out
  }
}
