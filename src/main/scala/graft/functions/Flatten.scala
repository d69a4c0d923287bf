package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Recursive struct flattening: `{a:{b:1}} → column "a.b"` — export-shape
  * parity with the reference's `elasticsearch_row` flatten step
  * (`luigi_pipeline/lib/model/seqr_mt_schema.py:366-389`). */
object Flatten {

  /** Columns that select every leaf field, named `parent.child` (dot-joined,
    * like the reference's flattened ES field names). */
  def flatColumns(schema: StructType, prefix: String = ""): Seq[Column] =
    schema.fields.toSeq.flatMap { f =>
      val name = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
      f.dataType match {
        case st: StructType => flatColumns(st, name)
        case _ =>
          val path = name.split('.').map(p => s"`$p`").mkString(".")
          Seq(col(path).as(name))
      }
    }

  def apply(df: DataFrame): DataFrame = df.select(flatColumns(df.schema): _*)
}
