package graft.index

/** ES-safe field-name encoding: arbitrary strings → names that are legal as
  * index field names, with a lossless inverse.
  *
  * Re-expresses the reference's `encode_field_name` /`_decode_field_name`
  * pair (`hail_scripts/elasticsearch/elasticsearch_utils.py:123-147`, decode
  * in `elasticsearch_utils_tests.py:5-29`): special characters map to
  * human-readable `_$name$_` tags, the escape char `$` doubles itself, and a
  * bad leading char (`_ - + $`) is shielded by one prepended `$` which the
  * decoder strips. Round-trip identity over adversarial inputs is pinned by
  * both the reference's curated list and a ScalaCheck property.
  */
object FieldNames {

  val EscapeChar = '$'
  val BadLeading: Set[Char] = Set('_', '-', '+', EscapeChar)
  /** Ordered like the reference map; decode scans in this order after the
    * doubled-escape check. */
  val SpecialCharMap: Seq[(Char, String)] = Seq(
    '.' -> "_$dot$_",
    ',' -> "_$comma$_",
    '#' -> "_$hash$_",
    '*' -> "_$star$_",
    '(' -> "_$lp$_",
    ')' -> "_$rp$_",
    '[' -> "_$lsb$_",
    ']' -> "_$rsb$_",
    '{' -> "_$lcb$_",
    '}' -> "_$rcb$_")
  private val byChar: Map[Char, String] = SpecialCharMap.toMap

  def encode(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    s.foreach { c =>
      if (c == EscapeChar) sb.append("$$")
      else byChar.get(c) match {
        case Some(enc) => sb.append(enc)
        case None => sb.append(c)
      }
    }
    val out = sb.toString
    if (out.nonEmpty && BadLeading.contains(out.head)) s"$EscapeChar$out" else out
  }

  def decode(fieldName: String): String = {
    val f =
      if (fieldName.startsWith(EscapeChar.toString)) fieldName.substring(1)
      else fieldName
    val sb = new StringBuilder(f.length)
    var i = 0
    while (i < f.length) {
      if (f.startsWith("$$", i)) { sb.append(EscapeChar); i += 2 }
      else {
        SpecialCharMap.find { case (_, enc) => f.startsWith(enc, i) } match {
          case Some((orig, enc)) => sb.append(orig); i += enc.length
          case None => sb.append(f.charAt(i)); i += 1
        }
      }
    }
    sb.toString
  }
}

/** Shard-count auto-derivation — the reference's `_mt_num_shards`
  * (`luigi_pipeline/lib/hail_tasks.py:274-278`): shards =
  * `max(user_min, ceil(rows*cols / 1.4e9))` matrix cells per shard. For the
  * engine, "cells" = docs × avg tokens per doc (the posting volume proxy),
  * and the derived shard count fixes `docsPerShard`. */
object Sizing {

  val CellsPerShard: Double = 1.4e9

  def numShards(
      rows: Long,
      cols: Long,
      minShards: Int = 1,
      cellsPerShard: Double = CellsPerShard): Int =
    math.max(minShards, math.ceil(rows.toDouble * cols.toDouble / cellsPerShard).toInt)

  /** Derive `docsPerShard` for a corpus from its doc count and average
    * token length, instead of static config. */
  def configFor(
      numDocs: Long,
      avgTokens: Double,
      base: IndexConfig = IndexConfig(),
      minShards: Int = 1,
      cellsPerShard: Double = CellsPerShard): IndexConfig = {
    val shards = numShards(numDocs, math.max(1L, math.round(avgTokens)), minShards, cellsPerShard)
    base.copy(docsPerShard = math.max(1L, (numDocs + shards - 1) / shards))
  }
}
