package graft.search

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths:
  *  - [[bruteTopK]] — exact cosine top-k as a declarative plan (the oracle
  *    and the small-N baseline). One scan, map-side partial top-k via
  *    TakeOrderedAndProject, no shuffle of the embedding column.
  *  - [[lshTopK]] — random-hyperplane LSH: deterministic seeded projections
  *    → sign-bit signature → banded bucket keys → candidate union → exact
  *    re-rank of candidates only. The scale path: at 10^9+ vectors the
  *    bucket join prunes the candidate set by orders of magnitude, and the
  *    signature build is a single narrow map (broadcast hyperplanes).
  */
object Ann {

  final case class Vec(id: Long, v: Array[Float])
  final case class Scored(id: Long, cos: Double)

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
      i += 1
    }
    dot / math.sqrt(na * nb)
  }

  /** Exact cosine top-k, ties broken by id ascending. */
  def bruteTopK(vecs: Dataset[Vec], query: Array[Float], k: Int): Array[Scored] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bq = spark.sparkContext.broadcast(query)
    vecs.map(x => Scored(x.id, cosine(x.v, bq.value)))
      .orderBy(desc("cos"), asc("id"))
      .limit(k)
      .collect()
  }

  /** Deterministic random hyperplanes: `planes` rows × `dim` cols, seeded. */
  def hyperplanes(dim: Int, planes: Int, seed: Long): Array[Array[Float]] = {
    val rng = new java.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rng.nextGaussian().toFloat))
  }

  /** Sign-bit signature of `v` against the hyperplanes. */
  def signature(v: Array[Float], hp: Array[Array[Float]]): Array[Boolean] =
    hp.map { plane =>
      var dot = 0.0
      var i = 0
      while (i < v.length) { dot += v(i).toDouble * plane(i); i += 1 }
      dot >= 0.0
    }

  /** Banded bucket keys: `bands` keys per vector, each hashing
    * `planes/bands` consecutive signature bits. A candidate shares ≥1 key
    * with the query. */
  def bucketKeys(sig: Array[Boolean], bands: Int): Array[Long] = {
    val rows = sig.length / bands
    Array.tabulate(bands) { b =>
      var key = b.toLong << 56
      var i = 0
      while (i < rows) {
        key = (key << 1) | (if (sig(b * rows + i)) 1L else 0L)
        i += 1
      }
      key
    }
  }

  /** LSH-bucketed ANN: candidates = vectors sharing ≥1 band key with the
    * query; exact cosine re-rank of candidates. Recall depends on
    * (planes, bands); the LSH parameters are part of the result contract. */
  def lshTopK(
      vecs: Dataset[Vec],
      query: Array[Float],
      k: Int,
      planes: Int = 16,
      bands: Int = 4,
      seed: Long = 42L): Array[Scored] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val hp = hyperplanes(query.length, planes, seed)
    val bhp = spark.sparkContext.broadcast(hp)
    val bq = spark.sparkContext.broadcast(query)
    val qKeys = bucketKeys(signature(query, hp), bands).toSet
    val bqKeys = spark.sparkContext.broadcast(qKeys)
    vecs
      .filter { x =>
        val keys = bucketKeys(signature(x.v, bhp.value), bands)
        var i = 0
        var hit = false
        while (i < keys.length && !hit) { hit = bqKeys.value.contains(keys(i)); i += 1 }
        hit
      }
      .map(x => Scored(x.id, cosine(x.v, bq.value)))
      .orderBy(desc("cos"), asc("id"))
      .limit(k)
      .collect()
  }

  /** DataFrame adapter for the driver tables: (vec_id: long, embedding:
    * array<float>). */
  def fromDf(df: DataFrame): Dataset[Vec] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].map { case (id, v) => Vec(id, v) }
  }
}
