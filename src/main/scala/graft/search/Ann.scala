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

  def cosine(a: Array[Float], b: Array[Float]): Double = {
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

  /** Deterministic seeded k-means coarse-quantizer trainer (cosine
    * assignment, mean update): k-means++ init over a bounded driver-side
    * sample, then `iters` distributed Lloyd iterations — each iteration is
    * ONE narrow pass over the vectors (broadcast centroids) plus a
    * k×dim-double reduction to the driver, so training cost is O(iters ×
    * scan) regardless of vector count. Empty cells keep their previous
    * centroid. */
  def kmeans(
      vecs: Dataset[Vec],
      k: Int,
      iters: Int = 5,
      seed: Long = 42L,
      initSample: Int = 4096): Array[Array[Float]] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val sample = vecs.orderBy("id").limit(initSample).collect()
    require(sample.length >= k, s"need at least $k vectors to train $k centroids")
    val rng = new java.util.Random(seed)
    // k-means++ over the sample (driver-side, O(sample·k))
    val centers = scala.collection.mutable.ArrayBuffer[Array[Float]]()
    centers += sample(rng.nextInt(sample.length)).v
    while (centers.length < k) {
      val d2 = sample.map(s => math.max(1e-12, centers.map(c => 1.0 - cosine(s.v, c)).min))
      var r = rng.nextDouble() * d2.sum
      var i = 0
      while (i < d2.length - 1 && r > d2(i)) { r -= d2(i); i += 1 }
      centers += sample(i).v
    }
    var cents = centers.toArray
    val dim = cents(0).length
    for (_ <- 1 to iters) {
      val bc = spark.sparkContext.broadcast(cents)
      val agg = vecs.mapPartitions { it =>
        val cs = bc.value
        val sums = Array.fill(cs.length)(new Array[Double](dim))
        val cnts = new Array[Long](cs.length)
        it.foreach { x =>
          var best = 0; var bestCos = -2.0
          var c = 0
          while (c < cs.length) {
            val s = cosine(x.v, cs(c))
            if (s > bestCos) { bestCos = s; best = c }
            c += 1
          }
          val acc = sums(best)
          var j = 0
          while (j < dim) { acc(j) += x.v(j); j += 1 }
          cnts(best) += 1
        }
        Iterator.range(0, cs.length).map(c => (c, sums(c), cnts(c)))
      }
        .groupByKey(_._1)
        .mapGroups { (c, it) =>
          val sum = new Array[Double](dim)
          var n = 0L
          it.foreach { t =>
            var j = 0
            while (j < dim) { sum(j) += t._2(j); j += 1 }
            n += t._3
          }
          (c, sum, n)
        }
        .collect()
      val next = cents.clone()
      agg.foreach { case (c, sum, n) =>
        if (n > 0) next(c) = sum.map(x => (x / n).toFloat)
      }
      cents = next
      bc.destroy()
    }
    cents
  }

  /** IVF-flat ANN: assign every vector to its nearest (cosine) broadcast
    * centroid, probe the query's `nprobe` nearest cells, exact re-rank
    * inside the probed cells only — the trained-quantizer scale path next
    * to [[lshTopK]]. */
  def ivfTopK(
      vecs: Dataset[Vec],
      query: Array[Float],
      k: Int,
      centroids: Array[Array[Float]],
      nprobe: Int = 2): Array[Scored] = {
    val spark = vecs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    val bq = spark.sparkContext.broadcast(query)
    val probe: Set[Int] = centroids.indices
      .sortBy(c => (-cosine(query, centroids(c)), c)).take(nprobe).toSet
    val bprobe = spark.sparkContext.broadcast(probe)
    vecs
      .filter { x =>
        val cs = bc.value
        var best = 0; var bestCos = -2.0
        var c = 0
        while (c < cs.length) {
          val s = cosine(x.v, cs(c))
          if (s > bestCos) { bestCos = s; best = c }
          c += 1
        }
        bprobe.value.contains(best)
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
