package graft.search

/** BM25 scoring, Lucene/Elasticsearch-default parameterization.
  *
  * The reference delegates all scoring to Elasticsearch's default
  * similarity (BM25 with k1=1.2, b=0.75 — implied by the export at
  * `hail_scripts/elasticsearch/hail_elasticsearch_client.py:197-199` and the
  * ES 6.3.2 deployment at `gcloud_dataproc/create_es_loading_nodes.py:100-120`).
  * We reproduce the Lucene formulation:
  *
  *   idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
  *   tfn(t,d)= tf / (tf + k1 * (1 - b + b * dl/avgdl))
  *   score   = Σ_t idf(t) * tfn(t,d)
  *
  * Scores are bit-stable: every code path (brute-force oracle, naive
  * term-at-a-time engine, block-max WAND) sums per-term contributions in
  * ascending termId order over doubles.
  */
final case class Bm25Params(k1: Double = 1.2, b: Double = 0.75)

object BM25 {
  val Default: Bm25Params = Bm25Params()

  def idf(n: Long, df: Long): Double =
    math.log(1.0 + (n - df + 0.5) / (df + 0.5))

  def tfNorm(tf: Long, dl: Long, avgdl: Double, p: Bm25Params): Double =
    tf.toDouble / (tf.toDouble + p.k1 * (1.0 - p.b + p.b * dl.toDouble / avgdl))

  /** Smallest float that is >= v — admissible upper bound for block-max
    * metadata stored as Float. */
  def upperBoundFloat(v: Double): Float = {
    val f = v.toFloat
    if (f.toDouble < v) math.nextUp(f) else f
  }
}
