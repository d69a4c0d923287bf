package graft.search

/** Hierarchical Navigable Small World graphs (Malkov & Yashunin 2016) —
  * the ANN structure Lucene/ES 8 actually builds for `dense_vector`
  * fields. Built PER SHARD at index time (the Lucene per-segment shape:
  * bounded build memory, embarrassingly parallel, merge rebuilds per
  * segment), serialized as an ordinary adjacency relation next to the
  * docs table, and walked inside `mapPartitions`/cogroup kernels at query
  * time with an exact cosine re-rank over the candidates.
  *
  * Determinism: the level RNG is seeded per shard and nodes are inserted
  * in ascending docId order, so a rebuild reproduces the graph bit-for-bit
  * (the kill/resume invariant every other index structure honors).
  *
  * Similarity = cosine (the engine's kNN metric); the graph maximizes
  * similarity rather than minimizing a distance.
  */
object Hnsw {

  /** One serialized adjacency row: node `docId`'s neighbor list at `level`
    * within `shard` (docIds, not node ordinals — stable across readers). */
  final case class Edge(shard: Long, level: Int, docId: Long, neighbors: Array[Long])

  /** In-memory graph of ONE shard, built or reconstructed. `ids(i)` is the
    * docId of node i; `adj(level)(i)` its neighbor node-ordinals. */
  final class Graph(
      val ids: Array[Long],
      val vecs: Array[Array[Float]],
      val adj: Array[Array[Array[Int]]],
      val entry: Int,
      val maxLevel: Int,
      /** sampled level per node — row presence in the serialized form */
      val levels: Array[Int])

  /** Build one shard's graph. `items` must be sorted by docId (determinism).
    * M = max neighbors per node at levels > 0 (level 0 keeps 2M, the
    * standard Lucene/hnswlib setting); efConstruction = beam width. */
  def build(items: Array[(Long, Array[Float])], m: Int, efConstruction: Int,
      seed: Long): Graph = {
    require(m >= 2, s"HNSW M must be >= 2 (got $m)")
    val n = items.length
    val ids = items.map(_._1)
    val vecs = items.map(_._2)
    if (n == 0) return new Graph(ids, vecs, Array(Array.empty), -1, 0, Array.empty)
    val mL = 1.0 / math.log(m.toDouble)
    val rnd = new java.util.Random(seed)
    val levels = new Array[Int](n)
    var topLevel = 0
    var i = 0
    while (i < n) {
      val u = rnd.nextDouble()
      levels(i) = (-math.log(u) * mL).toInt
      if (levels(i) > topLevel) topLevel = levels(i)
      i += 1
    }
    // adjacency: growable per node per level
    val adjB = Array.tabulate(topLevel + 1)(_ =>
      new Array[scala.collection.mutable.ArrayBuffer[Int]](n))
    def nbrs(lc: Int, u: Int): scala.collection.mutable.ArrayBuffer[Int] = {
      var b = adjB(lc)(u)
      if (b == null) { b = new scala.collection.mutable.ArrayBuffer[Int](m + 1); adjB(lc)(u) = b }
      b
    }
    def sim(a: Int, b: Array[Float]): Double = Ann.cosine(vecs(a), b)

    var entry = 0
    var curTop = levels(0)
    var q = 1
    while (q < n) {
      val qv = vecs(q)
      val qLevel = levels(q)
      var ep = entry
      // greedy descent through the levels above the node's level
      var lc = curTop
      while (lc > qLevel) {
        var changed = true
        var best = sim(ep, qv)
        while (changed) {
          changed = false
          val bs = adjB(lc)(ep)
          if (bs != null) {
            var j = 0
            while (j < bs.length) {
              val s = sim(bs(j), qv)
              if (s > best) { best = s; ep = bs(j); changed = true }
              j += 1
            }
          }
        }
        lc -= 1
      }
      // beam insert at each level <= qLevel
      lc = math.min(qLevel, curTop)
      while (lc >= 0) {
        val w = searchLayerBuild(qv, ep, efConstruction, lc, adjB, vecs)
        // neighbor DIVERSITY heuristic (Malkov Alg. 4 — what hnswlib and
        // Lucene use): a candidate joins only if it is closer to q than to
        // every already-selected neighbor; without this, clustered data
        // prunes away all inter-cluster links and the graph fragments into
        // islands (measured: recall@10 0.51 → ≥0.95 on 200-cluster data).
        // Rejected candidates backfill remaining slots (hnswlib's
        // keepPrunedConnections) so sparse regions stay connected.
        val sel = selectHeuristic(w.sortBy(-_._2), m, vecs)
        val qN = nbrs(lc, q)
        var j = 0
        while (j < sel.length) {
          val u = sel(j)
          qN += u
          val uN = nbrs(lc, u)
          uN += q
          val cap = if (lc == 0) 2 * m else m
          if (uN.length > cap) {
            // prune u's list with the SAME diversity heuristic (w.r.t. u)
            val uv = vecs(u)
            val ranked = uN.map(x => (x, Ann.cosine(vecs(x), uv)))
              .sortBy(-_._2).toArray
            val pruned = selectHeuristic(ranked, cap, vecs)
            uN.clear(); uN ++= pruned
          }
          j += 1
        }
        if (sel.nonEmpty) ep = sel(0)
        lc -= 1
      }
      if (qLevel > curTop) { curTop = qLevel; entry = q }
      q += 1
    }
    // ---- level-0 connectivity repair ----------------------------------
    // Diversity pruning of an EXISTING node's neighbor list can, rarely,
    // disconnect level 0 even with the keepPrunedConnections backfill; an
    // unreachable node would silently cap recall (and break the
    // "exhaustive-ef beam == exact" oracle gate). Repair: directed BFS
    // from the entry over level 0 (the reachability the beam actually
    // uses); each unreachable component gets a bidirectional bridge from
    // its smallest-ordinal node to that node's most similar reachable
    // node (ties → smallest ordinal; the bridge may overflow the cap —
    // a pruned bridge would defeat the repair). Deterministic; O(n·d)
    // per repaired component, and components are rare and tiny.
    if (n > 1) {
      val reach = new Array[Boolean](n)
      val stack = new java.util.ArrayDeque[Integer]()
      def bfsFrom(s: Int): Unit = {
        if (!reach(s)) { reach(s) = true; stack.push(s) }
        while (!stack.isEmpty) {
          val u = stack.pop().intValue()
          val b = adjB(0)(u)
          if (b != null) {
            var j = 0
            while (j < b.length) {
              val v = b(j)
              if (!reach(v)) { reach(v) = true; stack.push(v) }
              j += 1
            }
          }
        }
      }
      bfsFrom(entry)
      var u = 0
      while (u < n) {
        if (!reach(u)) {
          var best = -1
          var bestS = Double.NegativeInfinity
          val uv = vecs(u)
          var v = 0
          while (v < n) {
            if (reach(v)) {
              val s = Ann.cosine(uv, vecs(v))
              if (s > bestS) { bestS = s; best = v }
            }
            v += 1
          }
          nbrs(0, u) += best
          nbrs(0, best) += u
          bfsFrom(u)
        }
        u += 1
      }
    }
    val adj = Array.tabulate(curTop + 1)(lc =>
      Array.tabulate(n)(u => {
        val b = adjB(lc)(u); if (b == null) Array.emptyIntArray else b.toArray
      }))
    new Graph(ids, vecs, adj, entry, curTop, levels.map(math.min(_, curTop)))
  }

  /** Malkov's Algorithm 4 in similarity form: walk candidates best-first;
    * keep one iff it is MORE similar to the target than to every neighbor
    * already kept (diversity — preserves inter-cluster bridges); backfill
    * leftover slots with the best rejected candidates. `ranked` must be
    * sorted by similarity-to-target descending. */
  private def selectHeuristic(ranked: Array[(Int, Double)], cap: Int,
      vecs: Array[Array[Float]]): Array[Int] = {
    val selected = new scala.collection.mutable.ArrayBuffer[Int](cap)
    val rejected = new scala.collection.mutable.ArrayBuffer[Int](ranked.length)
    var i = 0
    while (i < ranked.length && selected.length < cap) {
      val (c, simToQ) = ranked(i)
      var ok = true
      var j = 0
      while (ok && j < selected.length) {
        if (Ann.cosine(vecs(c), vecs(selected(j))) > simToQ) ok = false
        j += 1
      }
      if (ok) selected += c else rejected += c
      i += 1
    }
    var ri = 0
    while (selected.length < cap && ri < rejected.length) {
      selected += rejected(ri); ri += 1
    }
    selected.toArray
  }

  /** Beam search one layer during BUILD (adjacency in growable form). */
  private def searchLayerBuild(qv: Array[Float], ep: Int, ef: Int, lc: Int,
      adjB: Array[Array[scala.collection.mutable.ArrayBuffer[Int]]],
      vecs: Array[Array[Float]]): Array[(Int, Double)] =
    searchLayerImpl(qv, ep, ef, u => {
      val b = adjB(lc)(u)
      if (b == null) Iterator.empty else b.iterator
    }, vecs, acceptOrd = null, visitedLimit = Int.MaxValue)

  /** The canonical ef-bounded best-first layer search (similarity form):
    * candidates max-heap by similarity, results min-heap of size ≤ ef.
    * `acceptOrd` (null = accept all) gates RESULT membership only — the
    * walk expands any node whose similarity beats the current worst
    * result, accepted or not, so the beam can cross filtered-out regions
    * (the Lucene filtered-HNSW traversal). While the result beam is not
    * yet full, every frontier node stays expandable; `visitedLimit` caps
    * the node visits so a near-empty accept set cannot degenerate into a
    * full-graph scan (the caller falls back to exact instead). */
  private def searchLayerImpl(qv: Array[Float], ep: Int, ef: Int,
      neighborsOf: Int => Iterator[Int],
      vecs: Array[Array[Float]],
      acceptOrd: Int => Boolean,
      visitedLimit: Int): Array[(Int, Double)] = {
    val visited = new java.util.HashSet[Int]()
    val cand = new java.util.PriorityQueue[(Int, Double)](
      11, (a: (Int, Double), b: (Int, Double)) => java.lang.Double.compare(b._2, a._2))
    val res = new java.util.PriorityQueue[(Int, Double)](
      11, (a: (Int, Double), b: (Int, Double)) => java.lang.Double.compare(a._2, b._2))
    val s0 = Ann.cosine(vecs(ep), qv)
    visited.add(ep); cand.add((ep, s0))
    if (acceptOrd == null || acceptOrd(ep)) res.add((ep, s0))
    var visits = 1
    while (!cand.isEmpty) {
      val c = cand.poll()
      if ((res.size >= ef && c._2 < res.peek()._2) || visits > visitedLimit) {
        cand.clear() // best candidate worse than the worst result → done
      } else {
        val it = neighborsOf(c._1)
        while (it.hasNext) {
          val u = it.next()
          if (visited.add(u)) {
            visits += 1
            val s = Ann.cosine(vecs(u), qv)
            if (res.size < ef || s > res.peek()._2) {
              cand.add((u, s))
              if (acceptOrd == null || acceptOrd(u)) {
                res.add((u, s))
                if (res.size > ef) res.poll()
              }
            }
          }
        }
      }
    }
    val out = new Array[(Int, Double)](res.size)
    var i = out.length - 1
    while (!res.isEmpty) { out(i) = res.poll(); i -= 1 } // best-first
    out
  }

  /** Top candidates of one shard's graph for `qv`: greedy descent from the
    * entry point, then an ef-bounded beam at level 0. `accept` (sorted
    * docIds, null = all) is FILTER-AWARE (the Lucene filtered-HNSW shape):
    * the walk traverses freely through non-accepted nodes, but only
    * accepted nodes enter the result beam and count toward `ef` — so a
    * selective filter keeps expanding until k accepted candidates are
    * found instead of returning an underfilled beam. Traversal work is
    * capped at `visitedLimit` visited nodes (0 = derive `max(8·ef, 512)`);
    * when the cap fires before the beam fills, the caller should fall back
    * to an exact scan over the accepted set ([[searchFiltered]] does). */
  def search(g: Graph, qv: Array[Float], k: Int, ef: Int,
      accept: Array[Long] = null, visitedLimit: Int = 0): Array[ScoredDoc] = {
    if (g.entry < 0) return Array.empty
    var ep = g.entry
    var lc = g.maxLevel
    while (lc > 0) {
      var changed = true
      while (changed) {
        changed = false
        val bs = g.adj(lc)(ep)
        var best = Ann.cosine(g.vecs(ep), qv)
        var j = 0
        while (j < bs.length) {
          val s = Ann.cosine(g.vecs(bs(j)), qv)
          if (s > best) { best = s; ep = bs(j); changed = true }
          j += 1
        }
      }
      lc -= 1
    }
    val efEff = math.max(ef, k)
    val acceptOrd: Int => Boolean =
      if (accept == null) null
      else u => java.util.Arrays.binarySearch(accept, g.ids(u)) >= 0
    val vLim =
      if (acceptOrd == null) Int.MaxValue
      else if (visitedLimit > 0) visitedLimit
      else math.max(8 * efEff, 512)
    val w = searchLayerImpl(qv, ep, efEff, u => g.adj(0)(u).iterator, g.vecs,
      acceptOrd, vLim)
    w.iterator.take(k).map { case (u, s) => ScoredDoc(g.ids(u), s) }.toArray
  }

  /** Exact cosine top-k among the accepted docIds of one shard (all of
    * whose vectors the graph already holds) — the fallback for selective
    * filters, where a graph walk wastes work and risks underfill. */
  def exactAmongAccepted(g: Graph, qv: Array[Float], k: Int,
      accept: Array[Long]): Array[ScoredDoc] = {
    val out = new scala.collection.mutable.ArrayBuffer[ScoredDoc](accept.length)
    var i = 0
    while (i < accept.length) {
      val u = java.util.Arrays.binarySearch(g.ids, accept(i))
      if (u >= 0) out += ScoredDoc(g.ids(u), Ann.cosine(g.vecs(u), qv))
      i += 1
    }
    out.sortBy(sd => (-sd.score, sd.docId)).take(k).toArray
  }

  /** The shard-level filtered-search POLICY, shared by every serving path
    * (cold cogroup kernels and the warm driver tier must rank identically):
    *  - no filter → plain graph search;
    *  - |accepted| ≤ 2·ef → exact scan over the accepted set (ES falls
    *    back to exact kNN for selective pre-filters: the scan is cheaper
    *    than the walk AND exact);
    *  - else → filter-aware traversal; if the visited cap fired before k
    *    accepted candidates were found, exact scan (never underfill). */
  def searchFiltered(g: Graph, qv: Array[Float], k: Int, ef: Int,
      accept: Array[Long]): Array[ScoredDoc] = {
    if (accept == null) return search(g, qv, k, ef)
    val efEff = math.max(ef, k)
    if (accept.length <= 2L * efEff) return exactAmongAccepted(g, qv, k, accept)
    val r = search(g, qv, k, efEff, accept)
    if (r.length < math.min(k, accept.length)) exactAmongAccepted(g, qv, k, accept)
    else r
  }

  /** Serialize a built graph to adjacency rows (docId-keyed): one row per
    * (node, level ≤ the node's sampled level) — row PRESENCE encodes the
    * node's level, so a lone top-level node survives the round trip. */
  def toEdges(shard: Long, g: Graph): Iterator[Edge] =
    (0 to g.maxLevel).iterator.flatMap { lc =>
      g.ids.indices.iterator
        .filter(u => g.levels(u) >= lc)
        .map(u => Edge(shard, lc, g.ids(u), g.adj(lc)(u).map(g.ids(_))))
    }

  /** Reconstruct one shard's graph from its adjacency rows + vectors.
    * `vecById` must cover every docId in the rows. */
  def fromEdges(edges: Seq[Edge], vecById: collection.Map[Long, Array[Float]]): Graph = {
    if (edges.isEmpty)
      return new Graph(Array.empty, Array.empty, Array(Array.empty), -1, 0, Array.empty)
    val ids = edges.iterator.map(_.docId).toArray.distinct.sorted
    val idx = ids.zipWithIndex.toMap
    val vecs = ids.map(vecById)
    val maxLevel = edges.iterator.map(_.level).max
    val adj = Array.fill(maxLevel + 1)(Array.fill(ids.length)(Array.emptyIntArray))
    val levels = new Array[Int](ids.length)
    edges.foreach { e =>
      val u = idx(e.docId)
      adj(e.level)(u) = e.neighbors.map(idx)
      if (e.level > levels(u)) levels(u) = e.level
    }
    // entry = the smallest-docId node at the top level (determinism)
    val entry = (0 until ids.length).find(u => levels(u) == maxLevel).getOrElse(0)
    new Graph(ids, vecs, adj, entry, maxLevel, levels)
  }
}
