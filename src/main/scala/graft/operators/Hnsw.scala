package graft.operators

import scala.collection.mutable

/** Hierarchical Navigable Small World graph — the reference's HNSW index
  * family (pkg/storage2/hnsw_index.go, ivf_hnsw_index.go), re-implemented
  * from the public algorithm (Malkov & Yashunin, "Efficient and robust
  * approximate nearest neighbor search using Hierarchical Navigable Small
  * World graphs", IEEE TPAMI 2018).
  *
  * This class is the SINGLE-SHARD in-memory graph. The Spark-first shape
  * is shard-and-merge (how Vespa/Milvus distribute HNSW): partition the
  * corpus, build one graph per partition inside `mapPartitions`, search
  * every shard for each query, take the global top-k. A graph walk is
  * inherently sequential per query, so the parallelism axis at 100 TB is
  * shards × queries — each executor core owns a bounded subgraph, and no
  * executor ever needs the whole corpus resident.
  *
  * Determinism: node levels derive from splitmix64(id) — not from a shared
  * RNG — so the level structure is a pure function of the ids regardless of
  * partitioning, and builds insert in ascending-id order. Two builds over
  * the same shard contents produce identical graphs.
  *
  * Metrics (reference distance_metrics.go): `"cosine"` — dot product over
  * unit vectors (inputs normalized on insert/search, matching
  * [[graft.lake.VectorIndex]]'s quantizer convention); `"l2"` — squared
  * euclidean over raw vectors (the IVF coarse-quantizer metric, so an
  * HNSW-over-centroids probe ranks clusters identically to the exact
  * probe). [[HnswGraph.search]] scores are "higher = closer" in both.
  */
final class HnswGraph(
    val m: Int = HnswGraph.DefaultM,
    val efConstruction: Int = HnswGraph.DefaultEfConstruction,
    val metric: String = "cosine") {

  require(m >= 2, s"M must be >= 2, got $m")
  require(metric == "cosine" || metric == "l2", s"unknown metric '$metric'")
  private val isCosine = metric == "cosine"

  private val mL: Double = 1.0 / math.log(m.toDouble)
  private val maxConn0: Int = 2 * m // level-0 lists are denser (paper §4)

  // Node storage, ordinal-indexed. Neighbor lists hold ordinals.
  private val ids = mutable.ArrayBuffer.empty[Long]
  private val vecs = mutable.ArrayBuffer.empty[Array[Float]]
  private val levels = mutable.ArrayBuffer.empty[Int]
  // neighbors(ord)(level) = ArrayBuffer[ordinal]
  private val neighbors = mutable.ArrayBuffer.empty[Array[mutable.ArrayBuffer[Int]]]
  private var entryPoint: Int = -1
  private var topLevel: Int = -1

  def size: Int = ids.length
  def entryOrdinal: Int = entryPoint
  def idOf(ord: Int): Long = ids(ord)
  def levelOf(ord: Int): Int = levels(ord)
  def vectorOf(ord: Int): Array[Float] = vecs(ord)
  /** Neighbor ids per level for node `ord` (for persistence). */
  def neighborIds(ord: Int): Array[Array[Long]] =
    neighbors(ord).map(_.map(ids(_)).toArray)

  /** Deterministic level for an id: geometric with ratio 1/M, seeded by the
    * id itself (splitmix64 finalizer), so the hierarchy is independent of
    * insertion order and sharding. */
  def levelFor(id: Long): Int = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    // uniform in (0,1]; avoid u=0 (infinite level)
    val u = ((z >>> 11).toDouble + 1.0) / (1L << 53).toDouble
    math.min((-math.log(u) * mL).toInt, HnswGraph.MaxLevel)
  }

  @inline private def dot(a: Array[Float], b: Array[Float]): Float = {
    var s = 0.0f
    var i = 0
    val n = a.length
    while (i < n) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Smaller = closer: 1 − cosine on unit vectors, or squared L2. */
  @inline private def dist(q: Array[Float], ord: Int): Float =
    if (isCosine) 1.0f - dot(q, vecs(ord))
    else {
      val v = vecs(ord)
      var s = 0.0f
      var i = 0
      while (i < q.length) {
        val diff = q(i) - v(i)
        s += diff * diff
        i += 1
      }
      s
    }

  private def normalize(v: Array[Float]): Array[Float] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i).toDouble * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v.clone()
    else {
      val out = new Array[Float](v.length)
      i = 0
      while (i < v.length) { out(i) = (v(i) / n).toFloat; i += 1 }
      out
    }
  }

  /** Greedy best-first search of one layer. Returns up to `ef` nearest
    * (dist, ordinal) pairs, closest first. */
  private def searchLayer(q: Array[Float], entry: Int, ef: Int,
      level: Int): mutable.ArrayBuffer[(Float, Int)] = {
    val visited = mutable.HashSet(entry)
    // candidates: min-heap by distance (explore closest first)
    val candidates = mutable.PriorityQueue((-dist(q, entry), entry))
    // results: max-heap by distance (evict farthest when > ef)
    val results = mutable.PriorityQueue((dist(q, entry), entry))
    while (candidates.nonEmpty) {
      val (negD, c) = candidates.dequeue()
      if (-negD > results.head._1 && results.size >= ef) {
        candidates.clear() // closest open candidate is farther than the worst kept
      } else {
        val nb = neighbors(c)
        if (level < nb.length) {
          val lvlNb = nb(level)
          var i = 0
          while (i < lvlNb.length) {
            val e = lvlNb(i)
            if (visited.add(e)) {
              val d = dist(q, e)
              if (results.size < ef || d < results.head._1) {
                candidates.enqueue((-d, e))
                results.enqueue((d, e))
                if (results.size > ef) results.dequeue()
              }
            }
            i += 1
          }
        }
      }
    }
    val out = mutable.ArrayBuffer.empty[(Float, Int)]
    out ++= results
    out.sortInPlaceBy(r => (r._1, ids(r._2)))
    out
  }

  /** Plain closest-M selection (the reference's selectNeighbors,
    * hnsw_index.go:341 — it uses simple selection, not the §4 heuristic). */
  private def selectClosest(cands: mutable.ArrayBuffer[(Float, Int)],
      max: Int): mutable.ArrayBuffer[Int] = {
    val sorted = cands.sortBy(c => (c._1, ids(c._2)))
    val out = mutable.ArrayBuffer.empty[Int]
    val it = sorted.iterator
    while (it.hasNext && out.length < max) out += it.next()._2
    out
  }

  private def shrink(ord: Int, level: Int): Unit = {
    val cap = if (level == 0) maxConn0 else m
    val lst = neighbors(ord)(level)
    if (lst.length > cap) {
      val v = vecs(ord)
      val ranked = lst.map(nb => (dist(v, nb), nb))
      neighbors(ord)(level) = selectClosest(ranked, cap)
    }
  }

  /** Insert a vector (normalized internally under the cosine metric). Not
    * thread-safe; builds are single-threaded per shard by design. */
  def insert(id: Long, vector: Array[Float]): Unit = {
    val v = if (isCosine) normalize(vector) else vector.clone()
    val l = levelFor(id)
    val ord = ids.length
    ids += id
    vecs += v
    levels += l
    neighbors += Array.fill(l + 1)(mutable.ArrayBuffer.empty[Int])

    if (entryPoint < 0) { entryPoint = ord; topLevel = l; return }

    var ep = entryPoint
    // zoom down through layers above the new node's level (greedy, ef=1)
    var lvl = topLevel
    while (lvl > l) {
      ep = searchLayer(v, ep, 1, lvl).head._2
      lvl -= 1
    }
    // connect on each layer from min(l, topLevel) down to 0
    lvl = math.min(l, topLevel)
    while (lvl >= 0) {
      val cands = searchLayer(v, ep, efConstruction, lvl)
      ep = cands.head._2
      val conns = selectClosest(cands, m)
      neighbors(ord)(lvl) = conns.clone()
      var i = 0
      while (i < conns.length) {
        val nb = conns(i)
        neighbors(nb)(lvl) += ord
        shrink(nb, lvl)
        i += 1
      }
      lvl -= 1
    }
    if (l > topLevel) { topLevel = l; entryPoint = ord }
  }

  /** Top-k closest, ties broken by id. Returns (id, score) with
    * higher = closer (cosine similarity, or −L2²). `ef` bounds the
    * layer-0 beam (recall knob). */
  def search(query: Array[Float], k: Int,
      ef: Int = HnswGraph.DefaultEfSearch): Seq[(Long, Double)] = {
    if (entryPoint < 0) return Seq.empty
    val q = if (isCosine) normalize(query) else query
    var ep = entryPoint
    var lvl = topLevel
    while (lvl > 0) {
      ep = searchLayer(q, ep, 1, lvl).head._2
      lvl -= 1
    }
    val res = searchLayer(q, ep, math.max(ef, k), 0)
    res.take(k).map { case (d, ord) =>
      (ids(ord), if (isCosine) 1.0 - d.toDouble else -d.toDouble)
    }.toSeq
  }

  /** Restore a node verbatim (persisted-graph load path). Caller must add
    * every node before resolving neighbor ids via [[wireNeighbors]]. */
  private[operators] def restoreNode(id: Long, vec: Array[Float],
      level: Int): Unit = {
    ids += id
    vecs += vec
    levels += level
    neighbors += Array.fill(level + 1)(mutable.ArrayBuffer.empty[Int])
    if (level > topLevel ||
      (level == topLevel && entryPoint >= 0 && id < ids(entryPoint))) {
      topLevel = level
      entryPoint = ids.length - 1
    }
  }

  private[operators] def wireNeighbors(ordinalOf: Long => Int,
      ord: Int, nbIds: Array[Array[Long]]): Unit = {
    var l = 0
    while (l < nbIds.length) {
      val lst = neighbors(ord)(l)
      nbIds(l).foreach(nid => lst += ordinalOf(nid))
      l += 1
    }
  }
}

object HnswGraph {
  val DefaultM = 16
  val DefaultEfConstruction = 100
  val DefaultEfSearch = 64
  val MaxLevel = 16

  /** Build from (id, vector) pairs; ascending-id insertion for determinism
    * (levels are id-derived, so the graph is a function of the SET). */
  def build(rows: Iterator[(Long, Array[Float])],
      m: Int = DefaultM,
      efConstruction: Int = DefaultEfConstruction,
      metric: String = "cosine"): HnswGraph = {
    val g = new HnswGraph(m, efConstruction, metric)
    rows.toArray.sortBy(_._1).foreach { case (id, v) => g.insert(id, v) }
    g
  }

  /** One persisted graph node: neighbor lists hold IDS (not ordinals) so
    * the on-disk format survives reordering. Vectors are stored normalized. */
  final case class Node(id: Long, vec: Array[Float], level: Int,
      nbrs: Array[Array[Long]])

  def toNodes(g: HnswGraph): Iterator[Node] =
    (0 until g.size).iterator.map { ord =>
      Node(g.idOf(ord), g.vectorOf(ord), g.levelOf(ord), g.neighborIds(ord))
    }

  /** Rebuild a graph from persisted nodes (already-normalized vectors). */
  def fromNodes(nodes: Seq[Node], m: Int = DefaultM,
      efConstruction: Int = DefaultEfConstruction,
      metric: String = "cosine"): HnswGraph = {
    val g = new HnswGraph(m, efConstruction, metric)
    val sorted = nodes.sortBy(_.id)
    sorted.foreach(n => g.restoreNode(n.id, n.vec, n.level))
    val ordinalOf = sorted.iterator.map(_.id).zipWithIndex.toMap
    sorted.iterator.zipWithIndex.foreach { case (n, ord) =>
      g.wireNeighbors(ordinalOf, ord, n.nbrs)
    }
    g
  }
}
