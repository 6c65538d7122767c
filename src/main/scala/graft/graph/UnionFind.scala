package graft.graph

/** Driver-side union-find with path compression — the small-side leg of
  * the documented size-adaptive connectivity pattern ("the check is not
  * the operator"): when an edge set is under a few million rows it is
  * far cheaper to pull it to the driver and label components in
  * microseconds than to run the iterative distributed CC dataflow whose
  * every round is a shuffle. Callers gate on a row-count threshold and
  * fall back to [[Algorithms.connectedComponents]] above it.
  *
  * Component labels are the MIN member id (larger roots are parented to
  * smaller), matching the distributed CC's labelling exactly — the two
  * legs are interchangeable row-for-row.
  */
object UnionFind {

  /** (node, min-member-of-its-component) for every node incident to an
    * edge. Nodes not appearing in `edges` are absent (callers coalesce
    * singletons to their own id). */
  def componentsLocal(edges: Array[(Long, Long)]): Array[(Long, Long)] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(if (ra < rb) rb else ra) = math.min(ra, rb)
    }
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    ids.map(id => (id, find(id)))
  }
}
