package graft.core

/**
 * Lowest-common-ancestor over a small rooted taxonomy, built once on the
 * driver and broadcast; queried per row on executors.
 *
 * Same capability as the reference's offline LCA (ganon:
 * src/utils/include/utils/LCA.hpp:38-174 — Euler tour + sparse-table RMQ,
 * O(N log N) preprocess / O(1) query; pairwise fold over a node list
 * :165-174), re-implemented from scratch.
 *
 * Nodes are strings; unknown nodes resolve to the root (the reference
 * patches missing targets to root/"no rank" — GanonClassify.cpp:1343-1362).
 */
final class Lca private (
    val root: String,
    idOf: Map[String, Int],
    nameOf: Array[String],
    first: Array[Int],     // first occurrence of node id in euler tour
    eulerNode: Array[Int], // node id at tour position
    sparse: Array[Array[Int]], // sparse[j][i] = tour idx of min-depth in [i, i+2^j)
    depthAt: Array[Int]    // depth at tour position
) extends Serializable {

  private def rmq(l: Int, r: Int): Int = { // inclusive, returns tour index
    val j = 31 - Integer.numberOfLeadingZeros(r - l + 1)
    val a = sparse(j)(l)
    val b = sparse(j)(r - (1 << j) + 1)
    if (depthAt(a) <= depthAt(b)) a else b
  }

  private val rootId: Int = idOf(root)

  def lca(a: String, b: String): String = {
    // unknown nodes resolve to the ROOT (reference patches missing targets
    // to root/"no rank" — GanonClassify.cpp:1343-1362), not to node 0
    val ia = idOf.getOrElse(a, rootId)
    val ib = idOf.getOrElse(b, rootId)
    var l = first(ia); var r = first(ib)
    if (l > r) { val t = l; l = r; r = t }
    nameOf(eulerNode(rmq(l, r)))
  }

  /** Fold LCA over a node list (reference LCA.hpp:165-174). A singleton
    * list resolves unknown nodes to the root too (the reduce path only
    * patches unknowns inside `lca`). */
  def lcaAll(nodes: Seq[String]): String = nodes match {
    case Seq()    => root
    case Seq(one) => if (idOf.contains(one)) one else root
    case _        => nodes.reduce(lca)
  }
}

object Lca {
  /**
   * Build from a parent map (child -> parent). Root is the node whose
   * parent is itself or is absent from the map's keys.
   */
  def build(parents: Map[String, String], root: String): Lca = {
    val names = (parents.keySet ++ parents.values + root).toArray.sorted
    val idOf = names.zipWithIndex.toMap.map { case (k, v) => k -> v }
    // ensure root is id-resolvable; children adjacency
    val children = Array.fill(names.length)(List.empty[Int])
    parents.foreach { case (c, p) =>
      if (c != root && c != p) {
        val ci = idOf(c); val pi = idOf(p)
        children(pi) = ci :: children(pi)
      }
    }
    val n = names.length
    val first = Array.fill(n)(-1)
    val euler = new scala.collection.mutable.ArrayBuffer[Int](2 * n)
    val depths = new scala.collection.mutable.ArrayBuffer[Int](2 * n)
    // iterative DFS (deterministic child order: sorted ids, reversed by cons)
    val stack = scala.collection.mutable.Stack[(Int, Int)]((idOf(root), 0))
    val visited = new Array[Boolean](n)
    while (stack.nonEmpty) {
      val (node, depth) = stack.pop()
      if (node >= 0) {
        euler += node; depths += depth
        if (!visited(node)) {
          visited(node) = true
          if (first(node) < 0) first(node) = euler.length - 1
          children(node).sorted.reverse.foreach { c =>
            if (!visited(c)) {
              stack.push((node, depth))   // re-visit parent after child subtree
              stack.push((c, depth + 1))
            }
          }
        }
      }
    }
    // any disconnected nodes (cycles/bad data): attach directly under root,
    // each preceded by a root occurrence so RMQ between two of them hits root
    var i = 0
    while (i < n) {
      if (first(i) < 0) {
        euler += idOf(root); depths += 0
        euler += i; depths += 1
        first(i) = euler.length - 1
      }
      i += 1
    }
    val tour = euler.toArray
    val depthAt = depths.toArray
    val m = tour.length
    val logM = math.max(1, 32 - Integer.numberOfLeadingZeros(m))
    val sparse = Array.ofDim[Int](logM, m)
    i = 0
    while (i < m) { sparse(0)(i) = i; i += 1 }
    var j = 1
    while ((1 << j) <= m) {
      var i2 = 0
      while (i2 + (1 << j) <= m) {
        val a = sparse(j - 1)(i2)
        val b = sparse(j - 1)(i2 + (1 << (j - 1)))
        sparse(j)(i2) = if (depthAt(a) <= depthAt(b)) a else b
        i2 += 1
      }
      j += 1
    }
    new Lca(root, idOf, names, first, tour, sparse, depthAt)
  }
}
