package graft.compile

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, expr}

import graft.model._

/** FK join-graph navigation (SURVEY.md §2.3 "multi-way join path").
  *
  * The reference hands its relationship edges to the LLM as join-path
  * hints (sample_metadata.py:68-74 fed into the prompt); our engine
  * resolves the path mechanically: BFS over the FK edges, then chain
  * equi-joins along the path. Dimension hops (the `to` side of an FK) are
  * broadcast — a path fact→dim1→dim2 never shuffles the fact side.
  */
final class JoinGraph(catalog: CatalogModel) {

  /** Undirected adjacency over FK edges (either side can be the start). */
  private val adjacency: Map[String, Seq[Relationship]] =
    (catalog.relationships.map(r => r.fromTable -> r) ++
      catalog.relationships.map(r => r.toTable -> r))
      .groupBy(_._1).map { case (t, es) => t -> es.map(_._2).distinct }

  /** Shortest FK path between two tables (BFS), as the edge list. */
  def path(from: String, to: String): Option[Seq[Relationship]] = {
    if (from == to) return Some(Nil)
    val visited = scala.collection.mutable.Set(from)
    val queue = scala.collection.mutable.Queue((from, List.empty[Relationship]))
    while (queue.nonEmpty) {
      val (t, walked) = queue.dequeue()
      for (edge <- adjacency.getOrElse(t, Nil)) {
        val next = if (edge.fromTable == t) edge.toTable else edge.fromTable
        if (!visited.contains(next)) {
          val sofar = walked :+ edge
          if (next == to) return Some(sofar)
          visited += next
          queue.enqueue((next, sofar))
        }
      }
    }
    None
  }

  /** Join `from` to `to` along the shortest FK path. Each hop toward a
    * dim table (the FK's target) is broadcast. Every scan is aliased by
    * its table name and conditions are table-qualified — unqualified
    * names are ambiguous the moment two tables on the path share a
    * column name (e.g. a PK/FK both called `id`).
    */
  def join(resolve: String => DataFrame, from: String, to: String): DataFrame = {
    val edges = path(from, to).getOrElse(throw new IllegalArgumentException(
      s"no FK path from '$from' to '$to' in catalog"))
    var current = from
    var df = resolve(from).as(from)
    for (edge <- edges) {
      val (next, cond) =
        if (edge.fromTable == current)
          (edge.toTable,
            s"$current.${edge.fromColumn} = ${edge.toTable}.${edge.toColumn}")
        else (edge.fromTable,
          s"$current.${edge.toColumn} = ${edge.fromTable}.${edge.fromColumn}")
      val nextDf =
        if (next == edge.toTable) broadcast(resolve(next).as(next)) // dim side
        else resolve(next).as(next)
      df = df.join(nextDf, expr(cond))
      current = next
    }
    df
  }
}
