package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{EngineQuery, Tables}

/** Connected components over a pair graph — the step between pairwise
  * near-dup candidates (q41/q43) and survivor selection: transitive
  * duplicates A~B~C must collapse to ONE cluster even when the A~C
  * pair was never emitted. Survivor = min doc_id per component, so the
  * component label IS the survivor id.
  *
  * Implementation: iterative min-label propagation — each round every
  * node takes the min label among itself and its neighbors; the loop
  * stops at fixpoint (label flow covers one hop per round, so rounds =
  * component diameter; near-dup clusters are shallow by construction).
  * All per-round state lives in DataFrames (one shuffle per round for
  * the neighbor join + min-agg); the driver holds only one scalar per
  * round — the label SUM, a valid convergence witness BECAUSE min-label
  * propagation is monotone (labels only decrease). `localCheckpoint`
  * truncates lineage each round — without it the plan doubles per
  * iteration. At 100 TB-scale graphs with deep components, the same
  * loop upgrades to the alternating large-star/small-star contraction
  * (O(log n) rounds) — whose per-round labels are NOT monotone, so the
  * witness there must be a changed-row count, not the sum; the
  * fixpoint contract and the oracle stay identical.
  */
object Components {

  /** (id) nodes + (u, v) undirected edges → (id, comp) with
    * comp = min reachable id.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // materialize the (possibly expensive) edge derivation ONCE — a
    // lazy edge plan would re-execute upstream (e.g. the whole
    // MinHash pipeline) in every round's join and convergence count
    val sym = edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    // propagate only over edge-TOUCHED nodes: on a dedup corpus the
    // pair graph is a tiny fraction of the node set, and a label can
    // only change if the node has an edge — singletons rejoin at the
    // end with comp = id. At 100 TB this is the difference between
    // iterating over the pair graph and iterating over the corpus.
    var labels = sym.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    // labels decrease monotonically, so the label SUM is a strictly
    // decreasing convergence witness — one scalar agg per round
    // instead of an old-vs-new join
    def labelSum(df: DataFrame): Long = {
      val r = df.agg(sum(col("comp"))).head
      if (r.isNullAt(0)) 0L else r.getLong(0)   // empty node set
    }
    var prevSum = labelSum(labels)
    var converged = false
    while (!converged) {
      val neigh = sym.join(labels, sym("v") === labels("id"))
        .select(sym("u").as("id"), col("comp"))
      val updated = labels.unionByName(neigh)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      val s = labelSum(updated)
      converged = s == prevSum
      prevSum = s
      labels = updated
    }
    nodes.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  /** Gate row: components over the q41 MinHash-LSH candidate pairs.
    * The oracle replays the pair derivation (shared CTE block) and
    * closes it with a recursive min-label reachability — the full
    * transitive closure the iterative loop converges to.
    */
  val q112 = EngineQuery(
    "q112_dedup_components",
    (s, dir) => {
      val t = Tables(s, dir)
      val pairs = Dedup.minhashPairs(s, dir)
      val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      val nodes = t.documents.select(col("doc_id").as("id"))
      connectedComponents(nodes, edges)
        .select(col("id").as("doc_id"), col("comp").as("component"),
          (col("id") === col("comp")).as("survivor"))
        .orderBy(col("doc_id"))
    },
    Some(Dedup.minhashPairsCtes +
      """
         , edges AS (
             SELECT doc_a AS u, doc_b AS v FROM pairs
             UNION ALL SELECT doc_b, doc_a FROM pairs
           ), reach AS (
             SELECT doc_id AS u, doc_id AS l FROM documents
             UNION
             SELECT e.u, r.l FROM edges e JOIN reach r ON e.v = r.u
           )
           SELECT u AS doc_id, MIN(l) AS component, u = MIN(l) AS survivor
           FROM reach GROUP BY u ORDER BY doc_id"""))

  val all: Seq[EngineQuery] = Seq(q112)
}
