package graft.llmops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{EngineQuery, Tables}

/** Connected components over a pair graph — the step between pairwise
  * near-dup candidates (q41/q43) and survivor selection: transitive
  * duplicates A~B~C must collapse to ONE cluster even when the A~C
  * pair was never emitted. Survivor = min doc_id per component, so the
  * component label IS the survivor id.
  *
  * Two implementations behind one API, both iterating the PAIR GRAPH
  * (never the corpus — singletons rejoin at the end with comp = id):
  *
  *  - [[starContract]] (the default): alternating large-star /
  *    small-star contraction, the MapReduce-era algorithm published as
  *    "Connected Components in MapReduce and Beyond" (Kiveris et al.,
  *    SoCC'14). Converges in O(log n) rounds regardless of component
  *    diameter — the 100 TB path, where an adversarial chain must not
  *    turn into a diameter-length shuffle sequence.
  *  - [[minLabelComponents]]: one-hop min-label propagation, rounds =
  *    component diameter. Fewer shuffles per round, fine for the
  *    shallow clusters near-dup dedup produces by construction.
  *
  * Both use an overflow-free convergence witness (a changed/differing
  * ROW COUNT, not a label sum): summing int64 labels can overflow on
  * large graphs with large ids — aborting under ANSI mode, or silently
  * wrapping (and potentially false-converging) without it.
  * `localCheckpoint` truncates lineage each round — without it the plan
  * doubles per iteration.
  */
object Components {

  /** (id) nodes + (u, v) undirected edges → (id, comp) with
    * comp = min reachable id. Star contraction: O(log n) rounds.
    */
  def connectedComponents(nodes: DataFrame, edges: DataFrame): DataFrame =
    attachSingletons(nodes, starContract(edges)._1)

  /** Same contract via one-hop min-label propagation — rounds =
    * component diameter; shallow-graph variant.
    */
  def minLabelComponents(nodes: DataFrame, edges: DataFrame): DataFrame =
    attachSingletons(nodes, minLabelPropagate(edges))

  /** Labels cover only edge-touched nodes; everything else is its own
    * component. On a dedup corpus the pair graph is a tiny fraction of
    * the node set — at 100 TB this join is the difference between
    * iterating over the pair graph and iterating over the corpus.
    */
  private def attachSingletons(nodes: DataFrame,
      labels: DataFrame): DataFrame =
    nodes.select(col("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))

  /** Alternating large-star/small-star contraction over (u, v) edges.
    * Returns (labels for edge-touched nodes, rounds to fixpoint).
    *
    * One round = large-star then small-star:
    *  - large-star: every node connects its LARGER neighbors to the
    *    minimum of its closed neighborhood;
    *  - small-star: on smaller-oriented edges, every node connects its
    *    smaller neighbors AND itself to the neighborhood minimum.
    * Both steps preserve connectivity and only ever point edges at
    * smaller ids; the fixpoint is a forest of stars centered at each
    * component's minimum id (the published invariant), read off as
    * comp = min neighbor.
    *
    * The edge derivation (e.g. the whole MinHash pipeline) materializes
    * ONCE into the canonicalized initial set; each round is a bounded
    * number of hash shuffles on the current edge set, which only
    * shrinks toward one edge per non-min node.
    */
  /** Materialize a LAZY localCheckpoint and return its row count in
    * ONE Spark action (optimization r16): the eager-checkpoint job and
    * the separate count job were two actions per round — the count is
    * free once the blocks are being computed anyway, and an RDD count
    * carries no AQE stage-job overhead. ~2 fewer jobs per round on a
    * driver-glue-bound loop (profiled: 34 jobs, jobWall 0.9 s of a
    * 1.7 s idle wall).
    */
  private def materializeCounting(df: DataFrame): Long =
    df.queryExecution.toRdd.count()

  private[graft] def starContract(edges: DataFrame): (DataFrame, Int) = {
    // canonical orientation u > v, self-loops and duplicates dropped
    var e = edges.filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v"))
      .distinct()
      .localCheckpoint(false)
    var n = materializeCounting(e)
    var rounds = 0
    var converged = n == 0
    while (!converged) {
      // Each star step needs min(neighborhood) next to EVERY edge row
      // of its node — a window min over the partition key, not an
      // aggregate joined back (optimization r15, guide §2.4): the
      // agg+join form shuffled each step's edge set twice (partial-agg
      // exchange + join exchange) plus an intermediate distinct; the
      // window form shuffles it once, and the one distinct at the end
      // of the round absorbs the duplicates both steps emit. 6
      // exchanges/round → 3, identical row sets (PropertySpec's
      // star-vs-min-label equivalence covers it).
      val wU = Window.partitionBy(col("u"))
      // large-star: symmetric neighborhoods; m = min(N(u) ∪ {u});
      // every neighbor v > u re-points to m. Output is canonical by
      // construction (v > u >= m).
      val sym = e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
      val large = sym
        .withColumn("m", least(min(col("v")).over(wU), col("u")))
        .filter(col("v") > col("u") && col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      // small-star: edges already oriented u > v; m = min neighbor
      // (all neighbors < u). Every smaller neighbor and u itself
      // re-point to m.
      val withM2 = large.withColumn("m", min(col("v")).over(wU))
      val small = withM2.select(col("v").as("u"), col("m").as("v"))
        .unionByName(withM2.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint(false)
      // fixpoint witness: set equality via count + one-way difference
      // (equal cardinality + empty difference ⇒ equal sets). Row
      // counts never overflow — no label arithmetic involved. The
      // count doubles as the checkpoint's materializing action.
      val m = materializeCounting(small)
      converged = m == n && small.except(e).isEmpty
      // round i's edge blocks are dead once the witness has compared
      // them against round i+1 — release instead of pinning every
      // round's edge set for the session
      graft.ops.SessionScratch.releaseCheckpoint(e)
      e = small
      n = m
      rounds += 1
    }
    // the surviving edge set backs the returned labels lazily: evicted
    // only once the harness has consumed the query result
    graft.ops.SessionScratch.registerTransient(e)
    val labels = e.groupBy(col("u")).agg(min(col("v")).as("comp"))
      .select(col("u").as("id"), col("comp"))
    // star centers appear only on the v side: comp = own id
    val centers = e.select(col("v").as("id")).distinct()
      .join(labels, Seq("id"), "left_anti")
      .select(col("id"), col("id").as("comp"))
    (labels.unionByName(centers), rounds)
  }

  /** One-hop min-label propagation: each round every edge-touched node
    * takes the min label of its closed neighborhood; stops when no
    * label changes (an exact changed-row count per round — labels only
    * decrease, so "no row changed" IS the fixpoint).
    */
  private[graft] def minLabelPropagate(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    var labels = sym.select(col("u").as("id")).distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint()
    var converged = false
    while (!converged) {
      val neigh = sym.join(labels, sym("v") === labels("id"))
        .select(sym("u").as("id"), col("comp"))
      val updated = labels.unionByName(neigh)
        .groupBy(col("id")).agg(min(col("comp")).as("comp"))
        .localCheckpoint()
      // labels strictly decrease when they change, so the changed set
      // is exactly the inner-join mismatch; counting rows cannot
      // overflow, unlike a SUM over int64 labels
      val changed = updated.alias("n")
        .join(labels.alias("o"), col("n.id") === col("o.id"))
        .filter(col("n.comp") =!= col("o.comp"))
        .count()
      converged = changed == 0
      graft.ops.SessionScratch.releaseCheckpoint(labels)
      labels = updated
    }
    // sym fed only the loop (the final labels checkpoint has truncated
    // lineage); the final labels back the returned frame until eviction
    graft.ops.SessionScratch.releaseCheckpoint(sym)
    graft.ops.SessionScratch.registerTransient(labels)
    labels
  }

  /** Gate row: components over the q41 MinHash-LSH candidate pairs.
    * The oracle replays the pair derivation (shared CTE block) and
    * closes it with a recursive min-label reachability — the full
    * transitive closure both iterative algorithms converge to.
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
