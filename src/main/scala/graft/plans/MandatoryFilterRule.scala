package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

import graft.compile.MandatoryFilters
import graft.model.CatalogModel

/** Catalyst-rule form of mandatory-filter injection (SURVEY.md §4) — the
  * `injectOptimizerRule`-style alternative to the spec-compile-time path
  * in [[graft.compile.MandatoryFilters]].
  *
  * The reference feeds its soft-delete / policy hints into the LLM prompt
  * (sample_metadata.py:76-80, 158-162); our engine enforces them in the
  * plan. Two equivalent enforcement points exist:
  *
  *  - **spec-level** ([[graft.compile.SpecCompiler.scan]]): the compiler
  *    appends the predicates when it builds each scan. Simple, visible,
  *    and the default.
  *  - **analyzer-rule** (this class): a `Rule[LogicalPlan]` registered at
  *    session construction via
  *    [[graft.functions.GraftExtensions]]/`injectResolutionRule`, so the
  *    policy applies to EVERY query in the session — `spark.sql` over
  *    temp views, ad-hoc DataFrames, anything that names a governed
  *    table — not only plans built by the spec compiler. This is the
  *    row-level-security deployment shape.
  *
  * A deployment picks ONE point; running both is semantically harmless
  * (the predicates are deterministic, so the duplicate Filter is a no-op)
  * but wasteful.
  *
  * Mechanics: injected as a RESOLUTION rule, not an optimizer rule, for
  * two reasons. (1) The predicate strings parse to unresolved expressions
  * (`is_deleted = false` → UnresolvedAttribute) — in the analyzer the
  * surrounding passes resolve them for free; an optimizer rule would have
  * to re-implement attribute + function resolution. (2) At analysis time
  * the scan still carries its `SubqueryAlias` (table name or temp-view
  * name) — the optimizer strips aliases in its first batch, leaving only
  * path-based relations whose table identity is gone. Filters injected at
  * analysis flow through the normal optimizer, so they PUSH DOWN into the
  * parquet scan exactly like user predicates (asserted in CompileSpec).
  *
  * Idempotence inside the analyzer's fixed-point loop: the alias node is
  * tagged when its filters are injected; `resolveOperatorsUp` additionally
  * skips subtrees already marked analyzed, so composing an already-
  * analyzed Dataset into a larger query never re-injects.
  */
case class MandatoryFilterRule(catalog: () => Option[CatalogModel])
    extends Rule[LogicalPlan] {
  import MandatoryFilterRule.Injected

  override def apply(plan: LogicalPlan): LogicalPlan = catalog() match {
    case None => plan
    case Some(cat) =>
      plan.resolveOperatorsUp {
        case a @ SubqueryAlias(id, _) if a.getTagValue(Injected).isEmpty =>
          val fs = MandatoryFilters.filtersFor(id.name, cat)
          if (fs.isEmpty) a
          else {
            a.setTagValue(Injected, ())
            fs.foldLeft(a: LogicalPlan) { (p, f) =>
              Filter(CatalystSqlParser.parseExpression(f), p)
            }
          }
      }
  }
}

object MandatoryFilterRule {
  /** Marks a SubqueryAlias whose mandatory filters are already injected,
    * so the analyzer's fixed-point re-runs don't stack duplicates.
    */
  private val Injected = TreeNodeTag[Unit]("graft.mandatoryFiltersInjected")

  /** Per-session governed catalog. The rule itself is registered at
    * session construction (extensions), but the catalog is DATA — it
    * arrives after the session exists (parsed metadata JSON, a live JDBC
    * walk). Until `install` is called the rule is a no-op pass-through.
    */
  private val catalogs =
    new ConcurrentHashMap[SparkSession, CatalogModel]()

  /** Activate policy injection for `session`. Fails loudly on filters
    * that attach to no table — same contract as the spec-level path.
    */
  def install(session: SparkSession, catalog: CatalogModel): Unit = {
    val dead = MandatoryFilters.unapplicable(catalog)
    require(dead.isEmpty,
      s"mandatory filter(s) resolve on no catalog table — " +
        s"policy constraint would be silently dropped: " +
        dead.mkString("; "))
    catalogs.put(session, catalog)
  }

  def uninstall(session: SparkSession): Unit = catalogs.remove(session)

  /** The extension entry point: one rule instance per session, reading
    * whatever catalog is installed at analysis time.
    */
  def forSession(session: SparkSession): MandatoryFilterRule =
    MandatoryFilterRule(() => Option(catalogs.get(session)))

  /** Governed sibling session for gate/demo paths. Extensions apply only
    * at session CONSTRUCTION, so a driver session built without
    * [[graft.functions.GraftExtensions]] cannot host this rule — build
    * ONE sibling per application on the same SparkContext (memoized via
    * [[graft.ops.SessionScratch]]), restoring the default/active session
    * globals afterwards so the surrounding run is undisturbed. SQL confs
    * (UTC zone, shuffle partitions) are inherited from the SparkConf the
    * first session wrote its builder options into.
    */
  def governedSibling(s: SparkSession): SparkSession =
    graft.ops.SessionScratch.memo("governed_session",
        s.sparkContext.applicationId, "") {
      this.synchronized {
        val prevDefault = SparkSession.getDefaultSession
        val prevActive = SparkSession.getActiveSession
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
        try SparkSession.builder()
          .withExtensions(new graft.functions.GraftExtensions)
          .getOrCreate()
        finally {
          SparkSession.clearActiveSession()
          SparkSession.clearDefaultSession()
          prevDefault.foreach(SparkSession.setDefaultSession)
          prevActive.foreach(SparkSession.setActiveSession)
        }
      }
    }
}
