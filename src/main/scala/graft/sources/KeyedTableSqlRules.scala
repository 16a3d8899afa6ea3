package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, MergeIntoTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Analyzer fix-up for the ONE SQL row-level statement Spark plans
  * AROUND the connector instead of through it: an INSERT-ONLY
  * `MERGE INTO` (no MATCHED / NOT MATCHED BY SOURCE clauses) is
  * rewritten by Spark's own RewriteMergeIntoTable into a plain append
  * behind a LEFT ANTI join against the target's ORDINARY scan — the
  * row-level operation (and its current-state scan) is never built.
  * Over a multi-version keyed table the ordinary scan is the commit
  * LOG, so "NOT MATCHED" would mean "never written" instead of
  * "currently absent": a key whose only log presence is dead versions
  * under a tombstone would wrongly refuse its re-insert.
  *
  * This rule runs in the HINT-RESOLUTION stage — before Spark's
  * Resolution batch, while the MERGE target is still an
  * [[UnresolvedRelation]] — and stamps `view=current` onto the
  * target's read options whenever the statement is insert-only and
  * addresses a [[KeyedTableCatalog]] table. The option rides relation
  * resolution into [[KeyedTable.KTable.newScanBuilder]], which then
  * resolves the table's current state merge-on-read: the anti-join
  * matches exactly the live keys, which is what SQL MERGE means.
  * Multi-clause MERGE, UPDATE, and DELETE never get here — Spark
  * plans them through SupportsRowLevelOperations, whose scan resolves
  * already.
  *
  * Wire with the rest of the engine's extensions:
  * `spark.sql.extensions=graft.functions.GraftExtensions` (the same
  * session wiring Iceberg's MERGE support used before Spark 3.4).
  */
final class InsertOnlyMergeCurrentState(session: SparkSession)
    extends Rule[LogicalPlan] {

  /** Does this multipart identifier address a [[KeyedTableCatalog]]
    * table? The catalog may be registered under ANY name (the session
    * conf is the truth), SQL identifiers are case-insensitive, and a
    * name with no catalog part (or whose head is not a registered
    * catalog at all) resolves against the session's CURRENT catalog —
    * `USE graft_keyed; MERGE INTO t ...` must get the current-state
    * anti-join exactly like the fully qualified spelling, or a
    * tombstoned key's re-insert silently drops. */
  private[graft] def isKeyedCatalog(parts: Seq[String]): Boolean = {
    val impl = classOf[KeyedTableCatalog].getName
    val prefix = "spark.sql.catalog."
    def catalogImpl(name: String): Option[String] =
      session.conf.getAll.collectFirst {
        case (k, v) if k.startsWith(prefix) && !k.drop(prefix.length)
          .contains('.') && k.drop(prefix.length).equalsIgnoreCase(name) => v
      }
    def currentIsKeyed: Boolean =
      session.sessionState.catalogManager.currentCatalog
        .isInstanceOf[KeyedTableCatalog]
    // The built-in session catalog is registered under
    // CatalogManager.SESSION_CATALOG_NAME without a
    // `spark.sql.catalog.spark_catalog` conf key, so conf-scanning
    // alone would misread `spark_catalog.db.t` as a namespace under
    // the current (possibly keyed) catalog. It is never a
    // KeyedTableCatalog unless a conf key explicitly rebinds it.
    // (CatalogManager.SESSION_CATALOG_NAME — the class is private[sql],
    // the name is Spark's stable public spelling.)
    val sessionCatalog = "spark_catalog"
    if (parts.length >= 2) catalogImpl(parts.head) match {
      case Some(v) => v == impl // head IS a registered catalog
      case None if parts.head.equalsIgnoreCase(sessionCatalog) => false
      case None => currentIsKeyed // head is a namespace under the current one
    }
    else currentIsKeyed
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsDown {
      case m: MergeIntoTable
          if m.matchedActions.isEmpty && m.notMatchedActions.nonEmpty &&
            m.notMatchedBySourceActions.isEmpty =>
        val target = m.targetTable.transformDown {
          case u: UnresolvedRelation
              if isKeyedCatalog(u.multipartIdentifier) &&
                !u.options.containsKey("view") =>
            val merged = new java.util.HashMap[String, String](
              u.options.asCaseSensitiveMap())
            merged.put("view", "current")
            u.copy(options = new CaseInsensitiveStringMap(merged))
        }
        if (target eq m.targetTable) m else m.copy(targetTable = target)
    }
}
