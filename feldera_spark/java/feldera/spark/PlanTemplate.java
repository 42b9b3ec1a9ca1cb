package feldera.spark;

import java.util.HashMap;
import org.apache.spark.sql.catalyst.expressions.Alias;
import org.apache.spark.sql.catalyst.expressions.Attribute;
import org.apache.spark.sql.catalyst.expressions.NamedExpression;
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan;
import org.apache.spark.sql.catalyst.plans.logical.Project;
import org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias;
import scala.collection.Seq;
import scala.collection.mutable.ArrayBuffer;
import scala.runtime.AbstractPartialFunction;

/**
 * JVM-side plan-template leaf rebinding.
 *
 * The engine's circuit steps re-evaluate the SAME ~fixed plan shapes
 * every step with only the leaf relations (the step's delta, the current
 * state frame) changing. Rebuilding those DataFrame ASTs from Python
 * costs ~1000 py4j round trips per step on a 3-view DAG (measured,
 * SCALE.md round-10 profile) — the per-step driver floor. The reference
 * engine compiles its circuit once and steps it many times
 * (dbsp_handle.rs:1712); this helper is the Spark analogue: the Python
 * side builds each step plan ONCE over marker leaves (empty
 * LocalRelations wrapped in uniquely-named SubqueryAlias nodes) and per
 * step makes ONE call here to splice the real leaves in.
 *
 * The splice keeps the template's attribute exprIds: each marker
 * occurrence is replaced by SubqueryAlias(name, Project(alias new leaf
 * columns BY NAME to the old occurrence's exprIds, newLeafPlan)), so
 * every reference above the leaf stays valid and no analysis-time
 * rewrite of the template is needed. Dataset.ofRows re-runs the analyzer
 * on the spliced tree (a fixpoint no-op pass over an already-analyzed
 * plan) — milliseconds, JVM-side, vs hundreds of py4j round trips.
 */
public class PlanTemplate {

  /** Rebind template's marker leaves (SubqueryAlias nodes named
   * markers[i]) to leaves[i] (Datasets whose analyzed plans replace the
   * marker children). Column matching is BY NAME; a missing column
   * throws. Returns a new Dataset of Row on the template's session. */
  public Object rebind(Object templateDs, String[] markers, Object[] leafDs) {
    org.apache.spark.sql.classic.Dataset<?> template =
        (org.apache.spark.sql.classic.Dataset<?>) templateDs;
    final HashMap<String, LogicalPlan> newLeaves = new HashMap<>();
    for (int i = 0; i < markers.length; i++) {
      org.apache.spark.sql.classic.Dataset<?> leaf =
          (org.apache.spark.sql.classic.Dataset<?>) leafDs[i];
      newLeaves.put(markers[i], leaf.queryExecution().analyzed());
    }
    LogicalPlan plan = template.queryExecution().analyzed();
    LogicalPlan rebound = plan.transformUp(substitution(newLeaves));
    // The spliced tree is fully resolved by construction (analyzed
    // template + analyzed leaves + by-name Alias projections keeping the
    // template's exprIds/dtypes), but transformUp's node copies reset
    // the _analyzed flag, so Dataset.ofRows would re-run the analyzer
    // fixpoint over the whole tree (state leaves are deep) on EVERY
    // step — measured ~25 ms per rebind, the dominant residual
    // driver-phase cost. Marking the tree analyzed takes
    // Analyzer.executeAndCheck's `if (plan.analyzed) return plan` fast
    // path; any rule that could fire on this tree already fired when
    // the template itself was analyzed (the only new nodes are the
    // resolved Alias projections). setAnalyzed() is private[catalyst],
    // which compiles to a public method in bytecode.
    rebound.setAnalyzed();
    return org.apache.spark.sql.classic.Dataset.ofRows(
        template.sparkSession(), rebound);
  }

  /** Batched rebind: one py4j round trip for N templates sharing one
   * leaf map (a whole circuit step's plan trees). */
  public Object[] rebindMany(
      Object[] templateDs, String[] markers, Object[] leafDs) {
    Object[] out = new Object[templateDs.length];
    for (int i = 0; i < templateDs.length; i++) {
      out[i] = rebind(templateDs[i], markers, leafDs);
    }
    return out;
  }

  @SuppressWarnings({"unchecked", "rawtypes"})
  private static AbstractPartialFunction substitution(
      final HashMap<String, LogicalPlan> newLeaves) {
    return new AbstractPartialFunction() {
      @Override
      public boolean isDefinedAt(Object p) {
        return p instanceof SubqueryAlias
            && newLeaves.containsKey(((SubqueryAlias) p).alias());
      }

      @Override
      public Object applyOrElse(Object p, scala.Function1 dflt) {
        if (!(p instanceof SubqueryAlias)) return dflt.apply(p);
        SubqueryAlias sa = (SubqueryAlias) p;
        LogicalPlan leaf = newLeaves.get(sa.alias());
        if (leaf == null) return dflt.apply(p);
        HashMap<String, Attribute> byName = new HashMap<>();
        Seq<Attribute> newOut = leaf.output();
        for (int i = 0; i < newOut.size(); i++) {
          Attribute a = newOut.apply(i);
          byName.put(a.name(), a);
        }
        Seq<Attribute> oldOut = sa.output();
        ArrayBuffer<NamedExpression> projs = new ArrayBuffer<>();
        for (int i = 0; i < oldOut.size(); i++) {
          Attribute oldA = oldOut.apply(i);
          Attribute newA = byName.get(oldA.name());
          if (newA == null)
            throw new IllegalArgumentException(
                "plan-template rebind: leaf '" + sa.alias()
                    + "' is missing column " + oldA.name());
          // schema-compat gate, HERE instead of a per-bind Python-side
          // schema fetch (which costs a full analysis round trip per
          // leaf per step): a type drift must not splice — resolved
          // attributes above the leaf carry the template's dtype by
          // exprId and the analyzer does not re-bind them.
          if (!org.apache.spark.sql.types.DataType$.MODULE$
              .equalsIgnoreNullability(newA.dataType(), oldA.dataType()))
            throw new IllegalArgumentException(
                "plan-template rebind: leaf '" + sa.alias() + "' column "
                    + oldA.name() + " drifted from "
                    + oldA.dataType().simpleString() + " to "
                    + newA.dataType().simpleString());
          projs.$plus$eq(
              new Alias(
                  newA,
                  oldA.name(),
                  oldA.exprId(),
                  scala.collection.immutable.Seq$.MODULE$.<String>empty(),
                  scala.Option.empty(),
                  scala.collection.immutable.Seq$.MODULE$.<String>empty()));
        }
        return new SubqueryAlias(sa.identifier(), new Project(projs.toSeq(), leaf));
      }
    };
  }
}
