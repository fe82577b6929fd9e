// SURVEY.md §4 optional optimizer extension: auto-rewrite the "faithful"
// UDF-theta similarity join into a blocked equi-join.
//
// The reference's Task-2 spelling (soulutionOne.py:53-57) scores every
// pair of rows with a Python similarity UDF — a Cartesian product that
// cannot scale. The engine already ships the API-level rewrite
// (operators/linkage.py::blocked_similarity_join); this Catalyst rule
// applies the same blocking TRANSPARENTLY to the faithful spelling, so
// `a.join(b, similarity(a.c, b.c) >= t)` plans as a hash/sort-merge
// equi-join on a cheap prefix key with the original UDF threshold still
// verifying every surviving pair.
//
// Recall contract (identical to blocked_similarity_join(prefix_key)):
// pairs whose first `prefixLen` chars of lower(trim(arg)) differ are
// never generated. OR-composed predicates (sim(a) >= t OR sim(b) >= t)
// and non-inner joins are left untouched. The rewrite is doubly opt-in:
// loading the extension jar, AND the UDF's name must appear EXACTLY
// (case-insensitive) in spark.dedupspark.similarityRewrite.udfNames —
// a name-substring match would silently drop cross-prefix pairs from
// unrelated user UDFs that merely contain "similarity" (ADVICE r4).
// spark.dedupspark.similarityRewrite.enabled=false disables at runtime.
package dedupspark.extensions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

class SimilarityJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    SQLConf.get
      .getConfString(SimilarityJoinRewrite.ENABLED_KEY, "true")
      .toBoolean

  private def prefixLen: Int =
    SQLConf.get
      .getConfString(SimilarityJoinRewrite.PREFIX_LEN_KEY, "4")
      .toInt

  private def udfNames: Set[String] =
    SQLConf.get
      .getConfString(
        SimilarityJoinRewrite.UDF_NAMES_KEY,
        SimilarityJoinRewrite.DEFAULT_UDF_NAMES)
      .split(",")
      .iterator
      .map(_.trim.toLowerCase)
      .filter(_.nonEmpty)
      .toSet

  private def blockKey(e: Expression): Expression =
    Substring(Lower(StringTrim(e)), Literal(1), Literal(prefixLen))

  /** First conjunct shaped `similarity_udf(x, y) >= lit` whose two
   *  argument expressions resolve cleanly to opposite join sides,
   *  returned as (left-side arg, right-side arg). */
  private def simArgs(
      cond: Expression,
      l: LogicalPlan,
      r: LogicalPlan): Option[(Expression, Expression)] =
    splitConjunctivePredicates(cond).iterator
      .map {
        case GreaterThanOrEqual(u: PythonUDF, _: Literal)
            if udfNames.contains(u.name.toLowerCase) &&
              u.children.size == 2 =>
          val x = u.children(0)
          val y = u.children(1)
          if (x.references.subsetOf(l.outputSet) &&
              y.references.subsetOf(r.outputSet)) Some((x, y))
          else if (y.references.subsetOf(l.outputSet) &&
                   x.references.subsetOf(r.outputSet)) Some((y, x))
          else None
        case _ => None
      }
      .collectFirst { case Some(p) => p }

  private def withBlock(
      j: Join,
      x: Expression,
      y: Expression): Option[Join] = {
    val eq = EqualTo(blockKey(x), blockKey(y))
    val present =
      j.condition.exists(c => splitConjunctivePredicates(c).contains(eq))
    if (present) None
    else {
      val cond = j.condition.map(And(eq, _)).getOrElse(eq)
      Some(j.copy(joinType = Inner, condition = Some(cond)))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      // faithful spelling: the UDF threshold lives in the join condition
      case j @ Join(l, r, Inner | Cross, Some(cond), _) =>
        simArgs(cond, l, r)
          .flatMap { case (x, y) => withBlock(j, x, y) }
          .getOrElse(j)
      // crossJoin().filter(...) spelling: threshold in a Filter above
      case f @ Filter(cond, j @ Join(l, r, Inner | Cross, _, _)) =>
        simArgs(cond, l, r)
          .flatMap { case (x, y) => withBlock(j, x, y) }
          .map(nj => Filter(cond, nj))
          .getOrElse(f)
    }
  }
}

object SimilarityJoinRewrite {
  val ENABLED_KEY = "spark.dedupspark.similarityRewrite.enabled"
  val PREFIX_LEN_KEY = "spark.dedupspark.similarityRewrite.prefixLen"
  val UDF_NAMES_KEY = "spark.dedupspark.similarityRewrite.udfNames"
  // the engine's own post-blocking rescorer (functions/similarity.py)
  val DEFAULT_UDF_NAMES = "ratcliff_similarity"
}

class SimilarityExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => new SimilarityJoinRewrite)
}
