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
// Blocking modes (spark.dedupspark.similarityRewrite.keyMode):
//   sortedTokens (default) — keys are the first TWO tokens of
//     sort_array(split(lower(trim(arg)), "\s+")). The join becomes a
//     UNION of two equi-joins: branch 1 matches on token-key 1; branch
//     2 matches on token-key 2 AND NOT key-1-equal, so the branches are
//     disjoint and the union adds no duplicate pairs (exact-cardinality
//     OR-to-union decomposition; both branches reuse the same child
//     plans, so the exchanges dedupe via ReusedExchange). Word
//     reorderings and first-word typos block together — the documented
//     cross-prefix recall loss of `prefix` mode shrinks to pairs that
//     disagree on BOTH smallest sorted tokens (e.g. single-token typo
//     strings).
//   prefix — the round-4 single key: first `prefixLen` chars of
//     lower(trim(arg)); pairs whose prefixes differ are never generated.
// OR-composed predicates (sim(a) >= t OR sim(b) >= t) and non-inner
// joins are left untouched. The rewrite is doubly opt-in: loading the
// extension jar, AND the UDF's name must appear EXACTLY
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

  private def keyMode: String =
    SQLConf.get
      .getConfString(SimilarityJoinRewrite.KEY_MODE_KEY, "sortedTokens")

  /** Blocking keys for one side. `prefix`: one substring key.
   *  `sortedTokens`: the two smallest whitespace tokens (null-safe —
   *  GetArrayItem(failOnError = false) yields null past the end, and a
   *  null key simply matches nothing, which is also what the UDF
   *  threshold would decide for such rows). */
  private def blockKeys(e: Expression): Seq[Expression] = keyMode match {
    case "prefix" =>
      Seq(Substring(Lower(StringTrim(e)), Literal(1), Literal(prefixLen)))
    case _ =>
      val toks = SortArray(
        StringSplit(Lower(StringTrim(e)), Literal("\\s+"), Literal(-1)),
        Literal(true))
      Seq(
        GetArrayItem(toks, Literal(0), failOnError = false),
        GetArrayItem(toks, Literal(1), failOnError = false))
  }

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
      y: Expression): Option[LogicalPlan] = {
    val eqs = blockKeys(x).zip(blockKeys(y)).map {
      case (a, b) => EqualTo(a, b)
    }
    val conjuncts =
      j.condition.toSeq.flatMap(splitConjunctivePredicates)
    // idempotence under the optimizer's fix-point: a branch we already
    // built carries its block-key conjunct
    if (eqs.exists(conjuncts.contains)) None
    else
      eqs match {
        case Seq(eq) =>
          val cond = j.condition.map(And(eq, _)).getOrElse(eq)
          Some(j.copy(joinType = Inner, condition = Some(cond)))
        case Seq(eq1, eq2) =>
          // disjoint union: branch 2 takes only pairs branch 1 missed,
          // so cardinality is exactly the any-key-overlap pair set
          val c1 = j.condition.map(And(eq1, _)).getOrElse(eq1)
          val b2 = And(eq2, Not(eq1))
          val c2 = j.condition.map(And(b2, _)).getOrElse(b2)
          Some(Union(Seq(
            j.copy(joinType = Inner, condition = Some(c1)),
            j.copy(joinType = Inner, condition = Some(c2)))))
        case _ => None
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
  val KEY_MODE_KEY = "spark.dedupspark.similarityRewrite.keyMode"
  // the engine's own post-blocking rescorer (functions/similarity.py)
  val DEFAULT_UDF_NAMES = "ratcliff_similarity"
}

class SimilarityExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(_ => new SimilarityJoinRewrite)
}
