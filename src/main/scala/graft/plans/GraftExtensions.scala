package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
import graft.functions.{AdjacentPairs, ByteNgrams, NfcNormalize, RollingHash, Sigmoid, VecDot}

/** Optimizer rule: recognize the composed sigmoid pattern
  * `1.0 / (1.0 + exp(-x))` anywhere in a plan and collapse it into the
  * single native [[Sigmoid]] expression — one codegen call instead of
  * four expression nodes. Demonstrates the `Rule[LogicalPlan]`
  * extension point (SURVEY §4.2 item 3); semantics are bit-identical
  * so it is safe under the DuckDB oracle gate.
  */
object RewriteSigmoid extends Rule[LogicalPlan] {
  private object One {
    def unapply(e: Expression): Boolean = e match {
      case Literal(1.0, DoubleType) => true
      case _ => false
    }
  }
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Divide(One(), Add(One(), Exp(UnaryMinus(x, _)), _), _) => Sigmoid(x)
    }
}

/** Optimizer rule: recognize the declarative dot-product pattern
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0, (acc, v) -> acc + v)`
  * (with optional to-double casts inside the multiply) and collapse it
  * into the fused [[VecDot]] kernel — one primitive loop instead of a
  * materialized zipped array per row. Safe unconditionally on
  * float/double arrays because VecDot reproduces the composed form's
  * null semantics exactly: null array, null element, and mismatched
  * lengths (zip_with null-pads the short side) all poison the
  * composed sum to null, and VecDot returns null in the same cases.
  */
object RewriteVecDot extends Rule[LogicalPlan] {

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, DoubleType, _, _) => stripCast(c)
    case other => other
  }

  private def isVar(e: Expression, v: NamedLambdaVariable): Boolean =
    e match {
      case nv: NamedLambdaVariable => nv.exprId == v.exprId
      case _ => false
    }

  private def denseVec(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ArrayAggregate(
          ZipWith(l, r, LambdaFunction(mul: Multiply,
            Seq(x: NamedLambdaVariable, y: NamedLambdaVariable), _)),
          Literal(0.0, DoubleType),
          LambdaFunction(add: Add,
            Seq(acc: NamedLambdaVariable, el: NamedLambdaVariable), _),
          LambdaFunction(fin, Seq(fv: NamedLambdaVariable), _))
        if isVar(stripCast(mul.left), x) && isVar(stripCast(mul.right), y) &&
          ((isVar(add.left, acc) && isVar(add.right, el)) ||
            (isVar(add.left, el) && isVar(add.right, acc))) &&
          isVar(fin, fv) && denseVec(l) && denseVec(r) =>
        VecDot(l, r)
    }
}

/** Whole-PLAN optimizer rule: recognize the MapReduce-style relational
  * matvec — `posexplode(x) ⋈ posexplode(w) ON pos → GROUP BY → SUM(x*w)`
  * (q11's shape, the reference's `rbmmapper.java:144-183` expressed
  * relationally) — and collapse the explode/join/re-aggregate into a
  * join of the UN-exploded rows with one fused
  * `SUM(graft_vec_dot_matched(x, w))` per pair: no row explosion (64×
  * here), no position-key shuffle, one primitive loop per vector pair.
  *
  * Soundness (why every matched plan can be rewritten blindly):
  *   - [[graft.functions.VecDotMatched]] reproduces the join+SUM
  *     semantics exactly: positions beyond the shorter array don't
  *     join (ignored), null elements make null products which SUM
  *     skips (skipped), all-null means SUM over nulls (null result).
  *   - Group EXISTENCE: a row whose array is null/empty emits zero
  *     posexplode rows, so it vanishes from the aggregate; the rewrite
  *     re-creates that with explicit `IsNotNull ∧ size > 0` filters on
  *     both inputs (usually already present via
  *     InferFiltersFromGenerate — the extra copy folds away).
  *   - The rule bails unless EVERY aggregate in the Aggregate node is
  *     the matched sum (a stray `count(*)` counts matched positions,
  *     which the fused form no longer materializes) and no other
  *     expression references the exploded columns.
  */
object RewriteMatvecJoin extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
  import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Generate, Join, Project}
  import org.apache.spark.sql.catalyst.plans.logical.JoinHint
  import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Sum}
  import graft.functions.VecDotMatched

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast if c.dataType == DoubleType => stripCast(c.child)
    case other => other
  }

  private case class Matvec(embL: Expression, xval: Attribute,
      embR: Expression, wval: Attribute,
      lChild: LogicalPlan, rChild: LogicalPlan, hint: JoinHint)

  /** Matches the (optionally Project-capped) inner equi-join of two
    * non-outer posexplodes on their position outputs. Restricted to
    * float/double arrays (integer arrays' exact long-sum semantics and
    * result type would change under double accumulation); additionally
    * [[isMatchedMul]] requires the multiply itself to be double-typed,
    * so float elements fuse only when the query already casts them to
    * double before multiplying — exactly VecDotMatched's arithmetic.
    */
  private object ExplodedJoin {
    private def fpArray(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    def unapply(p: LogicalPlan): Option[Matvec] = p match {
      case Project(projList, child) if projList.forall(_.isInstanceOf[Attribute]) =>
        unapply(child)
      case Join(
          Generate(PosExplode(embL), _, false, _, Seq(posL, xvalL), lChild),
          Generate(PosExplode(embR), _, false, _, Seq(posR, wvalR), rChild),
          Inner, Some(EqualTo(a, b)), hint)
          if ((a.semanticEquals(posL) && b.semanticEquals(posR)) ||
            (a.semanticEquals(posR) && b.semanticEquals(posL))) &&
            embL.deterministic && embR.deterministic &&
            fpArray(embL) && fpArray(embR) =>
        Some(Matvec(embL, xvalL, embR, wvalR, lChild, rChild, hint))
      case _ => None
    }
  }

  private def isMatchedMul(e: Expression, m: Matvec): Boolean =
    stripCast(e) match {
      // the multiply must itself be DOUBLE-typed: float arrays summed
      // through an uncast float×float multiply round the product to
      // fp32 first, which VecDotMatched's double×double arithmetic
      // would not reproduce bit-for-bit — only the explicitly
      // cast-to-double form (or native double arrays) is fused
      case mul: Multiply if mul.dataType == DoubleType =>
        val l = stripCast(mul.left); val r = stripCast(mul.right)
        (l.semanticEquals(m.xval) && r.semanticEquals(m.wval)) ||
          (l.semanticEquals(m.wval) && r.semanticEquals(m.xval))
      case _ => false
    }

  private def sound(grouping: Seq[Expression],
      aggExprs: Seq[NamedExpression], m: Matvec): Boolean = {
    val childOut = m.lChild.outputSet ++ m.rChild.outputSet
    grouping.forall {
      case a: Attribute => childOut.contains(a)
      case _ => false
    } &&
    aggExprs.forall(_.collect { case ae: AggregateExpression => ae }.forall {
      case AggregateExpression(s: Sum, _, false, None, _) =>
        isMatchedMul(s.child, m)
      case _ => false
    }) && {
      // with every aggregate verified above, blank them out and require
      // the residue to reference only un-exploded columns
      val residue = aggExprs.map(_.transform {
        case _: AggregateExpression => Literal(0.0)
      })
      residue.forall(_.references.subsetOf(childOut))
    }
  }

  private def nonEmptyArrays(child: LogicalPlan, emb: Expression): LogicalPlan =
    Filter(And(IsNotNull(emb), GreaterThan(Size(emb), Literal(0))), child)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Aggregate(grouping, aggExprs, ExplodedJoin(m), aggHint)
        if sound(grouping, aggExprs, m) =>
      val dot = VecDotMatched(m.embL, m.embR)
      val newAggExprs = aggExprs.map(_.transform {
        case ae @ AggregateExpression(s: Sum, _, false, None, _)
            if isMatchedMul(s.child, m) =>
          ae.copy(aggregateFunction =
            s.withNewChildren(Seq(dot)).asInstanceOf[Sum])
      }.asInstanceOf[NamedExpression])
      Aggregate(grouping, newAggExprs,
        Join(nonEmptyArrays(m.lChild, m.embL),
          nonEmptyArrays(m.rChild, m.embR), Cross, None, m.hint), aggHint)
  }
}

/** `SparkSessionExtensions` installer: SQL-function registration for
  * the native expressions plus the sigmoid rewrite rule. Activate with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or per-session
  * `withExtensions`); sessions without the config can inject the rule
  * at runtime via `spark.experimental.extraOptimizations`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => RewriteSigmoid)
    e.injectOptimizerRule(_ => RewriteVecDot)
    e.injectOptimizerRule(_ => RewriteMatvecJoin)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_sigmoid"),
      new ExpressionInfo(classOf[Sigmoid].getName, "graft_sigmoid"),
      buildSigmoid))
    e.injectFunction((new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_rolling_hash"),
      new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
      buildRollingHash))
    e.injectFunction((new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "graft_vec_dot"),
      buildVecDot))
    e.injectFunction((new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_adjacent_pairs"),
      new ExpressionInfo(classOf[AdjacentPairs].getName, "graft_adjacent_pairs"),
      buildAdjacentPairs))
    e.injectFunction((new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_byte_ngrams"),
      new ExpressionInfo(classOf[ByteNgrams].getName, "graft_byte_ngrams"),
      buildByteNgrams))
    e.injectFunction((new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc_normalize"),
      buildNfcNormalize))
    e.injectFunction((new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_theta_sketch_agg"),
      new ExpressionInfo(classOf[graft.functions.ThetaSketchAgg].getName,
        "graft_theta_sketch_agg"),
      buildThetaSketchAgg))
    e.injectFunction((new org.apache.spark.sql.catalyst.FunctionIdentifier("graft_kll_sketch_agg"),
      new ExpressionInfo(classOf[graft.functions.KllSketchAgg].getName,
        "graft_kll_sketch_agg"),
      buildKllSketchAgg))
  }
}

/** The SQL-name builders, shared between [[GraftExtensions]] and
  * runtime `functionRegistry` registration. Each validates arity
  * first — a friendly analysis-time error (Spark's own WRONG_NUM_ARGS
  * condition, matching checkInputDataTypes' style) instead of an
  * IndexOutOfBoundsException from blind children(i) indexing — and
  * casts the child exactly like the Column API surface does (a raw
  * int/long argument would otherwise ClassCastException at eval).
  */
object GraftExtensions {

  private def requireArity(name: String, expected: Int,
      children: Seq[Expression]): Unit =
    if (children.length != expected)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> s"`$name`",
          "expectedNum" -> expected.toString,
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))

  val buildSigmoid: Seq[Expression] => Expression = { children =>
    requireArity("graft_sigmoid", 1, children)
    Sigmoid(Cast(children.head, org.apache.spark.sql.types.DoubleType))
  }

  val buildRollingHash: Seq[Expression] => Expression = { children =>
    requireArity("graft_rolling_hash", 1, children)
    RollingHash(Cast(children.head, org.apache.spark.sql.types.StringType))
  }

  val buildVecDot: Seq[Expression] => Expression = { children =>
    requireArity("graft_vec_dot", 2, children)
    VecDot(children(0), children(1))
  }

  val buildAdjacentPairs: Seq[Expression] => Expression = { children =>
    requireArity("graft_adjacent_pairs", 1, children)
    AdjacentPairs(children.head)
  }

  val buildByteNgrams: Seq[Expression] => Expression = { children =>
    requireArity("graft_byte_ngrams", 2, children)
    // The builder runs at function resolution, BEFORE constant
    // folding, so a constant n can still arrive as an unfolded tree
    // (1+1, CAST(2 AS INT)) — fold any foldable integral expression
    // here rather than demanding a bare Literal, and reject the rest
    // with the dedicated non-foldable-argument error class instead of
    // a misleading WRONG_NUM_ARGS (the arity IS correct).
    val n = children(1) match {
      case e if e.foldable &&
          (e.dataType == org.apache.spark.sql.types.IntegerType ||
            e.dataType == org.apache.spark.sql.types.ShortType ||
            e.dataType == org.apache.spark.sql.types.ByteType ||
            e.dataType == org.apache.spark.sql.types.LongType) =>
        e.eval() match {
          case i: Int => i
          case s: Short => s.toInt
          case b: Byte => b.toInt
          // SQL integer literals default to the narrowest fitting type,
          // but 2L / CAST(2 AS BIGINT) are just as foldable — raising
          // NON_FOLDABLE_ARGUMENT for them would be a lie. Accept any
          // long whose value fits an Int; out-of-range gets the
          // value-range error, not the foldability one.
          case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
          case l: Long => throw new IllegalArgumentException(
            s"graft_byte_ngrams: n=$l is out of Int range")
          case null => throw new org.apache.spark.sql.AnalysisException(
            errorClass = "NON_FOLDABLE_ARGUMENT",
            messageParameters = Map(
              "funcName" -> "`graft_byte_ngrams`",
              "paramName" -> "`n`", "paramType" -> "\"INT\""))
        }
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> "`graft_byte_ngrams`",
          "paramName" -> "`n`", "paramType" -> "\"INT\""))
    }
    ByteNgrams(Cast(children.head, org.apache.spark.sql.types.StringType), n)
  }

  val buildNfcNormalize: Seq[Expression] => Expression = { children =>
    requireArity("graft_nfc_normalize", 1, children)
    NfcNormalize(Cast(children.head, org.apache.spark.sql.types.StringType))
  }

  // SQL surface: graft_theta_sketch_agg(col [, nominalEntries]).
  // The optional second argument must be a foldable integer — the
  // sketch size is plan-time configuration, not per-row data.
  val buildThetaSketchAgg: Seq[Expression] => Expression = { children =>
    if (children.isEmpty || children.length > 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`graft_theta_sketch_agg`",
          "expectedNum" -> "1 or 2",
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    val nom = if (children.length == 2) children(1) match {
      case e if e.foldable => e.eval() match {
        // same range check on both literal widths: an unchecked Int 0
        // or negative would pass analysis and surface later as an
        // opaque DataSketches exception instead of this message
        case i: Int if i >= 1 => i
        case l: Long if l >= 1 && l <= Int.MaxValue => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_theta_sketch_agg: bad nominalEntries $other")
      }
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> "`graft_theta_sketch_agg`",
          "paramName" -> "`nominalEntries`", "paramType" -> "\"INT\""))
    } else 4096
    graft.functions.ThetaSketchAgg(children.head, nom).toAggregateExpression()
  }

  // SQL surface: graft_kll_sketch_agg(col [, k]) — same foldable-k
  // contract as the theta aggregate; input is cast to double like the
  // Column surface does.
  val buildKllSketchAgg: Seq[Expression] => Expression = { children =>
    if (children.isEmpty || children.length > 2)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map(
          "functionName" -> "`graft_kll_sketch_agg`",
          "expectedNum" -> "1 or 2",
          "actualNum" -> children.length.toString,
          "docroot" -> "https://spark.apache.org/docs/latest"))
    val k = if (children.length == 2) children(1) match {
      case e if e.foldable => e.eval() match {
        // KLL's documented minimum k = 8, enforced on BOTH literal
        // widths (the Int branch previously accepted any value)
        case i: Int if i >= 8 => i
        case l: Long if l >= 8 && l <= Int.MaxValue => l.toInt
        case other => throw new IllegalArgumentException(
          s"graft_kll_sketch_agg: bad k $other")
      }
      case _ => throw new org.apache.spark.sql.AnalysisException(
        errorClass = "NON_FOLDABLE_ARGUMENT",
        messageParameters = Map(
          "funcName" -> "`graft_kll_sketch_agg`",
          "paramName" -> "`k`", "paramType" -> "\"INT\""))
    } else 200
    graft.functions.KllSketchAgg(
      Cast(children.head, org.apache.spark.sql.types.DoubleType), k)
      .toAggregateExpression()
  }
}
