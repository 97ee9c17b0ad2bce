package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native Catalyst expressions for the vector hot path (SURVEY §2.9:
  * the one place custom-Catalyst budget is genuinely spent).
  *
  * `aggregate(zip_with(a, b, ...))` — the built-in way to fold a dot
  * product — is a HigherOrderFunction, which is CodegenFallback: every
  * element bounces through boxed lambdas and breaks the surrounding
  * WholeStageCodegen stage. At sf0.1 the similarity queries spend most
  * of their time there. [[DotF64]] generates a primitive double loop
  * inline in the stage (doGenCode), keeping the whole operator chain
  * codegen'd.
  *
  * Semantics are IDENTICAL to the HOF fold (and to the DuckDB oracle's
  * `list_reduce(list_transform(...))`): left-to-right IEEE adds over
  * products in array order — results stay bit-for-bit hash-matchable.
  */
case class DotF64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f64 expects (array<double>, array<double>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_f64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session extension registering the graft native functions; enabled
  * via `spark.sql.extensions=graft.functions.GraftExtensions` (set by
  * Verify/Bench/tests), after which `expr("dot_f64(a, b)")` resolves
  * like any built-in. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // Aggregate-navigation rewrite (graft.plans.SummaryRewrite): a
    // no-op until a gate registers a summary in SummaryRegistry.
    ext.injectOptimizerRule(session => new graft.plans.SummaryRewrite(session))
    // Range-join bin rewrite (graft.plans.RangeBinRewrite): a no-op
    // until spark.graft.rangeJoin.binWidth is set.
    ext.injectOptimizerRule(session => new graft.plans.RangeBinRewrite(session))
    // Sketch-driven join-strategy selection (graft.plans.SketchJoinHint):
    // inert unless spark.graft.sketchJoin.thresholdBytes is set AND a
    // statistic is registered in SketchJoinRegistry.
    ext.injectOptimizerRule(session => new graft.plans.SketchJoinHint(session))
    // Whole-operator rung: plans the graft.plans.AsOfJoin logical node
    // (a node only AsOfJoin.asof builds — inert for every other query).
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("dot_f64"),
      new ExpressionInfo(classOf[DotF64].getName, "dot_f64"),
      (children: Seq[Expression]) => DotF64(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("parse_yt_duration"),
      new ExpressionInfo(classOf[ParseYtDuration].getName, "parse_yt_duration"),
      (children: Seq[Expression]) => ParseYtDuration(children.head)))
    ext.injectFunction((
      FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (children: Seq[Expression]) => MinHashSig(children.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("md5h60_array"),
      new ExpressionInfo(classOf[Md5H60Array].getName, "md5h60_array"),
      (children: Seq[Expression]) => Md5H60Array(children.head)))
    def litInt(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
    ext.injectFunction((
      FunctionIdentifier("pq_encode"),
      new ExpressionInfo(classOf[PqEncode].getName, "pq_encode"),
      (children: Seq[Expression]) =>
        PqEncode(children.head, children(1), litInt(children(2), "pq_encode sub_dim"))))
    ext.injectFunction((
      FunctionIdentifier("pq_dist_table"),
      new ExpressionInfo(classOf[PqDistTable].getName, "pq_dist_table"),
      (children: Seq[Expression]) =>
        PqDistTable(children.head, children(1), litInt(children(2), "pq_dist_table sub_dim"))))
    ext.injectFunction((
      FunctionIdentifier("kmv_kmin"),
      new ExpressionInfo(classOf[KmvKMin].getName, "kmv_kmin"),
      (children: Seq[Expression]) => {
        val k = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"kmv_kmin k must be an integer literal, got $other")
        }
        KmvKMin(children.head, k)
      }))
    ext.injectFunction((
      FunctionIdentifier("kll_sketch"),
      new ExpressionInfo(classOf[KllSketchAgg].getName, "kll_sketch"),
      (children: Seq[Expression]) =>
        KllSketchAgg(children.head, litInt(children(1), "kll_sketch k"))))
    ext.injectFunction((
      FunctionIdentifier("mg_topk"),
      new ExpressionInfo(classOf[MgTopKAgg].getName, "mg_topk"),
      (children: Seq[Expression]) =>
        MgTopKAgg(children.head, litInt(children(1), "mg_topk k"))))
  }
}
