package graft

import graft.functions.{AbnValid, GraftFunctions}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * Session-extensions entry point: add
 * `spark.sql.extensions=graft.GraftExtensions` to a cluster config and
 * the engine's native expressions are available in every session's SQL
 * without touching application code. (In-application callers can use
 * [[graft.functions.GraftFunctions.register]] instead.)
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column => col, expression => expr}

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("abn_valid"),
      new ExpressionInfo(classOf[AbnValid].getName, "abn_valid"),
      exprs => AbnValid(exprs.head)))
    e.injectFunction((
      FunctionIdentifier("token_sort_ratio"),
      new ExpressionInfo(GraftFunctions.getClass.getName, "token_sort_ratio"),
      exprs => expr(GraftFunctions.token_sort_ratio(col(exprs(0)), col(exprs(1))))))
    e.injectFunction((
      FunctionIdentifier("indel_ratio"),
      new ExpressionInfo(GraftFunctions.getClass.getName, "indel_ratio"),
      exprs => expr(GraftFunctions.indel_ratio(col(exprs(0)), col(exprs(1))))))
    e.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(GraftFunctions.getClass.getName, "dot_product"),
      exprs => expr(GraftFunctions.dot_product(col(exprs(0)), col(exprs(1))))))
    e.injectFunction((
      FunctionIdentifier("heavy_hitters"),
      new ExpressionInfo(classOf[graft.functions.HeavyHitters].getName,
        "heavy_hitters"),
      exprs => graft.functions.HeavyHitters(exprs(0), exprs(1))
        .toAggregateExpression()))
    e.injectFunction((
      FunctionIdentifier("hll_registers"),
      new ExpressionInfo(classOf[graft.functions.HllRegisters].getName,
        "hll_registers"),
      exprs => graft.functions.HllRegisters(exprs(0), exprs(1))
        .toAggregateExpression()))
    // whole-operator custom plan: native as-of join (plans.AsofJoinPlan)
    e.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    e.injectOptimizerRule(_ => graft.plans.PruneAsofJoinColumns)
  }
}
