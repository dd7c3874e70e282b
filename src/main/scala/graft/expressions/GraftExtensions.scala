package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point (`spark.sql.extensions=graft.expressions.
  * GraftExtensions`): registers the native graft expressions with the
  * session's function registry so both the DataFrame API (`expr(...)`)
  * and `spark.sql` can call them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.qcosineDescriptor)
  }
}

object GraftExtensions {

  private[expressions] val qcosineDescriptor =
    (new FunctionIdentifier("qcosine"),
      new ExpressionInfo(classOf[QCosine].getName, "qcosine"),
      (args: Seq[Expression]) => {
        require(args.length == 4, "qcosine(qa, qb, nsqa, nsqb)")
        QCosine(args(0), args(1), args(2), args(3))
      })

  /** Late registration for sessions not built with the extension (e.g. a
    * vanilla test session): idempotent, so queries can call it eagerly.
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val (ident, info, builder) = qcosineDescriptor
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(ident.funcName, builder, "built-in")
    val _ = info // ExpressionInfo only matters for DESCRIBE FUNCTION
  }
}
