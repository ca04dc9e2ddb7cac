package org.apache.spark.sql.graftshim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** Registers expression builders into an EXISTING session's function
  * registry (sessionState is private[sql], hence the shim). For new
  * sessions prefer `graft.GraftExtensions` via
  * `SparkSession.builder().withExtensions(...)`. */
object FunctionRegistration {
  def registerTemp(spark: SparkSession,
      fns: Seq[(String, Seq[Expression] => Expression)]): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "scala_udf")
    }
}
