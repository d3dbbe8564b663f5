package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{CosineSimilarity, PortableHash60}

/** Session extension: registers the engine's native functions for SQL use.
  *
  * Install at session build time:
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions)...
  * }}}
  * or via config: `spark.sql.extensions=graft.GraftExtensions`. After that
  * `SELECT cosine_similarity(a.embedding, b.embedding) ...` works in plain
  * SQL (`spark.sql`), keeping the SQL frontend at parity with the DSL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.descriptors.foreach(ext.injectFunction)
}

object GraftExtensions {
  private[graft] val descriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_similarity"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "cosine_similarity expects 2 arguments")
        CosineSimilarity(children.head, children(1))
      }),
    (FunctionIdentifier("portable_hash60"),
      new ExpressionInfo(classOf[PortableHash60].getName, "portable_hash60"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "portable_hash60 expects 1 argument")
        PortableHash60(children.head)
      }))

  /** Imperative registration for an already-built session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    descriptors.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
