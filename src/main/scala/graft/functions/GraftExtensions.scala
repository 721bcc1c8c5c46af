package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions wiring: exposes the engine's native expressions to
  * SQL, so `spark.sql("SELECT cosine_sim(a, b) ...")` plans the codegen'd
  * expressions — the same surface ksqlDB users get from built-in functions.
  *
  * Activate per session with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or at runtime via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "", "", "built-in")

  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    ("graft_hash64",
      info("graft_hash64", "graft_hash64(s) - cross-engine 60-bit md5-derived hash"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.Cast(
          org.apache.spark.sql.catalyst.expressions.Conv(
            org.apache.spark.sql.catalyst.expressions.Substring(
              org.apache.spark.sql.catalyst.expressions.Md5(
                org.apache.spark.sql.catalyst.expressions.Cast(args(0),
                  org.apache.spark.sql.types.BinaryType)),
              org.apache.spark.sql.catalyst.expressions.Literal(1),
              org.apache.spark.sql.catalyst.expressions.Literal(15)),
            org.apache.spark.sql.catalyst.expressions.Literal(16),
            org.apache.spark.sql.catalyst.expressions.Literal(10)),
          org.apache.spark.sql.types.LongType)))

  /** Runtime registration into an existing session (tests, notebooks). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), i, builder)
    }
}
