package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{CosineExact, Dec10, DotExact, HyperSig, NormSqExact, SimHash64, SortedFirstGeq}

/** Spark-native registration of the library's custom Catalyst expressions as
  * SQL functions (SURVEY.md §4: extend via `SparkSessionExtensions`, never a
  * UDF). Two entry points:
  *
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build — the
  *    standard extension hook for clusters;
  *  - [[GraftExtensions.register]] on an existing session — convenient in
  *    notebooks/tests.
  *
  * After registration the engine's primitives compose in plain SQL, e.g.
  * `SELECT cosine_exact(a.embedding, b.embedding) FROM ...` or
  * `SELECT simhash64(split(text, '\\s+')) FROM documents`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  private def unary(name: String, mk: Expression => Expression)
      (args: Seq[Expression]): Expression = args match {
    case Seq(a) => mk(a)
    case _ => throw new IllegalArgumentException(s"$name expects 1 argument, got ${args.size}")
  }

  private def binary(name: String, mk: (Expression, Expression) => Expression)
      (args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => mk(a, b)
    case _ => throw new IllegalArgumentException(s"$name expects 2 arguments, got ${args.size}")
  }

  /** (name, info, builder) for every exported function. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      info("simhash64", "_FUNC_(array<string>) - 64-bit SimHash of a token array."),
      unary("simhash64", SimHash64.apply) _),
    ("cosine_exact",
      info("cosine_exact", "_FUNC_(array<float>, array<float>) - decimal-exact cosine similarity."),
      binary("cosine_exact", CosineExact.apply) _),
    ("dot_exact",
      info("dot_exact", "_FUNC_(array<float>, array<float>) - decimal-exact dot product."),
      binary("dot_exact", DotExact.apply) _),
    ("norm_sq_exact",
      info("norm_sq_exact", "_FUNC_(array<float>) - decimal-exact squared L2 norm."),
      unary("norm_sq_exact", NormSqExact.apply) _),
    ("sorted_first_geq",
      info("sorted_first_geq",
        "_FUNC_(array<bigint>, bigint) - first element >= probe of a sorted array (binary search)."),
      binary("sorted_first_geq", SortedFirstGeq.apply) _),
    ("dec10",
      info("dec10", "_FUNC_(double) - exact DECIMAL(28,10) rounding of a double."),
      unary("dec10", Dec10.apply) _),
    ("hyper_sig",
      info("hyper_sig", "_FUNC_(array<float>, planes) - hyperplane-LSH sign signature."),
      { args: Seq[Expression] =>
        args match {
          case Seq(v, Literal(p: Int, IntegerType)) => HyperSig(v, p)
          case _ => throw new IllegalArgumentException(
            "hyper_sig expects (array<float>, integer literal planes)")
        }
      }))

  /** Register every function on an existing session. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
