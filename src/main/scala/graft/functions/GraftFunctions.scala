package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SQL registration for the native expressions, so `spark.sql("SELECT
 * graft_cosine(a, b) ...")` works for SQL-only users:
 *
 *  - [[GraftExtensions]] is the `spark.sql.extensions` entry point
 *    (`--conf spark.sql.extensions=graft.functions.GraftExtensions`)
 *    for cluster deployments;
 *  - [[GraftFunctions.register]] injects into an existing session
 *    (tests, notebooks).
 */
object GraftFunctions {

  private def arity(name: String, n: Int)(f: Seq[Expression] => Expression)
  : Seq[Expression] => Expression = { args =>
    if (args.length != n) throw new IllegalArgumentException(
      s"$name expects $n argument(s), got ${args.length}")
    f(args)
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> arity("graft_cosine", 2) { args => CosineSimilarity(args(0), args(1)) },
    "graft_dot" -> arity("graft_dot", 2) { args => DotProduct(args(0), args(1)) },
    "graft_int8_dot" -> arity("graft_int8_dot", 2) { args => Int8DotProduct(args(0), args(1)) },
    "graft_int8_cosine" -> arity("graft_int8_cosine", 2) { args =>
      Int8CosineSimilarity(args(0), args(1)) },
    "graft_rolling_hash" -> arity("graft_rolling_hash", 1) { args => RollingHash(args(0)) },
    "graft_jaro_winkler" -> arity("graft_jaro_winkler", 2) { args =>
      JaroWinkler(args(0), args(1)) },
    "graft_sorted_intersect_count" -> arity("graft_sorted_intersect_count", 2) { args =>
      SortedIntersectCount(args(0), args(1)) },
    "graft_nfc" -> arity("graft_nfc", 1) { args => NormalizeNfc(args(0)) },
    "graft_shingle_hashes" -> arity("graft_shingle_hashes", 3) { args =>
      def lit[T](e: Expression, what: String): Any =
        if (e.foldable) e.eval()
        else throw new IllegalArgumentException(s"graft_shingle_hashes $what must be a literal")
      val n = lit(args(1), "n") match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(s"n must be an integer, got $other")
      }
      val distinct = lit(args(2), "distinct") match {
        case b: Boolean => b
        case other => throw new IllegalArgumentException(s"distinct must be a boolean, got $other")
      }
      WordShingleHashes(args(0), n, distinct)
    },
    "graft_top_k_by" -> arity("graft_top_k_by", 3) { args =>
      val k = (if (args(2).foldable) args(2).eval()
        else throw new IllegalArgumentException("graft_top_k_by k must be a literal")) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(s"k must be an integer, got $other")
      }
      TopKByAgg(args(0), args(1), k).toAggregateExpression()
    },
    "graft_misra_gries" -> arity("graft_misra_gries", 2) { args =>
      val k = (if (args(1).foldable) args(1).eval()
        else throw new IllegalArgumentException("graft_misra_gries k must be a literal")) match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(s"k must be an integer, got $other")
      }
      MisraGriesAgg(args(0), k).toAggregateExpression()
    })

  private def info(name: String) =
    new ExpressionInfo("graft.functions.GraftFunctions", name)

  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), info(name), builder)
    }

  def inject(ext: SparkSessionExtensions): Unit =
    all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
}

/** `spark.sql.extensions` hook. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = GraftFunctions.inject(ext)
}
