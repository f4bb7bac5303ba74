package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Divide, Expression, ExpressionInfo, Literal, Multiply, NullIf, Sqrt, Subtract}
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Kurtosis, Skewness}
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** SQL-text surface for the engine's custom functions (SURVEY §7.0): the
  * reference's query shapes use `quantileExactExclusive(q)(x)` and friends
  * as SQL TEXT (300k generated templates, e.g.
  * sql/gen600_2down_template.sql:69-72, sql/gen111_true_nolookahead.sql:49),
  * so a user porting one of them must be able to run the same shape through
  * `spark.sql(...)` — the Scala-DSL Column API alone doesn't cover that.
  *
  * Two registration paths, same builder list:
  *  - [[GraftExtensions]] via `spark.sql.extensions=graft.functions
  *    .GraftExtensions` at session build (the production path — survives
  *    into every new session of the builder);
  *  - [[GraftSqlFunctions.registerAll]] on an existing session (tests,
  *    notebooks).
  *
  * Registered names (all lowercase-with-underscores, SQL-style):
  *  - `erf(x)` — A&S 7.1.26 erf (codegen'd ErfExpr)
  *  - `exclusive_quantile(arr, q)` — exact exclusive quantile of an array
  *  - `exclusive_quantile_agg(x, q)` — the TypedImperativeAggregate; valid
  *    as a plain aggregate AND as a window function, which is exactly the
  *    reference's `quantileExactExclusive(0.95)(ti) OVER (... ROWS BETWEEN
  *    UNBOUNDED PRECEDING AND 1 PRECEDING)` expanding shape
  *  - `dot_fold(a, b)`, `sorted_intersect_count(a, b)`, `md5_prefix_int(s)`,
  *    `word_bigrams(s)`, `hashed_word_bigrams(s)`, `hashed_word_ngrams(s, n)`,
  *    `winnow_stats(s)` — the text/similarity kernels
  *  - `kurt_raw(x)`, `kurt_samp_excess(x)`, `skew_samp(x)` — the moment
  *    shims (ClickHouse/DuckDB conventions from Spark's population moments;
  *    composite aggregate expressions, resolved like any `avg(x)+1`)
  *
  * SqlSurfaceSpec pins the surface by running the gen111 champion chain as
  * ONE spark.sql string and matching q40's output row-for-row.
  */
object GraftSqlFunctions {

  private def lit2Double(e: Expression, what: String): Double = {
    require(e.foldable, s"$what must be a literal, got $e")
    e.eval() match {
      case d: java.lang.Double => d
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case f: java.lang.Float => f.toDouble
      case i: java.lang.Integer => i.toDouble
      case l: java.lang.Long => l.toDouble
      case other => sys.error(s"$what: unsupported literal $other")
    }
  }

  private def lit2Int(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be a literal, got $e")
    e.eval() match {
      case i: java.lang.Integer => i
      case l: java.lang.Long => l.toInt
      case other => sys.error(s"$what: unsupported literal $other")
    }
  }

  /** name → builder. SQL numeric literals arrive as Decimal, so every
    * double-typed argument is wrapped in Cast(DoubleType) (the DSL path
    * goes through lit(...) doubles and needs no cast); the analyzer's
    * coercion then no-ops on already-double inputs. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "erf" -> { args => ErfExpr(Cast(args.head, DoubleType)) },
    "exclusive_quantile" -> { args =>
      QuantileExactExclusive(
        Cast(args(0), ArrayType(DoubleType)), Cast(args(1), DoubleType))
    },
    "exclusive_quantile_agg" -> { args =>
      ExclusiveQuantileAgg(Cast(args(0), DoubleType),
        lit2Double(args(1), "exclusive_quantile_agg q"))
    },
    "dot_fold" -> { args => DotFold(args(0), args(1)) },
    "sorted_intersect_count" -> { args => SortedIntersectCount(args(0), args(1)) },
    "md5_prefix_int" -> { args => Md5PrefixInt(args.head) },
    "word_bigrams" -> { args => WordBigrams(args.head) },
    "hashed_word_bigrams" -> { args => HashedWordBigrams(args.head) },
    "hashed_word_ngrams" -> { args =>
      HashedWordNgrams(args(0), lit2Int(args(1), "hashed_word_ngrams n"))
    },
    "winnow_stats" -> { args => WinnowStats(args.head) },
    // moment shims: raw catalyst trees mirroring the DSL formulas node for
    // node (GraftFunctions.kurtRaw/kurtSampExcess/skewSamp with n =
    // count(x)), so SQL text and DSL produce bit-identical doubles — the
    // analyzer applies the same type coercions to both
    "kurt_raw" -> { args =>
      Add(Kurtosis(args.head).toAggregateExpression(), Literal(3.0))
    },
    "kurt_samp_excess" -> { args =>
      val x = args.head
      val n = Count(x).toAggregateExpression()
      Divide(
        Multiply(
          Add(Multiply(Add(n, Literal(1)), Kurtosis(x).toAggregateExpression()),
            Literal(6)),
          Subtract(n, Literal(1))),
        new NullIf(
          Cast(Multiply(Subtract(n, Literal(2)), Subtract(n, Literal(3))), DoubleType),
          Literal(0.0)))
    },
    "skew_samp" -> { args =>
      val x = args.head
      val n = Count(x).toAggregateExpression()
      Divide(
        Multiply(Skewness(x).toAggregateExpression(),
          Sqrt(Multiply(n, Subtract(n, Literal(1))))),
        new NullIf(Cast(Subtract(n, Literal(2)), DoubleType), Literal(0.0)))
    })

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo("graft.functions.GraftSqlFunctions", name)

  /** Register on an EXISTING session (idempotent — replaces), including the
    * sliding-quantile planner strategy, so SQL text using the rolling
    * `exclusive_quantile_agg(...) OVER (ROWS BETWEEN L PRECEDING AND 1
    * PRECEDING)` shape plans as the incremental
    * [[graft.plans.SlidingQuantileWindowExec]] instead of WindowExec's
    * per-row frame rebuild. */
  def registerAll(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    all.foreach { case (name, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info(name), builder)
    }
    graft.plans.SlidingQuantileStrategy.register(spark)
  }
}

/** `spark.sql.extensions` entry point: registers every custom function at
  * session build, so reference-shaped SQL text runs verbatim in any session
  * of the extended builder. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftSqlFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftSqlFunctions", name), builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.SlidingQuantileStrategy)
  }
}
