package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CosineSim, MinHashArray, SqL2Sub, WordNGrams}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions. Enable with
  * `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  *
  * SQL surface:
  *   cosine_sim(a, b)            — codegen'd cosine similarity
  *   word_ngrams(words, n)       — distinct word n-gram shingles
  *   minhash_array(grams, k)     — k md5-seeded minhash values
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      e.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, org.apache.spark.sql.types.IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT, got $other")
  }

  /** Analysis-time arity guard: a wrong-arity SQL call must fail with
    * the expected signature, not a raw IndexOutOfBoundsException from
    * `exprs(3)`. */
  private def arity(exprs: Seq[Expression], n: Int, sig: String): Seq[Expression] = {
    if (exprs.length != n) throw new IllegalArgumentException(
      s"expected $n arguments: $sig, got ${exprs.length}")
    exprs
  }

  /** The function table, shared by the extensions injection and the
    * live-session registration path below. */
  val functions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "cosine_sim(a, b)")
        CosineSim(e(0), e(1))
      }),
    ("word_ngrams",
      new ExpressionInfo(classOf[WordNGrams].getName, "word_ngrams"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "word_ngrams(words, n)")
        WordNGrams(e(0), intArg(e(1), "word_ngrams"))
      }),
    ("minhash_array",
      new ExpressionInfo(classOf[MinHashArray].getName, "minhash_array"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 2, "minhash_array(grams, k)")
        MinHashArray(e(0), intArg(e(1), "minhash_array"))
      }),
    ("sq_l2",
      new ExpressionInfo(classOf[SqL2Sub].getName, "sq_l2"),
      (exprs: Seq[Expression]) => {
        val e = arity(exprs, 4, "sq_l2(a, b, lo, len)")
        SqL2Sub(e(0), e(1), intArg(e(2), "sq_l2"), intArg(e(3), "sq_l2"))
      }))

  /** Register everything on an already-running session (extensions
    * only apply at session build time). */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (name, _, builder) =>
      org.apache.spark.sql.GraftInternal.registerFunction(spark, name, builder)
    }
}
