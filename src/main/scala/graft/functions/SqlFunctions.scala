package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.{IntegerType, LongType}

/** SQL registrations for the engine's native expressions, so a pure-SQL
  * user (the reference's audience) can call the kernels without touching
  * the Scala API:
  *
  * {{{
  *   SELECT graft_vector_dot(a.embedding, b.embedding) FROM ...
  *   SELECT graft_minhash(h, 64) FROM shingles GROUP BY doc_id
  * }}}
  *
  * Wired by [[graft.GraftExtensions]] via `injectFunction`. Aggregate
  * builders return the bare `AggregateFunction` — the analyzer wraps it,
  * exactly as for built-ins. Literal-only parameters (hash counts, k)
  * are enforced at resolution with a clear error, since a non-foldable
  * argument cannot parameterize buffer shape.
  */
object SqlFunctions {

  type Registration =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[SqlFunctions.type].getName, null, name, usage,
      "", "", "", "", "", "", "built-in")

  private def litInt(e: Expression, fn: String, arg: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    // range-check before narrowing: a silent toInt would turn
    // 4294967297 into 1 (wrong k) or 2147483648 into a negative that
    // fails deep in buffer allocation instead of here
    case Literal(v: Long, LongType)
        if v >= Int.MinValue && v <= Int.MaxValue => v.toInt
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an INT-range integer literal, got $other")
  }

  private def litLong(e: Expression, fn: String, arg: String): Long = e match {
    case Literal(v: Long, LongType) => v
    case Literal(v: Int, IntegerType) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    if (args.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments, got ${args.length}")

  val all: Seq[Registration] = Seq(
    (FunctionIdentifier("graft_vector_dot"),
      info("graft_vector_dot",
        "_FUNC_(a, b) - element-ordered double dot product of two float-array embeddings"),
      args => { arity("graft_vector_dot", args, 2)
        VectorDot(args(0), args(1)) }),
    (FunctionIdentifier("graft_mix64"),
      info("graft_mix64",
        "_FUNC_(x, seed) - SplitMix64 finalizer of a long under a literal seed"),
      args => { arity("graft_mix64", args, 2)
        Mix64(args(0), litLong(args(1), "graft_mix64", "seed")) }),
    (FunctionIdentifier("graft_rolling_hash"),
      info("graft_rolling_hash",
        "_FUNC_(s) - 61-bit Rabin fingerprint of a string"),
      args => { arity("graft_rolling_hash", args, 1)
        RollingHash(args(0)) }),
    (FunctionIdentifier("graft_simhash_sig"),
      info("graft_simhash_sig",
        "_FUNC_(s) - 64-bit SimHash signature over whitespace tokens"),
      args => { arity("graft_simhash_sig", args, 1)
        SimHashSig(args(0)) }),
    (FunctionIdentifier("graft_sorted_intersect_size"),
      info("graft_sorted_intersect_size",
        "_FUNC_(a, b) - |a intersect b| of two sorted distinct long arrays via one merge walk"),
      args => { arity("graft_sorted_intersect_size", args, 2)
        SortedIntersectSize(args(0), args(1)) }),
    (FunctionIdentifier("graft_word_gram_hashes"),
      info("graft_word_gram_hashes",
        "_FUNC_(s, n) - mixed 64-bit hashes of the string's word n-grams (n literal)"),
      args => { arity("graft_word_gram_hashes", args, 2)
        WordGramHashes(args(0),
          litInt(args(1), "graft_word_gram_hashes", "n")) }),
    (FunctionIdentifier("graft_minhash"),
      info("graft_minhash",
        "_FUNC_(h, k) - aggregate: k-lane MinHash signature over long hashes (k literal)"),
      args => { arity("graft_minhash", args, 2)
        MinHashAgg(args(0), litInt(args(1), "graft_minhash", "k")) }),
    (FunctionIdentifier("graft_top_k"),
      info("graft_top_k",
        "_FUNC_(score, id, k) - aggregate: bounded-heap exact top-k of (double, long) pairs (k literal)"),
      args => { arity("graft_top_k", args, 3)
        TopKAgg(args(0), args(1), litInt(args(2), "graft_top_k", "k")) }),
  )
}
