package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the library's native
  * expressions as SQL functions, so `spark.sql` users get the same codegen'd
  * kernels as the Column API —
  *
  *   spark.sql("SELECT url_canon(url), simhash64_native(split(text, ' ')),
  *              minhash_shingled(split(text, ' '), 16, 3) FROM pages")
  *
  * Wire-up (standard extension mechanism, works with spark-submit):
  *   --conf spark.sql.extensions=graft.plans.GraftExtensions
  * or SparkSession.builder().withExtensions(new GraftExtensions()).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** Literal-int argument: accepts INT and in-range BIGINT literals (SQL
    * users plausibly write `16` where the parser types it LONG). */
  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) if v.isValidInt => v.toInt
    // e.g. CAST(16 AS BIGINT): foldable but not yet constant-folded at
    // function-resolution time
    case f if f.foldable =>
      f.eval() match {
        case v: Int => v
        case v: Long if v.isValidInt => v.toInt
        case other => throw new org.apache.spark.sql.AnalysisException(
          errorClass = "_LEGACY_ERROR_TEMP_3071",
          messageParameters = Map("msg" ->
            s"$name expects a literal integer argument, got $other"))
      }
    case other => throw new org.apache.spark.sql.AnalysisException(
      errorClass = "_LEGACY_ERROR_TEMP_3071",
      messageParameters = Map("msg" ->
        s"$name expects a literal integer argument, got $other"))
  }

  /** Arity-checked builder: a wrong argument count surfaces as a readable
    * analysis error instead of a raw scala.MatchError. */
  private def arity(name: String, n: Int)(
      f: Seq[Expression] => Expression): FunctionBuilder = { args =>
    if (args.length != n)
      throw new org.apache.spark.sql.AnalysisException(
        errorClass = "_LEGACY_ERROR_TEMP_3071",
        messageParameters = Map("msg" ->
          s"$name expects $n argument(s), got ${args.length}"))
    f(args)
  }

  private def register(
      ext: SparkSessionExtensions,
      name: String,
      usage: String,
      builder: FunctionBuilder): Unit =
    ext.injectFunction((
      FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, ""),
      builder))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "url_canon",
      "url_canon(url) - RFC-3986 canonical form of a url.",
      arity("url_canon", 1) { case Seq(u) => UrlCanonExpr(u) })
    register(ext, "url_canon_parts",
      "url_canon_parts(url) - struct(url_norm, host, depth) of a url.",
      arity("url_canon_parts", 1) { case Seq(u) => UrlCanonPartsExpr(u) })
    register(ext, "simhash64_native",
      "simhash64_native(tokens) - 64-bit SimHash fingerprint of a token array.",
      arity("simhash64_native", 1) { case Seq(t) => SimHash64Expr(t) })
    register(ext, "minhash_native",
      "minhash_native(shingles, k) - k-value MinHash signature of a shingle array.",
      arity("minhash_native", 2) { case Seq(t, k) => MinHashExpr(t, intLit(k, "minhash_native")) })
    register(ext, "minhash_shingled",
      "minhash_shingled(tokens, k, w) - MinHash over w-token shingles, fused.",
      arity("minhash_shingled", 3) { case Seq(t, k, w) =>
        MinHashShingledExpr(t, intLit(k, "minhash_shingled"), intLit(w, "minhash_shingled")) })
  }
}
