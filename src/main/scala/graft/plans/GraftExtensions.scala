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

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int argument, got $other")
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
      { case Seq(u) => UrlCanonExpr(u) })
    register(ext, "url_canon_parts",
      "url_canon_parts(url) - struct(url_norm, host, depth) of a url.",
      { case Seq(u) => UrlCanonPartsExpr(u) })
    register(ext, "simhash64_native",
      "simhash64_native(tokens) - 64-bit SimHash fingerprint of a token array.",
      { case Seq(t) => SimHash64Expr(t) })
    register(ext, "minhash_native",
      "minhash_native(shingles, k) - k-value MinHash signature of a shingle array.",
      { case Seq(t, k) => MinHashExpr(t, intLit(k, "minhash_native")) })
    register(ext, "minhash_shingled",
      "minhash_shingled(tokens, k, w) - MinHash over w-token shingles, fused.",
      { case Seq(t, k, w) =>
        MinHashShingledExpr(t, intLit(k, "minhash_shingled"), intLit(w, "minhash_shingled")) })
  }
}
