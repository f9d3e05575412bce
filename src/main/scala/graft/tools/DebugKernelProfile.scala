package graft.tools

/** Where does kernel time go? parse vs selector walks vs JSON islands, on
  * the same synthetic pages the extract bench uses — plain JVM loop, no
  * Spark, so the numbers isolate the kernel itself (min-of-rounds, same
  * throttling caveat as every timing on this host).
  *
  * Usage: runMain graft.tools.DebugKernelProfile [nPages] [rounds]
  */
object DebugKernelProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(20000)
    val rounds = args.lift(1).map(_.toInt).getOrElse(5)
    val htmls = (0 until n).map { i =>
      graft.gen.Synthetic.pageHtml(i.toLong, if (i % 2 == 0) "en" else "ar")
    }.toArray
    val langs = (0 until n).map(i => if (i % 2 == 0) "en" else "ar").toArray

    def time(tag: String)(f: => Long): Double = {
      var best = Double.MaxValue
      var sink = 0L
      for (_ <- 1 to rounds) {
        val t0 = System.nanoTime()
        sink ^= f
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PROFILE $tag%-14s min=$best%.3fs  (${n / best}%.0f pages/s/core, sink=$sink)")
      best
    }

    // full kernel
    time("extractAll") {
      var acc = 0L
      var i = 0
      while (i < n) {
        acc ^= graft.extract.ExtractKernel.extractAll(htmls(i), langs(i)).name.length
        i += 1
      }
      acc
    }
    // parse only
    time("parse") {
      var acc = 0L
      var i = 0
      while (i < n) { acc ^= graft.html.MiniHtml.parse(htmls(i)).children.length; i += 1 }
      acc
    }
    // parse + the 11 css selects (no JSON, no xpath)
    val selectors = Seq(".css-106scfp", ".css-1nnke3o", ".css-juexlj > span:nth-child(2)",
      ".css-iamwo8", "#__NEXT_DATA__", "div.css-1c2pck7 img", ".css-1i90gmp",
      "del.css-1bdwabt", ".css-17ctnp", "script[type=application/ld+json]",
      ".breadcrumb li", ".price p.before", ".price p.after", "a")
    time("parse+selects") {
      var acc = 0L
      var i = 0
      while (i < n) {
        val root = graft.html.MiniHtml.parse(htmls(i))
        selectors.foreach(sel => acc ^= graft.html.MiniHtml.select(root, sel).length)
        i += 1
      }
      acc
    }
  }
}
