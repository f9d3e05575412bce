package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.html.MiniHtml

class MiniHtmlSpec extends AnyFunSuite {

  test("parse + class selector + text") {
    val root = MiniHtml.parse("""<div class="a b"><span>hi</span> there</div>""")
    val hits = MiniHtml.select(root, ".a")
    assert(hits.size == 1)
    assert(hits.head.text == "hi there")
  }

  test("select_one returns first in document order") {
    val root = MiniHtml.parse("""<p class="x">one</p><p class="x">two</p>""")
    assert(MiniHtml.selectOne(root, ".x").map(_.text).contains("one"))
    assert(MiniHtml.select(root, ".x").map(_.text) == List("one", "two"))
  }

  test("tag.class compound") {
    val root = MiniHtml.parse("""<del class="p">old</del><div class="p">new</div>""")
    assert(MiniHtml.selectOne(root, "del.p").map(_.text).contains("old"))
  }

  test("#id selector and raw script text") {
    val root = MiniHtml.parse(
      """<script id="__NEXT_DATA__" type="application/json">{"a":"<not a tag>"}</script>""")
    val el = MiniHtml.selectOne(root, "#__NEXT_DATA__")
    assert(el.map(_.text).contains("""{"a":"<not a tag>"}"""))
  }

  test("child combinator with nth-child (carrefour offer span)") {
    val root = MiniHtml.parse(
      """<div class="css-juexlj"><span>Offer ends in</span><span>5 days</span></div>""")
    val el = MiniHtml.selectOne(root, ".css-juexlj > span:nth-child(2)")
    assert(el.map(_.text).contains("5 days"))
  }

  test("descendant combinator + attribute (carrefour image)") {
    val root = MiniHtml.parse(
      """<div class="css-1c2pck7"><figure><img src="http://x/i.jpg"/></figure></div>""")
    val el = MiniHtml.selectOne(root, "div.css-1c2pck7 img")
    assert(el.flatMap(_.attrs.get("src")).contains("http://x/i.jpg"))
  }

  test("attribute-equals selector (ld+json)") {
    val root = MiniHtml.parse(
      """<script type="text/js">no</script><script type="application/ld+json">{"name":"N"}</script>""")
    val el = MiniHtml.selectOne(root, "script[type=application/ld+json]")
    assert(el.map(_.text).contains("""{"name":"N"}"""))
  }

  test("entity decoding in text and attrs") {
    val root = MiniHtml.parse("""<p class="e" title="a&amp;b">x &lt;&gt; &#65;&#x42; &nbsp;y</p>""")
    val el = MiniHtml.selectOne(root, ".e").get
    assert(el.text == "x <> AB  y")
    assert(el.attrs("title") == "a&b")
  }

  test("void elements and unclosed tags do not break structure") {
    val root = MiniHtml.parse("""<ul class="breadcrumb"><li><a>Home</a><li><a>Food</a><li>no-link</ul>""")
    val lis = MiniHtml.select(root, ".breadcrumb li")
    assert(lis.size == 3)
    assert(lis.map(li => MiniHtml.selectOne(li, "a").map(_.text).getOrElse("")) ==
      List("Home", "Food", ""))
  }

  test("anchors with and without href") {
    val root = MiniHtml.parse("""<a href="/rel">r</a><a href="http://abs">a</a><a>none</a>""")
    val hrefs = MiniHtml.select(root, "a").map(_.attrs.getOrElse("href", "N/A"))
    assert(hrefs == List("/rel", "http://abs", "N/A"))
  }

  test("comments and doctype skipped") {
    val root = MiniHtml.parse("<!DOCTYPE html><!-- c --><p class='q'>ok</p>")
    assert(MiniHtml.selectOne(root, ".q").map(_.text).contains("ok"))
  }

  test("nth-child counts element children only") {
    val root = MiniHtml.parse("""<div class="w">text<span>1st</span> mid <span>2nd</span></div>""")
    assert(MiniHtml.selectOne(root, ".w > span:nth-child(2)").map(_.text).contains("2nd"))
  }

  test("selectMany over real pages equals per-selector select, in order") {
    // the fused kernel path rides selectMany; this pins the fusion to the
    // sequential semantics on both merchants' generated page families
    val selectors = IndexedSeq(".css-106scfp", ".css-1nnke3o",
      ".css-juexlj > span:nth-child(2)", ".css-iamwo8", "#__NEXT_DATA__",
      "div.css-1c2pck7 img", ".css-1i90gmp", "del.css-1bdwabt", ".css-17ctnp",
      "script[type=application/ld+json]", ".breadcrumb li",
      ".price p.before", ".price p.after", "a")
    for (id <- 0L until 40L; lang <- Seq("en", "ar")) {
      val html = if (id % 2 == 0) graft.gen.Synthetic.pageHtml(id, lang)
                 else graft.gen.Synthetic.metroPageHtml(id, lang)
      val root = MiniHtml.parse(html)
      val fused = MiniHtml.selectMany(root, selectors)
      selectors.zipWithIndex.foreach { case (sel, i) =>
        // one-selector selectMany IS select; compare against a fresh
        // single-walk evaluation of just this selector
        assert(fused(i) == MiniHtml.selectMany(root, IndexedSeq(sel))(0),
          s"selector $sel diverged on id=$id lang=$lang")
      }
    }
  }
}
