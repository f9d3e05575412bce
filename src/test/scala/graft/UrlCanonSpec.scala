package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.url.UrlCanon

class UrlCanonSpec extends AnyFunSuite {

  test("scheme and host lowercased, path case preserved") {
    assert(UrlCanon.canonicalize("HTTPS://Shop0.Example.COM/Mafegy/EN/x") ==
      "https://shop0.example.com/Mafegy/EN/x")
  }

  test("default ports stripped, explicit ports kept") {
    assert(UrlCanon.canonicalize("https://h.com:443/a") == "https://h.com/a")
    assert(UrlCanon.canonicalize("http://h.com:80/a") == "http://h.com/a")
    assert(UrlCanon.canonicalize("http://h.com:8080/a") == "http://h.com:8080/a")
  }

  test("fragment dropped, empty path becomes /") {
    assert(UrlCanon.canonicalize("https://h.com#frag") == "https://h.com/")
    assert(UrlCanon.canonicalize("https://h.com/p#frag") == "https://h.com/p")
  }

  test("dot segments removed") {
    assert(UrlCanon.canonicalize("https://h.com/a/b/../c/./d") == "https://h.com/a/c/d")
    assert(UrlCanon.canonicalize("https://h.com/../a") == "https://h.com/a")
  }

  test("percent-encoding normalized: unreserved decoded, others uppercased") {
    assert(UrlCanon.canonicalize("https://h.com/%7Euser/%2fx") == "https://h.com/~user/%2Fx")
  }

  test("query params sorted, empty query dropped") {
    assert(UrlCanon.canonicalize("https://h.com/p?b=2&a=1") == "https://h.com/p?a=1&b=2")
    assert(UrlCanon.canonicalize("https://h.com/p?") == "https://h.com/p")
  }

  test("idempotence on concrete shapes") {
    val urls = Seq(
      "https://Shop1.example.com:443/a/../b/?z=1&a=2#f",
      "http://h.com:80/%7Ea/b/./c",
      "https://www.carrefouregypt.com/mafegy/en/x/p/123")
    urls.foreach { u =>
      val once = UrlCanon.canonicalize(u)
      assert(UrlCanon.canonicalize(once) == once, s"not idempotent for $u")
    }
  }

  test("idempotence property over the url-shape cross product") {
    val hosts = Seq("Shop0.Example.com", "h.com", "a.b.co:8080", "x.io:443")
    val segs = Seq("a", "B", ".", "..", "%7E", "p%2Fq")
    val tails = Seq("", "?b=2&a=1", "?x", "#frag", "?b=2&a=1#f")
    for {
      h <- hosts; s1 <- segs; s2 <- segs; q <- tails
    } {
      val u = s"https://$h/$s1/$s2$q"
      val once = UrlCanon.canonicalize(u)
      assert(UrlCanon.canonicalize(once) == once, s"not idempotent: $u -> $once")
    }
  }

  test("hostOf / depthOf") {
    assert(UrlCanon.hostOf("https://user@Shop2.example.com:8080/a/b?q=1") == "shop2.example.com")
    assert(UrlCanon.depthOf("https://h.com/a/b/c") == 3)
    assert(UrlCanon.depthOf("https://h.com/") == 0)
    assert(UrlCanon.depthOf("https://h.com/a?x=/y/z") == 1)
  }

  test("non-hierarchical input passes through percent-normalized") {
    assert(UrlCanon.canonicalize("mailto:x@y.com") == "mailto:x@y.com")
    assert(UrlCanon.canonicalize(null) == null)
  }
}
