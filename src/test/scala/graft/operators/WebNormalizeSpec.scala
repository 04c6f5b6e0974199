package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Hand-computed cases for the web front-door normalizers — the planted
  * inputs exercise every rule the fixture-derived construction can't vary
  * (http vs https ports, root path, empty query, already-canonical). */
class WebNormalizeSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def canon(urls: String*): Seq[String] = {
    import spark.implicits._
    urls.toDF("u").select(WebNormalize.canonicalUrl(col("u"))).collect().map(_.getString(0)).toSeq
  }

  private def strip(htmls: String*): Seq[String] = {
    import spark.implicits._
    htmls.toDF("h").select(WebNormalize.stripHtml(col("h"))).collect().map(_.getString(0)).toSeq
  }

  test("URL canonicalization: case, www, default ports, slashes, fragments, params") {
    assert(canon("HTTPS://WWW.Example.COM:443//a//b/?utm_source=x&b=2&a=1#f")
      == Seq("https://example.com/a/b?a=1&b=2"))
    // http default port, no query, trailing slash
    assert(canon("HTTP://Site.ORG:80/path/") == Seq("http://site.org/path"))
    // non-default port survives; path case survives (paths are case-sensitive)
    assert(canon("https://example.com:8443/A/B") == Seq("https://example.com:8443/A/B"))
    // root slash survives; empty query '?' dropped
    assert(canon("https://example.com/?") == Seq("https://example.com/"))
    // all-tracking query collapses to none; fbclid/gclid/utm_* all dropped
    assert(canon("https://e.com/p?utm_a=1&utm_b=2&fbclid=x&gclid=y") == Seq("https://e.com/p"))
    // already-canonical is a fixpoint
    assert(canon("https://e.com/p?a=1") == Seq("https://e.com/p?a=1"))
    // identical resources under different noise collide (the dedup property)
    assert(canon("https://WWW.e.com:443/p//q?b=2&a=1&utm_z=9").head
      == canon("HTTPS://e.com/p/q/?a=1&b=2#top").head)
  }

  test("HTML strip: scripts/styles/boilerplate out, content preserved, entities decoded") {
    assert(strip("<html><body><p>hello world</p></body></html>") == Seq("hello world"))
    assert(strip("<script>var x='<p>sneaky</p>';</script><p>keep</p>") == Seq("keep"))
    assert(strip("<style>.x{}</style><nav>menu</nav>real<footer>foot</footer>") == Seq("real"))
    assert(strip("""<div class="ad">BUY</div>text<div class="ok">stay</div>""")
      == Seq("text stay"))
    assert(strip("a &amp; b &lt;c&gt; &copy;") == Seq("a & b <c> (c)"))
    // whitespace collapse across removed blocks
    assert(strip("<p>one</p>  <p>two</p>") == Seq("one two"))
  }
}
