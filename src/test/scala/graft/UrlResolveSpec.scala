package graft

import org.apache.spark.sql.functions._

import graft.plans.{UrlCanonExpr, UrlResolveExpr, UrlResolveUtil}

/** resolve_url: RFC 3986 §5.4's own reference-resolution examples
  * (normal AND abnormal) are the spec, plus composition with
  * url_canon and totality. */
class UrlResolveSpec extends SparkSpec {

  private val B = "http://a/b/c/d;p?q" // the RFC's base
  private def r(ref: String): String = UrlResolveUtil.resolve(B, ref)

  test("RFC 3986 §5.4.1 normal examples") {
    assert(r("g:h") == "g:h")
    assert(r("g") == "http://a/b/c/g")
    assert(r("./g") == "http://a/b/c/g")
    assert(r("g/") == "http://a/b/c/g/")
    assert(r("/g") == "http://a/g")
    assert(r("//g") == "http://g")
    assert(r("?y") == "http://a/b/c/d;p?y")
    assert(r("g?y") == "http://a/b/c/g?y")
    assert(r("#s") == "http://a/b/c/d;p?q#s")
    assert(r("g#s") == "http://a/b/c/g#s")
    assert(r("g?y#s") == "http://a/b/c/g?y#s")
    assert(r(";x") == "http://a/b/c/;x")
    assert(r("g;x") == "http://a/b/c/g;x")
    assert(r("g;x?y#s") == "http://a/b/c/g;x?y#s")
    assert(r("") == "http://a/b/c/d;p?q")
    assert(r(".") == "http://a/b/c/")
    assert(r("./") == "http://a/b/c/")
    assert(r("..") == "http://a/b/")
    assert(r("../") == "http://a/b/")
    assert(r("../g") == "http://a/b/g")
    assert(r("../..") == "http://a/")
    assert(r("../../") == "http://a/")
    assert(r("../../g") == "http://a/g")
  }

  test("RFC 3986 §5.4.2 abnormal examples") {
    // .. beyond root is consumed silently
    assert(r("../../../g") == "http://a/g")
    assert(r("../../../../g") == "http://a/g")
    // dot-segments only removed as COMPLETE segments
    assert(r("/./g") == "http://a/g")
    assert(r("/../g") == "http://a/g")
    assert(r("g.") == "http://a/b/c/g.")
    assert(r(".g") == "http://a/b/c/.g")
    assert(r("g..") == "http://a/b/c/g..")
    assert(r("..g") == "http://a/b/c/..g")
    // nonsensical dot-forms
    assert(r("./../g") == "http://a/b/g")
    assert(r("./g/.") == "http://a/b/c/g/")
    assert(r("g/./h") == "http://a/b/c/g/h")
    assert(r("g/../h") == "http://a/b/c/h")
    assert(r("g;x=1/./y") == "http://a/b/c/g;x=1/y")
    assert(r("g;x=1/../y") == "http://a/b/c/y")
    // query/fragment are NOT path
    assert(r("g?y/./x") == "http://a/b/c/g?y/./x")
    assert(r("g?y/../x") == "http://a/b/c/g?y/../x")
    assert(r("g#s/./x") == "http://a/b/c/g#s/./x")
    assert(r("g#s/../x") == "http://a/b/c/g#s/../x")
    // strict parser: a same-scheme ref is STILL absolute
    assert(r("http:g") == "http:g")
  }

  test("base must be absolute; weird bases") {
    assert(UrlResolveUtil.resolve("/no/scheme", "g") == null)
    assert(UrlResolveUtil.resolve("", "g") == null)
    assert(UrlResolveUtil.resolve("not a url", "g") == null)
    // authority-only base: merge starts at "/"
    assert(UrlResolveUtil.resolve("http://h", "g") == "http://h/g")
    assert(UrlResolveUtil.resolve("http://h?q", "g") == "http://h/g")
  }

  test("composes with url_canon into crawl keys") {
    val df = spark.range(1).toDF("id").select(
      UrlCanonExpr.urlCanon(UrlResolveExpr.resolveUrl(
        lit("HTTP://A.com/dir/page.html?x=1"),
        lit("../img/p.png?utm_source=t&k=v#top"))).as("key"))
    assert(df.collect()(0).getString(0) == "http://a.com/img/p.png?k=v")
    // null propagation
    val n = spark.range(1).toDF("id").select(
      UrlResolveExpr.resolveUrl(lit(null).cast("string"), lit("g")))
    assert(n.collect()(0).isNullAt(0))
  }

  test("totality fuzz: never throws") {
    val rnd = new scala.util.Random(13)
    val chars = "abc:/?#.%[]@!$&'()*+,;= é"
    (1 to 2000).foreach { _ =>
      val s = (1 to rnd.nextInt(24)).map(_ =>
        chars(rnd.nextInt(chars.length))).mkString
      val b = (1 to rnd.nextInt(24)).map(_ =>
        chars(rnd.nextInt(chars.length))).mkString
      UrlResolveUtil.resolve(b, s) // must not throw
      UrlResolveUtil.resolve(B, s)
    }
  }
}
