package graft

import org.apache.spark.sql.functions._

import graft.plans.{UrlCanonExpr, UrlCanonUtil}

/** url_canon kernel: every rule of the canonicalization contract,
  * plus the reject paths (the kernel must null, never guess). */
class UrlCanonSpec extends SparkSpec {
  import spark.implicits._

  private def c(s: String): String = UrlCanonUtil.canon(s)

  test("scheme and host lowercase; path case preserved") {
    assert(c("HTTP://WWW.Example.COM/Path/File") ==
      "http://www.example.com/Path/File")
    assert(c("FTP://Files.EXAMPLE.com/pub") == "ftp://files.example.com/pub")
  }

  test("default ports drop, others keep, bare colon drops") {
    assert(c("http://a.com:80/x") == "http://a.com/x")
    assert(c("https://a.com:443/x") == "https://a.com/x")
    assert(c("http://a.com:8080/x") == "http://a.com:8080/x")
    // https:80 is NOT a default — keeps
    assert(c("https://a.com:80/x") == "https://a.com:80/x")
    assert(c("http://a.com:/x") == "http://a.com/x")
    // non-digit port: malformed authority -> null
    assert(c("http://a.com:8a/x") == null)
  }

  test("fragment drops; empty path becomes '/'") {
    assert(c("http://a.com/x#frag") == "http://a.com/x")
    assert(c("http://a.com") == "http://a.com/")
    assert(c("http://a.com#frag") == "http://a.com/")
    assert(c("http://a.com?q=1#frag") == "http://a.com/?q=1")
  }

  test("tracking params drop (case-insensitive), order survives") {
    assert(c("http://a.com/p?utm_source=x&id=5&utm_medium=y") ==
      "http://a.com/p?id=5")
    assert(c("http://a.com/p?UTM_CAMPAIGN=c&x=2") == "http://a.com/p?x=2")
    assert(c("http://a.com/p?gclid=1&fbclid=2&msclkid=3&mc_eid=4") ==
      "http://a.com/p")
    // empty tokens drop; bare names count as names
    assert(c("http://a.com/p?&&a=1&&gclid&b=2") == "http://a.com/p?a=1&b=2")
    // utm in a VALUE is not a tracking NAME
    assert(c("http://a.com/p?q=utm_source") == "http://a.com/p?q=utm_source")
    // an emptied query drops its '?'
    assert(c("http://a.com/p?utm_source=x") == "http://a.com/p")
  }

  test("pct-norm: unreserved escapes decode, retained escapes uppercase (r14)") {
    // RFC 3986 §6.2.2: %7E/%7e/~ are the same URL — one dedup key
    assert(c("https://a.com/%7Euser/x") == "https://a.com/~user/x")
    assert(c("https://a.com/%7euser/x") == "https://a.com/~user/x")
    assert(c("https://a.com/%41%62%2D%5F%2E/") == "https://a.com/Ab-_./")
    // reserved escapes never decode (structure would change) — hex
    // uppercases only
    assert(c("http://a.com/a%2fb%3Fc") == "http://a.com/a%2Fb%3Fc")
    assert(c("http://a.com/p?x=%41%7e&y=%2f") == "http://a.com/p?x=A~&y=%2F")
    // host normalizes too, then lowercases
    assert(c("http://%41.com/x") == "http://a.com/x")
    // malformed escapes keep verbatim — total, never a throw
    assert(c("http://a.com/a%G1b%4") == "http://a.com/a%G1b%4")
    assert(c("http://a.com/end%") == "http://a.com/end%")
    // an escaped tracking NAME cannot smuggle past the filter
    assert(c("http://a.com/p?%75tm_source=x&id=1") == "http://a.com/p?id=1")
  }

  test("pct-norm idempotence: canon(canon(u)) == canon(u) (r14)") {
    val shapes = Seq(
      "https://a.com/%7Euser/doc%2f5?id=%41a&%75tm_source=x",
      "http://a.com/a%G1b%4?q=%zz",
      "HTTP://A.com:80/%2D%2e#f",
      "https://%41.COM:4%31/x", // pct in port: non-digit port -> null
      "http://a.com/p?&&%67clid=1&b=%32")
    for (u <- shapes) {
      val once = c(u)
      if (once != null) assert(c(once) == once, s"not idempotent: $u")
    }
    assert(c("https://%41.COM:4%31/x") == null)
  }

  test("surt_key: label reversal, ports, empty path, rejects (r14)") {
    import graft.plans.SurtKeyUtil
    def k(s: String) = SurtKeyUtil.surt(s)
    assert(k("https://a.b.example.org/p/q") == "org,example,b,a)/p/q")
    // scheme-agnostic: http and https captures collide
    assert(k("http://a.b.example.org/p/q") == k("https://a.b.example.org/p/q"))
    // port keeps after the host list; bare colon drops; non-digit null
    assert(k("http://site.com:8080/x") == "com,site:8080)/x")
    assert(k("http://site.com:/x") == "com,site)/x")
    assert(k("http://site.com:8a/x") == null)
    // empty path -> ')/' so http://h and http://h/ collide
    assert(k("https://example.com") == "com,example)/")
    assert(k("https://example.com/") == "com,example)/")
    // query verbatim, fragment drops, host lowercases, path case kept
    assert(k("https://WWW.Site.COM/Path?A=b&c=D#frag") ==
      "com,site,www)/Path?A=b&c=D")
    // query with empty path
    assert(k("https://h.com?q=1") == "com,h)/?q=1")
    // single-label host; empty labels keep (total, never a throw)
    assert(k("http://localhost/x") == "localhost)/x")
    assert(k("http://.com/x") == "com,)/x")
    // rejects
    assert(k("not a url") == null)
    assert(k("http://") == null)
    // expression face through the canon composition, codegen path
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(graft.plans.SurtKeyExpr.surtKey(
      UrlCanonExpr.urlCanon(
        lit("HTTP://A.Example.COM:80/p?utm_source=x&id=5"))).as("k"))
    assert(df.collect()(0).getString(0) == "com,example,a)/p?id=5")
  }

  test("rejects: relative, no scheme, empty host, malformed scheme") {
    assert(c("/relative/path") == null)
    assert(c("not a url") == null)
    assert(c("http://") == null)
    assert(c("1http://a.com/") == null) // scheme must start with a letter
    assert(c("ht tp://a.com/") == null)
    // scheme chars +.- are legal
    assert(c("a+b-c.d://Host/") == "a+b-c.d://host/")
  }

  test("expression face: null in null out, reject -> null, codegen") {
    val df = Seq((1L, "HTTP://A.com:80"), (2L, "nope"),
      (3L, null.asInstanceOf[String])).toDF("id", "url")
      .select(col("id"), UrlCanonExpr.urlCanon(col("url")).as("c"))
    val got = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) null else r.getString(1))).toMap
    assert(got == Map(1L -> "http://a.com/", 2L -> null, 3L -> null))
    // stays inside whole-stage codegen on a non-foldable input
    val plan = spark.range(3)
      .select(UrlCanonExpr.urlCanon(
        concat(lit("http://H.com/"), col("id").cast("string"))).as("c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
  }
}
