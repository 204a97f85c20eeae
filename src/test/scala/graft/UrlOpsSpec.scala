package graft

import graft.ops.UrlOps
import org.apache.spark.sql.functions._

/** URL canonicalization rules, edge cases the synthesized query corpus
  * doesn't cover: https default port, tracking-only query strings,
  * multiple trailing slashes, empty path, non-URL input. */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.urlCanonicalize(col("u"))).as[String].collect().toSeq

  test("canonicalize: case, www, default ports, slash, params, fragment") {
    assert(canon(
      "HTTP://WWW.Example.COM:80/a/b/?b=2&a=1#frag",
      "https://example.com:443/a/b?a=1&b=2",
      "https://example.com:8443/a/b?a=1&b=2", // NON-default port survives
      "http://example.com",                  // empty path → /
      "http://example.com/a///",             // trailing slashes collapse
      "http://example.com/?utm_source=x&utm_medium=y&fbclid=z" // tracking-only → no query
    ) == Seq(
      "http://example.com/a/b?a=1&b=2",
      "https://example.com/a/b?a=1&b=2",
      "https://example.com:8443/a/b?a=1&b=2",
      "http://example.com/",
      "http://example.com/a",
      "http://example.com/"))
  }

  test("http:443 and https:80 are NOT stripped (not the scheme's default)") {
    assert(canon("http://a.com:443/x", "https://a.com:80/x")
      == Seq("http://a.com:443/x", "https://a.com:80/x"))
  }

  test("host and registered domain") {
    val df = Seq("https://WWW.blog.news.Example.com/x?a=1").toDF("u")
    val r = df.select(
      UrlOps.urlHost(col("u")).as("h"),
      UrlOps.urlRegisteredDomain(col("u")).as("d")).head
    assert(r.getString(0) == "blog.news.example.com")
    assert(r.getString(1) == "example.com")
  }

  test("non-URL input canonicalizes without throwing, to a stable key") {
    val out = canon("not a url", "")
    assert(out.forall(_ != null))
    assert(out.distinct.size == 2 || out.distinct.size == 1)
  }

  test("param sort is byte-wise and keeps duplicate keys") {
    assert(canon("http://a.com/x?z=1&a=2&a=1&B=3")
      == Seq("http://a.com/x?B=3&a=1&a=2&z=1")) // 'B' < 'a' byte-wise
  }
}
