package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge cases of the markup stripper and URL canonicalizer that the
  * fixture-built oracle rows can't reach: degenerate URLs (no query,
  * root path, non-default port, http vs https defaults), nested
  * entities, and markup-free text passing through unchanged. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("t").select(TextOps.stripMarkup(col("t"))).as[String].head()

  private def norm(s: String): String =
    Seq(s).toDF("u").select(TextOps.normalizeUrl(col("u"))).as[String].head()

  test("stripMarkup: script bodies vanish, entities decode once, plain text passes through") {
    assert(strip("""a<script>var x = "<b>hi</b>";</script>b""") == "a b")
    assert(strip("<STYLE media=x>p{}</STYLE>done") == "done")
    assert(strip("&amp;lt;x&amp;gt;") == "&lt;x&gt;", "&amp; must decode LAST, exactly once")
    assert(strip("plain  text,   no markup") == "plain text, no markup")
    assert(strip("<p\nclass='a'>multi\nline</p>") == "multi line")
    assert(strip("") == "")
  }

  test("normalizeUrl: ports, paths, params, fragments — every rule and its exception") {
    assert(norm("HTTPS://Example.COM:443/") == "https://example.com")
    assert(norm("http://example.com:80/a/") == "http://example.com/a")
    assert(norm("https://example.com:8443/a") == "https://example.com:8443/a",
      "only the scheme's DEFAULT port is stripped")
    assert(norm("http://example.com:443/a") == "http://example.com:443/a",
      "443 is not http's default")
    assert(norm("https://h/p?utm_source=x&utm_medium=y") == "https://h/p",
      "all-tracking query drops entirely")
    assert(norm("https://h/p?b=2&a=1#frag") == "https://h/p?a=1&b=2")
    assert(norm("https://h") == "https://h")
    assert(norm("https://h/?") == "https://h")
  }
}
