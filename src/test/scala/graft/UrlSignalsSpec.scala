package graft

import org.scalatest.funspec.AnyFunSpec

import graft.pipeline.TextAnalysis

class UrlSignalsSpec extends AnyFunSpec with SparkSessionTestWrapper {
  import spark.implicits._

  private def signals(url: String): (String, String, String, Int, Boolean, Boolean) = {
    val r = TextAnalysis.urlSignals(Seq((1L, url)).toDF("id", "url"), "id", "url").collect()(0)
    (r.getString(2), r.getString(3), r.getString(4), r.getInt(5), r.getBoolean(6), r.getBoolean(7))
  }

  describe("TextAnalysis.urlSignals") {
    it("extracts host/domain/tld/path depth from a plain https URL") {
      assert(signals("https://www.example.com/articles/42/view") ==
        (("www.example.com", "example.com", "com", 3, false, false)))
    }

    it("strips userinfo and port from the host") {
      assert(signals("https://user:pw@sub.example.org:8443/a/b") ==
        (("sub.example.org", "example.org", "org", 2, false, false)))
    }

    it("keeps three labels under a two-level public suffix") {
      assert(signals("http://blog.bbc.co.uk/post?id=7") ==
        (("blog.bbc.co.uk", "bbc.co.uk", "uk", 1, true, false)))
    }

    it("flags IPv4 hosts and leaves the tld empty for them") {
      assert(signals("https://10.0.13.1/x") == (("10.0.13.1", "10.0.13.1", "", 1, false, true)))
    }

    it("handles apex hosts with no path and non-http schemes") {
      assert(signals("https://example.org") == (("example.org", "example.org", "org", 0, false, false)))
      assert(signals("ftp://files.example.net/pub/data.bin") ==
        (("files.example.net", "example.net", "net", 2, false, false)))
    }

    it("falls back to the authority token for scheme-less strings") {
      assert(signals("example.com/a/b/c") == (("example.com", "example.com", "com", 0, false, false)))
    }

    it("trailing slashes do not count as path segments") {
      assert(signals("https://example.com/a/b/") == (("example.com", "example.com", "com", 2, false, false)))
    }
  }
}
