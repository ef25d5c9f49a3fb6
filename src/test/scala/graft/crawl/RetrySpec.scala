package graft.crawl

import org.scalatest.funsuite.AnyFunSuite

/** Ports the reference retry semantics tests (core/mod.rs:1000-1065). */
class RetrySpec extends AnyFunSuite {

  test("succeeds on a later attempt without surfacing earlier errors") {
    var calls = 0
    val out = Retry.withRetry(3) { attempt =>
      calls += 1
      if (attempt < 2) throw new RuntimeException(s"boom$attempt")
      s"ok@$attempt"
    }
    assert(out === "ok@2")
    assert(calls === 3)
  }

  test("preserves the LAST error after exhausting attempts (mod.rs:1000-1065)") {
    val e = intercept[Retry.RetryExhausted] {
      Retry.withRetry(3)(a => throw new RuntimeException(s"err$a"))
    }
    assert(e.attempts === 3)
    assert(e.lastError.getMessage === "err2")
  }

  test("runAll attempts every site and tallies failures (cli main.rs:110-125)") {
    val (ok, failed) = Retry.runAll(Seq("a", "b", "c"), attempts = 2) {
      case "b"  => throw new RuntimeException("site down")
      case site => site.toUpperCase
    }
    assert(ok === Map("a" -> "A", "c" -> "C"))
    assert(failed.keySet === Set("b"))
  }
}
