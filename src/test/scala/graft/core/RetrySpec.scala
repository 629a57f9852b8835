package graft.core

import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {
  test("returns first success without extra attempts") {
    var calls = 0
    assert(Retry(3) { calls += 1; 42 } == 42)
    assert(calls == 1)
  }

  test("retries up to n times then succeeds") {
    var calls = 0
    val out = Retry(3) {
      calls += 1
      if (calls < 3) sys.error("flaky") else "ok"
    }
    assert(out == "ok" && calls == 3)
  }

  test("exhausted retries rethrow the last failure") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry(2) { calls += 1; sys.error(s"boom $calls") }
    }
    assert(calls == 3 && e.getMessage == "boom 3")
  }
}
