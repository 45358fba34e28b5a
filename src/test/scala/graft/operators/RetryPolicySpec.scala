package graft.operators

import graft.SparkSpec

class RetryPolicySpec extends SparkSpec {

  test("status classification: 429/408/5xx retry, rest notify") {
    assert(RetryPolicy.isRetryableStatus(429))
    assert(RetryPolicy.isRetryableStatus(408))
    assert(RetryPolicy.isRetryableStatus(500))
    assert(RetryPolicy.isRetryableStatus(503))
    assert(!RetryPolicy.isRetryableStatus(404))
    assert(!RetryPolicy.isRetryableStatus(200))
    assert(!RetryPolicy.isRetryableStatus(301))
  }

  test("retry=false marker suppresses retry") {
    assert(!RetryPolicy.allowsRetry("retry=false: fatal"))
    assert(RetryPolicy.allowsRetry("retry=true: transient"))
    assert(RetryPolicy.allowsRetry("boom"))
    assert(RetryPolicy.allowsRetry(null: String))
  }

  test("linear backoff: first + n capped at max (reference cfg 6..12 min)") {
    val got = (0 to 8).map(RetryPolicy.linearBackoff(_, 6, 12))
    assert(got == Seq(6, 7, 8, 9, 10, 11, 12, 12, 12))
  }

  test("geometric backoff: 10s * 1.125^n capped; notify 15s * 1.1125^n cap 45") {
    assert(RetryPolicy.geometricBackoff(0, 10, 1.125, 720) == 10.0)
    assert(RetryPolicy.geometricBackoff(1, 10, 1.125, 720) == 11.25)
    assert(RetryPolicy.geometricBackoff(100, 10, 1.125, 720) == 720.0)
    assert(RetryPolicy.geometricBackoff(25, 15, 1.1125, 45) == 45.0)
  }
}
