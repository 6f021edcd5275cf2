package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench sidecar is the variance record the per-round BENCH artifact
  * lacks: each query carries min AND max of its timed runs so an outlier
  * in the driver's one-number-per-query view is attributable (max >> min
  * ⇒ host stall; max ~= min ⇒ real cost). This pins the schema.
  */
class BenchSidecarSpec extends AnyFunSuite {

  test("sidecar is one JSON object with min/max per query") {
    val line = Bench.sidecarJson(Seq(
      "q_fast" -> (0.0861, 0.0912),
      "q_stalled" -> (0.09, 8.4321)))
    assert(line ==
      """{"q_fast":{"min":0.0861,"max":0.0912},""" +
      """"q_stalled":{"min":0.0900,"max":8.4321}}""")
  }

  test("a failed query records -1 in both fields, not a fast run") {
    val line = Bench.sidecarJson(Seq("q_bad" -> (-1.0, -1.0)))
    assert(line == """{"q_bad":{"min":-1.0000,"max":-1.0000}}""")
  }
}
