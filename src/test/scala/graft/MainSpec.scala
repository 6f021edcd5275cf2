package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI argument parsing parity (reference main.py:33-155). */
class MainSpec extends AnyFunSuite {

  test("time args accept date-only and full ISO forms") {
    assert(Main.parseTimeArg("2024-01-05") ==
      java.time.LocalDateTime.of(2024, 1, 5, 0, 0))
    assert(Main.parseTimeArg("2024-01-05T06:30:00") ==
      java.time.LocalDateTime.of(2024, 1, 5, 6, 30))
  }

  test("rates parse as exact decimals; flags and intervals accumulate") {
    val c = Main.parseArgs(Seq(
      "--data-dir", "/d", "--output-dir", "/o",
      "--rate-cpu-su", "0.013", "--rate-gpu-v100-su", "1.214",
      "--include-stopped-runtime",
      "--exclude-interval", "2024-01-10,2024-01-11",
      "--exclude-interval", "2024-01-20T06:00:00,2024-01-20T18:00:00"))
    assert(c.rates.cpu == BigDecimal("0.013"))
    assert(c.rates.cpu.toString == "0.013") // scale preserved for CSV display
    assert(c.rates.gpuV100 == BigDecimal("1.214"))
    assert(c.rates.includeStoppedRuntime)
    assert(c.excludeIntervals.size == 2)
    assert(c.excludeIntervals.head._1 == java.time.LocalDateTime.of(2024, 1, 10, 0, 0))
  }

  test("unknown arguments and missing required paths fail loudly") {
    intercept[IllegalArgumentException](Main.parseArgs(Seq("--bogus", "x")))
    intercept[IllegalArgumentException](Main.parseArgs(Seq("--data-dir", "/d")))
  }
}
