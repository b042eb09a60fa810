package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the wall-window CPU account behind the per-section
  * `section_cpu_sec` artifact field (VERDICT r19 #2): executor CPU is
  * bucketed by task FINISH second and summed over a section's
  * [start, end] bracket, so stream/CDC/store jobs — which run on
  * streaming-execution threads outside the bench's job groups — still
  * get a drift-immune CPU axis next to their wall rates. */
class BenchCpuSpec extends AnyFunSuite {

  test("cpuSecWindow sums only buckets inside the bracket") {
    val cpu = new BenchCpu
    // 2 s of CPU finishing at t=10s, 1 s at t=12s, 4 s at t=20s
    cpu.recordWindow(10_500L, 2_000_000_000L)
    cpu.recordWindow(12_000L, 1_000_000_000L)
    cpu.recordWindow(20_999L, 4_000_000_000L)
    assert(cpu.cpuSecWindow(10_000L, 12_999L) == 3.0)
    assert(cpu.cpuSecWindow(0L, 9_999L) == 0.0)
    assert(cpu.cpuSecWindow(13_000L, 19_999L) == 0.0)
    assert(cpu.cpuSecWindow(10_000L, 20_000L) == 7.0)
    // empty window reads zero, not a sentinel
    assert(cpu.cpuSecWindow(50_000L, 60_000L) == 0.0)
  }

  test("tasks accumulate within one bucket") {
    val cpu = new BenchCpu
    cpu.recordWindow(7_100L, 500_000_000L)
    cpu.recordWindow(7_900L, 500_000_000L)
    assert(cpu.cpuSecWindow(7_000L, 7_999L) == 1.0)
  }
}
