package graft

import org.scalatest.funsuite.AnyFunSuite

/** The /proc-based measurement instrumentation both bench mains lean
  * on ([[BenchGuard]]): these pin the counter semantics the artifacts'
  * trust story depends on — monotonic jiffies, non-negative windows,
  * and a co-resident scan that never names this process or its own
  * launcher chain (sbt would otherwise flag itself on every run).
  */
class BenchGuardSpec extends AnyFunSuite {

  test("cpuJiffies is non-negative and monotonic across a busy window") {
    val (b0, s0, w0, st0) = BenchGuard.cpuJiffies()
    assert(b0 >= 0 && s0 >= 0 && w0 >= 0 && st0 >= 0)
    // burn a little cpu in-process so self jiffies must advance
    var acc = 0L
    val t0 = System.nanoTime()
    while ((System.nanoTime() - t0) / 1e9 < 0.3) acc += acc.hashCode()
    val (b1, s1, w1, st1) = BenchGuard.cpuJiffies()
    assert(b1 >= b0 && s1 >= s0 && w1 >= w0 && st1 >= st0)
    assert(s1 > s0, "self jiffies must advance across 0.3s of spinning")
  }

  test("timedExt reports the window length and non-negative cpu attributions") {
    val (secs, ext, iow, stl) = BenchGuard.timedExt { Thread.sleep(120) }
    assert(secs >= 0.1 && secs < 5.0)
    assert(ext >= 0.0 && iow >= 0.0 && stl >= 0.0)
  }

  test("steal rides its own channel: busy excludes it, stealCores samples it") {
    // busy = sum - idle - iowait - steal by construction; an idle-ish
    // window's external attribution must not inherit host steal (the
    // r17 incident: 3+ "external cores" on a guest with zero local
    // neighbors — all steal). We can't force the host to steal, so pin
    // the invariant we can: self <= busy and both channels non-negative.
    val (busy, self, _, steal) = BenchGuard.cpuJiffies()
    assert(self <= busy + 1, "self jiffies cannot exceed local busy")
    assert(steal >= 0)
    assert(BenchGuard.stealCores(200) >= 0.0)
  }

  test("dirtyMb and gcMillis are readable and non-negative") {
    assert(BenchGuard.dirtyMb() >= 0.0)
    assert(BenchGuard.gcMillis() >= 0L)
  }

  test("coResidentJvms never names this process or its launcher chain") {
    // the test runs UNDER a forked sbt test JVM whose parent is sbt —
    // cmdlines full of 'sbt'/'scala'; the ancestor exclusion must keep
    // the scan from flagging the very process tree running it
    var anc = Set(ProcessHandle.current().pid())
    var h = ProcessHandle.current()
    while (h.parent().isPresent) { h = h.parent().get(); anc += h.pid() }
    val hits = BenchGuard.coResidentJvms()
    anc.foreach { pid =>
      assert(!hits.exists(_.startsWith(s"pid=$pid ")),
        s"scan flagged its own ancestor pid=$pid: $hits")
    }
  }
}
