package graft

/** Shared measurement-trust utilities for [[Bench]] and [[ScaleBench]]
  * (r16 verdict items 1 and 6): the committed scale-up numbers were
  * contaminated twice (r15, r16) by co-located load that the plain
  * wall-clock `time(thunk)` could not see — `graph_prep`'s committed
  * 10x row drifted 11.8 s → 39.8 s → 71.5 s across one round's reruns
  * of UNCHANGED code while a fresh quiet JVM read 8.0 s. Both
  * measurement mains now share one immune system:
  *
  *  - [[timedExt]] reads `/proc/stat` around the window and reports the
  *    average EXTERNAL cpu cores busy (system busy minus this process)
  *    — loadavg alone cannot separate a neighbor from the bench itself;
  *  - [[coResidentJvms]] names any OTHER sbt/Spark/graft JVM alive on
  *    the box (excluding this process and its ancestors) so a run that
  *    starts next to a test suite is self-flagging in the artifact,
  *    not silently inflated — both contamination incidents were exactly
  *    a concurrent sbt JVM;
  *  - [[quietGate]] waits (capped) for the 1-min loadavg to settle AND
  *    for co-resident JVMs to exit before measuring, and returns what
  *    it saw so the artifact records the starting conditions either way.
  */
object BenchGuard {

  /** JSON string escape, shared by both measurement mains' artifact
    * serializers — a fix applied to one copy must not leave the other
    * emitting unparseable artifacts.
    */
  def jstr(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Scala prints Double.Infinity/NaN as `Infinity`/`NaN` — invalid
    * JSON that would corrupt the artifact line. -1 = "not measured".
    */
  def jnum(d: Double): String =
    if (d.isNaN || d.isInfinite) "-1" else d.toString

  def load1m: Double = java.lang.management.ManagementFactory
    .getOperatingSystemMXBean.getSystemLoadAverage

  /** (local busy jiffies across all cpus, this process's jiffies,
    * iowait jiffies, STEAL jiffies). Busy/self DELTAS separate our own
    * load from EXTERNAL-PROCESS load — loadavg alone cannot: the bench
    * keeps cores busy by design, so "loadavg rose mid-run" does not
    * distinguish a neighbor process from ourselves. IOWAIT is tracked
    * separately because it is invisible to both (it counts as idle):
    * leftover page writeback from a prior process inflated early probes
    * ~3-4x in a run whose external-CPU read 0.0. STEAL is tracked
    * separately (and EXCLUDED from busy) because this box is a guest VM
    * and steal is the HOST's neighbors, not a local process: a run that
    * lumps steal into "external cores" reads as "the builder ran
    * something concurrently" when the truth is "the host was contended"
    * — different trust story, measured 3+ steal cores on an otherwise
    * idle guest (r17).
    */
  def cpuJiffies(): (Long, Long, Long, Long) = {
    val cpu = scala.io.Source.fromFile("/proc/stat").getLines()
      .find(_.startsWith("cpu ")).get.trim.split("\\s+").drop(1).map(_.toLong)
    val iowait = if (cpu.length > 4) cpu(4) else 0L
    val steal = if (cpu.length > 7) cpu(7) else 0L
    val idle = cpu(3) + iowait
    val busy = cpu.sum - idle - steal
    val stat = scala.io.Source.fromFile("/proc/self/stat").mkString
    // fields after the parenthesized comm: state=0 ... utime=11 stime=12
    val f = stat.substring(stat.lastIndexOf(')') + 2).split(" ")
    (busy, f(11).toLong + f(12).toLong, iowait, steal)
  }

  val JiffiesPerSec = 100.0 // Linux USER_HZ

  /** Time `thunk`, returning (seconds, avg EXTERNAL-PROCESS cpu cores
    * busy during the window, avg cores in IOWAIT, avg cores STOLEN by
    * the host) — external = local busy minus this process; steal rides
    * its own channel (see [[cpuJiffies]]).
    */
  def timedExt(thunk: => Unit): (Double, Double, Double, Double) = {
    val (b0, s0, w0, st0) = cpuJiffies()
    val t0 = System.nanoTime()
    thunk
    val secs = (System.nanoTime() - t0) / 1e9
    val (b1, s1, w1, st1) = cpuJiffies()
    val ext = if (secs <= 0.0) 0.0
      else math.max(0L, (b1 - b0) - (s1 - s0)) / JiffiesPerSec / secs
    val iow = if (secs <= 0.0) 0.0
      else math.max(0L, w1 - w0) / JiffiesPerSec / secs
    val stl = if (secs <= 0.0) 0.0
      else math.max(0L, st1 - st0) / JiffiesPerSec / secs
    (secs, ext, iow, stl)
  }

  /** Dirty + Writeback pages from /proc/meminfo, in MB — pending disk
    * writeback. A measurement started while a PRIOR process's dirty
    * pages are still flushing competes for the disk with its own
    * shuffles; the contention shows up in neither loadavg nor
    * external-CPU (iowait counts as idle).
    */
  def dirtyMb(): Double = try {
    val mi = scala.io.Source.fromFile("/proc/meminfo").getLines()
      .filter(l => l.startsWith("Dirty:") || l.startsWith("Writeback:"))
      .map(_.split("\\s+")(1).toLong).sum
    mi / 1024.0
  } catch { case _: Throwable => -1.0 }

  /** GC time (ms) summed across all collectors — deltas attribute a
    * query's inflation to collection pressure.
    */
  def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
  }

  /** Other JVMs on this box that look like competing measurement noise:
    * a java process (not this one, not an ancestor of it — sbt runs
    * mains in-process or forked, so the launcher chain is ours) whose
    * command line mentions sbt, Spark, scala, or this project. Returns
    * one short description per hit for the artifact.
    */
  def coResidentJvms(): Seq[String] = {
    var ancestors = Set(ProcessHandle.current().pid())
    var h = ProcessHandle.current()
    while (h.parent().isPresent) {
      h = h.parent().get(); ancestors += h.pid()
    }
    val procs = Option(new java.io.File("/proc").listFiles())
      .getOrElse(Array.empty)
    procs.iterator
      .filter(d => d.getName.nonEmpty && d.getName.forall(_.isDigit))
      .flatMap { d =>
        val pid = d.getName.toLong
        if (ancestors(pid)) None
        else try {
          val raw = java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(s"/proc/$pid/cmdline"))
          val argv = new String(raw, "UTF-8").split('\u0000').filter(_.nonEmpty)
          val exe = argv.headOption.getOrElse("")
          val isJvm = exe.endsWith("java") || exe.endsWith("/java")
          val suspicious = argv.exists(a => a.contains("sbt") ||
            a.contains("spark") || a.contains("graft") ||
            a.contains("scala"))
          if (isJvm && suspicious)
            Some(s"pid=$pid ${argv.take(2).mkString(" ").take(100)}")
          else None
        } catch { case _: Throwable => None } // raced exit / no permission
      }.toSeq
  }

  /** Average cores STOLEN by the host over a short sample window —
    * guest-VM contention that no local counter attributes (see
    * [[cpuJiffies]]).
    */
  def stealCores(sampleMs: Int = 1000): Double = {
    val (_, _, _, s0) = cpuJiffies()
    Thread.sleep(sampleMs.toLong)
    val (_, _, _, s1) = cpuJiffies()
    math.max(0L, s1 - s0) / JiffiesPerSec / (sampleMs / 1000.0)
  }

  /** Wait (capped) until the 1-min loadavg is below `loadGate`, no
    * co-resident measurement JVM is alive, pending disk writeback has
    * drained below `dirtyGateMb` (a `sync` is kicked off first so a
    * prior process's dirty pages flush NOW instead of competing with
    * the measurement's own shuffle I/O — early probes of an otherwise
    * quiet run measured 3-4x inflated from exactly this), AND the host
    * is stealing fewer than `stealGate` cores (guest-VM contention the
    * run cannot control but should not start under), logging progress
    * to stderr. Returns (seconds waited, loadavg at measurement start,
    * co-resident JVMs STILL alive at measurement start, dirty MB at
    * measurement start, steal cores at measurement start) — a run that
    * proceeds contaminated is self-flagging in the artifact, never
    * silent.
    */
  def quietGate(tag: String, loadGate: Double, capSec: Int,
      dirtyGateMb: Double = 256.0, stealGate: Double = 2.0)
      : (Double, Double, Seq[String], Double, Double) = {
    val t0 = System.nanoTime()
    try new ProcessBuilder("sync").start() // async flush of leftover dirty
    catch { case _: Throwable => () }
    // steal is sampled as a DELTA across whatever this gate is already
    // doing — the /proc scan at entry (padded to 250 ms for jiffy
    // resolution) and each 15 s wait pass — instead of a dedicated 1 s
    // stealCores() sample per pass (ADVICE r17: that charged every run,
    // even a quiet one, an extra second before measurement, and left
    // steal one pass staler than the live-read load/dirty conditions)
    var stealWin = cpuJiffies()._4
    var stealT = System.nanoTime()
    def stealSince(): Double = {
      val s1 = cpuJiffies()._4
      val w = (System.nanoTime() - stealT) / 1e9
      val v = if (w <= 0) 0.0 else math.max(0L, s1 - stealWin) / JiffiesPerSec / w
      stealWin = s1; stealT = System.nanoTime()
      v
    }
    var jvms = coResidentJvms()
    val padMs = 250 - (System.nanoTime() - stealT) / 1000000
    if (padMs > 0) Thread.sleep(padMs)
    var steal = stealSince()
    while ((load1m >= loadGate || jvms.nonEmpty || dirtyMb() > dirtyGateMb ||
        steal >= stealGate) &&
        (System.nanoTime() - t0) / 1e9 < capSec) {
      val why = (if (load1m >= loadGate) Seq(f"loadavg ${load1m}%.2f >= $loadGate%.1f")
        else Seq.empty) ++
        (if (jvms.nonEmpty) Seq(s"${jvms.size} co-resident JVM(s): ${jvms.head}")
        else Seq.empty) ++
        (if (dirtyMb() > dirtyGateMb) Seq(f"${dirtyMb()}%.0f MB dirty pages flushing")
        else Seq.empty) ++
        (if (steal >= stealGate) Seq(f"host stealing $steal%.1f cores")
        else Seq.empty)
      System.err.println(s"[$tag] ${why.mkString("; ")} — waiting for quiet " +
        s"(cap ${capSec}s)")
      Thread.sleep(15000)
      jvms = coResidentJvms()
      steal = stealSince() // delta across the sleep — no extra wall-clock
    }
    ((System.nanoTime() - t0) / 1e9, load1m, jvms, dirtyMb(), steal)
  }
}
