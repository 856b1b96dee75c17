package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench load gate's /proc readers (r12). The official BENCH record
  * was load-poisoned two rounds running because nothing acted on
  * machine load; these probes are what now gates every timed rep, so a
  * silent parse regression (e.g. a /proc format surprise) must fail a
  * spec, not quietly disable the gate.
  */
class LoadGateSpec extends AnyFunSuite {
  test("host core count comes from /proc/stat per-cpu lines and is sane") {
    assert(LoadGate.cores > 0)
    // on Linux the per-cpu count can exceed (cpuset) but never be less
    // than... no: the JVM count can exceed per-cpu lines only if /proc
    // was unreadable and we fell back — either way it must be positive
    // and bounded by something machine-like
    assert(LoadGate.cores <= 4096)
  }

  test("externalBusyCores excludes this process and stays in [0, cores]") {
    // burn CPU in-process during the sample window: self load must NOT
    // count as external
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val burners = (1 to 4).map { _ =>
      val t = new Thread(() => { var x = 0L; while (!stop.get()) x += 1 })
      t.setDaemon(true); t.start(); t
    }
    try {
      val ext = LoadGate.externalBusyCores(300)
      assert(ext == -1.0 || (ext >= 0.0 && ext <= LoadGate.cores + 0.5),
        s"external busy cores out of range: $ext")
    } finally { stop.set(true); burners.foreach(_.join(1000)) }
  }

  test("loadAvg1m parses") {
    val l = LoadGate.loadAvg1m()
    assert(l >= 0.0 && l < 10000.0, s"implausible loadavg: $l")
  }
}
