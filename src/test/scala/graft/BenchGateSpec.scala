package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench retry gate's two sensor arms (r14 verdict item 6): every
  * r14 adjudication rode the task≈cpu arm because the round never saw
  * PSI above the gate — so the PSI arm had never demonstrably TRIPPED.
  * This spec pins both arms of [[Bench.sampleClean]]:
  *
  *   - the pure predicate's truth table (stalled task-time rejected,
  *     high PSI rejected, the no-PSI fallback judging by the sample's
  *     OWN loadavg — r14 ADVICE — and rejecting when that evidence is
  *     missing);
  *   - the PSI SENSOR itself under a deliberate stress window: spin
  *     more runnable threads than cores and watch `/proc/pressure/cpu`
  *     avg10 cross the gate — the kernel-evidence demonstration that a
  *     contaminated sample would be rejected by the real sensor, not
  *     just by synthetic numbers.
  *
  * No SparkSession: this is a harness spec, kept cheap except for the
  * bounded stress window (≤ 45 s, and it exits the moment the gate
  * trips).
  */
class BenchGateSpec extends AnyFunSuite {

  private val PsiGate = 10.0 // Bench's gate: >10% of the last 10 s stalled
  private val LoadGate = 8.0 // 32 cpus / 4, as Bench derives it

  test("sampleClean truth table: task≈cpu + low pressure accepts; either stall signal rejects") {
    // Clean: compute-bound (task ≈ cpu), calm host.
    assert(Bench.sampleClean(taskS = 30.0, cpuS = 29.0, psiEnd = 0.5,
      loadEnd = 2.0, PsiGate, LoadGate))
    // Stalled tasks: task-time ≫ cpu-time — rejected whatever PSI says
    // (runnable-but-not-running accrues task-time and no cpu-time).
    assert(!Bench.sampleClean(taskS = 40.0, cpuS = 10.0, psiEnd = 0.5,
      loadEnd = 2.0, PsiGate, LoadGate))
    // Contended host at the sample's end: rejected even with task≈cpu
    // (the query may have computed honestly BETWEEN stalls).
    assert(!Bench.sampleClean(taskS = 30.0, cpuS = 29.0, psiEnd = 35.0,
      loadEnd = 2.0, PsiGate, LoadGate))
    // Sub-second queries get 2 s absolute slack for scheduling overhead.
    assert(Bench.sampleClean(taskS = 2.2, cpuS = 0.3, psiEnd = 0.5,
      loadEnd = 2.0, PsiGate, LoadGate))
  }

  test("no-PSI fallback judges by the sample's own loadavg and rejects missing evidence") {
    // psiEnd < 0 = kernel exposes no PSI: the loadavg captured inside
    // the sample's window adjudicates.
    assert(Bench.sampleClean(taskS = 30.0, cpuS = 29.0, psiEnd = -1.0,
      loadEnd = 2.0, PsiGate, LoadGate))
    assert(!Bench.sampleClean(taskS = 30.0, cpuS = 29.0, psiEnd = -1.0,
      loadEnd = 20.0, PsiGate, LoadGate))
    // BOTH sensors unavailable: the sample cannot prove it ran
    // uncontended — never adjudicate on absent evidence (r14 ADVICE:
    // the pre-r15 fallback read loadavg at ADJUDICATION time, minutes
    // after the sample's window).
    assert(!Bench.sampleClean(taskS = 30.0, cpuS = 29.0, psiEnd = -1.0,
      loadEnd = -1.0, PsiGate, LoadGate))
  }

  test("the PSI sensor trips the gate under a real stress window (contaminated sample would be rejected)") {
    assume(new java.io.File("/proc/pressure/cpu").exists(),
      "kernel exposes no PSI — the loadavg-fallback arm is pinned above")
    val cores = Runtime.getRuntime.availableProcessors()
    // 2x oversubscription: with more runnable threads than cores, some
    // runnable task is ALWAYS stalled, so PSI 'some' avg10 climbs
    // toward 100 with its ~10 s time constant.
    val spinners = (0 until cores * 2).map { _ =>
      val t = new Thread(() => {
        var x = 0L
        while (!Thread.currentThread().isInterrupted) { x += 1 }
        if (x == Long.MinValue) println(x) // defeat JIT elision
      })
      t.setDaemon(true); t.start(); t
    }
    try {
      val deadline = System.nanoTime() + 45L * 1000 * 1000 * 1000
      var psi = Bench.Diag.psiCpu
      while (psi < PsiGate && System.nanoTime() < deadline) {
        Thread.sleep(1000)
        psi = Bench.Diag.psiCpu
      }
      info(f"psi avg10 reached $psi%.1f under ${spinners.size} spinners on $cores cores")
      assert(psi >= PsiGate,
        f"PSI avg10 only reached $psi%.1f under 2x oversubscription — " +
          "the gate's contention arm would never trip on this host")
      // And the predicate rejects a sample carrying this evidence even
      // when its task/cpu ratio looks clean.
      assert(!Bench.sampleClean(taskS = 10.0, cpuS = 9.9, psiEnd = psi,
        loadEnd = 1.0, PsiGate, LoadGate))
    } finally spinners.foreach(_.interrupt())
  }
}
