package graft

import graft.tools.RegexAudit

/** Regression net for ReDoS-class regex behavior: every pattern the
  * scalar operators still evaluate through java.util.regex must stay
  * effectively linear on the adversarial shape battery — the same
  * battery that exposed the email pattern's O(n²) blowup (fixed by the
  * [[graft.plans.EmailScan]] kernel; its linearity is pinned in
  * EmailScanSpec, so it is excluded here). A future operator that
  * ships a backtracking-prone pattern fails this suite by name
  * instead of stalling an executor at corpus scale.
  *
  * Bounds are loose on purpose (CI-noise tolerant): a genuinely
  * super-linear cell does not take 2× the budget, it times out by
  * orders of magnitude — the email pattern measured >2,000 ms at 50k
  * chars where every healthy cell sits under ~20 ms.
  */
class RegexLinearitySpec extends org.scalatest.funsuite.AnyFunSuite {

  test("every java.util.regex-evaluated operator pattern stays linear " +
      "on the adversarial shape battery") {
    val len = 40000
    val budgetMs = 1000L
    val offenders = for {
      (pn, ps) <- RegexAudit.javaEvaluated
      (sn, s) <- RegexAudit.shapes(len)
      (ms, timedOut) = RegexAudit.timeCell(ps, s, budgetMs)
      if timedOut
    } yield f"$pn/$sn exceeded $budgetMs ms at $len chars"
    assert(offenders.isEmpty,
      s"super-linear regex cells:\n${offenders.mkString("\n")}")
  }
}
