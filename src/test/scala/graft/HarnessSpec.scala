package graft

/** Harness plumbing: TempDirs scratch-dir lifecycle and the bench's
  * plan fingerprinting (both exist so the DRIVER's artifacts stay
  * diagnosable — regressions here corrupt round-over-round evidence,
  * not query results).
  */
class HarnessSpec extends SparkSpec {

  test("TempDirs sweeps every registered dir except the newest") {
    val a = TempDirs.register(java.nio.file.Files.createTempDirectory("graft_td_a"))
    val b = TempDirs.register(java.nio.file.Files.createTempDirectory("graft_td_b"))
    assert(a.toFile.exists && b.toFile.exists)
    TempDirs.sweep()
    // a (and anything older from other specs) is reclaimed; the newest
    // registration survives — it may back a live lazily-read frame
    assert(!a.toFile.exists, "older scratch dir should be deleted by sweep")
    assert(b.toFile.exists, "newest scratch dir must survive sweep")
    assert(TempDirs.pending == 1)
    // repeated invocations stay bounded: register N more, sweep → 1
    val more = (1 to 5).map(i =>
      TempDirs.register(java.nio.file.Files.createTempDirectory(s"graft_td_$i")))
    TempDirs.sweep()
    assert(TempDirs.pending == 1)
    assert(more.init.forall(!_.toFile.exists) && more.last.toFile.exists)
  }

  test("Bench.planFingerprint ignores run-varying ids, catches plan changes") {
    val p1 = "Project [l_orderkey#123L, sum#456]\n+- *(2) Filter (l_qty#12 > 5)"
    val p2 = "Project [l_orderkey#987L, sum#12]\n+- *(4) Filter (l_qty#77 > 5)"
    assert(Bench.planFingerprint(p1) == Bench.planFingerprint(p2),
      "exprId / codegen-stage renumbering must not change the fingerprint")
    val p3 = "Project [l_orderkey#1L]\n+- *(2) Filter (l_qty#12 > 6)"
    assert(Bench.planFingerprint(p1) != Bench.planFingerprint(p3),
      "a genuinely different plan must fingerprint differently")
  }

  test("Bench.planFingerprint is stable for the same query planned twice") {
    def plan(): String = table("orders").groupBy("o_orderstatus").count()
      .queryExecution.executedPlan.toString
    assert(Bench.planFingerprint(plan()) == Bench.planFingerprint(plan()))
  }

  test("fingerprintPlan: executing the frame does not move the hash (r20)") {
    // the r19 media plan-hash drift: executedPlan is AQE's FINAL plan
    // after an action, embedding runtime coalesce/reuse choices.
    // fingerprintPlan hashes the static sparkPlan, so the hash of an
    // AQE-shuffling query must be identical before and after count()
    // — and equal to a freshly planned copy of the same query.
    def frame() = table("lineitem").groupBy("l_returnflag").count()
    val df = frame()
    val before = Bench.fingerprintPlan(df)
    df.count()
    assert(Bench.fingerprintPlan(df) == before,
      "running the query must not change its static-plan fingerprint")
    assert(Bench.fingerprintPlan(frame()) == before,
      "a fresh plan of the same query must fingerprint identically")
  }

  test("planFingerprint strips JVM lambda/object identities (r20)") {
    // a recompile of the defining file renumbers anonymous-function
    // classes; two UDF node renders differing only in those must hash
    // equal — and object identity hashes (@1a2b3c4d) likewise
    val a = "Filter UDF(graft.multimodal.Media$$$Lambda$3412/0x00000008019a4c40@4f3c2a1b(blob#12))"
    val b = "Filter UDF(graft.multimodal.Media$$$Lambda$998/0x00000008011b2d10@77e1f0aa(blob#99))"
    assert(Bench.planFingerprint(a) == Bench.planFingerprint(b))
    val c = "Filter UDF(graft.multimodal.Media$$$Lambda$998/0x1(other#99))"
    assert(Bench.planFingerprint(a) != Bench.planFingerprint(c),
      "different argument shape must still fingerprint differently")
  }
}
