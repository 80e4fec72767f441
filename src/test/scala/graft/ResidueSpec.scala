package graft

/** Registry-wide storage-residue pin (the generalized GraphSpec residue
  * test, VERDICT r15 item 1c): EVERY registered query must leave the
  * session's executor storage the way it found it once its result frame
  * is dropped and the GC/ContextCleaner settle.
  *
  * Why this gate exists: r15's shipped bench recorded x04 at 7.85 s on
  * pass 1 and 141.3 s on pass 2 — same JVM, same data. The cause was
  * cumulative in-session residue: unreleased Dataset persists (held by
  * the CacheManager with STRONG references — never GC-reclaimable) and
  * unreleased checkpoint blocks accumulated per query execution until
  * the unified memory pool degraded every query that followed. On the
  * 100 TB shape — one cluster session running curation jobs back to
  * back — that decay is a scale-killer. This spec makes it a
  * compile-time-adjacent failure instead of a bench archaeology find.
  *
  * Mechanics: persisted-RDD count is sampled after a settle loop (GC +
  * short sleep, retried — ContextCleaner reclamation of DROPPED
  * checkpoint RDDs is async via weak references). CacheManager persists
  * would never settle, which is exactly what the pin catches: the
  * per-query budget is 0 — an operator may checkpoint its own result,
  * but once the caller drops the frame the session must return to
  * baseline. */
class ResidueSpec extends SparkSpec {

  test("every registered query settles back to storage baseline once dropped") {
    val sc = spark.sparkContext
    // settle the suite's own prior state first (shared session)
    def settled(limit: Int): Int = {
      var tries = 0
      var n = sc.getPersistentRDDs.size
      while (n > limit && tries < 25) {
        System.gc()
        Thread.sleep(200)
        n = sc.getPersistentRDDs.size
        tries += 1
      }
      n
    }
    val baseline = settled(0)
    val offenders = scala.collection.mutable.ListBuffer[String]()
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      // materialize fully (the bench shape) inside a scope, then drop
      locally {
        fn(spark, sfSmoke).write.mode("overwrite").format("noop").save()
      }
      val after = settled(baseline)
      if (after > baseline)
        offenders += s"$name: ${after - baseline} persisted RDDs survive GC settle " +
          "(an unreleased persist/checkpoint — the r15 in-session decay shape)"
      // a leak poisons every later measurement: stop at first offender
      // with the full picture rather than cascading blame
      assert(offenders.isEmpty, offenders.mkString("\n"))
    }
  }
}
