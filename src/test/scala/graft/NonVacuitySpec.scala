package graft

/** Institutionalizes the round-5 vacuity rule: a hash-gated query that
  * returns ZERO rows matches its oracle without exercising its
  * defining semantics (the original q_join_anti/q_except were green
  * for four rounds while never emitting a row, and q_funnel's tail
  * stages were green while never firing). The driver's gate only
  * enforces rows>0 for rows-only queries — a hash-gated query can
  * legitimately return an empty result and pass — so this spec closes
  * that hole for EVERY registered query at the smallest SF. A query
  * with a principled reason to be empty must be listed in `exempt`
  * with that reason next to it (none today). */
class NonVacuitySpec extends SparkSpec {

  test("every registered query returns rows at sf0.001 — nothing " +
    "passes its oracle vacuously-empty") {
    val exempt = Map.empty[String, String] // name -> justification
    val empties = SparkEntry.queries.toSeq.sortBy(_._1)
      .filterNot { case (name, _) => exempt.contains(name) }
      .flatMap { case (name, fn) =>
        val n =
          try fn(spark, sf).count()
          catch {
            case e: Throwable =>
              fail(s"$name threw at sf0.001: ${e.getMessage}")
          }
        if (n == 0L) Some(name) else None
      }
    assert(empties.isEmpty,
      s"queries with ZERO rows at sf0.001 (vacuous gate): $empties")
  }
}
