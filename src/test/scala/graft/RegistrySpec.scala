package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: forcing Registry init here makes a key
  * collision or an orphan oracle fail `sbt test`, not just the
  * driver's round.
  */
class RegistrySpec extends AnyFunSuite {

  test("query keys are unique and well-formed") {
    assert(Registry.queries.nonEmpty)
    assert(Registry.queries.keys.forall(_.matches("q[0-9]{2,3}_[a-z0-9_]+")))
  }

  test("every oracle key has a query") {
    assert(Registry.oracleSql.keySet.subsetOf(Registry.queries.keySet))
  }

  test("SparkEntry delegates to the registry") {
    assert(SparkEntry.queries.keySet == Registry.queries.keySet)
    assert(SparkEntry.oracleSql == Registry.oracleSql)
  }

  test("oracle SQL contains no unsubstituted interpolation artifacts") {
    // a Scala interpolation leftover looks like `$ident` or `${...}`;
    // a bare `$` followed by punctuation is legitimate SQL (q71's
    // JSON path '$.k')
    val interp = "\\$[A-Za-z_{]".r
    Registry.oracleSql.foreach { case (k, sql) =>
      assert(interp.findFirstIn(sql).isEmpty,
        s"$k: leftover interpolation placeholder: ${interp.findFirstIn(sql)}")
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("SELECT"), k)
    }
  }
}
