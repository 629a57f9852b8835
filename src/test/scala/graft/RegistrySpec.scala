package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: forcing Registry init here makes a key
  * collision or an orphan oracle fail `sbt test`, not just the
  * driver's round.
  */
class RegistrySpec extends AnyFunSuite {

  test("query keys are unique and well-formed") {
    assert(Registry.queries.nonEmpty)
    assert(Registry.queries.keys.forall(_.matches("q[0-9]{2}_[a-z0-9_]+")))
  }

  test("every oracle key has a query") {
    assert(Registry.oracleSql.keySet.subsetOf(Registry.queries.keySet))
  }

  test("SparkEntry delegates to the registry") {
    assert(SparkEntry.queries.keySet == Registry.queries.keySet)
    assert(SparkEntry.oracleSql == Registry.oracleSql)
  }

  test("oracle SQL contains no unsubstituted interpolation artifacts") {
    Registry.oracleSql.foreach { case (k, sql) =>
      assert(!sql.contains("$"), s"$k: leftover interpolation placeholder")
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("SELECT"), k)
    }
  }
}
