package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.Dates

class DatesSpec extends AnyFunSuite {

  test("parses the grammar shapes") {
    import java.time.LocalDate
    assert(Dates.parse("2021-03-09").contains(LocalDate.of(2021, 3, 9)))
    assert(Dates.parse("9 March 2021").contains(LocalDate.of(2021, 3, 9)))
    assert(Dates.parse("March 9, 2021").contains(LocalDate.of(2021, 3, 9)))
    assert(Dates.parse("9 de marzo de 2021").contains(LocalDate.of(2021, 3, 9)))
    assert(Dates.parse("09/03/2021").contains(LocalDate.of(2021, 3, 9)))
    assert(Dates.parse("  9   March  2021 ").contains(LocalDate.of(2021, 3, 9)))
  }

  test("rejects junk and out-of-range dates (F4 parse filter)") {
    assert(Dates.parse("not a date").isEmpty)
    assert(Dates.parse("2021-13-40").isEmpty)
    assert(Dates.parse("31 February 2021").isEmpty)
    assert(Dates.parse("12 Smarch 2021").isEmpty)
  }

  test("deliberately-uncovered shapes return None (documented grammar boundary)") {
    // relative and underspecified dates need a wall clock — excluded by
    // contract (see Dates scaladoc table), not by accident
    assert(Dates.parse("two weeks ago").isEmpty)
    assert(Dates.parse("hace dos semanas").isEmpty)
    assert(Dates.parse("2021").isEmpty)          // bare year
    assert(Dates.parse("March 2021").isEmpty)    // month-year
    assert(Dates.parse("12 January").isEmpty)    // no year
    assert(Dates.parse("01/02/21").isEmpty)      // 2-digit year
    assert(Dates.parse("last Tuesday").isEmpty)
  }

  test("render → parse round-trips for every style (property)") {
    val genDate = for {
      y <- Gen.choose(1900, 2100)
      m <- Gen.choose(1, 12)
      d <- Gen.choose(1, 28)
      s <- Gen.choose(0, 3)
    } yield (y, m, d, s)
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200),
      Prop.forAll(genDate) { case (y, m, d, s) =>
        Dates.parse(Dates.render(y, m, d, s))
          .contains(java.time.LocalDate.of(y, m, d))
      })
    assert(res.passed, res.toString)
  }
}
