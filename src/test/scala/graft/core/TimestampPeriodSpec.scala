package graft.core

import org.scalatest.funsuite.AnyFunSuite
import java.time.LocalDate

class TimestampPeriodSpec extends AnyFunSuite {
  private val p1 = TimestampPeriod.of("2024-01-01", "2024-01-31")
  private val p2 = TimestampPeriod.of("2024-01-15", "2024-02-15")
  private val p3 = TimestampPeriod.of("2024-03-01", "2024-03-10")

  test("inner union is the intersection") {
    assert(p1.union(p2) === TimestampPeriod.of("2024-01-15", "2024-01-31"))
  }

  test("inner union of disjoint periods is empty") {
    assert(p1.union(p3).isEmpty)
  }

  test("outer union is the hull") {
    assert(p1.union(p2, "outer") === TimestampPeriod.of("2024-01-01", "2024-02-15"))
  }

  test("open bounds behave like the reference's NaT") {
    val open = TimestampPeriod(None, Some(LocalDate.parse("2024-01-20")))
    assert(p1.union(open) === TimestampPeriod.of("2024-01-01", "2024-01-20"))
    assert(p1.union(open, "outer") === TimestampPeriod(None, Some(LocalDate.parse("2024-01-31"))))
  }

  test("contains and inside") {
    val inner = TimestampPeriod.of("2024-01-10", "2024-01-20")
    assert(p1.contains(inner))
    assert(inner.inside(p1))
    assert(!inner.contains(p1))
    // open bound contains any closed bound on that side
    assert(TimestampPeriod(None, Some(LocalDate.parse("2024-12-31"))).contains(p1))
  }

  test("length and middle") {
    assert(p1.lengthDays.contains(31L))
    assert(p1.middle.contains(LocalDate.parse("2024-01-16")))
    assert(TimestampPeriod.empty.lengthDays.isEmpty)
  }
}
