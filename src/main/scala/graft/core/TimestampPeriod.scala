package graft.core

import java.time.LocalDate

/** Closed date period with optional open ends — the reference's
  * TimestampPeriod utility (utils/TimestampPeriod.py) re-expressed as
  * an immutable value class for driver-side period arithmetic.
  *
  * `None` means an open bound (the reference's NaT).
  */
final case class TimestampPeriod(start: Option[LocalDate], end: Option[LocalDate]) {

  def isEmpty: Boolean = start.isEmpty && end.isEmpty
  def hasNaT: Boolean = start.isEmpty || end.isEmpty

  /** Intersection ("inner") or hull ("outer") of two periods
    * (TimestampPeriod.py:67 union). */
  def union(other: TimestampPeriod, how: String = "inner"): TimestampPeriod = {
    def pick(a: Option[LocalDate], b: Option[LocalDate], takeMax: Boolean): Option[LocalDate] =
      (a, b) match {
        case (Some(x), Some(y)) => Some(if ((x.isAfter(y)) == takeMax) x else y)
        case (Some(x), None) => if (how == "inner") Some(x) else None
        case (None, Some(y)) => if (how == "inner") Some(y) else None
        case _ => None
      }
    how match {
      case "inner" =>
        val s = pick(start, other.start, takeMax = true)
        val e = pick(end, other.end, takeMax = false)
        // disjoint periods -> empty
        (s, e) match {
          case (Some(a), Some(b)) if a.isAfter(b) => TimestampPeriod(None, None)
          case _ => TimestampPeriod(s, e)
        }
      case "outer" =>
        TimestampPeriod(pick(start, other.start, takeMax = false),
          pick(end, other.end, takeMax = true))
      case _ => throw new IllegalArgumentException(s"unknown how: $how")
    }
  }

  /** Is this period fully inside the other? (TimestampPeriod.py:245) */
  def inside(other: TimestampPeriod): Boolean = other.contains(this)

  /** Does this period contain the other? (TimestampPeriod.py:267) */
  def contains(other: TimestampPeriod): Boolean = {
    val sOk = (start, other.start) match {
      case (None, _) => true
      case (Some(_), None) => false
      case (Some(a), Some(b)) => !a.isAfter(b)
    }
    val eOk = (end, other.end) match {
      case (None, _) => true
      case (Some(_), None) => false
      case (Some(a), Some(b)) => !a.isBefore(b)
    }
    sOk && eOk
  }

  /** Number of days spanned (inclusive), when closed. */
  def lengthDays: Option[Long] = for (s <- start; e <- end)
    yield java.time.temporal.ChronoUnit.DAYS.between(s, e) + 1

  def middle: Option[LocalDate] = for (s <- start; e <- end)
    yield s.plusDays(java.time.temporal.ChronoUnit.DAYS.between(s, e) / 2)
}

object TimestampPeriod {
  val empty: TimestampPeriod = TimestampPeriod(None, None)
  def of(start: String, end: String): TimestampPeriod =
    TimestampPeriod(Some(LocalDate.parse(start)), Some(LocalDate.parse(end)))
}
