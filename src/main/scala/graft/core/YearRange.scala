package graft.core

/** Inclusive, optionally half-bounded year range
  * (gbif/maps common/.../filter/Range.java:21-62). A `None` bound is
  * unbounded; `contains(None)` (an unknown year) is only true for the
  * fully-unbounded range, matching the reference's null handling.
  */
final case class YearRange(lo: Option[Int], hi: Option[Int]) {
  require(
    (for { l <- lo; h <- hi } yield l <= h).getOrElse(true),
    s"Illegal range: $lo..$hi"
  )

  def isUnbounded: Boolean = lo.isEmpty && hi.isEmpty

  def contains(year: Option[Int]): Boolean = year match {
    case None    => isUnbounded
    case Some(y) => lo.forall(y >= _) && hi.forall(y <= _)
  }
}

object YearRange {
  val Unbounded: YearRange = YearRange(None, None)

  /** Parse "2001", "2001,2010", ",2010", "2001," (Params.java:149-171). */
  def parse(s: String): YearRange =
    if (s == null || s.trim.isEmpty) Unbounded
    else if (!s.contains(",")) {
      val y = s.trim.toInt
      YearRange(Some(y), Some(y))
    } else {
      val parts = s.split(",", -1).map(_.trim)
      def opt(p: String) = if (p.isEmpty) None else Some(p.toInt)
      YearRange(opt(parts(0)), opt(parts(1)))
    }
}
