package graft.core

/** Packs (basisOfRecord, year) into one int — `year*100 + borId` — to shrink
  * aggregation keys (gbif/maps spark-generate-maps/.../udf/EncodeBorYearUDF
  * .java:30-70). A null year encodes as 0, decoded back as "unknown".
  */
object BorYear {
  val BorIds: Map[String, Int] = Map(
    "PRESERVED_SPECIMEN" -> 0,
    "MACHINE_OBSERVATION" -> 1,
    "OCCURRENCE" -> 2,
    "HUMAN_OBSERVATION" -> 3,
    "LIVING_SPECIMEN" -> 4,
    "OBSERVATION" -> 5,
    "MATERIAL_CITATION" -> 6,
    "MATERIAL_SAMPLE" -> 7,
    "FOSSIL_SPECIMEN" -> 8
  )
  val BorNames: Map[Int, String] = BorIds.map(_.swap)

  def encode(bor: String, year: Option[Int]): Int =
    year.getOrElse(0) * 100 + BorIds(bor)

  def year(encoded: Int): Int = math.max(encoded / 100, 0)

  def bor(encoded: Int): String = BorNames(encoded % 100)
}
