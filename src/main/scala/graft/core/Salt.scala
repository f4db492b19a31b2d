package graft.core

/** Modulus-salted key scheme for balanced, pre-splittable keyed output
  * (gbif/maps common/.../hbase/ModulusSalt.java:52-97). Scala's
  * `String.hashCode` IS Java's, so salted keys are byte-compatible with the
  * reference's HBase rowkeys.
  */
final case class Salt(modulus: Int) extends Serializable {
  require(modulus > 0, "Modulus must be greater than 0")

  /** %100 produces 0..99 → 2 digits, etc. */
  val digitCount: Int = (math.log10((modulus - 1).max(1).toDouble) + 1).toInt

  def saltOf(key: String): Int = (key.hashCode & 0xfffffff) % modulus

  def saltToString(key: String): String =
    leftPadZeros(saltOf(key), digitCount) + ":" + key

  private def leftPadZeros(n: Int, len: Int): String = s"%0${len}d".format(n)
}

object Salt {
  /** Extract the salt prefix from "007:key". */
  def saltFrom(key: String): Int = {
    val i = key.indexOf(':')
    require(i > 0, s"Expected salt:value, got: $key")
    key.substring(0, i).toInt
  }
}
