package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/**
 * Australian Business Number checksum kernel
 * (reference: src/common/utils.py:270-300).
 *
 * Algorithm: strip non-digits; must be exactly 11 digits; subtract 1 from
 * the first digit; dot-product with weights [10,1,3,5,7,9,11,13,15,17,19];
 * valid iff the sum is divisible by 89. Null/blank → false (the reference
 * returns False for falsy input).
 */
object AbnKernel extends Serializable {
  private val Weights: Array[Int] = Array(10, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19)

  def isValid(abn: UTF8String): Boolean =
    abn != null && isValidString(abn.toString)

  def isValidString(abn: String): Boolean = {
    if (abn == null) return false
    // Single pass: collect digits, reject if count != 11.
    var sum = 0
    var n = 0
    var i = 0
    while (i < abn.length) {
      val c = abn.charAt(i)
      if (c >= '0' && c <= '9') {
        if (n == 11) return false
        val d = c - '0'
        sum += (if (n == 0) d - 1 else d) * Weights(n)
        n += 1
      }
      i += 1
    }
    n == 11 && sum % 89 == 0
  }
}
