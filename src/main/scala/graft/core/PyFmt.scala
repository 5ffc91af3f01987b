package graft.core

/** Python `format(x, '.6')` replica — the empty presentation type with
  * precision 6 the reference uses in CountingBloomFilter.__str__
  * (/root/reference/probables/blooms/countingbloom.py:119 `{fullness:.6}`).
  * Semantics: 'g'-style with 6 significant digits and round-half-even,
  * trailing zeros stripped, but always at least one digit after the decimal
  * point; scientific notation (two-digit exponent) when the decimal exponent
  * is < -4 or >= 6.
  */
object PyFmt {
  def g6(x: Double): String = {
    if (x == 0.0) return "0.0"
    if (x.isNaN) return "nan"
    if (x.isInfinite) return if (x > 0) "inf" else "-inf"
    val bd = new java.math.BigDecimal(x).round(new java.math.MathContext(6))
    val exp = bd.precision() - bd.scale() - 1
    if (exp < -4 || exp >= 6) {
      val m = bd.movePointLeft(exp).stripTrailingZeros()
      var ms = m.toPlainString
      if (!ms.contains('.')) ms += ".0"
      val sign = if (exp < 0) "-" else "+"
      f"${ms}e$sign${math.abs(exp)}%02d"
    } else {
      var s = bd.stripTrailingZeros().toPlainString
      if (!s.contains('.')) s += ".0"
      s
    }
  }
}
