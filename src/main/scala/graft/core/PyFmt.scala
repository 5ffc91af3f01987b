package graft.core

/** Python `format(x, '.6')` replica — the empty presentation type with
  * precision 6 the reference uses in CountingBloomFilter.__str__
  * (/root/reference/probables/blooms/countingbloom.py:119 `{fullness:.6}`).
  *
  * Semantics measured against CPython (round-5 review pass — the first cut
  * diverged on all three):
  *  - 6 significant digits, ROUND-HALF-EVEN on the exact binary value
  *    (format(0.1015625, '.6') == '0.101562', not ...63);
  *  - scientific notation when the decimal exponent is < -4 or
  *    >= precision-1 == 5 (format(100000.0, '.6') == '1e+05');
  *  - fixed-point keeps at least one digit after the point ('1.0'), but a
  *    scientific INTEGRAL mantissa does not (1e+06, never 1.0e+06);
  *  - two-digit exponent, 'nan'/'inf' lowercase, -0.0 keeps its sign.
  */
object PyFmt {
  def g6(x: Double): String = {
    if (x.isNaN) return "nan"
    if (x.isInfinite) return if (x > 0) "inf" else "-inf"
    if (x == 0.0) return if (1.0 / x < 0) "-0.0" else "0.0"
    val bd = new java.math.BigDecimal(x).round(
      new java.math.MathContext(6, java.math.RoundingMode.HALF_EVEN))
    val exp = bd.precision() - bd.scale() - 1
    if (exp < -4 || exp >= 5) {
      val ms = bd.movePointLeft(exp).stripTrailingZeros().toPlainString
      val sign = if (exp < 0) "-" else "+"
      f"${ms}e$sign${math.abs(exp)}%02d"
    } else {
      var s = bd.stripTrailingZeros().toPlainString
      if (!s.contains('.')) s += ".0"
      s
    }
  }
}
