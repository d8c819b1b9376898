package graft.queries

import graft.kernels.SaxCodec

/** Shared-literal SQL builders for the faithful bSAX rows: the DuckDB
  * oracles quantize with the SAME full-precision Acklam bounds and look
  * words up in the SAME driver-computed vocabulary table the Spark side
  * uses (SaxCodec) — the dftWeights/λ-table pattern, so both engines
  * agree bit-for-bit on every symbol and word string. */
private[queries] object SaxOracle {

  /** Full-precision bound literals (shortest round-trip decimal — both
    * DuckDB and Spark parse back the identical double). */
  def boundLits(alphabetSize: Int): Seq[String] =
    SaxCodec.getBounds(alphabetSize).toSeq.map(d => java.lang.Double.toString(d))

  /** CASE expr quantizing SQL expression `x` to its 0-based symbol
    * (upper bound included — SAXUtils.SAX binarySearch semantics). */
  def symbolSql(x: String, alphabetSize: Int): String =
    boundLits(alphabetSize).zipWithIndex
      .map { case (b, i) => s"WHEN ($x) <= $b THEN $i" }
      .mkString("CASE ", " ", s" ELSE ${alphabetSize - 1} END")

  /** DuckDB array literal of the (alphabetSize, wordLen) vocabulary,
    * indexed by 1 + Σ symbol_w·alphabet^(wordLen−1−w). OPB64 words use
    * [.0-9A-Z_a-z] only — no SQL quoting hazards. */
  def wordTableSql(alphabetSize: Int, wordLen: Int): String =
    SaxCodec.wordTable(SaxCodec.levelsOf(alphabetSize), wordLen)
      .map(w => s"'$w'").mkString("[", ",", "]")

  /** The bSAX word over symbol SQL expressions via the vocab table. */
  def wordSql(symbols: Seq[String], alphabetSize: Int, wordLen: Int): String = {
    val v = symbols.reduce((acc, s) => s"($acc) * $alphabetSize + ($s)")
    s"(${wordTableSql(alphabetSize, wordLen)})[($v) + 1]"
  }

  /** Bessel-standardized z expressions for a window of value exprs —
    * the exact fp shapes of StatOps.bsaxWordCol/GTSHelper.bSAX:
    * sum/sumsq over the SEGMENT MEANS, naive variance, ×w/(w−1),
    * z = sigma != 0 ? (m−mu)/sigma : m−mu. */
  def besselZSql(means: Seq[String]): Seq[String] = {
    val w = means.length
    val sum = means.reduce((a, b) => s"($a) + ($b)")
    val sumsq = means.map(m => s"($m) * ($m)").reduce((a, b) => s"($a) + ($b)")
    val mu = s"(($sum) / $w.0)"
    val varNaive = s"(($sumsq) / $w.0 - (($sum) * ($sum)) / ${w.toDouble * w})"
    val variance = if (w > 1) s"($varNaive * $w.0 / ${w - 1}.0)" else varNaive
    val sigma = s"sqrt($variance)"
    means.map(m => s"(CASE WHEN $sigma <> 0.0 THEN (($m) - $mu) / $sigma ELSE ($m) - $mu END)")
  }
}
