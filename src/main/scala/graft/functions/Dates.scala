package graft.functions

/** Deterministic natural-language date grammar — the engine-side replacement
  * of the reference's `dateparser.search_dates` calls
  * (src/methods/DateParser.py:45, Spanish variant at
  * src/methods/MultipleEntityExtractor.py:61-63). Covers the shapes the
  * reference corpus uses: ISO, "12 January 2021", "January 12, 2021",
  * "12 de enero de 2021" (es), "12/01/2021". Pure function → usable from
  * column pipelines (UDF) or typed maps; no locale lookups, no wall clock.
  */
object Dates {

  private val monthNames: Map[String, Int] = {
    val en = Seq("january", "february", "march", "april", "may", "june", "july",
      "august", "september", "october", "november", "december")
    val es = Seq("enero", "febrero", "marzo", "abril", "mayo", "junio", "julio",
      "agosto", "septiembre", "octubre", "noviembre", "diciembre")
    (en.zipWithIndex ++ es.zipWithIndex).map { case (n, i) => n -> (i + 1) }.toMap
  }

  private val Iso = """(\d{4})-(\d{2})-(\d{2})""".r
  private val Dmy = """(\d{1,2})[/.](\d{1,2})[/.](\d{4})""".r
  private val DMonY = """(\d{1,2})(?: de)? ([a-záéíóúñ]+)(?: de)?,? (\d{4})""".r
  private val MonDY = """([a-záéíóúñ]+) (\d{1,2}),? (\d{4})""".r

  /** Parse one date expression; None when the grammar doesn't match or the
    * field values are out of range (mirrors the parse-success filter F4).
    */
  def parse(s: String): Option[java.time.LocalDate] = {
    val t = Text.normWs(s).toLowerCase(java.util.Locale.ROOT)
    val parsed = t match {
      case Iso(y, m, d)    => Some((y.toInt, m.toInt, d.toInt))
      case Dmy(d, m, y)    => Some((y.toInt, m.toInt, d.toInt))
      case DMonY(d, mn, y) => monthNames.get(mn).map(m => (y.toInt, m, d.toInt))
      case MonDY(mn, d, y) => monthNames.get(mn).map(m => (y.toInt, m, d.toInt))
      case _               => None
    }
    parsed.flatMap { case (y, m, d) =>
      try Some(java.time.LocalDate.of(y, m, d))
      catch { case _: java.time.DateTimeException => None }
    }
  }

  /** Render (y, m, d) in one of the grammar's NL shapes, cycled by `style` —
    * used by the round-trip query (format → parse must invert).
    */
  def render(y: Int, m: Int, d: Int, style: Int): String = {
    val en = Seq("January", "February", "March", "April", "May", "June", "July",
      "August", "September", "October", "November", "December")
    val es = Seq("enero", "febrero", "marzo", "abril", "mayo", "junio", "julio",
      "agosto", "septiembre", "octubre", "noviembre", "diciembre")
    math.floorMod(style, 4) match {
      case 0 => f"$y%04d-$m%02d-$d%02d"
      case 1 => s"$d ${en(m - 1)} $y"
      case 2 => s"${en(m - 1)} $d, $y"
      case 3 => s"$d de ${es(m - 1)} de $y"
    }
  }
}
